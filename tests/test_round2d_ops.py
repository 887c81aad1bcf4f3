"""Batch-D operators: rare-shingle blocking + standalone connected
components (bounded candidate fan-out, planted-cluster transitive
closure) and cross-corpus duplicate-n-gram coverage (RefinedWeb-style
dup-token fraction: full containment, partial overlap, no-dup zero)."""

from pyspark.sql import Row

from shifts_etl_spark.operators import dedup


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        "doc_id bigint, text string",
    )


BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"


def test_components_transitive_closure(spark):
    # 0~1 and 1~2 are near-dups (high shingle overlap) but 0~2 only
    # transitively; 3 is unrelated; 4/5 an independent pair.
    texts = [
        BASE + " one",
        BASE + " two",
        BASE + " two three",
        "totally different words nothing shared here at all folks",
        "lorem ipsum dolor sit amet consectetur adipiscing elit sed",
        "lorem ipsum dolor sit amet consectetur adipiscing elit sed do",
    ]
    out = {
        r["doc"]: r["cluster_id"]
        for r in dedup.blocked_dedup_components(_docs(spark, texts)).collect()
    }
    assert out == {0: 0, 1: 0, 2: 0, 4: 4, 5: 4}


def test_components_candidate_fanout_bounded(spark):
    # 20 identical docs: every shingle has df=20 > max_df=5, so blocking
    # yields ZERO candidates — the hot-bucket blowup is excluded by
    # construction (the pathological case LSH needs an explicit cap for).
    texts = [BASE] * 20
    cands = dedup.rare_shingle_pairs(_docs(spark, texts))
    assert cands.count() == 0


def test_components_rare_block_pairs(spark):
    # exactly two docs share a rare shingle -> one candidate pair
    texts = [BASE, BASE + " extra", "unrelated text with other tokens wholly"]
    cands = {
        (r["id_a"], r["id_b"])
        for r in dedup.rare_shingle_pairs(_docs(spark, texts)).collect()
    }
    assert cands == {(0, 1)}


def test_dup_ngram_coverage_semantics(spark):
    # doc0/doc1 share their first 10 tokens -> all 5-grams over that span
    # are duplicated; the distinct tails are not.
    texts = [
        BASE + " unique0 tail0 here0",
        BASE + " unique1 tail1 here1",
        "completely separate vocabulary without any overlap at all now",
    ]
    rows = {
        r["doc_id"]: r
        for r in dedup.duplicate_ngram_coverage(_docs(spark, texts)).collect()
    }
    # 13 tokens each; duplicated 5-grams are positions 0..5 (6 shingles,
    # all within the shared 10-token prefix) covering positions 0..9.
    assert rows[0]["n_tokens"] == 13
    assert rows[0]["dup_tokens"] == 10
    assert abs(rows[0]["dup_frac"] - 10 / 13) < 1e-6
    assert rows[1]["dup_tokens"] == 10
    assert rows[2]["dup_tokens"] == 0 and rows[2]["dup_frac"] == 0.0


def test_dup_ngram_coverage_short_docs(spark):
    # docs shorter than the shingle width emit no 5-grams -> zero coverage
    texts = ["tiny doc", "tiny doc"]
    rows = dedup.duplicate_ngram_coverage(_docs(spark, texts)).collect()
    assert all(r["dup_tokens"] == 0 and r["dup_frac"] == 0.0 for r in rows)
    assert {r["n_tokens"] for r in rows} == {2}


def test_inverted_index_postings(spark):
    from shifts_etl_spark.operators.textstats import inverted_index

    texts = [
        "apple banana apple",        # doc0: apple tf=2
        "banana cherry",             # doc1
        "apple cherry cherry",       # doc2
    ]
    idx = {
        r["term"]: (r["df"], r["cf"], r["postings"])
        for r in inverted_index(_docs(spark, texts), min_df=2).collect()
    }
    assert idx == {
        "apple": (2, 3, "0,2"),
        "banana": (2, 2, "0,1"),
        "cherry": (2, 3, "1,2"),
    }


def test_inverted_index_df_cap(spark):
    from shifts_etl_spark.operators.textstats import inverted_index

    # 'common' appears in every doc -> above the 90% relative cap;
    # the other terms are singletons -> below min_df
    texts = ["common alpha", "common beta", "common gamma", "common delta"]
    out = inverted_index(_docs(spark, texts), min_df=2).collect()
    assert out == []


def test_ndcg_perfect_and_reordered(spark):
    from shifts_etl_spark.operators.textstats import ndcg_eval

    # 'q' tf order == bm25 order when lengths are equal -> NDCG exactly 1.
    equal_len = ["q q q pad1 pad2", "q q pad3 pad4 pad5", "q pad6 pad7 pad8 pad9"]
    rows = {r["term"]: r for r in ndcg_eval(_docs(spark, equal_len), ["q"]).collect()}
    assert rows["q"]["n_candidates"] == 3
    assert abs(rows["q"]["ndcg"] - 1.0) < 1e-9

    # doc0 has higher tf but is much longer: BM25's length normalization
    # demotes it below doc1 -> NDCG < 1.
    skewed = [
        "q q " + " ".join(f"w{i}" for i in range(60)),
        "q short doc",
    ]
    rows = {r["term"]: r for r in ndcg_eval(_docs(spark, skewed), ["q"]).collect()}
    assert rows["q"]["ndcg"] < 1.0


def test_materialize_mixture_quota_and_determinism(spark):
    from shifts_etl_spark.operators.curation import (
        materialize_mixture,
        mixture_allocation,
    )

    texts, sources = [], []
    for i in range(40):
        src = "big" if i < 30 else "small"
        sources.append(src)
        texts.append(" ".join(f"w{i}_{j}" for j in range(8)))
    docs = spark.createDataFrame(
        [Row(doc_id=i, source=s, text=t) for i, (s, t) in enumerate(zip(sources, texts))],
        "doc_id bigint, source string, text string",
    )
    alloc = {
        r["source"]: r["alloc_docs"]
        for r in mixture_allocation(docs, budget=10, temperature=2.0).collect()
    }
    drawn = materialize_mixture(docs, budget=10, temperature=2.0).collect()
    # drawn counts hit the planned quota exactly (every source has enough docs)
    per_src = {}
    for r in drawn:
        per_src[r["source"]] = per_src.get(r["source"], 0) + 1
    assert per_src == alloc and sum(alloc.values()) == 10
    # draw_rank dense within source and the draw is reproducible
    again = materialize_mixture(docs, budget=10, temperature=2.0).collect()
    assert sorted(map(tuple, drawn)) == sorted(map(tuple, again))
    # temperature upweights the small source vs proportional share
    assert alloc["small"] >= 2


def test_purged_temporal_split_boundaries(spark):
    from shifts_etl_spark.plans.extensions import x72_purged_temporal_split

    out = {r["split"]: r for r in x72_purged_temporal_split(spark, "/root/testdata/sf0.001").collect()}
    assert set(out) <= {"train", "test", "embargo"}
    if "train" in out and "embargo" in out:
        assert out["train"]["last_date"] < out["embargo"]["first_date"]
    if "embargo" in out and "test" in out:
        assert out["embargo"]["last_date"] < out["test"]["first_date"]
        # embargo window spans at most the 30-day purge
        assert (out["embargo"]["last_date"] - out["embargo"]["first_date"]).days < 30


def test_negative_sampling_cross_label_and_reproducible(spark):
    from shifts_etl_spark.plans.catalog import CATALOG

    rows = CATALOG["x73_negative_sampling"].spark(spark, "/root/testdata/sf0.001").collect()
    assert rows, "expected some negatives"
    import duckdb

    con = duckdb.connect()
    labels = dict(
        con.execute(
            "SELECT vec_id, label FROM '/root/testdata/sf0.001/embeddings.parquet'"
        ).fetchall()
    )
    for r in rows:
        assert labels[r["anchor_id"]] != labels[r["neg_id"]]
        assert 1 <= r["neg_rank"] <= 3
    again = CATALOG["x73_negative_sampling"].spark(spark, "/root/testdata/sf0.001").collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_label_noise_flags_planted_mislabels(spark):
    from shifts_etl_spark.plans.extensions import x76_label_noise

    # sanity on real data: every vector gets <=5 neighbors and frac in [0,1]
    rows = x76_label_noise(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_neighbors"] <= 5
        assert 0.0 <= r["disagree_frac"] <= 1.0
        if r["suspect"]:
            assert r["n_neighbors"] >= 3 and r["disagree_frac"] >= 0.6


def test_quality_psi_identical_sources_near_zero(spark):
    from shifts_etl_spark.operators.textstats import quality_score  # noqa: F401
    from shifts_etl_spark.plans.extensions import x77_quality_psi

    out = {r["source"]: r for r in x77_quality_psi(spark, "/root/testdata/sf0.001").collect()}
    assert out
    # PSI is finite and small for sources drawn from the same generator;
    # and per-source doc counts sum to the corpus size
    import duckdb

    n = duckdb.sql(
        "SELECT count(*) FROM '/root/testdata/sf0.001/documents.parquet'"
    ).fetchone()[0]
    assert sum(r["n_docs"] for r in out.values()) == n
    assert all(abs(r["psi"]) < 1.0 for r in out.values())
