"""Round-8 operators: incremental near-dup admission
(dedup.incremental_minhash_dedup) and the token-balanced shard planner
(curation.balanced_shard_plan) — planted-scenario pins complementing
the x240/x241 catalog oracles.
"""

from __future__ import annotations

from pyspark.sql import Row

from shifts_etl_spark.operators.curation import balanced_shard_plan
from shifts_etl_spark.operators.dedup import (
    incremental_minhash_dedup,
    minhash_signatures,
)

A = (
    "the quick brown fox jumps over the lazy dog near the quiet river "
    "bank while the evening sun sets slowly behind the old wooden mill"
)
B = (
    "completely different content about distributed query engines and "
    "columnar storage formats with vectorized execution pipelines today"
)
C = (
    "a third unrelated passage describing mountain weather patterns and "
    "the seasonal migration of birds across the northern coastal plains"
)


def test_incremental_neardup_admission(spark):
    """History match drops the incoming copy; an unrelated doc is
    admitted; of two mutual batch near-dups only the min-id one is
    admitted (the greedy lower-id rule), the other matching its batch
    mate, not history."""
    history = spark.createDataFrame([Row(doc_id=1, text=A)])
    incoming = spark.createDataFrame(
        [
            Row(doc_id=10, text=A),   # exact copy of history -> drop
            Row(doc_id=11, text=B),   # fresh -> keep
            Row(doc_id=12, text=C),   # first of a batch pair -> keep
            Row(doc_id=13, text=C),   # batch mate of 12 -> drop
        ]
    )
    out = {
        r.doc_id: r
        for r in incremental_minhash_dedup(incoming, history).collect()
    }
    assert not out[10].keep and out[10].matched_id == 1
    assert out[10].est_jaccard == 1.0
    assert out[11].keep and out[11].matched_id is None
    assert out[12].keep
    assert not out[13].keep and out[13].matched_id == 12


def test_incremental_neardup_signature_only_history(spark):
    """The 100 TB path: history passed as a precomputed (id, sig)
    sidecar — text never scanned — must produce the identical verdicts
    as the text-based convenience path."""
    history = spark.createDataFrame(
        [Row(doc_id=1, text=A), Row(doc_id=2, text=B)]
    )
    incoming = spark.createDataFrame(
        [Row(doc_id=10, text=A), Row(doc_id=11, text=C)]
    )
    via_text = incremental_minhash_dedup(incoming, history).collect()
    sidecar = minhash_signatures(history).withColumnRenamed("doc", "doc_id")
    via_sigs = incremental_minhash_dedup(
        incoming, sidecar, history_sig_col="sig"
    ).collect()
    key = lambda rows: sorted(tuple(r) for r in rows)  # noqa: E731
    assert key(via_text) == key(via_sigs)
    verdicts = {r.doc_id: r.keep for r in via_text}
    assert verdicts == {10: False, 11: True}


def test_balanced_shard_plan_invariants(spark):
    """Every doc lands in exactly one shard, token shares sum to 1,
    skew is share x W by definition, and the plan is deterministic."""
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(["tok"] * (5 + (i * 7) % 40)))
         for i in range(60)]
    )
    plan = balanced_shard_plan(docs, n_shards=4, sub_buckets_per_shard=8)
    rows = plan.collect()
    assert {r.shard for r in rows} <= set(range(4))
    assert sum(r.n_docs for r in rows) == 60
    total = sum(r.n_tokens for r in rows)
    assert total == sum(5 + (i * 7) % 40 for i in range(60))
    assert abs(sum(r.token_share for r in rows) - 1.0) < 1e-5
    for r in rows:
        assert abs(r.skew_vs_mean - r.token_share * 4) < 1e-5
    again = balanced_shard_plan(
        docs, n_shards=4, sub_buckets_per_shard=8
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_balanced_shard_plan_beats_naive_on_skewed_tokens(spark):
    """The serpentine pack must tame a token-skewed corpus: with a few
    giant docs and many small ones, every shard's skew_vs_mean stays
    within a loose band around 1 instead of one shard swallowing the
    giants."""
    rows = [Row(doc_id=i, text=" ".join(["w"] * 2000)) for i in range(4)]
    rows += [Row(doc_id=100 + i, text=" ".join(["w"] * 10))
             for i in range(96)]
    plan = balanced_shard_plan(
        spark.createDataFrame(rows), n_shards=4, sub_buckets_per_shard=16
    ).collect()
    assert len(plan) == 4
    for r in plan:
        assert 0.5 <= r.skew_vs_mean <= 1.5, plan


def test_balanced_shard_map_matches_plan(spark):
    """Applying balanced_shard_map the documented way (hash each doc to
    its md5 sub-bucket, broadcast-join shard) reproduces the plan's
    per-shard doc and token totals exactly — audit == shipped."""
    from pyspark.sql import functions as F

    from shifts_etl_spark.operators.curation import (
        _hex_uniform_int,
        balanced_shard_map,
    )
    from shifts_etl_spark.operators.textstats import token_count

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(["tok"] * (5 + (i * 11) % 50)))
         for i in range(80)]
    )
    plan = {
        r.shard: (r.n_docs, r.n_tokens)
        for r in balanced_shard_plan(
            docs, n_shards=4, sub_buckets_per_shard=8
        ).collect()
    }
    m = balanced_shard_map(docs, n_shards=4, sub_buckets_per_shard=8)
    applied = (
        docs.select(
            (
                _hex_uniform_int(
                    F.concat(F.col("doc_id").cast("string"), F.lit("-shard"))
                )
                % 32
            ).alias("sb"),
            token_count(F.col("text")).alias("n_tok"),
        )
        .join(F.broadcast(m), "sb")
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("n_tokens"))
        .collect()
    )
    assert {r.shard: (r.n_docs, r.n_tokens) for r in applied} == plan


def test_incremental_neardup_reingested_id_no_self_match(spark):
    """A doc re-ingested under its previously-admitted id with EDITED
    text must be judged against the history signature stored for that
    id — never against its own incoming signature (the bare-id
    re-attach bug produced a spurious est-1.0 self-match and dropped
    the doc)."""
    history = spark.createDataFrame([Row(doc_id=10, text=A)])
    sidecar = minhash_signatures(history).withColumnRenamed("doc", "doc_id")
    edited = B  # wholly different text under the same id
    incoming = spark.createDataFrame([Row(doc_id=10, text=edited)])
    out = incremental_minhash_dedup(
        incoming, sidecar, history_sig_col="sig", threshold=0.5
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.doc_id == 10 and r.keep and r.matched_id is None


def test_incremental_neardup_history_ids_above_batch(spark):
    """With history ids sorting ABOVE batch ids, a non-representative
    exact dup must still report its min qualifying partner — the rep
    itself at est 1.0 — not the rep's higher-id history match (the
    coalesce-expansion bug)."""
    history = spark.createDataFrame([Row(doc_id=1000, text=A)])
    incoming = spark.createDataFrame(
        [Row(doc_id=5, text=A), Row(doc_id=7, text=A)]
    )
    out = {
        r.doc_id: r
        for r in incremental_minhash_dedup(incoming, history).collect()
    }
    assert not out[5].keep and out[5].matched_id == 1000
    assert out[5].est_jaccard == 1.0
    assert not out[7].keep and out[7].matched_id == 5
    assert out[7].est_jaccard == 1.0
