"""Round-5 operators: duplicate-cluster canonicalization (x84) and
maximal duplicated spans (x85) — planted-data semantics pins; the sf0.01
value-hash equivalence lives in the driver gate / check_correctness."""

from __future__ import annotations

from pyspark.sql import Row

from shifts_etl_spark.operators.dedup import (
    canonical_representatives,
    duplicate_span_intervals,
    span_boilerplate_blocks,
    span_scrub_stats,
)

BASE = "the quick brown fox jumps over the lazy dog and a cat"


def _doc(i, text):
    return Row(doc_id=i, text=text, lang="en", source="s", n_chars=len(text))


def test_canonical_representatives_picks_best_quality(spark):
    """Docs 7 and 3 are near-dups (3-shingle Jaccard ~0.71); 7 is the
    clean copy (quality 1.0), 3 carries digit junk that kills the
    digit-ratio bonus (0.9). Canonical must be 7 even though the
    cluster_id (min member id) is 3. Doc 50 is unrelated → no row."""
    rows = [
        _doc(7, BASE),
        _doc(3, BASE + " 1234567890 987654321 55555555 4444444"),
        _doc(50, "completely different words entirely unrelated content here"),
    ]
    df = spark.createDataFrame(rows)
    out = canonical_representatives(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.cluster_id, r.n_members, r.canonical_doc) == (3, 2, 7)
    assert r.canonical_quality == 1.0


def test_canonical_representatives_tiebreak_min_id(spark):
    """Equal-quality members → min doc id wins the canonical slot (the
    deterministic tie-break the oracle mirrors)."""
    rows = [_doc(12, BASE), _doc(8, BASE)]  # identical text, same quality
    out = canonical_representatives(spark.createDataFrame(rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.cluster_id, r.n_members, r.canonical_doc) == (8, 2, 8)


def test_duplicate_span_intervals_merges_windows(spark):
    """A 132-char block shared by docs 1 and 2 (at different offsets,
    surrounded by doc-unique filler) must surface as ONE maximal span
    per doc — start/end at the block boundaries, span_chars = 132,
    n_windows = 132 - 40 + 1 = 93 — not 93 separate fingerprints."""
    shared = "the quick brown fox jumps over the lazy dog " * 3  # 132 chars
    assert len(shared) == 132
    d1 = "U1" * 30 + shared + "V1" * 30
    d2 = "W2" * 25 + shared + "Z2" * 40
    df = spark.createDataFrame([_doc(1, d1), _doc(2, d2)])
    out = {r.doc: r for r in duplicate_span_intervals(df).collect()}
    assert set(out) == {1, 2}
    r1, r2 = out[1], out[2]
    assert (r1.span_start, r1.span_chars, r1.n_windows) == (61, 132, 93)
    assert r1.span_end == 61 + 132 - 1
    assert (r2.span_start, r2.span_chars, r2.n_windows) == (51, 132, 93)
    assert r2.span_end == 51 + 132 - 1


def test_duplicate_span_intervals_separate_islands(spark):
    """Two shared blocks in one doc separated by >40 unique chars must
    stay TWO spans (the gap breaks the island)."""
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"  # 56
    b = "one two three four five six seven eight nine ten eleven"  # 55
    d1 = a + "Q1" * 30 + b
    d2 = a + "R2" * 35 + b
    df = spark.createDataFrame([_doc(1, d1), _doc(2, d2)])
    out = [r for r in duplicate_span_intervals(df).collect() if r.doc == 1]
    out.sort(key=lambda r: r.span_start)
    assert len(out) == 2
    assert out[0].span_start == 1 and out[0].span_chars == 56
    assert out[1].span_chars == 55 and out[1].n_windows == 16
    assert out[1].span_start == 56 + 60 + 1


def test_span_boilerplate_catalog(spark):
    """Both docs carry the same 132-char block at different offsets →
    the catalog has exactly ONE entry: that block's hash, seen in 2
    docs / 2 spans, first_doc = min id."""
    shared = "the quick brown fox jumps over the lazy dog " * 3
    df = spark.createDataFrame(
        [_doc(4, "U1" * 30 + shared + "V1" * 30),
         _doc(9, "W2" * 25 + shared + "Z2" * 40)]
    )
    out = span_boilerplate_blocks(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.span_chars, r.n_docs, r.n_spans, r.first_doc) == (132, 2, 2, 4)
    import hashlib

    assert r.block_hash == hashlib.md5(shared.encode()).hexdigest()


def test_span_scrub_stats_accounts_all_docs(spark):
    """Scrub accounting covers EVERY doc: the two span-carrying docs
    report dup_chars = 132 and the exact dup_frac; the span-free doc
    reports zeros."""
    shared = "the quick brown fox jumps over the lazy dog " * 3
    d1 = "U1" * 30 + shared + "V1" * 30
    df = spark.createDataFrame(
        [_doc(1, d1),
         _doc(2, "W2" * 25 + shared + "Z2" * 40),
         _doc(3, "entirely unrelated text with no duplicate block at all")]
    )
    out = {r.doc: r for r in span_scrub_stats(df).collect()}
    assert set(out) == {1, 2, 3}
    assert (out[1].dup_chars, out[1].n_spans) == (132, 1)
    assert out[1].n_chars == len(d1)
    assert out[1].dup_frac == round(132 / len(d1), 6)
    assert (out[3].dup_chars, out[3].n_spans, out[3].dup_frac) == (0, 0, 0.0)


def test_quality_calibration_properties(spark):
    """Quantile-normalization contract on the real sf0.001 corpus:
    calibrated values come from the corpus quality lattice, each
    source's worst doc (r=0) maps to the corpus minimum, each source's
    best (r=1) maps to the corpus maximum, and calibration is monotone
    in within-source rank."""
    from shifts_etl_spark.operators.curation import calibrate_quality
    from shifts_etl_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = calibrate_quality(docs).collect()
    corpus_q = sorted({r.q for r in out})
    assert all(r.q_calibrated in corpus_q for r in out)
    by_source = {}
    for r in out:
        by_source.setdefault(r.source, []).append(r)
    for rows in by_source.values():
        rows.sort(key=lambda r: r.src_rank)
        if len(rows) > 1:
            assert rows[0].q_calibrated == corpus_q[0]   # r = 0
            assert rows[-1].q_calibrated == corpus_q[-1]  # r = 1
        cal = [r.q_calibrated for r in rows]
        assert cal == sorted(cal)  # monotone in rank


def test_budget_selection_keeps_quality_prefix(spark):
    """Budget = tokens(A) + tokens(B) exactly: the quality-ranked prefix
    A (q=1.0, 12 tokens) + B (q=0.9, 16 tokens) is kept; C (junk, 1
    token) would overflow and is excluded even though it's tiny —
    budget selection is a prefix rule, not a knapsack."""
    from shifts_etl_spark.operators.curation import select_within_token_budget

    rows = [
        _doc(1, BASE),                                         # q=1.0, 12 tok
        _doc(2, BASE + " 1234567890 987654321 55555555 4444444"),  # 0.9, 16
        _doc(3, "zz"),                                         # low q, 1 tok
    ]
    out = {
        r.doc_id: r
        for r in select_within_token_budget(
            spark.createDataFrame(rows), budget_tokens=28
        ).collect()
    }
    assert set(out) == {1, 2}
    assert (out[1].q, out[1].n_tokens, out[1].cum_tokens) == (1.0, 12, 12)
    assert (out[2].q, out[2].n_tokens, out[2].cum_tokens) == (0.9, 16, 28)


def test_dsir_weights_sign(spark):
    """Hand-checked likelihood ratios: a pool doc made of target-LM
    words scores positive (ln(3/12) − ln(4/18) per token ≈ +0.1178); a
    pool doc of words unseen in the target scores negative
    (ln(1/12) − ln(2/18) ≈ −0.2877)."""
    import math

    from pyspark.sql import Row
    from shifts_etl_spark.operators.curation import dsir_importance_weights

    def d(i, src, text):
        return Row(doc_id=i, text=text, lang="en", source=src,
                   n_chars=len(text))

    df = spark.createDataFrame(
        [
            d(1, "t", "alpha beta gamma"),
            d(2, "t", "alpha beta gamma"),
            d(3, "p", "alpha beta gamma"),
            d(4, "p", "omega psi chi"),
        ]
    )
    out = {
        r.doc_id: r
        for r in dsir_importance_weights(df, target_source="t").collect()
    }
    assert set(out) == {3, 4}
    assert out[3].target_like and not out[4].target_like
    assert out[3].mean_log_ratio == round(
        math.log(3 / 12) - math.log(4 / 18), 4
    )
    assert out[4].mean_log_ratio == round(
        math.log(1 / 12) - math.log(2 / 18), 4
    )


def test_padding_audit_buckets(spark):
    """12-token and 16-token docs land in the 16-bucket (28 real vs 32
    padded); a 300-token doc clips to 256 with zero waste."""
    from shifts_etl_spark.plans.extensions import x92_padding_audit

    rows = [
        _doc(1, " ".join(["w"] * 12)),
        _doc(2, " ".join(["w"] * 16)),
        _doc(3, " ".join(["w"] * 300)),
    ]
    import os

    d = "/tmp/x92_docs_%d" % os.getpid()
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{d}/documents.parquet"
    )
    out = {r.bucket: r for r in x92_padding_audit(spark, d).collect()}
    assert set(out) == {16, 256}
    b16 = out[16]
    assert (b16.n_docs, b16.sum_tokens, b16.sum_padded) == (2, 28, 32)
    assert b16.waste_frac == round(1 - 28 / 32, 6)
    assert (out[256].sum_tokens, out[256].waste_frac) == (256, 0.0)


def test_cross_source_dupes_attribution(spark):
    """A near-dup pair across sources A/B rolls up to one unordered
    (A, B) row; an in-source pair rolls up to (C, C)."""
    from pyspark.sql import Row
    from shifts_etl_spark.plans.extensions import x93_cross_source_dupes

    def d(i, src, text):
        return Row(doc_id=i, text=text, lang="en", source=src,
                   n_chars=len(text))

    t1 = BASE
    t2 = BASE + " 1234567890"
    rows = [
        d(1, "B", t1), d(2, "A", t2),            # cross-source near-dup
        d(3, "C", t1 + " extra tail words here"),
        d(4, "C", t1 + " extra tail words here now"),  # in-source near-dup
    ]
    import os

    p = "/tmp/x93_docs_%d" % os.getpid()
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{p}/documents.parquet"
    )
    out = {(r.source_a, r.source_b): r.n_pairs
           for r in x93_cross_source_dupes(spark, p).collect()}
    assert out[("A", "B")] >= 1
    assert out[("C", "C")] >= 1
