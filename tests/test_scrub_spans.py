"""Edge cases for dedup.scrub_duplicate_spans — the destructive
exact-substring scrub pipeline.curate() stage 3 applies. The happy path
(carriers lose exactly the shared block) is pinned in
tests/test_curate_pipeline.py; here: boundary geometry (span at start /
end / whole doc), short docs below the window, and arithmetic identity
scrubbed_len == n_chars - dup_chars for every scrubbed doc.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shifts_etl_spark.operators.dedup import scrub_duplicate_spans

BLOCK = "0123456789" * 5  # 50 shared chars >= span_len=40


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r.doc_id: r
        for r in scrub_duplicate_spans(df, **kw).collect()
    }


def test_span_positions_start_middle_end(spark):
    # surroundings share no text AND the chars adjacent to BLOCK differ
    # per doc (a shared boundary char — even a space — correctly extends
    # the maximal span past the block), so the span is exactly BLOCK
    t1 = "Qalpha unique tail one two three four five six"
    h2 = "bravo unique head seven eight nine ten elevenZ"
    h3, t3 = "charlie delta echo foxtrot golf hotel indiaX", "Yjuliet kilo lima"
    rows = [
        (1, BLOCK + t1),        # span at char 1
        (2, h2 + BLOCK),        # span at end
        (3, h3 + BLOCK + t3),   # span in the middle
    ]
    out = _run(spark, rows)
    assert out[1].text == t1
    assert out[2].text == h2
    assert out[3].text == h3 + t3
    for r in out.values():
        assert r.action == "scrub"
        assert r.dup_chars == 50  # exactly BLOCK
        assert len(r.text) == r.n_chars - r.dup_chars


def test_whole_doc_duplicated_is_dropped(spark):
    rows = [(1, BLOCK), (2, BLOCK)]
    out = _run(spark, rows)
    assert out[1].action == "drop" and out[2].action == "drop"
    assert out[1].dup_frac == 1.0


def test_docs_below_window_pass_through(spark):
    short = "too short to window"
    rows = [(1, short), (2, short), (3, "x")]
    out = _run(spark, rows)  # span_len=40 > len(text): no spans possible
    for i, r in out.items():
        assert r.action == "keep"
        assert r.dup_chars == 0 and r.n_spans == 0
        assert r.text == rows[i - 1][1]


def test_adjacent_spans_merge_to_one_cut(spark):
    # two distinct shared blocks sitting back-to-back in doc 1: the
    # interval merge must emit ONE maximal span covering both, and the
    # cut must remove the full range exactly once
    a, b = "A" * 45, "B" * 45
    pad = " one two three four five six seven eight nine"  # keeps frac < 0.8
    # chars adjacent to the shared blocks differ per doc (see above)
    rows = [
        (1, "left." + a + b + "!right" + pad),
        (2, "other carrier of;" + a + "?apart"),
        (3, "another carrier:" + b + "=elsewhere"),
        (4, "second_" + a + b + "-pair carrier" + pad.upper()),
    ]
    out = _run(spark, rows)
    r = out[1]
    assert r.action == "scrub"
    assert r.n_spans == 1  # merged maximal interval
    assert r.dup_chars == 90
    assert r.text == "left.!right" + pad


def test_extra_columns_survive(spark):
    df = spark.createDataFrame(
        [(1, "s0", 7, BLOCK + " unique tail abc"), (2, "s1", 8, BLOCK + " other tail xyz")],
        "doc_id long, source string, extra int, text string",
    )
    out = scrub_duplicate_spans(df)
    assert set(out.columns) >= {"doc_id", "source", "extra", "text", "action"}
    vals = {r.doc_id: r for r in out.collect()}
    assert vals[1].extra == 7 and vals[2].source == "s1"


def test_randomized_invariants(spark):
    """Seeded random corpus with planted shared blocks at random
    positions: per-row invariants hold for every document —
    scrub ⇒ len(text) == n_chars - dup_chars and dup_frac < drop_frac;
    keep ⇒ text unchanged and dup_chars == 0;
    drop ⇒ dup_frac >= drop_frac; and 0 <= dup_chars <= n_chars."""
    import random

    rng = random.Random(42)
    words = [f"w{i}" for i in range(300)]
    blocks = [
        "".join(rng.choice("abcdefghij") for _ in range(rng.randint(40, 90)))
        for _ in range(6)
    ]
    rows = []
    for doc_id in range(200):
        body = " ".join(rng.choice(words) for _ in range(rng.randint(5, 60)))
        # ~half the docs carry 1-2 shared blocks spliced at random points
        for _ in range(rng.randint(0, 2)):
            b = rng.choice(blocks)
            pos = rng.randint(0, len(body))
            body = body[:pos] + b + body[pos:]
        rows.append((doc_id, body))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    original = dict(rows)
    drop_frac = 0.7
    out = scrub_duplicate_spans(df, drop_frac=drop_frac).collect()
    assert len(out) == 200
    for r in out:
        assert 0 <= r.dup_chars <= r.n_chars
        assert r.n_chars == len(original[r.doc_id])
        if r.action == "keep":
            assert r.dup_chars == 0 and r.text == original[r.doc_id]
        elif r.action == "scrub":
            assert len(r.text) == r.n_chars - r.dup_chars
            assert r.dup_frac < drop_frac
        else:
            assert r.action == "drop"
            assert r.dup_frac >= drop_frac
            assert r.text == original[r.doc_id]  # drop leaves text as-is
