"""Collocation PMI + unigram-LM log-prob scoring (textstats):
planted-data semantics beyond the DuckDB oracle agreement (x38/x39)."""

from pyspark.sql import functions as F

from shifts_etl_spark.operators.textstats import collocation_pmi, unigram_logprob


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )


def test_collocation_pmi_ranks_fixed_phrase_above_independent_pair(spark):
    # "new york" always co-occurs; "the cat" / "the dog" mix freely, so
    # p(the, cat) factorizes and its PMI sits near zero.
    rows = (
        ["visit new york today"] * 10
        + ["the cat sat", "the dog sat"] * 10
    )
    got = {
        (r.w1, r.w2): r
        for r in collocation_pmi(_docs(spark, rows), min_count=5).collect()
    }
    assert ("new", "york") in got
    phrase = got[("new", "york")]
    assert phrase.n_pair == 10
    mixed = [got[k] for k in [("the", "cat"), ("the", "dog")] if k in got]
    assert mixed, "independent pairs above min_count should still appear"
    assert all(phrase.pmi > m.pmi for m in mixed)


def test_collocation_pmi_min_count_bounds_output(spark):
    rows = ["rare pair here"] + ["common words appear often"] * 6
    got = collocation_pmi(_docs(spark, rows), min_count=5).collect()
    pairs = {(r.w1, r.w2) for r in got}
    assert ("rare", "pair") not in pairs
    assert ("common", "words") in pairs
    assert all(r.n_pair >= 5 for r in got)


def test_unigram_logprob_flags_rare_token_soup(spark):
    # 20 docs of the same two words make those words very probable; the
    # last doc is all-singleton tokens and must score strictly lower.
    rows = ["hello world"] * 20 + ["zqx jvw qqk pzm"]
    out = unigram_logprob(_docs(spark, rows))
    scores = {r.doc_id: r.mean_logprob for r in out.collect()}
    assert scores[20] < scores[0] < 0.0


def test_unigram_logprob_skips_empty_docs_and_counts_tokens(spark):
    rows = ["one two three", "   ", ""]
    out = unigram_logprob(_docs(spark, rows)).collect()
    assert {r.doc_id for r in out} == {0}
    assert out[0].n_tokens == 3
