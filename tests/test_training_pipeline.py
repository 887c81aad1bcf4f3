"""Capstone training-data pipeline: filter → scrub → dedup → chunk → pack
→ split, with planted duplicates and PII."""

from pyspark.sql import Row, functions as F

from shifts_etl_spark.pipeline import prepare_training_data
from shifts_etl_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_prepare_training_data(spark, tmp_path):
    base = load_table(spark, SF, "documents").select("doc_id", "text").limit(40)
    rows = [Row(doc_id=r.doc_id, text=r.text) for r in base.collect()]
    # plant: a near-duplicate of doc rows[0] and a PII-laden doc
    words = rows[0].text.split()
    words[0] = "CHANGED"
    rows.append(Row(doc_id=9001, text=" ".join(words)))
    rows.append(
        Row(
            doc_id=9002,
            text="contact me at someone@example.com or https://example.com/x "
            + " ".join(["filler"] * 30),
        )
    )
    rows.append(Row(doc_id=9003, text="too short"))  # fails quality gate
    docs = spark.createDataFrame(rows)

    stages = prepare_training_data(spark, docs, output_dir=tmp_path / "out")

    quality = {r.doc_id: r.keep for r in stages["quality"].collect()}
    assert quality[9003] is False
    assert quality[9002] is True

    deduped_ids = {r.doc_id for r in stages["deduped"].collect()}
    # the planted near-dup cluster keeps only the min id
    assert rows[0].doc_id in deduped_ids
    assert 9001 not in deduped_ids
    assert 9003 not in deduped_ids  # quality-dropped before dedup

    scrub_row = stages["deduped"].where(F.col("doc_id") == 9002).first()
    assert "<EMAIL>" in scrub_row.text and "<URL>" in scrub_row.text
    assert "example.com" not in scrub_row.text.replace("<EMAIL>", "").replace("<URL>", "")

    # chunking covers every surviving doc; packs are budget-shaped
    assert {r.doc_id for r in stages["chunks"].select("doc_id").distinct().collect()} == deduped_ids
    packs = stages["packs"].collect()
    assert {r.doc_id for r in packs} == deduped_ids
    assert all(0 <= r.pack_offset < 512 for r in packs)

    splits = {r.doc_id: r.split for r in stages["split"].collect()}
    assert set(splits) == deduped_ids
    assert set(splits.values()) <= {"train", "val", "test"}


def test_repetition_stage_drops_spam_doc(spark):
    from pyspark.sql import Row

    from shifts_etl_spark.pipeline import prepare_training_data

    base = spark.read.parquet(f"{SF}/documents.parquet").limit(10)
    spam = spark.createDataFrame(
        [Row(doc_id=99999, text="buy now " * 40)]
    )
    docs = base.select("doc_id", "text").unionByName(spam)
    with_filter = prepare_training_data(
        spark, docs, max_dup_bigram_frac=0.5
    )
    surviving = {r["doc_id"] for r in with_filter["deduped"].collect()}
    assert 99999 not in surviving
    without = prepare_training_data(spark, docs)
    assert 99999 in {r["doc_id"] for r in without["deduped"].collect()}


def test_length_quantile_stage_drops_outlier_doc(spark):
    from pyspark.sql import Row

    from shifts_etl_spark.pipeline import prepare_training_data

    base = spark.read.parquet(f"{SF}/documents.parquet").limit(20)
    # far beyond the corpus p90 token count, but low-repetition enough to
    # pass the quality stage on its own
    letters = "abcdefghijklmnopqrstuvwxyz"
    giant_text = " ".join(
        f"word{letters[i % 23]}{letters[i % 17]}{letters[i % 11]}"
        for i in range(3000)
    )
    giant = spark.createDataFrame([Row(doc_id=88888, text=giant_text)])
    docs = base.select("doc_id", "text").unionByName(giant)

    with_cut = prepare_training_data(spark, docs, max_length_quantile=0.9)
    assert 88888 not in {r["doc_id"] for r in with_cut["deduped"].collect()}

    without = prepare_training_data(spark, docs)
    assert 88888 in {r["doc_id"] for r in without["deduped"].collect()}


def test_cross_doc_dup_filter_stage(spark):
    from pyspark.sql import Row

    from shifts_etl_spark.pipeline import prepare_training_data

    shared = " ".join(f"boiler{i:02d}" for i in range(16))
    docs = spark.createDataFrame(
        [
            # two docs that are ~pure cross-copy boilerplate of each other
            Row(doc_id=0, text=shared + " alpha omega ending here right now"),
            Row(doc_id=1, text=shared + " beta gamma closing this out today"),
            # clean doc sharing no 5-gram with anyone (>= 20 tokens)
            Row(doc_id=2, text=" ".join("unique" + "abcdefghijklmnopqrstuv"[i] * 2 for i in range(22))),
        ],
        "doc_id bigint, text string",
    )
    with_filter = prepare_training_data(
        spark, docs, max_cross_doc_dup_frac=0.3, min_jaccard=0.9
    )
    without = prepare_training_data(spark, docs, min_jaccard=0.9)
    kept_ids = {r["doc_id"] for r in with_filter["deduped"].collect()}
    base_ids = {r["doc_id"] for r in without["deduped"].collect()}
    # the boilerplate pair exceeds 30% dup-5-gram coverage and is dropped
    # by the cross-doc stage; the clean doc survives; stage off = no drop
    assert 2 in kept_ids and not {0, 1} & kept_ids
    assert {0, 1, 2} <= base_ids


def test_prepare_validates_knobs_before_any_action(spark):
    """Config typos fail at entry, BEFORE the eager LSH-dedup stage
    burns a corpus pass (the curate() convention): overlap must sit in
    [0, chunk_tokens), budget_tokens must be positive (0 would silently
    NULL every pack_id), min_jaccard must be a fraction."""
    import pytest

    docs = spark.createDataFrame([(1, "some words")], "doc_id long, text string")
    with pytest.raises(ValueError, match="overlap"):
        prepare_training_data(spark, docs, chunk_tokens=100, overlap=100)
    with pytest.raises(ValueError, match="budget_tokens"):
        prepare_training_data(spark, docs, budget_tokens=0)
    with pytest.raises(ValueError, match="min_jaccard"):
        prepare_training_data(spark, docs, min_jaccard=1.5)
