"""End-to-end orchestration — the engine's analog of the reference's two
control endpoints (E1 `/run-etl`, E2 `/clear-data`; reference
etl/app/main.py:31-67, SURVEY.md §3).

`run_etl` = ingest pages → flatten to 4 tables → integrity-validate →
atomically persist → compute + persist the 6 KPIs. One lazy logical plan per
table; the nested doc frame is persisted so the 4 children and 6 KPIs share
a single materialization (the reference's "one scan per table" strategy,
SURVEY.md §4).
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel

from .operators import flatten, kpi, quality
from .sinks.staged import StagedWriter, clear_outputs
from .sources import pages as pages_src

OUTPUT_TABLES = ["shifts", "breaks", "allowances", "award_interpretations", "kpis"]


def run_etl(
    spark: SparkSession,
    pages: Iterable[dict] | None = None,
    api_url: str | None = None,
    output_dir: str | Path = "/tmp/shifts_etl_spark_out",
    anchor_date: dt.date | str | None = None,
    fetch=None,
) -> dict[str, int]:
    """E1 — full pipeline. Provide either ``pages`` (iterable of page dicts,
    e.g. from sources.generator.paginate) or ``api_url`` (paginated HTTP).

    Returns row counts per persisted table. Raises quality.IntegrityError
    (nothing persisted) on constraint violations — the rollback semantics of
    reference etl/tests/test_shift_data_processor.py:242-300 at job
    granularity.
    """
    if pages is None:
        if api_url is None:
            raise ValueError("provide pages or api_url")
        pages = pages_src.iter_http_pages(api_url, fetch=fetch)

    docs = pages_src.docs_from_pages(spark, pages)
    docs = docs.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        tables = flatten.flatten_all(docs)
        quality.validate_tables(tables)

        writer = StagedWriter(output_dir)
        batch = writer.write_batch(tables)

        shifts = writer.read_table(spark, "shifts")
        breaks = writer.read_table(spark, "breaks")
        allowances = writer.read_table(spark, "allowances")
        kpis = kpi.compute_kpis(spark, shifts, breaks, allowances, anchor_date)
        writer.write_batch({"kpis": kpis}, batch_id=f"{batch}-kpis")

        counts = {name: writer.read_table(spark, name).count() for name in OUTPUT_TABLES}
        return counts
    finally:
        docs.unpersist()


def clear_data(output_dir: str | Path) -> None:
    """E2 — wipe all five outputs together (the FK-cascade analog)."""
    clear_outputs(output_dir, OUTPUT_TABLES + ["_staging"])


def prepare_training_data(
    spark: SparkSession,
    docs: DataFrame,
    output_dir: str | Path | None = None,
    min_jaccard: float = 0.5,
    chunk_tokens: int = 100,
    overlap: int = 20,
    budget_tokens: int = 512,
    max_dup_bigram_frac: float | None = None,
    max_length_quantile: float | None = None,
    max_cross_doc_dup_frac: float | None = None,
) -> dict[str, DataFrame]:
    """The LLM-data capstone pipeline, composed from the extension
    operators: quality-filter → optional repetition filter (Gopher-style
    ``max_dup_bigram_frac`` cutoff; None disables the stage and its pass)
    → optional length-outlier filter (``max_length_quantile`` drops docs
    whose token count exceeds that corpus quantile, computed from the
    mergeable sketch — one bounded extra pass, cutoff is a 1-row collect
    like bloom's bitset; None disables) → optional cross-corpus
    boilerplate filter (``max_cross_doc_dup_frac`` drops docs whose
    duplicate-5-gram coverage — the RefinedWeb dup-token signal,
    operators/dedup.duplicate_ngram_coverage — exceeds the cutoff;
    None disables) → PII-scrub → near-dup removal
    (LSH → exact-Jaccard verify → connected components) →
    context-window chunking → sequence packing → stable train/val/test
    split.

    Returns the intermediate DataFrames keyed by stage (and writes each
    stage as a table batch when ``output_dir`` is given), so callers can
    audit per-stage row drops — the shape of a production curation run.
    Input: any DataFrame with (doc_id long, text string).
    """
    from pyspark.sql import functions as F

    from .operators import dedup
    from .operators.chunking import chunk_documents, pack_sequences
    from .operators.textstats import quality_filter, repetition_stats, scrub_pii

    docs = docs.select("doc_id", "text").persist(StorageLevel.MEMORY_AND_DISK)

    quality = quality_filter(docs)
    kept = docs.join(quality.where(F.col("keep")).select("doc_id"), "doc_id")

    if max_dup_bigram_frac is not None:
        low_rep = repetition_stats(kept).where(
            F.col("dup_bigram_frac") <= max_dup_bigram_frac
        )
        kept = kept.join(low_rep.select("doc_id"), "doc_id")

    if max_length_quantile is not None:
        from .operators.quantiles import quantile_sketch, sketch_quantiles
        from .operators.textstats import token_count

        lens = kept.select(token_count(F.col("text")).alias("_n"))
        cut = sketch_quantiles(
            quantile_sketch(lens, "_n", k=256), [max_length_quantile], k=256
        ).collect()
        if cut and cut[0]["approx_value"] is not None:
            kept = kept.where(
                token_count(F.col("text")) <= cut[0]["approx_value"]
            )

    if max_cross_doc_dup_frac is not None:
        # anti-join against docs EXCEEDING the cutoff: coverage yields no
        # row for zero-token docs, so an inner join on the keep side would
        # silently drop them instead of passing them through as dup_frac=0
        over = dedup.duplicate_ngram_coverage(kept).where(
            F.col("dup_frac") > max_cross_doc_dup_frac
        )
        kept = kept.join(over.select("doc_id"), "doc_id", "left_anti")

    scrubbed = kept.select("doc_id", scrub_pii(F.col("text")).alias("text"))
    scrubbed = scrubbed.persist(StorageLevel.MEMORY_AND_DISK)

    cand = dedup.minhash_lsh_pairs(scrubbed)
    verified = dedup.ngram_jaccard_pairs(scrubbed, cand.select("id_a", "id_b")).where(
        F.col("jaccard") >= min_jaccard
    )
    clusters = dedup.dedup_clusters(verified)
    deduped = (
        scrubbed.join(clusters, scrubbed.doc_id == clusters.doc, "left")
        .where(F.col("cluster_id").isNull() | (F.col("cluster_id") == F.col("doc_id")))
        .select("doc_id", "text")
    )

    chunks = chunk_documents(deduped, chunk_tokens, overlap)
    packs = pack_sequences(deduped, budget_tokens)

    h = F.md5(F.col("doc_id").cast("string"))
    bucket = (F.ascii(F.substring(h, 1, 1)) * 256 + F.ascii(F.substring(h, 2, 1))) % 100
    split = deduped.select(
        "doc_id",
        F.when(bucket < 5, "val").when(bucket < 15, "test").otherwise("train").alias("split"),
    )

    stages = {
        "quality": quality,
        "deduped": deduped,
        "chunks": chunks,
        "packs": packs,
        "split": split,
    }
    if output_dir is not None:
        StagedWriter(output_dir).write_batch(stages)
    return stages
