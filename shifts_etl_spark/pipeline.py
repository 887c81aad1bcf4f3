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
