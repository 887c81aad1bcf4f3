"""End-to-end pipeline semantics: pagination equivalence, rollback
atomicity, clear — the engine analogs of the reference's test suite
(reference etl/tests/test_shift_data_processor.py:127-300)."""

import copy

import pytest

from shifts_etl_spark.operators.quality import IntegrityError
from shifts_etl_spark.pipeline import clear_data, run_etl
from shifts_etl_spark.sinks.staged import StagedWriter
from shifts_etl_spark.sources.generator import generate_shift_docs, paginate
from shifts_etl_spark.sources.pages import docs_from_pages, iter_http_pages

from .golden import GOLDEN_DOCS


def test_pagination_equivalence(spark, tmp_path):
    """2-page split produces identical outputs to a single page."""
    docs = generate_shift_docs(days=20)
    one = docs_from_pages(spark, paginate(docs, limit=30))
    two = docs_from_pages(spark, paginate(docs, limit=7))
    assert one.count() == two.count() == 20
    assert one.exceptAll(two).count() == 0


def test_run_etl_counts_golden(spark, tmp_path):
    out = tmp_path / "out"
    counts = run_etl(
        spark,
        pages=paginate(GOLDEN_DOCS, limit=1),
        output_dir=out,
        anchor_date="2024-01-15",
    )
    assert counts == {
        "shifts": 2,
        "breaks": 2,
        "allowances": 3,
        "award_interpretations": 2,
        "kpis": 6,
    }


def test_rollback_on_duplicate_pk(spark, tmp_path):
    """Reference rollback test analog: duplicate break_id across two shifts
    → IntegrityError and ZERO rows persisted in any table."""
    docs = copy.deepcopy(GOLDEN_DOCS)
    docs[1]["breaks"][0]["id"] = docs[0]["breaks"][0]["id"]
    out = tmp_path / "out"
    with pytest.raises(IntegrityError):
        run_etl(spark, pages=paginate(docs, limit=10), output_dir=out)
    w = StagedWriter(out)
    for t in ["shifts", "breaks", "allowances", "award_interpretations"]:
        assert not w.table_exists(t), f"{t} partially persisted"


def test_rollback_on_orphan_fk(spark, tmp_path):
    docs = copy.deepcopy(GOLDEN_DOCS)
    # simulate an orphan by post-processing: a break pointing nowhere can't
    # arise from nested input, so check the validator directly instead
    from shifts_etl_spark.operators import flatten, quality
    from shifts_etl_spark.schemas import SHIFT_DOC_SCHEMA

    d = spark.createDataFrame(docs, SHIFT_DOC_SCHEMA)
    tables = flatten.flatten_all(d)
    breaks_bad = tables["breaks"].withColumn(
        "shift_id", tables["breaks"].shift_id.substr(1, 5)
    )
    with pytest.raises(quality.IntegrityError):
        quality.check_foreign_key(breaks_bad, "shift_id", tables["shifts"], "breaks")


def test_clear_data(spark, tmp_path):
    out = tmp_path / "out"
    run_etl(spark, pages=paginate(GOLDEN_DOCS, 5), output_dir=out, anchor_date="2024-01-15")
    clear_data(out)
    w = StagedWriter(out)
    assert not any(w.table_exists(t) for t in ["shifts", "breaks", "kpis"])


def test_http_pagination_iterator(spark):
    """links.next following with an injected fetch (mock-HTTP analog)."""
    pages = paginate(generate_shift_docs(days=10), limit=4, base="http://x/api/shifts")
    by_url = {"http://x/api/shifts": pages[0]}
    for p in pages:
        nxt = p["links"].get("next")
        if nxt:
            from urllib.parse import urljoin

            by_url[urljoin("http://x/api/shifts", nxt)] = pages[
                (p["start"] + p["limit"]) // p["limit"]
            ]
    seen = list(iter_http_pages("http://x/api/shifts", fetch=by_url.get))
    assert sum(len(p["results"]) for p in seen) == 10


def test_fetch_failure_raises(spark):
    with pytest.raises(ValueError, match="Failed to fetch"):
        list(iter_http_pages("http://x/api/shifts", fetch=lambda u: None))


def test_cli_end_to_end(spark, tmp_path, capsys):
    """Drive the CLI entry points in-process (reuses the test session)."""
    from shifts_etl_spark.__main__ import main

    out = str(tmp_path / "cli")
    assert main(["run-etl", "--days", "5", "--batch-size", "3",
                 "--output", out, "--anchor-date", "2023-02-01"]) == 0
    assert "ETL job completed successfully" in capsys.readouterr().out
    assert main(["show-kpis", "--output", out]) == 0
    assert "mean_shift_cost" in capsys.readouterr().out
    assert main(["clear-data", "--output", out]) == 0
    assert main(["run-etl", "--batch-size", "31"]) == 2


def test_cli_curate_smoke(spark, tmp_path, capsys):
    """CLI smoke for the composed curation pipeline (VERDICT r6 #7): the
    one surface whose correctness otherwise rests on pytest alone. Runs
    `python -m shifts_etl_spark curate` in-process on the sf0.001
    documents table and checks the printed ledger plus the atomically
    persisted curated + ledger tables."""
    from shifts_etl_spark.__main__ import main
    from shifts_etl_spark.sinks.staged import StagedWriter

    out = str(tmp_path / "curated")
    assert main([
        "curate", "--input", "/root/testdata/sf0.001/documents.parquet",
        "--output", out, "--budget-docs", "100",
    ]) == 0
    printed = capsys.readouterr().out
    for stage in ("ingest", "exact_dedup", "mixture_draw", "split"):
        assert stage in printed
    w = StagedWriter(out)
    curated = w.read_table(spark, "curated")
    assert curated.count() == 100
    assert set(curated.columns) == {"doc_id", "source", "text", "split"}
    ledger = {r.stage: r for r in w.read_table(spark, "curation_ledger").collect()}
    assert ledger["ingest"].n_docs == 500
    assert ledger["split"].n_docs == 100


def test_cli_prepare_smoke(spark, tmp_path, capsys):
    """CLI smoke for the training-shard pipeline: `python -m
    shifts_etl_spark prepare` on the sf0.001 documents table — printed
    stage counts plus the five persisted stage tables. The quality-gate
    count is deterministic (446 at sf0.001, pinned by the x237 oracle);
    dedup runs the xxhash64 default here, so downstream counts are
    bounded rather than pinned (the md5-family configuration is
    value-checked by x237)."""
    from shifts_etl_spark.__main__ import main
    from shifts_etl_spark.sinks.staged import StagedWriter

    out = str(tmp_path / "prepared")
    assert main([
        "prepare", "--input", "/root/testdata/sf0.001/documents.parquet",
        "--output", out,
    ]) == 0
    printed = capsys.readouterr().out
    assert "'quality_keep': 446" in printed
    w = StagedWriter(out)
    deduped = w.read_table(spark, "deduped")
    n_dedup = deduped.count()
    assert 0 < n_dedup <= 446
    assert w.read_table(spark, "chunks").count() >= n_dedup
    assert w.read_table(spark, "split").count() == n_dedup
    assert set(deduped.columns) == {"doc_id", "text"}


def test_run_etl_over_real_http(spark, tmp_path):
    """Full E1 over an actual HTTP boundary: threaded stdlib server serving
    the reference's page envelope, urllib-based page iterator, full
    pipeline, golden counts."""
    from shifts_etl_spark.sources.generator import generate_shift_docs
    from shifts_etl_spark.sources.http_service import ShiftsApiServer

    docs = generate_shift_docs(days=15)
    server = ShiftsApiServer(docs, default_limit=4)
    url = server.start()
    try:
        counts = run_etl(
            spark,
            api_url=f"{url}?limit=4",
            output_dir=tmp_path / "http_out",
            anchor_date="2023-02-01",
        )
        assert counts["shifts"] == 15
        assert counts["breaks"] == sum(len(d["breaks"]) for d in docs)
        assert counts["kpis"] == 6
    finally:
        server.stop()


def test_distributed_fetch_df(spark):
    """Executor-side page fetch: URLs distributed, bodies parsed on
    executors with the fixed schema."""
    from shifts_etl_spark.sources.pages import distributed_fetch_df

    docs = generate_shift_docs(days=9)
    pages = paginate(docs, limit=3, base="http://x/api/shifts")
    by_url = {f"http://x/api/shifts?p={i}": p for i, p in enumerate(pages)}
    df = distributed_fetch_df(spark, list(by_url), fetch=by_url.get)
    assert df.count() == 9
    assert {r.id for r in df.select("id").collect()} == {d["id"] for d in docs}


def test_distributed_fetch_df_key_order_independent(spark):
    """Pages whose JSON key order differs from the schema must still land in
    the right columns (rows are bound positionally by createDataFrame, so
    the fetch path emits schema-ordered tuples, never insertion-order
    Rows)."""
    from shifts_etl_spark.sources.pages import distributed_fetch_df

    docs = generate_shift_docs(days=3)
    reversed_docs = [dict(reversed(list(d.items()))) for d in docs]
    pages = paginate(reversed_docs, limit=3, base="http://x/api/shifts")
    by_url = {f"http://x/api/shifts?p={i}": p for i, p in enumerate(pages)}
    df = distributed_fetch_df(spark, list(by_url), fetch=by_url.get)
    # start/finish are same-typed adjacent fields — the silent-swap case
    got = {r.id: (r.start, r.finish) for r in df.select("id", "start", "finish").collect()}
    assert got == {d["id"]: (d["start"], d["finish"]) for d in docs}


def test_custom_datasource_reads_api(spark):
    """spark.read.format("shifts_api") — partition-per-page custom
    DataSource over the live stdlib HTTP service."""
    from shifts_etl_spark.sources.api_source import register
    from shifts_etl_spark.sources.generator import generate_shift_docs
    from shifts_etl_spark.sources.http_service import ShiftsApiServer

    docs = generate_shift_docs(days=20)
    server = ShiftsApiServer(docs)
    base = server.start()
    try:
        register(spark)
        df = (
            spark.read.format("shifts_api")
            .option("base_url", base)
            .option("page_size", 7)
            .load()
        )
        assert df.rdd.getNumPartitions() == 3  # ceil(20/7) pages
        got = df.collect()
        assert len(got) == 20
        assert {r["id"] for r in got} == {d["id"] for d in docs}
        n_breaks = sum(len(r["breaks"]) for r in got)
        assert n_breaks == sum(len(d["breaks"]) for d in docs)
    finally:
        server.stop()
