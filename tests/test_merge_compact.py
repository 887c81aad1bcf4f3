"""MERGE/upsert, compaction, and streaming-vs-batch KPI equivalence."""

import json

import pytest

from pyspark.sql import Row, functions as F

from shifts_etl_spark.operators.merge import merge_into
from shifts_etl_spark.pipeline import run_etl
from shifts_etl_spark.sinks.staged import StagedWriter
from shifts_etl_spark.sources.generator import generate_shift_docs, paginate
from shifts_etl_spark.streaming.micro_batch import stream_etl


def test_merge_upsert_and_delete(spark, tmp_path):
    out = tmp_path / "t"
    run_etl(spark, pages=paginate(generate_shift_docs(days=10), 5), output_dir=out,
            anchor_date="2023-02-01")
    w = StagedWriter(out)
    before = {r.shift_id: r for r in w.read_table(spark, "shifts").collect()}
    ids = sorted(before)

    updates = spark.createDataFrame(
        [
            Row(**{**before[ids[0]].asDict(), "shift_cost": None, "_del": False}),
            Row(**{**before[ids[1]].asDict(), "_del": True}),
            Row(shift_id="NEW-1", shift_date=before[ids[0]].shift_date,
                shift_start=None, shift_finish=None, shift_cost=None, _del=False),
        ],
        w.read_table(spark, "shifts").schema.add("_del", "boolean"),
    )
    n = merge_into(spark, out, "shifts", updates, "shift_id", delete_col="_del")
    after = {r.shift_id: r for r in w.read_table(spark, "shifts").collect()}
    assert n == len(after) == 10  # 10 - 1 delete + 1 insert
    assert ids[1] not in after                      # deleted
    assert after[ids[0]].shift_cost is None         # updated
    assert "NEW-1" in after                         # inserted
    assert after[ids[2]] == before[ids[2]]          # untouched rows survive


def test_compaction(spark, tmp_path):
    out = tmp_path / "c"
    # 4 pages → 1 batch each? no: run_etl writes one batch per run; run twice
    run_etl(spark, pages=paginate(generate_shift_docs(days=4), 2), output_dir=out,
            anchor_date="2023-02-01")
    run_etl(spark, pages=paginate(generate_shift_docs(days=4, seed=7), 2),
            output_dir=out, anchor_date="2023-02-01")
    w = StagedWriter(out)
    n_before = w.read_table(spark, "breaks").count()
    removed = w.compact(spark, "breaks")
    assert removed >= 2
    assert len(list((w.root / "breaks").glob("batch=*"))) == 1
    assert w.read_table(spark, "breaks").count() == n_before


def test_streaming_kpis_equal_batch(spark, tmp_path):
    """The streaming pipeline with per-epoch KPI refresh converges to
    exactly the batch pipeline's KPI values on the same input."""
    docs = generate_shift_docs(days=16)

    batch_out = tmp_path / "batch"
    run_etl(spark, pages=paginate(docs, 8), output_dir=batch_out,
            anchor_date="2023-02-01")
    batch_kpis = {
        r.kpi_name: r.kpi_value
        for r in StagedWriter(batch_out).read_table(spark, "kpis").collect()
    }

    inp = tmp_path / "in"
    inp.mkdir()
    for i in range(0, 16, 4):
        with open(inp / f"p{i}.json", "w") as f:
            for d in docs[i : i + 4]:
                f.write(json.dumps(d) + "\n")
    stream_out = tmp_path / "stream"
    stream_etl(spark, inp, stream_out, tmp_path / "ck", available_now=True,
               refresh_kpis=True, anchor_date="2023-02-01")
    stream_kpis = {
        r.kpi_name: r.kpi_value
        for r in StagedWriter(stream_out).read_table(spark, "kpis").collect()
    }
    assert stream_kpis == batch_kpis


def test_time_travel_snapshots(spark, tmp_path):
    from pyspark.sql import Row

    w = StagedWriter(tmp_path / "tt")
    b1 = w.write_batch(
        {"kpis": spark.createDataFrame([Row(kpi_name="a", kpi_date="d", kpi_value=1.0)])}
    )
    b2 = w.write_batch(
        {"kpis": spark.createDataFrame([Row(kpi_name="b", kpi_date="d", kpi_value=2.0)])}
    )
    assert [c[0] for c in w.commits()] == [b1, b2]
    assert w.read_table(spark, "kpis", as_of=b1).count() == 1
    assert w.read_table(spark, "kpis", as_of=b2).count() == 2
    assert w.read_table(spark, "kpis").count() == 2
    with pytest.raises(ValueError, match="unknown commit"):
        w.read_table(spark, "kpis", as_of="nope")


def test_write_batch_idempotent_replay(spark, tmp_path):
    """A streaming epoch replayed after a crash must not double-write or
    wedge: (a) a batch_id already in _commits.log is a no-op; (b) an orphan
    batch dir from a crash BEFORE the log append is replaced, not ENOTEMPTY."""
    from pyspark.sql import Row

    w = StagedWriter(tmp_path / "idem")
    df = spark.createDataFrame([Row(kpi_name="a", kpi_date="d", kpi_value=1.0)])
    w.write_batch({"kpis": df}, batch_id="epoch000001")
    # (a) committed replay: no new rows, no new commit entry
    w.write_batch({"kpis": df}, batch_id="epoch000001")
    assert w.read_table(spark, "kpis").count() == 1
    assert [c[0] for c in w.commits()] == ["epoch000001"]
    # (b) orphan promotion without a log entry (simulated crash), then replay
    orphan = tmp_path / "idem" / "kpis" / "batch=epoch000002"
    orphan.mkdir(parents=True)
    (orphan / "leftover.parquet").write_text("partial")
    w.write_batch({"kpis": df}, batch_id="epoch000002")
    assert w.read_table(spark, "kpis").count() == 2
    assert not (orphan / "leftover.parquet").exists()


def test_time_travel_vacuumed_by_compaction(spark, tmp_path):
    from pyspark.sql import Row

    w = StagedWriter(tmp_path / "ttc")
    b1 = w.write_batch(
        {"kpis": spark.createDataFrame([Row(kpi_name="a", kpi_date="d", kpi_value=1.0)])}
    )
    w.write_batch(
        {"kpis": spark.createDataFrame([Row(kpi_name="b", kpi_date="d", kpi_value=2.0)])}
    )
    w.compact(spark, "kpis")
    assert w.read_table(spark, "kpis").count() == 2  # current state intact
    with pytest.raises(ValueError, match="vacuumed"):
        w.read_table(spark, "kpis", as_of=b1)


def test_scd2_from_changelog_collapses_runs(spark):
    from shifts_etl_spark.operators.merge import scd2_from_changelog

    log = spark.createDataFrame(
        [
            # key 1: A,A,B,A -> three intervals (A re-opens after B)
            (1, "2024-01-01", "A", 1),
            (1, "2024-01-05", "A", 2),
            (1, "2024-02-01", "B", 3),
            (1, "2024-03-01", "A", 4),
            # key 2: single state, always-open interval
            (2, "2024-01-10", "Z", 5),
        ],
        "k long, d string, s string, seq long",
    ).select("k", F.to_date("d").alias("d"), "s", "seq")
    got = sorted(
        scd2_from_changelog(log, "k", "d", "s", tiebreak_col="seq").collect(),
        key=lambda r: (r.k, r.valid_from),
    )
    rows = [(r.k, r.state, str(r.valid_from), str(r.valid_to), r.n_changes)
            for r in got]
    assert rows == [
        (1, "A", "2024-01-01", "2024-02-01", 2),
        (1, "B", "2024-02-01", "2024-03-01", 1),
        (1, "A", "2024-03-01", "None", 1),
        (2, "Z", "2024-01-10", "None", 1),
    ]


def test_incremental_aggregate_matches_full_recompute(spark):
    from shifts_etl_spark.operators.merge import (
        merge_partial_aggregates,
        partial_aggregate,
    )

    measures = {"v": "sum", "n": "count", "lo": "min", "hi": "max"}

    def batch(seed, n):
        return spark.range(n).select(
            (F.col("id") % 7).alias("k"),
            (F.col("id") * seed % 100).cast("double").alias("v"),
            F.lit(1).alias("n"),
            (F.col("id") * seed % 53).alias("lo"),
            (F.col("id") * seed % 53).alias("hi"),
        )

    batches = [batch(3, 40), batch(11, 25), batch(7, 60)]
    state = None
    for b in batches:
        state = merge_partial_aggregates(
            state, partial_aggregate(b, ["k"], measures), ["k"], measures
        )
    got = {r["k"]: (r["v"], r["n"], r["lo"], r["hi"]) for r in state.collect()}

    full = batches[0].unionByName(batches[1]).unionByName(batches[2])
    exp = {
        r["k"]: (r["v"], r["n"], r["lo"], r["hi"])
        for r in full.groupBy("k").agg(
            F.sum("v").alias("v"), F.count("n").alias("n"),
            F.min("lo").alias("lo"), F.max("hi").alias("hi"),
        ).collect()
    }
    assert got == exp
    # avg is derivable from the (sum, count) pair without a base rescan
    assert all(n > 0 for (_, n, _, _) in got.values())


def test_snapshot_diff_between_commits(spark, tmp_path):
    """Inserts appear as _op=insert in forward diff; reversing the
    snapshot order flips them to deletes; identical snapshots diff
    empty; duplicate rows diff by multiset count."""
    from shifts_etl_spark.sinks.staged import snapshot_diff

    w = StagedWriter(tmp_path / "sd")
    b1 = w.write_batch(
        {"kpis": spark.createDataFrame(
            [Row(kpi_name="a", kpi_date="d", kpi_value=1.0),
             Row(kpi_name="a", kpi_date="d", kpi_value=1.0)]  # dup on purpose
        )}
    )
    b2 = w.write_batch(
        {"kpis": spark.createDataFrame(
            [Row(kpi_name="b", kpi_date="d", kpi_value=2.0)]
        )}
    )
    fwd = snapshot_diff(spark, w, "kpis", b1, b2).collect()
    assert [(r.kpi_name, r._op) for r in fwd] == [("b", "insert")]
    rev = snapshot_diff(spark, w, "kpis", b2, b1).collect()
    assert [(r.kpi_name, r._op) for r in rev] == [("b", "delete")]
    assert snapshot_diff(spark, w, "kpis", b1, b1).count() == 0
    # multiset: the duplicate 'a' row is not cancelled by a single copy
    fwd_all = snapshot_diff(spark, w, "kpis", b2, b2).count()
    assert fwd_all == 0
