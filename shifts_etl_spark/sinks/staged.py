"""Atomic multi-table sink (K1/K2/K4 — SURVEY.md §2.2).

The reference loads 4 tables inside one Postgres transaction per page and
rolls all of them back on any failure (reference
etl/app/shift_data_processor.py:154-183). Vanilla Spark file sinks have no
cross-table transaction, so atomicity is re-created with staging + promote:

  1. every table of a batch is written under  <root>/_staging/<epoch>/<table>
  2. only after ALL writes succeed is each table promoted (atomic directory
     rename) into <root>/<table>/batch=<epoch>
  3. any failure ⇒ the staging dir is deleted; readers never see partial data

Readers always go through ``read_table`` which scans <root>/<table>/batch=*.
On a real cluster the same protocol holds on HDFS (rename is atomic per
directory); on S3 you would swap this class for a Delta/Iceberg commit —
the interface is deliberately that of a transactional table format.

K4 (clear) maps to deleting all table dirs — the FK-cascade analog is that we
always clear parent and children together.
"""

from __future__ import annotations

import shutil
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class StagedWriter:
    def __init__(self, root: str | Path):
        self.root = Path(root)

    def write_batch(self, tables: dict[str, DataFrame], batch_id: str | None = None) -> str:
        """All-or-nothing write of several tables (one reference 'page')."""
        batch_id = batch_id or uuid.uuid4().hex[:12]
        staging = self.root / "_staging" / batch_id
        try:
            for name, df in tables.items():
                df.write.mode("overwrite").parquet(str(staging / name))
            for name in tables:
                dest = self.root / name / f"batch={batch_id}"
                dest.parent.mkdir(parents=True, exist_ok=True)
                (staging / name).rename(dest)
        except BaseException:
            shutil.rmtree(staging, ignore_errors=True)
            raise
        finally:
            shutil.rmtree(self.root / "_staging" / batch_id, ignore_errors=True)
        return batch_id

    def read_table(self, spark: SparkSession, name: str) -> DataFrame:
        # enumerate concrete batch dirs (globs make Spark's scan log spurious
        # FileNotFoundExceptions); empty table → empty DF with declared schema
        batches = sorted(str(p) for p in (self.root / name).glob("batch=*"))
        if not batches:
            from ..schemas import TABLE_SCHEMAS

            return spark.createDataFrame([], TABLE_SCHEMAS[name])
        return spark.read.parquet(*batches)

    def table_exists(self, name: str) -> bool:
        d = self.root / name
        return d.exists() and any(d.glob("batch=*"))

    def compact(self, spark: SparkSession, name: str, target_partitions: int = 1) -> int:
        """Small-file management: rewrite all batch dirs of a table into one
        compacted batch (atomic: the compacted batch is staged and promoted
        before the source batches are removed). Returns batches removed.
        At scale this is the nightly OPTIMIZE pass — per-epoch micro-batches
        otherwise accumulate one file set per commit forever."""
        old = sorted((self.root / name).glob("batch=*"))
        if len(old) <= 1:
            return 0
        df = self.read_table(spark, name).coalesce(target_partitions)
        # materialize under staging first; promote, then drop the originals
        batch_id = f"compact-{uuid.uuid4().hex[:8]}"
        self.write_batch({name: df}, batch_id=batch_id)
        for d in old:
            shutil.rmtree(d, ignore_errors=True)
        return len(old)


def clear_outputs(root: str | Path, tables: list[str] | None = None) -> None:
    """K4 — cascade-delete analog: wipe every output table together."""
    root = Path(root)
    if tables is None:
        targets = [p for p in root.iterdir()] if root.exists() else []
    else:
        targets = [root / t for t in tables]
    for t in targets:
        shutil.rmtree(t, ignore_errors=True)
