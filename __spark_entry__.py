"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``shifts_etl_spark`` (see SURVEY.md §2 inventory →
shifts_etl_spark/plans/relational.py and plans/extensions.py; each QuerySpec
pairs a DataFrame program with its ANSI-SQL oracle twin, aliases matched).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from shifts_etl_spark.plans.catalog import CATALOG  # noqa: E402


def _utc(spark: SparkSession) -> SparkSession:
    # engine semantics are defined in UTC (SURVEY.md §7.4 #1)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's 6-KPI
    union shape (scalar aggregates + join-filter + gaps-and-islands top-1)
    recast over the testdata tables."""
    return CATALOG["q8_kpi_union"].spark(_utc(spark), "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 plus the
    north-star extension ops (x1-x31: dedup, similarity search, text
    analysis, multimodal, sketches, clustering, join pruning)."""

    def wrap(spec):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return spec.spark(_utc(spark), sf_dir)

        run.__name__ = spec.name
        return run

    return {name: wrap(spec) for name, spec in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checkable query.
    Omitted (rows-only check) for hash/sketch/iterative ops whose
    estimator or hash family is engine-specific: x3 minhash, x4 simhash,
    x8 LSH ANN, x13 IVF, x15 approx-agg, x25 dedup pipeline, x30 kmeans,
    x31 HLL sketches."""
    return {
        name: spec.oracle for name, spec in CATALOG.items() if spec.oracle
    }
