"""Unified query catalog — the single source for the driver contract
(__spark_entry__.queries() / oracle_sql()) and for bench.py's headline set.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from .extensions import EXTENSIONS
from .relational import RELATIONAL


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI/DuckDB SQL twin; None → rows-only check


CATALOG: dict[str, QuerySpec] = {
    name: QuerySpec(name, fn, sql)
    for name, (fn, sql) in {**RELATIONAL, **EXTENSIONS}.items()
}

# headline queries bench.py times at sf0.1 (heaviest / most representative)
BENCH_QUERIES = [
    "a6_pricing_summary",
    "j1_inner_broadcast",
    "j6_range_join",
    "w2_gaps_islands",
    "w7_session_window",
    "q8_kpi_union",
    "x1_dedup_exact",
    "x3_dedup_minhash_lsh",
    "x7_sim_topk_bruteforce",
    "x9_text_stats",
]
