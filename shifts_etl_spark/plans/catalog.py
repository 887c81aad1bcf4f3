"""Unified query catalog — the single source for the driver contract
(__spark_entry__.queries() / oracle_sql()) and for bench.py's headline set.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from .extensions import EXTENSIONS
from .relational import RELATIONAL
from .tpch import TPCH


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI/DuckDB SQL twin; None → rows-only check


# Names that already hold a green driver-correctness row from round 1
# (CORRECTNESS_r01.json). The driver's harness consumes CATALOG in iteration
# order and only reaches the first ~50 entries per round, so queries WITHOUT a
# driver row yet must iterate first; the already-verified set goes last.
_DRIVER_VERIFIED_R01 = frozenset(
    {
        "s5_scan_pushdown", "t1_explode_tokens", "t2_rename_projection",
        "t3_array_fold_sum", "t5_epoch_seconds", "f1_predicates",
        "f2_date_range", "j1_inner_broadcast", "j2_left_join", "j3_semi_join",
        "j4_anti_join", "j5_cross_join", "j6_range_join", "j7_asof_join",
        "j8_full_outer", "t6_explode_outer", "a1_global_aggregates",
        "a6_pricing_summary", "a7_distinct_agg", "a8_rollup", "a9_cube",
        "a10_grouping_sets", "a11_percentiles", "w1_running_sum",
        "w2_gaps_islands", "w3_rank_lag", "w4_scalable_prefix_sum",
        "w5_tumbling_window", "w6_sliding_window", "w7_session_window",
        "w8_ntile_first_last", "q1_scalar_subquery", "q2_topk",
        "q3_set_intersect", "q4_set_except", "q5_union_distinct",
        "q6_scalar_functions", "q7_json_extract", "q8_kpi_union",
        "q9_correlated_subquery", "q10_in_subquery", "q11_pivot",
        "q12_offset_limit", "q13_decimal_exact", "q14_string_functions",
        "q15_math_functions", "q16_date_spine", "q17_shipping_priority",
        "q18_local_supplier_volume", "q19_event_funnel",
    }
)

_MERGED = {**RELATIONAL, **TPCH, **EXTENSIONS}

# Round-1 verdict names an explicit done-criterion for round 2: driver
# correctness rows for ALL of x1-x32, q20-q25, w9. That set outranks the
# queries added after the verdict (q26+, x33+), which in turn outrank the
# 50 already-driver-verified names.
def _asked(name: str) -> bool:
    stem = name.split("_", 1)[0]
    if stem == "w9":
        return True
    if stem.startswith("q") and stem[1:].isdigit():
        return 20 <= int(stem[1:]) <= 25
    if stem.startswith("x") and stem[1:].isdigit():
        return 1 <= int(stem[1:]) <= 32
    return False


# Within each block, oracle-backed queries first (a driver row there is a
# full rows+schema+hash check), rows-only ones last.
CATALOG: dict[str, QuerySpec] = {
    name: QuerySpec(name, *_MERGED[name])
    for name in sorted(
        _MERGED,
        key=lambda n: (
            n in _DRIVER_VERIFIED_R01,
            not _asked(n),
            _MERGED[n][1] is None,
        ),
    )
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
