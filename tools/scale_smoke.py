"""Scale-up smoke: materialize an N× copy of the sf0.1 testdata in /tmp
(key-shifted unions so join/group cardinalities scale realistically), run a
subset of headline queries at 1× and N×, and report the time ratio.

A linear-time operator at 10× data on fixed cores should land near 10×
wall-clock (amortized overheads usually pull it below); superlinear ratios
flag an operator that would not survive the 100 TB scale-up.

Usage: python tools/scale_smoke.py [factor] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from shifts_etl_spark.plans.catalog import CATALOG
from shifts_etl_spark.session import get_spark
from shifts_etl_spark.sources.tables import load_table

BASE = "/root/testdata/sf0.1"
KEYED = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "region": [],
    "nation": [],
}
OFFSET = 10_000_000
DEFAULT_QUERIES = [
    "a6_pricing_summary",
    "j1_inner_broadcast",
    "w4_scalable_prefix_sum",
    "x1_dedup_exact",
    "x3_dedup_minhash_lsh",
    "x9_text_stats",
    "x17_vocabulary",
]


def materialize(spark, factor: int, out_dir: Path) -> None:
    for name, keys in KEYED.items():
        src = load_table(spark, BASE, name)
        if keys:
            parts = []
            for i in range(factor):
                p = src
                for k in keys:
                    p = p.withColumn(k, F.col(k) + F.lit(i * OFFSET))
                parts.append(p)
            df = parts[0]
            for p in parts[1:]:
                df = df.unionByName(p)
        else:
            df = src
        df.write.mode("overwrite").parquet(str(out_dir / f"{name}.parquet"))


def time_query(spark, name: str, sf_dir: str) -> float:
    # timer covers the build too: for lazy entries that's millis of plan
    # construction, but eager entries (x231's curate ledger runs its
    # Spark actions while building) do their real work there.
    # Materialize through the noop sink, not count(): count() lets
    # Catalyst prune projection columns and eliminate unique-key outer
    # joins, so projection-shaped entries (x228's scrub rewrite) would
    # time an empty plan.
    t0 = time.time()
    df = CATALOG[name].spark(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    args = sys.argv[1:]
    factor = int(args[0]) if args and args[0].isdigit() else 10
    queries = [a for a in args if not a.isdigit()] or DEFAULT_QUERIES

    out_dir = Path(f"/tmp/scale_smoke_x{factor}")
    spark = get_spark(app_name="scale_smoke")
    if not (out_dir / "lineitem.parquet").exists():
        print(f"materializing {factor}x dataset at {out_dir} ...", file=sys.stderr)
        materialize(spark, factor, out_dir)

    print(f"{'query':28s} {'1x_sec':>8s} {f'{factor}x_sec':>8s} {'ratio':>6s}")
    for name in queries:
        t1 = time_query(spark, name, BASE)
        tn = time_query(spark, name, str(out_dir))
        print(f"{name:28s} {t1:8.2f} {tn:8.2f} {tn / max(t1, 1e-9):6.1f}")


if __name__ == "__main__":
    main()
