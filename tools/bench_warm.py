"""Round-10-and-earlier bench methodology, kept for comparability
(OPTIMIZATION_r11.md "Bench methodology change"): identical to bench.py
except the Spark CacheManager is NOT cleared between the min-of-3 timed
runs, so operators that persist internal frames (x3) time a warm-cache
run on runs 2-3 — exactly what BENCH_r01..r10 measured. Prints the same
one-line JSON with metric name suffixed _warm_methodology.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from shifts_etl_spark.plans.catalog import BENCH_QUERIES, CATALOG
from shifts_etl_spark.session import get_spark
from shifts_etl_spark.sources.tables import load_table


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench_warm")
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        load_table(spark, sf_dir, t).count()
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        spec = CATALOG[name]
        best, n = None, 0
        for _ in range(3):
            df = spec.spark(spark, sf_dir)
            t0 = time.time()
            n = df.count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)
    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_sec_warm_methodology",
        "value": total, "unit": "sec", "queries": timings, "sf": float(sf),
    }))


if __name__ == "__main__":
    main()
