"""Round-11 measurement harness (guide §1): isolate each query with the
noop sink, capture .explain("formatted"), and count plan features
(Exchange / join strategy / Python eval nodes).

Usage:
    python tools/measure_r11.py before [query ...]   # plans/r11/<q>_before.txt
    python tools/measure_r11.py after  [query ...]   # plans/r11/<q>_after.txt

Default query set = BENCH_QUERIES. Prints one line per query:
name, noop best-of-3 sec, count best-of-3 sec (cache-honest: the Spark
cache is cleared between timed runs so internally-persisted frames are
rebuilt — VERDICT r10 #7), count best-of-3 with the CacheManager left
warm (the r10-and-earlier methodology, kept for comparability),
Exchange count, joins, python nodes.
"""

from __future__ import annotations

import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from shifts_etl_spark.plans.catalog import BENCH_QUERIES, CATALOG
from shifts_etl_spark.session import get_spark
from shifts_etl_spark.sources.tables import load_table


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or list(BENCH_QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = Path(__file__).resolve().parent.parent / "plans" / "r11"
    out_dir.mkdir(parents=True, exist_ok=True)

    spark = get_spark(app_name=f"measure_r11_{tag}")
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        load_table(spark, sf_dir, t).count()

    results = []
    for name in names:
        spec = CATALOG[name]
        df = spec.spark(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{tag}.txt").write_text(plan)

        n_exchange = len(re.findall(r"\bExchange\b", plan))
        joins = sorted(set(re.findall(
            r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
            r"BroadcastNestedLoopJoin|CartesianProduct)", plan)))
        py = sorted(set(re.findall(
            r"(BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|"
            r"FlatMapGroupsInPandas)", plan)))

        spark.sparkContext.setJobDescription(f"{tag}:{name}:noop")
        best_noop = None
        for _ in range(3):
            spark.catalog.clearCache()
            d = spec.spark(spark, sf_dir)
            t0 = time.time()
            d.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best_noop = dt if best_noop is None else min(best_noop, dt)

        spark.sparkContext.setJobDescription(f"{tag}:{name}:count")
        best_cnt = None
        for _ in range(3):
            spark.catalog.clearCache()
            d = spec.spark(spark, sf_dir)
            t0 = time.time()
            d.count()
            dt = time.time() - t0
            best_cnt = dt if best_cnt is None else min(best_cnt, dt)

        # r10-and-earlier methodology: CacheManager left warm across the
        # min-of-3, so internally-persisted frames are reused on runs 2-3.
        spark.sparkContext.setJobDescription(f"{tag}:{name}:count_warm")
        best_warm = None
        for _ in range(3):
            d = spec.spark(spark, sf_dir)
            t0 = time.time()
            d.count()
            dt = time.time() - t0
            best_warm = dt if best_warm is None else min(best_warm, dt)
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)

        line = (f"{name}: noop={best_noop:.3f}s count={best_cnt:.3f}s "
                f"count_warm={best_warm:.3f}s "
                f"exchanges={n_exchange} joins={','.join(joins) or '-'} "
                f"python={','.join(py) or '-'}")
        print(line, flush=True)
        results.append(line)

    (out_dir / f"summary_{tag}.txt").write_text("\n".join(results) + "\n")


if __name__ == "__main__":
    main()
