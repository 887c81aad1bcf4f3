"""x3 trade evidence (VERDICT r10 #2): triples-only shuffle (current
minhash_lsh_pairs, sigs re-attached by id) vs the r9 sig-carrying shape
(signatures ride through the banded self-join), timed quiet with the
cache cleared between runs, plus per-variant shuffle read/write bytes
from the Spark UI REST API.

Usage: python tools/bench_x3_ab.py <sf_dir> <triples|sigcarry> [runs]

Run each variant in its OWN process (the UI byte counters are
app-global); compare the printed JSON lines.
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from shifts_etl_spark.operators import dedup
from shifts_etl_spark.operators.dedup import (
    _hash_family,
    _track_cache,
    minhash_signatures,
    release_orphaned_caches,
)
from shifts_etl_spark.sources.tables import load_table


def sigcarry_lsh_pairs(docs, num_hashes=64, bands=16, shingle_n=3,
                       max_bucket_size=500, hash_fn="md5"):
    """The round-9 shape, verbatim (commit 24d627a): signatures carried
    through both sides of the banded self-join and the pair dedup."""
    r = num_hashes // bands
    hf = _hash_family(hash_fn)
    with_sig = _track_cache(
        minhash_signatures(docs, "text", "doc_id", num_hashes, shingle_n, hash_fn),
        None,
    )
    band_hashes = F.array(
        *[hf(F.concat_ws(",", F.slice("sig", b * r + 1, r)), b) for b in range(bands)]
    )
    banded = with_sig.select(
        "doc", "sig", F.posexplode(band_hashes).alias("band", "band_hash")
    )
    hot = (
        banded.groupBy("band", "band_hash")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") > max_bucket_size)
        .select("band", "band_hash")
    )
    banded = banded.join(F.broadcast(hot), ["band", "band_hash"], "left_anti")
    left, right = banded.alias("l"), banded.alias("r")
    est = (
        F.size(
            F.filter(
                F.zip_with("l.sig", "r.sig", lambda x, y: (x == y).cast("int")),
                lambda v: v == 1,
            )
        )
        / F.lit(float(num_hashes))
    )
    return (
        left.join(right, ["band", "band_hash"])
        .where(F.col("l.doc") < F.col("r.doc"))
        .select(
            F.col("l.doc").alias("id_a"),
            F.col("r.doc").alias("id_b"),
            est.alias("est_jaccard"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )


def rest_stage_bytes(port: int) -> tuple[int, int, int]:
    """(max_stage_id, shuffle_write_bytes, shuffle_read_bytes) summed
    over all completed stages of the single running application."""
    base = f"http://localhost:{port}/api/v1"
    apps = json.load(urllib.request.urlopen(f"{base}/applications"))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{base}/applications/{app_id}/stages?status=complete")
    )
    w = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    r = sum(s.get("shuffleReadBytes", 0) for s in stages)
    mx = max((s["stageId"] for s in stages), default=-1)
    return mx, w, r


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    variant = sys.argv[2] if len(sys.argv) > 2 else "triples"
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    spark = (
        SparkSession.builder.master("local[32]")
        .appName(f"bench_x3_ab_{variant}")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4049")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    docs = load_table(spark, sf_dir, "documents")
    docs.count()  # warm the scan / JVM

    best, n = None, 0
    per_run = []
    for i in range(runs):
        release_orphaned_caches()
        spark.catalog.clearCache()
        pre_stage, pre_w, pre_r = rest_stage_bytes(4049)
        spark.sparkContext.setJobDescription(f"x3_ab:{variant}:run{i}")
        t0 = time.time()
        if variant == "triples":
            df = dedup.minhash_lsh_pairs(docs, hash_fn="md5")
        else:
            df = sigcarry_lsh_pairs(docs, hash_fn="md5")
        n = df.count()
        dt = time.time() - t0
        _, post_w, post_r = rest_stage_bytes(4049)
        per_run.append(
            {"sec": round(dt, 3),
             "shuffle_write_mb": round((post_w - pre_w) / 1e6, 2),
             "shuffle_read_mb": round((post_r - pre_r) / 1e6, 2)}
        )
        best = dt if best is None else min(best, dt)
    print(json.dumps({
        "variant": variant, "sf_dir": sf_dir, "rows": n,
        "best_sec": round(best, 3), "runs": per_run,
    }))


if __name__ == "__main__":
    main()
