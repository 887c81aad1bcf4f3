"""x3 shape laboratory (r11): honest (cache-cleared) timings of candidate
minhash_lsh_pairs shapes at a given SF, one shape per process.

Shapes:
  v2_triples    — library shape (single cache, banded self-join, sa/sb est)
  v3_bucket     — no self-join: collect_list(doc) per bucket, row-local
                  pair expansion, est via sa/sb joins on the sig cache
  v4_bucketsig  — no joins, no cache: collect_list(struct(doc,sig)),
                  est inline during pair expansion

Usage: python tools/x3_shape_lab.py <shape> [sf_dir] [runs]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from shifts_etl_spark.operators import dedup
from shifts_etl_spark.operators.dedup import (
    _hash_family,
    _track_cache,
    minhash_signatures,
    release_orphaned_caches,
)
from shifts_etl_spark.session import get_spark
from shifts_etl_spark.sources.tables import load_table

NUM_HASHES, BANDS, CAP = 64, 16, 500


def _banded(with_sig, hash_fn):
    r = NUM_HASHES // BANDS
    hf = _hash_family(hash_fn)
    bh = F.array(*[hf(F.concat_ws(",", F.slice("sig", b * r + 1, r)), b)
                   for b in range(BANDS)])
    return bh


def v3_bucket(docs, hash_fn="md5"):
    with_sig = _track_cache(minhash_signatures(docs, hash_fn=hash_fn), None)
    bh = _banded(with_sig, hash_fn)
    banded = with_sig.select("doc", F.posexplode(bh).alias("band", "band_hash"))
    hot = (banded.groupBy("band", "band_hash").agg(F.count(F.lit(1)).alias("_n"))
           .where(F.col("_n") > CAP).select("band", "band_hash"))
    cool = banded.join(F.broadcast(hot), ["band", "band_hash"], "left_anti")
    buckets = cool.groupBy("band", "band_hash").agg(
        F.array_sort(F.collect_list("doc")).alias("ds"))
    n = F.size("ds")
    pairs = (buckets.where(n >= 2)
             .select(F.explode(F.flatten(F.transform(
                 F.sequence(F.lit(1), n - 1),
                 lambda i: F.transform(
                     F.slice("ds", i + 1, n - i),
                     lambda b: F.struct(F.col("ds")[i - 1].alias("id_a"),
                                        b.alias("id_b")))))).alias("p"))
             .select("p.id_a", "p.id_b")
             .dropDuplicates(["id_a", "id_b"]))
    sa = with_sig.select(F.col("doc").alias("id_a"), F.col("sig").alias("_sa"))
    sb = with_sig.select(F.col("doc").alias("id_b"), F.col("sig").alias("_sb"))
    est = (F.size(F.filter(F.zip_with("_sa", "_sb", lambda x, y: (x == y).cast("int")),
                           lambda v: v == 1)) / F.lit(float(NUM_HASHES)))
    return (pairs.join(sa, "id_a").join(sb, "id_b")
            .select("id_a", "id_b", est.alias("est_jaccard")))


def v4_bucketsig(docs, hash_fn="md5"):
    with_sig = minhash_signatures(docs, hash_fn=hash_fn)  # NO cache
    bh = _banded(with_sig, hash_fn)
    banded = with_sig.select("doc", "sig", F.posexplode(bh).alias("band", "band_hash"))
    hot = (banded.groupBy("band", "band_hash").agg(F.count(F.lit(1)).alias("_n"))
           .where(F.col("_n") > CAP).select("band", "band_hash"))
    cool = banded.join(F.broadcast(hot), ["band", "band_hash"], "left_anti")
    buckets = cool.groupBy("band", "band_hash").agg(
        F.array_sort(F.collect_list(F.struct("doc", "sig"))).alias("ds"))
    n = F.size("ds")
    est_of = lambda a, b: (F.size(F.filter(
        F.zip_with(a["sig"], b["sig"], lambda x, y: (x == y).cast("int")),
        lambda v: v == 1)) / F.lit(float(NUM_HASHES)))
    pairs = (buckets.where(n >= 2)
             .select(F.explode(F.flatten(F.transform(
                 F.sequence(F.lit(1), n - 1),
                 lambda i: F.transform(
                     F.slice("ds", i + 1, n - i),
                     lambda b: F.struct(
                         F.col("ds")[i - 1]["doc"].alias("id_a"),
                         b["doc"].alias("id_b"),
                         est_of(F.col("ds")[i - 1], b).alias("est_jaccard"),
                     ))))).alias("p"))
             .select("p.id_a", "p.id_b", "p.est_jaccard")
             .dropDuplicates(["id_a", "id_b"]))
    return pairs


SHAPES = {
    "v2_triples": lambda docs: dedup.minhash_lsh_pairs(docs, hash_fn="md5"),
    "v3_bucket": v3_bucket,
    "v4_bucketsig": v4_bucketsig,
}


def main() -> None:
    shape = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    fn = SHAPES[shape]
    spark = get_spark(app_name=f"x3lab_{shape}")
    docs = load_table(spark, sf_dir, "documents")
    docs.count()
    fn(docs).count()  # JIT/codegen warm
    best = None
    for i in range(runs):
        release_orphaned_caches()
        spark.catalog.clearCache()
        t0 = time.time()
        n = fn(docs).count()
        dt = time.time() - t0
        print(f"{shape} run{i}: {dt:.3f}s rows={n}", flush=True)
        best = dt if best is None or dt < best else best
    print(f"{shape} best={best:.3f}")


if __name__ == "__main__":
    main()
