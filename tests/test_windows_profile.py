"""Windows operators, scalable prefix sum equivalence, table profile, IVF
recall, approx-aggregate error bounds, multimodal plumbing."""

import pytest
from pyspark.sql import Row, Window, functions as F

from shifts_etl_spark.operators import multimodal, simsearch
from shifts_etl_spark.operators.profile import profile_table
from shifts_etl_spark.operators.windows import scalable_running_sum
from shifts_etl_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_scalable_prefix_sum_matches_global_window(spark):
    ev = load_table(spark, SF, "events").select("event_id", "value")
    two_pass = {
        r.event_id: r.rs
        for r in scalable_running_sum(ev, "event_id", "value", "rs").collect()
    }
    w = Window.orderBy("event_id").rowsBetween(Window.unboundedPreceding, 0)
    single = {
        r.event_id: r.rs
        for r in ev.select("event_id", F.sum("value").over(w).alias("rs")).collect()
    }
    assert set(two_pass) == set(single)
    for k in single:
        assert two_pass[k] == pytest.approx(single[k], rel=1e-9)


def test_scalable_prefix_sum_partition_count(spark):
    """The point of the two-pass form: no single-partition stage."""
    ev = load_table(spark, SF, "events").select("event_id", "value")
    # AQE legitimately coalesces this tiny dataset to one partition; disable
    # coalescing to observe the range-partitioned execution shape itself
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        out = scalable_running_sum(ev, "event_id", "value", "rs", num_partitions=8)
        assert out.rdd.getNumPartitions() > 1
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    # and the result is still the exact global prefix sum
    w = Window.orderBy("event_id").rowsBetween(Window.unboundedPreceding, 0)
    single = {
        r.event_id: r.rs
        for r in ev.select("event_id", F.sum("value").over(w).alias("rs")).collect()
    }
    for r in out.collect():
        assert r.rs == pytest.approx(single[r.event_id], rel=1e-9)


def test_scalable_prefix_sum_derived_order_column(spark):
    """Regression for the Spark 4.1.2 Catalyst bug (VERDICT r2 #3): a
    DERIVED order column (xxhash64 of the key) under the default
    32-partition session used to raise INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND
    ("Could not find _h in [_pid, _total, _we0]") from the window-over-
    totals offset plan. The driver-folded offsets path must (a) not raise
    and (b) still produce the exact prefix sum in hash order."""
    ev = (
        load_table(spark, SF, "events")
        .select("event_id", "value")
        .withColumn("_h", F.xxhash64("event_id"))
    )
    out = {
        r._h: r.rs
        for r in scalable_running_sum(ev, "_h", "value", "rs").collect()
    }
    rows = sorted(
        (r._h, r.value) for r in ev.select("_h", "value").collect()
    )
    acc = 0.0
    for h, v in rows:
        acc += v
        assert out[h] == pytest.approx(acc, rel=1e-9)


def test_scalable_prefix_sum_bigint_sums_exact(spark):
    """Integral value columns must fold at bigint precision on the driver
    (a double carrier would truncate past 2^53)."""
    big = 1 << 54
    df = spark.createDataFrame(
        [(i, big + i) for i in range(8)], "id long, v long"
    )
    out = {r.id: r.rs for r in scalable_running_sum(df, "id", "v", "rs", num_partitions=4).collect()}
    acc = 0
    for i in range(8):
        acc += big + i
        assert out[i] == acc


def test_profile_table_shape(spark):
    orders = load_table(spark, SF, "orders")
    prof = profile_table(orders).collect()
    by_col = {r.column: r for r in prof}
    assert set(by_col) == set(orders.columns)
    assert by_col["o_orderkey"].n_nulls == 0
    assert by_col["o_orderkey"].n_rows == orders.count()
    assert by_col["o_orderstatus"].mean_val is None


def test_ivf_recall(spark):
    emb = load_table(spark, SF, "embeddings")
    qids = [0, 1, 2, 3, 4]
    exact = {
        (r.query_id, r.neighbor_id)
        for r in simsearch.brute_force_topk(emb, qids, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in simsearch.ivf_topk(emb, qids, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.2, f"IVF recall collapsed: {recall}"


def test_approx_aggregates_error_bound(spark):
    li = load_table(spark, SF, "lineitem")
    row = li.agg(
        F.approx_count_distinct("l_orderkey").alias("a"),
        F.countDistinct("l_orderkey").alias("e"),
        F.percentile_approx("l_extendedprice", 0.5).alias("m"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("me"),
    ).first()
    assert abs(row.a - row.e) / row.e < 0.1
    assert abs(row.m - row.me) / row.me < 0.1


def test_multimodal_metadata_and_features(spark):
    docs = load_table(spark, SF, "documents").limit(50)
    blobs = multimodal.attach_blob(docs)
    meta = multimodal.blob_metadata(blobs).collect()
    assert len(meta) == 50
    src = {r.doc_id: r.n_chars for r in docs.select("doc_id", "n_chars").collect()}
    for r in meta:
        assert r.byte_len == src[r.doc_id]  # ascii text: bytes == chars
        assert len(r.sha256) == 64
    feats = multimodal.extract_features(blobs).collect()
    for r in feats:
        assert r.n_frames == (max(r.byte_len, 1) + 255) // 256
        assert sum(r.features) == pytest.approx(1.0)
        assert 0 < r.mean_byte < 128  # ascii


def test_decode_image_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG")


def test_resize_images(spark):
    # orderBy before limit: a bare limit() may pick different rows per job
    docs = load_table(spark, SF, "documents").orderBy("doc_id").limit(20)
    resized = multimodal.resize_images(
        multimodal.attach_blob(docs), width=16, height=8
    ).collect()
    assert len(resized) == 20
    for r in resized:
        assert (r.width, r.height) == (16, 8)
        assert len(r.resized) == 16 * 8
    # deterministic: same input → same bytes
    again = {
        r.doc_id: bytes(r.resized)
        for r in multimodal.resize_images(
            multimodal.attach_blob(docs), width=16, height=8
        ).collect()
    }
    for r in resized:
        assert bytes(r.resized) == again[r.doc_id]


def test_multimodal_null_blob_safe(spark):
    from pyspark.sql import Row
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("blob", T.BinaryType()),
            T.StructField("media_type", T.StringType()),
        ]
    )
    df = spark.createDataFrame(
        [Row(doc_id=1, blob=None, media_type="x"),
         Row(doc_id=2, blob=b"abc", media_type="x")],
        schema,
    )
    meta = {r.doc_id: r for r in multimodal.blob_metadata(df).collect()}
    assert meta[1].byte_len == 0
    rs = {r.doc_id: r for r in multimodal.resize_images(df, width=4, height=2).collect()}
    assert len(rs[1].resized) == 8  # null blob → 1-byte placeholder sampled
    fr = multimodal.frame_sample(df).collect()
    assert {r.doc_id for r in fr} == {1, 2}


def test_hll_union_matches_exact_within_bound(spark):
    from shifts_etl_spark.plans.extensions import x31_hll_mergeable_sketches

    got = {
        r["event_type"]: r["approx_users"]
        for r in x31_hll_mergeable_sketches(spark, SF).collect()
    }
    ev = spark.read.parquet(f"{SF}/events.parquet")
    exact_all = ev.select("user_id").distinct().count()
    assert got["__all__"] == pytest.approx(exact_all, rel=0.05)
    exact_view = (
        ev.where("event_type = 'view'").select("user_id").distinct().count()
    )
    assert got["view"] == pytest.approx(exact_view, rel=0.05)


def test_observed_metrics_single_pass(spark, tmp_path):
    from pyspark.sql import functions as F

    from shifts_etl_spark.operators.profile import observed_metrics

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    out = str(tmp_path / "obs")
    result, metrics = observed_metrics(
        li,
        action=lambda d: d.write.mode("overwrite").parquet(out),
        n_rows=F.count(F.lit(1)),
        null_keys=F.sum(F.col("l_orderkey").isNull().cast("long")),
        total_qty=F.sum("l_quantity"),
    )
    assert metrics["n_rows"] == li.count()
    assert metrics["null_keys"] == 0
    assert metrics["total_qty"] == pytest.approx(
        li.agg(F.sum("l_quantity")).first()[0]
    )
    assert spark.read.parquet(out).count() == metrics["n_rows"]


def test_pca_whiten_matches_numpy_replica(spark):
    """pca_whiten vs a full numpy replica on the real sf0.001
    embeddings: projections agree to 1e-6 per coordinate, and the
    whitened projections have ≈identity covariance (unit variance,
    zero cross-correlation) — the whitening contract."""
    import numpy as np

    from shifts_etl_spark.operators.profile import pca_whiten
    from shifts_etl_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    ids = [r.vec_id for r in rows]
    m = np.asarray([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    k = 8
    mean = m.mean(axis=0)
    cov = ((m - mean).T @ (m - mean)) / len(m)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    vals, vecs = vals[order], vecs[:, order]
    for c in range(k):
        if vecs[np.argmax(np.abs(vecs[:, c])), c] < 0:
            vecs[:, c] = -vecs[:, c]
    expect = (m - mean) @ (vecs / np.sqrt(np.maximum(vals, 1e-9)))

    got = {r.vec_id: np.asarray(r.proj) for r in pca_whiten(emb).collect()}
    assert set(got) == set(ids)
    g = np.asarray([got[i] for i in ids])
    assert np.max(np.abs(g - expect)) < 1e-5

    wcov = (g - g.mean(axis=0)).T @ (g - g.mean(axis=0)) / len(g)
    assert np.max(np.abs(wcov - np.eye(k))) < 1e-3
