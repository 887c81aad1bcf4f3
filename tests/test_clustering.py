"""DataFrame-native k-means (operators/clustering.py): Lloyd convergence,
partition completeness, and plan shape (no join/exchange in assignment)."""

import pytest
from pyspark.sql import functions as F

from shifts_etl_spark.operators import clustering

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_objective_non_increasing(spark, emb):
    model = clustering.kmeans_fit(emb, k=4, max_iter=4)
    for prev, cur in zip(model.objective, model.objective[1:]):
        assert cur <= prev + 1e-9
    assert len(model.centroids) == 4
    assert sum(model.sizes) == emb.count()


def test_assignment_partitions_corpus(spark, emb):
    model = clustering.kmeans_fit(emb, k=4, max_iter=2)
    cells = clustering.assign_cells(emb, model.centroids)
    assert cells.count() == emb.count()
    assert cells.select("vec_id").distinct().count() == emb.count()
    got = {r["cell"] for r in cells.select("cell").distinct().collect()}
    assert got <= set(range(4))


def test_assignment_is_shuffle_free(spark, emb):
    model = clustering.kmeans_fit(emb, k=4, max_iter=1)
    plan = clustering.assign_cells(
        emb, model.centroids
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan


def test_separated_clusters_recovered(spark):
    # two tight blobs far apart -> k=2 must split them exactly
    rows = [
        (i, [10.0 + 0.01 * i, 10.0]) for i in range(20)
    ] + [(100 + i, [-10.0 - 0.01 * i, -10.0]) for i in range(20)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    model = clustering.kmeans_fit(df, k=2, max_iter=4)
    cells = clustering.assign_cells(df, model.centroids).collect()
    by_cell = {}
    for r in cells:
        by_cell.setdefault(r["cell"], set()).add(r["vec_id"])
    assert sorted(len(v) for v in by_cell.values()) == [20, 20]
    blob_a = {r["vec_id"] for r in cells if r["vec_id"] < 100}
    assert blob_a in by_cell.values()


def test_ivf_with_trained_centroids(spark, emb):
    from shifts_etl_spark.operators import simsearch

    model = clustering.kmeans_fit(emb, k=8, max_iter=2)
    qids = [r["vec_id"] for r in emb.select("vec_id").limit(3).collect()]
    got = simsearch.ivf_topk(
        emb, qids, k=5, n_probe=3, centroids=model.centroids
    ).collect()
    per_q = {}
    for r in got:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert set(per_q) == set(qids)
    for ranks in per_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_kmeans_fewer_rows_than_k(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [5.0, 5.0])], ["vec_id", "embedding"]
    )
    model = clustering.kmeans_fit(df, k=8, max_iter=2)
    assert len(model.centroids) == 2
    assert sum(model.sizes) == 2
    with pytest.raises(ValueError, match="no rows"):
        clustering.kmeans_fit(df.where("vec_id < 0"), k=2)


def test_label_centroid_similarity_planted(spark):
    """Two labels sharing a direction → cosine 1; orthogonal labels → 0."""
    from shifts_etl_spark.plans.extensions import x42_label_centroid_similarity
    # patch the family module whose globals x42 resolves `_t` from
    from shifts_etl_spark.plans.extensions import ann as ext

    rows = []
    for vid in range(4):
        rows.append((vid, [1.0, 0.0, 1.0, 0.0], 0))      # label 0: e1+e3
    for vid in range(4, 8):
        rows.append((vid, [2.0, 0.0, 2.0, 0.0], 1))      # label 1: same direction
    for vid in range(8, 12):
        rows.append((vid, [0.0, 3.0, 0.0, -3.0], 2))     # label 2: orthogonal
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")

    orig = ext._t
    ext._t = lambda spark, sf_dir, name: df
    try:
        got = {(r.la, r.lb): r.cosine
               for r in x42_label_centroid_similarity(spark, "ignored").collect()}
    finally:
        ext._t = orig
    assert got[(0, 1)] == 1.0
    assert got[(0, 2)] == 0.0
    assert got[(1, 2)] == 0.0
