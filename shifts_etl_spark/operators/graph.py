"""Iterative graph analytics on DataFrames: fixed-iteration PageRank.

Spark-first design: the edge list with out-degrees is computed once and
persisted; each power iteration is ONE shuffle (join ranks→edges on src,
aggregate contributions on dst) — O(|E|) rows of (id, double) per round,
never the payload tables. A fixed iteration count keeps the computation
expressible as an unrolled chain of CTEs for the cross-engine oracle
(recursive aggregation is not portable SQL).

Reference parity note: the reference engine
(/root/reference/etl/app/shift_data_processor.py) has no graph operator;
this is a beyond-reference extension in the LLM-pipeline family (link
analysis for corpus/citation graphs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    top_k: int = 100,
) -> DataFrame:
    """PageRank after a FIXED number of power iterations over a directed
    edge list (duplicate edges are collapsed). Every node appearing as a
    source or destination participates; rank mass from dangling nodes
    (no out-edges) is redistributed uniformly each round, so the ranks
    sum to 1 at every iteration.

    Scale notes: `edges ⋈ ranks` shuffles on src — the SAME key every
    iteration, so the persisted, pre-partitioned edge side is reused and
    only the rank vector (id, double) moves. The per-iteration dangling
    mass is a one-row aggregate (broadcast). Ranks are persisted and the
    previous iteration unpersisted each round to keep the lineage and
    memory bounded (the k-means cache-and-iterate pattern,
    clustering.py)."""
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        nodes.unpersist()
        raise ValueError("pagerank: empty edge list")
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # pre-partition the join side once; every iteration reuses it
    links = (
        e.join(outdeg, "src")
        .repartition("src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    links.count()

    # The dangling-node SET is fixed across iterations (it depends only on
    # the edge list); detect it once. When empty — e.g. any symmetrized
    # graph — the whole dangling branch (a semi join + 1-row aggregate +
    # broadcast per round) drops out of the loop.
    dangling_ids = nodes.join(
        outdeg, nodes.node == outdeg.src, "left_anti"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    has_dangling = bool(dangling_ids.take(1))
    # Likewise fixed: nodes with no in-edges. When none exist the contrib
    # aggregate already covers every node, so the per-iteration left join
    # against the node list drops out as well.
    all_reachable = not nodes.join(
        e.select(F.col("dst").alias("node")).distinct(), "node", "left_anti"
    ).take(1)

    teleport = (1.0 - damping) / n_nodes
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    ranks = ranks.persist(StorageLevel.MEMORY_AND_DISK)
    for _ in range(iterations):
        contrib = (
            links.join(ranks, links.src == ranks.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("c"))
        )
        new_rank = teleport + damping * F.coalesce(F.col("c"), F.lit(0.0))
        joined = contrib if all_reachable else nodes.join(contrib, "node", "left")
        if has_dangling:
            # mass held by dangling nodes, redistributed uniformly
            dangling = ranks.join(
                F.broadcast(dangling_ids), "node", "left_semi"
            ).agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
            joined = joined.crossJoin(F.broadcast(dangling))
            new_rank = new_rank + damping * F.col("dm") / n_nodes
        new_ranks = joined.select("node", new_rank.alias("rank")).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        new_ranks.count()
        ranks.unpersist()
        ranks = new_ranks

    out = (
        ranks.select("node", F.round("rank", 6).alias("pagerank"))
        .orderBy(F.desc("pagerank"), "node")
        .limit(top_k)
    )
    rows = out.collect()
    links.unpersist()
    nodes.unpersist()
    dangling_ids.unpersist()
    ranks.unpersist()
    spark = edges.sparkSession
    return spark.createDataFrame(rows, out.schema)


def triangle_count(edges: DataFrame, src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """Global triangle count over an undirected graph (edges may arrive in
    either or both directions; self-loops and duplicates are dropped).

    Degree-ordered orientation (the standard scale trick, cf. the
    node-iterator++ family): orient every edge from the endpoint with
    smaller (degree, id) to the larger, so every out-adjacency list is
    O(sqrt(m)) — wedge generation is bounded by Σ out_deg² ≤ O(m^1.5)
    instead of Σ deg² which a hub node makes quadratic. Each triangle has
    exactly one node with two out-edges in this orientation, so counting
    wedges (u→v, u→w) closed by the oriented edge (v→w) counts each
    triangle exactly once.

    Returns one row: (n_nodes, n_edges, n_triangles).
    """
    und = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    deg = (
        und.select(F.col("a").alias("n"))
        .unionAll(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # orient by (degree, node): u -> v iff (d_u, u) < (d_v, v)
    withdeg = (
        und.join(deg.withColumnsRenamed({"n": "a", "d": "da"}), "a")
        .join(deg.withColumnsRenamed({"n": "b", "d": "db"}), "b")
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = withdeg.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.struct("b", "db")).otherwise(F.struct(F.col("a").alias("b"), F.col("da").alias("db"))).alias("vd"),
    ).select("u", F.col("vd.b").alias("v"), F.col("vd.db").alias("dv")).persist(
        StorageLevel.MEMORY_AND_DISK
    )

    e1 = oriented.select("u", F.col("v").alias("v1"), F.col("dv").alias("d1"))
    e2 = oriented.select("u", F.col("v").alias("v2"), F.col("dv").alias("d2"))
    # wedge (v1, v2) canonicalized in the same (degree, id) order so it can
    # close only against the oriented edge between them
    wedges = e1.join(e2, "u").where(
        (F.col("d1") < F.col("d2"))
        | ((F.col("d1") == F.col("d2")) & (F.col("v1") < F.col("v2")))
    )
    closer = oriented.select(F.col("u").alias("v1"), F.col("v").alias("v2"))
    tri = wedges.join(closer, ["v1", "v2"], "left_semi")

    # one-row result: collect eagerly so the persisted frames can be
    # released (same discipline as pagerank above) — the und/deg/oriented
    # subtrees would otherwise re-execute once per referencing aggregate
    n_tri = tri.agg(F.count(F.lit(1)).alias("n_triangles"))
    n_edges = und.agg(F.count(F.lit(1)).alias("n_edges"))
    n_nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    out = n_nodes.crossJoin(n_edges).crossJoin(n_tri)
    rows = out.collect()
    und.unpersist()
    deg.unpersist()
    oriented.unpersist()
    return edges.sparkSession.createDataFrame(rows, out.schema)
