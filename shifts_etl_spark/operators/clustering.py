"""DataFrame-native k-means (Lloyd's algorithm) over an embedding column —
the iterative-algorithm pattern on Spark, and the proper trainer for
``simsearch.ivf_topk``'s cells (which defaults to a fixed md5-priority
centroid sample since r9; pass ``kmeans_fit``'s output for trained ones).

Scale design (100 TB):
  - **Assignment is shuffle-free.** Each iteration broadcasts the k×dim
    centroid matrix *inside the plan* as array literals (same
    ship-with-the-plan mechanism as operators/bloom.py); every vector's
    nearest cell is an argmin over k JVM-side squared-L2 expressions —
    one scan, no join, no exchange.
  - **Recompute is one map-side-combinable aggregate.** Per-cell
    elementwise sums (dim element_at aggregates — never a posexplode,
    which would re-evaluate the distance tree once per element through
    generator projection-collapse) reduce each partition to ≤ k rows
    before the shuffle; the driver only ever materializes the k×dim
    centroid matrix (KBs) and the per-iteration objective.
  - Driver-side loop of ``max_iter`` jobs is the standard shape for
    iterative algorithms on Spark (MLlib's own k-means does the same);
    the per-iteration lineage is cut by re-reading the source, not by
    growing a plan chain.

Determinism: init picks the k rows with the smallest xxhash64(id) (a
seedless deterministic pseudo-random sample); ties in assignment break
toward the lower cell index. Floating-point partial-sum order can wiggle
centroids in the last ulp, so queries built on this round their outputs.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F


@dataclass
class KMeansModel:
    centroids: list[list[float]]  # k × dim
    objective: list[float]  # mean squared distance per iteration
    sizes: list[int]  # vectors per cell at the last iteration


def _l2_sq(vec: Column, cent: list[float]) -> Column:
    """Σ (v[i]-c[i])² in double against a literal centroid."""
    return F.aggregate(
        F.zip_with(
            vec, F.lit(cent), lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _dists(vec: Column, centroids: list[list[float]]) -> Column:
    """array of k squared distances — per-row JVM work, no join."""
    return F.array(*[_l2_sq(vec, c) for c in centroids])


def _nearest(dists: Column, round_decimals: int | None = None) -> tuple[Column, Column]:
    """(cell, dist²) of the minimum — array_position returns the FIRST
    match, so ties break toward the lower cell index. ``round_decimals``
    rounds each distance before the argmin (HALF_UP, like DuckDB's round)
    so cross-engine float-summation-order wobble cannot flip a cell."""
    if round_decimals is not None:
        dists = F.transform(dists, lambda d: F.round(d, round_decimals))
    lo = F.array_min(dists)
    return (F.array_position(dists, lo) - 1).cast("int"), lo


def _round_half_up(x: float, decimals: int) -> float:
    """Driver-side HALF_UP rounding (ties away from zero) — matches
    Spark's F.round and DuckDB's round; Python's built-in round is
    HALF_EVEN and would diverge at exact .5 boundaries."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-decimals)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def assign_cells(
    emb: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_decimals: int | None = None,
) -> DataFrame:
    """(id, cell, dist²) for every vector — one shuffle-free scan."""
    cell, dist = _nearest(_dists(F.col(vec_col), centroids), round_decimals)
    return emb.select(
        F.col(id_col), cell.alias("cell"), dist.alias("dist_sq")
    )


def kmeans_fit(
    emb: DataFrame,
    k: int = 8,
    max_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init: str = "hash",
    round_decimals: int | None = None,
) -> KMeansModel:
    """Lloyd's iterations: assign (shuffle-free, literal centroids) →
    recompute means ((cell, pos) aggregate) → repeat. Empty cells keep
    their previous centroid. Returns centroids + per-iteration mean
    squared distance (non-increasing, the convergence witness).

    ``init``: "hash" seeds from the k first vectors in xxhash64(id) order
    (a deterministic pseudo-random sample — the scale default); "first"
    seeds from the k lowest ids — trivially SQL-mirrorable, which is what
    makes the x30/x36 catalog entries DuckDB-oracle-checkable.
    ``round_decimals``: HALF_UP-round distances before each argmin and
    centroid means after each update, so the fixed point is identical
    across engines regardless of float summation order (the x13 6-decimal
    convention)."""
    # Persist the (order-key, double-vector) projection ONCE: every Lloyd
    # iteration otherwise rebuilds its plan from the parquet scan (scan +
    # decode + cast per round — measured as the dominant cost at sf0.01).
    # The cached footprint is one double array + a long per vector.
    order_key = (
        F.xxhash64(F.col(id_col)) if init == "hash" else F.col(id_col)
    )
    # _fan_out: a compact single-file scan arrives as ONE split, which
    # would serialize every Lloyd pass's |rows|×k×d distance folds on one
    # core; the cached frame is what every iteration reads, so spread it
    # once. Partial-sum order changes are absorbed by the round_decimals
    # convention (and are measurement noise for the unrounded default).
    from .dedup import _fan_out

    feats = _fan_out(
        emb.select(
            order_key.alias("_h"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
        )
    ).persist()
    try:
        init_rows = feats.orderBy("_h").limit(k).collect()
        if not init_rows:
            raise ValueError("kmeans_fit: input has no rows")
        k = min(k, len(init_rows))  # fewer vectors than k → one cell per vector
        centroids = [[float(x) for x in r["v"]] for r in init_rows]
        objective: list[float] = []
        sizes: list[int] = []

        dim = len(centroids[0])
        for _ in range(max_iter):
            cell, dist = _nearest(_dists(F.col("v"), centroids), round_decimals)
            # Elementwise sums via dim element_at aggregates, NOT
            # posexplode: Catalyst collapses a projection into a
            # generator, so an exploded form re-evaluates the whole
            # k-centroid distance tree once PER ELEMENT (dim× per
            # vector — measured 8.1 s vs 0.4 s per iteration at sf0.1).
            # Here cell/dist evaluate once per row, the aggregate is
            # map-side combinable, and the exchange carries ≤ k rows
            # per task of (count, dist, dim sums).
            stats = (
                feats.select(cell.alias("cell"), dist.alias("dist_sq"), "v")
                .groupBy("cell")
                .agg(
                    F.count(F.lit(1)).alias("c"),
                    F.sum("dist_sq").alias("d"),
                    *[
                        F.sum(F.element_at("v", i + 1)).alias(f"s{i}")
                        for i in range(dim)
                    ],
                )
                .collect()
            )
            new_cents = [list(c) for c in centroids]
            counts = [0] * k
            total_d, total_n = 0.0, 0
            for r in stats:
                mean = [r[f"s{i}"] / r["c"] for i in range(dim)]
                if round_decimals is not None:
                    mean = [_round_half_up(x, round_decimals) for x in mean]
                new_cents[r["cell"]] = mean
                counts[r["cell"]] = r["c"]
                total_d += r["d"]
                total_n += r["c"]
            centroids = new_cents
            sizes = counts
            objective.append(total_d / max(total_n, 1))
    finally:
        feats.unpersist()

    return KMeansModel(centroids=centroids, objective=objective, sizes=sizes)


def coverage_sample(
    emb: DataFrame,
    centroids: list[list[float]],
    budget: int = 200,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_decimals: int | None = 6,
    salt: str = "-cov",
) -> DataFrame:
    """Cluster-coverage subsample: allocate an integer ``budget`` across
    k-means cells proportional to sqrt(cell size) — the diversity-
    preserving compromise between uniform-over-rows (head clusters
    dominate) and uniform-over-clusters (tail clusters oversampled) —
    then draw each cell's quota by a deterministic md5 priority.
    Returns (cell, vec_id, draw_rank). Quotas are largest-remainder
    rounded (lower-cell tiebreak) and capped at the cell size, so the
    draw is exact, reproducible, and sums to ``budget`` whenever no
    cell is smaller than its quota.

    Scale shape: assignment is the shuffle-free literal-centroid scan
    (assign_cells); sizes/quotas are a k-row window; the draw joins the
    broadcast k-row quota table and ranks with the two-phase bounded
    top-k (partition-local prefilter first), so a giant cell never
    funnels through one task — only quota x P rows reach the global
    rank."""
    from pyspark.sql import Window

    from .curation import _hex_uniform_int

    assign = assign_cells(emb, centroids, id_col, vec_col, round_decimals)
    sizes = assign.groupBy("cell").agg(F.count(F.lit(1)).alias("n"))
    w = F.sqrt(F.col("n").cast("double"))
    wsum = sizes.select(F.sqrt(F.col("n").cast("double")).alias("w")).agg(
        F.sum("w").alias("ws")
    )
    scored = sizes.crossJoin(F.broadcast(wsum)).select(
        "cell",
        "n",
        (w / F.col("ws")).alias("p"),
        F.floor(w / F.col("ws") * budget).alias("base"),
        (w / F.col("ws") * budget - F.floor(w / F.col("ws") * budget)).alias(
            "frac"
        ),
    )
    short = F.lit(budget) - F.sum("base").over(Window.partitionBy())
    alloc = (
        scored.select(
            "cell",
            "n",
            F.row_number()
            .over(Window.orderBy(F.desc("frac"), "cell"))
            .alias("fr"),
            short.alias("short"),
            "base",
        )
        .select(
            "cell",
            F.least(
                F.col("base")
                + F.when(F.col("fr") <= F.col("short"), 1).otherwise(0),
                F.col("n"),
            )
            .cast("long")
            .alias("quota"),
        )
    )
    pri = _hex_uniform_int(
        F.concat(F.col(id_col).cast("string"), F.lit(salt))
    )
    base = assign.select("cell", id_col, pri.alias("pri")).join(
        F.broadcast(alloc), "cell"
    )
    w_local = Window.partitionBy("cell", "_p").orderBy("pri", id_col)
    w_global = Window.partitionBy("cell").orderBy("pri", id_col)
    return (
        base.withColumn("_p", F.spark_partition_id())
        .withColumn("_rl", F.row_number().over(w_local))
        .where(F.col("_rl") <= F.col("quota"))
        .drop("_rl", "_p")
        .withColumn("draw_rank", F.row_number().over(w_global))
        .where(F.col("draw_rank") <= F.col("quota"))
        .select("cell", id_col, F.col("draw_rank").cast("long").alias("draw_rank"))
    )
