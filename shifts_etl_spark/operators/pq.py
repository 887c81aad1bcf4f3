"""Product-quantization (PQ) approximate nearest neighbor — the
memory-bound tier of the similarity-search story (complementing
simsearch's LSH and IVF tiers, after Jégou et al., "Product Quantization
for Nearest Neighbor Search", TPAMI 2011).

Why PQ at 100 TB: IVF/LSH prune *candidates* but still re-rank against
full vectors; PQ compresses every corpus vector to ``m`` small codes
(64 float32 dims → 16 4-bit codes = 8 packable bytes at the defaults,
32×), so the compressed table is small enough to scan per query and the
raw vectors are only touched for the k·refine-row shortlist. The
pipeline:

  1. ``train_codebooks`` — driver-side Lloyd iterations per subspace on a
     BOUNDED deterministic sample (codebooks are a few KiB trained on a
     few thousand rows; collecting the sample is the sanctioned bounded
     driver collect, exactly like bloom.py's bitset).
  2. ``encode_pq`` — one Arrow-batched Pandas UDF maps each vector to its
     per-subspace nearest-centroid codes (numpy matmul per batch, the
     sanctioned vectorized slow path). Output shuffles (id, m bytes),
     never vectors.
  3. ``pq_topk`` — asymmetric distance computation (ADC): per query, a
     lookup table of m×k subspace distances is built driver-side (m·k·d
     flops, trivial), broadcast as a literal array column, and each
     corpus row is scored with a JVM-side ``aggregate`` over its codes —
     whole-stage-codegen, no Python in the scan loop.

Vectors are L2-normalized throughout, so ADC's L2² ranking equals cosine
ranking (L2² = 2 − 2·cos) and recall is measured directly against
``simsearch.brute_force_topk``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T


def _normalize(X: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return X / norms


def _rha(x: np.ndarray, dec: int) -> np.ndarray:
    """Half-away-from-zero rounding — DuckDB round(DOUBLE, dec)
    semantics, the cross-engine convention (see simsearch/clustering)."""
    p = 10.0 ** dec
    return np.sign(x) * np.floor(np.abs(x) * p + 0.5) / p


def train_codebooks(
    emb: DataFrame,
    m: int = 4,
    k: int = 16,
    sample_size: int = 2048,
    iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_decimals: int | None = None,
) -> np.ndarray:
    """(m, k, d/m) float64 codebooks from a deterministic bounded sample
    (first ``sample_size`` rows by id; evenly-spaced init, fixed Lloyd
    iteration count — bit-reproducible across runs).

    ``round_decimals`` enables the cross-engine oracle convention (the
    x30 recipe): normalized inputs, per-step distances, and updated
    means all round half-away to that many decimals, so the Lloyd fixed
    point is identical to X44_SQL's unrolled CTE chain regardless of
    float summation order."""
    rows = emb.orderBy(id_col).limit(sample_size).select(vec_col).collect()
    X = _normalize(np.array([r[0] for r in rows], dtype="float64"))
    if round_decimals is not None:
        X = _rha(X, round_decimals)
    n, d = X.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    books = np.zeros((m, k, dsub))
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        C = S[np.linspace(0, n - 1, k).astype(int)].copy()
        for _ in range(iters):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            if round_decimals is not None:
                d2 = _rha(d2, round_decimals)
            assign = d2.argmin(1)
            for c in range(k):
                pts = S[assign == c]
                if len(pts):
                    C[c] = pts.mean(0)
            if round_decimals is not None:
                C = _rha(C, round_decimals)
        books[j] = C
    return books


def encode_pq(
    emb: DataFrame,
    books: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_decimals: int | None = None,
) -> DataFrame:
    """(id, codes: array<int>) — per-subspace nearest-centroid codes via
    one Arrow-batched Pandas UDF. ``round_decimals`` applies the oracle
    rounding convention (see train_codebooks)."""
    m, _, dsub = books.shape
    B = books
    rd = round_decimals

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def enc(v: pd.Series) -> pd.Series:
        X = _normalize(np.stack(v.to_numpy()).astype("float64"))
        if rd is not None:
            X = _rha(X, rd)
        codes = np.empty((X.shape[0], m), dtype="int64")
        for j in range(m):
            S = X[:, j * dsub : (j + 1) * dsub]
            d2 = ((S[:, None, :] - B[j][None, :, :]) ** 2).sum(-1)
            if rd is not None:
                d2 = _rha(d2, rd)
            codes[:, j] = d2.argmin(1)
        return pd.Series([[int(c) for c in row] for row in codes])

    return emb.select(F.col(id_col), enc(F.col(vec_col)).alias("codes"))


def pq_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    m: int = 16,
    n_codes: int = 16,
    sample_size: int = 2048,
    refine: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_decimals: int | None = None,
) -> DataFrame:
    """Approximate top-k neighbors by PQ/ADC with exact re-rank: the
    compressed scan shortlists ``k * refine`` candidates per query by
    ADC L2² (== cosine order on normalized vectors), then full vectors
    are re-attached BY ID for the shortlist only and exact cosine picks
    the final top-k — the standard production PQ shape (scan compressed
    codes, touch raw vectors for ~k·refine rows per query). Returns
    (query_id, neighbor_id, cosine, rank), ties by neighbor id."""
    books = train_codebooks(
        emb, m, n_codes, sample_size, id_col=id_col, vec_col=vec_col,
        round_decimals=round_decimals,
    )
    codes = encode_pq(
        emb, books, id_col, vec_col, round_decimals=round_decimals
    ).withColumnRenamed(id_col, "neighbor_id")
    qrows = (
        emb.where(F.col(id_col).isin(query_ids))
        .select(id_col, vec_col)
        .collect()
    )
    dsub = books.shape[2]
    luts = []
    for r in qrows:
        qv = _normalize(np.array([r[1]], dtype="float64"))[0]
        if round_decimals is not None:
            qv = _rha(qv, round_decimals)
        lut = np.empty(m * n_codes)
        for j in range(m):
            qs = qv[j * dsub : (j + 1) * dsub]
            lut[j * n_codes : (j + 1) * n_codes] = (
                (books[j] - qs[None, :]) ** 2
            ).sum(-1)
        if round_decimals is not None:
            lut = _rha(lut, round_decimals)
        luts.append((int(r[0]), [float(x) for x in lut]))
    qdf = emb.sparkSession.createDataFrame(
        luts, schema="query_id long, lut array<double>"
    )
    cand = codes.crossJoin(F.broadcast(qdf)).where(
        F.col("query_id") != F.col("neighbor_id")
    )
    dist = F.expr(
        f"aggregate(sequence(0, {m - 1}), 0D,"
        f" (acc, j) -> acc + lut[j * {n_codes} + codes[j]])"
    )
    scored = cand.select(
        "query_id", "neighbor_id", F.round(dist, 6).alias("adc_dist")
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    shortlist = (
        scored.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= k * refine)
        .select("query_id", "neighbor_id")
    )
    # exact re-rank: vectors re-attached by id AFTER the shortlist, so
    # only k*refine rows per query ever carry an embedding
    from ..functions.vectors import cosine_similarity

    qv = F.broadcast(
        emb.where(F.col(id_col).isin(query_ids)).select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
        )
    )
    cv = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    sim = F.round(cosine_similarity(F.col("qv"), F.col("cv")), 6)
    rescored = (
        shortlist.join(qv, "query_id")
        .join(cv, "neighbor_id")
        .select("query_id", "neighbor_id", sim.alias("cosine"))
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
