"""LLM-training-data pipeline queries (north-star extension ops,
BASELINE.json) over documents / embeddings, with DuckDB oracles where the
semantics are SQL-expressible. Non-SQL-expressible ops (xxhash64-based
MinHash/SimHash, Pandas-UDF LSH) are registered without an oracle — the
driver records a rows-only check and pytest covers their semantics
(recall / planted-duplicate tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..operators import bloom, clustering, countmin, curation, dedup, funnel, heavyhitters, multimodal, profile, simsearch, textstats, theta
from ..operators.profile import profile_table
from ..sources.tables import load_table as _t_impl


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return _t_impl(spark, sf_dir, name)


# --------------------------------------------------------------------------
# dedup
# --------------------------------------------------------------------------

# DuckDB mirror of textstats.normalize_text + tokens (shared by many oracles;
# named after its first user, the x67 components oracle)
_X67_NORM = (
    r"list_filter(regexp_split_to_array(trim(regexp_replace(regexp_replace("
    r"lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), '\s+'), "
    r"t -> t <> '')"
)


def x1_dedup_exact(spark, sf_dir):
    return dedup.exact_dedup(_t(spark, sf_dir, "documents"))


X1_SQL = """
SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id, count(*) AS n_copies
FROM documents GROUP BY md5(text)
"""


def x2_dedup_exact_normalized(spark, sf_dir):
    return dedup.exact_dedup_normalized(_t(spark, sf_dir, "documents"))


X2_SQL = r"""
SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS content_hash,
       MIN(doc_id) AS keep_id, count(*) AS n_copies
FROM documents
GROUP BY 1
"""


def x3_dedup_minhash_lsh(spark, sf_dir):
    """Candidate near-dup pairs via 64-hash / 16-band MinHash-LSH.

    Oracle-checkable since round 3: the catalog entry runs the md5-derived
    48-bit hash family (dedup._md5_hash48), which DuckDB reproduces
    bit-for-bit from the same hex string — signatures, band keys, the
    hot-bucket cap, and the est_jaccard slot-match fraction all mirror
    into X3_SQL. xxhash64 remains the library's throughput default and
    keeps the planted-dup pytest."""
    return dedup.minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), hash_fn="md5"
    )


def x4_dedup_simhash(spark, sf_dir):
    """SimHash near-dup pairs (hamming ≤ 3 via 4-chunk pigeonhole).

    Oracle-checkable since round 3: the catalog entry runs the 48-bit
    md5-family SimHash (12-bit chunks), which X4_SQL folds identically —
    bit votes, sign fold, chunk banding, and the bit_count(xor) hamming
    filter are all integer-exact cross-engine. The 64-bit xxhash64
    configuration stays the library default with its planted-dup pytest."""
    return dedup.simhash_pairs(
        _t(spark, sf_dir, "documents"), n_bits=48, hash_fn="md5"
    )


def _hex12_int_sql(hx: str) -> str:
    """DuckDB base-16 positional fold of the first 12 hex chars of column
    ``hx`` — equals Spark's conv(substring(md5, 1, 12), 16, 10)::long."""
    return "(" + " + ".join(
        f"CAST(ascii(substring({hx}, {i}, 1)) - CASE WHEN "
        f"ascii(substring({hx}, {i}, 1)) >= 97 THEN 87 ELSE 48 END AS BIGINT)"
        f" * {16 ** (12 - i)}"
        for i in range(1, 13)
    ) + ")"


_X3_SHN = r"""
shn AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3
              THEN [array_to_string(toks[i:i+2], ' ') for i in generate_series(1, len(toks) - 2)]
              WHEN len(toks) > 0
              THEN [array_to_string(toks, ' ')]
              ELSE CAST([] AS VARCHAR[])
         END AS sh
  FROM norm
),
flat AS (SELECT DISTINCT doc_id, unnest(sh) AS s FROM shn)"""

X3_SQL = rf"""
WITH norm AS (
  SELECT doc_id, {{norm}} AS toks FROM documents
),{_X3_SHN},
hs AS (
  SELECT doc_id, j, md5(s || '#' || CAST(j AS VARCHAR)) AS hx
  FROM flat, unnest(generate_series(0, 63)) AS u(j)
),
hv AS (SELECT doc_id, j, {_hex12_int_sql('hx')} AS h FROM hs),
sigs AS (
  SELECT doc_id, list(h ORDER BY j) AS sig
  FROM (SELECT doc_id, j, MIN(h) AS h FROM hv GROUP BY 1, 2)
  GROUP BY doc_id
),
bandh AS (
  SELECT doc_id, sig, b,
         md5(array_to_string(sig[b * 4 + 1:b * 4 + 4], ',') || '#' || CAST(b AS VARCHAR)) AS hx
  FROM sigs, unnest(generate_series(0, 15)) AS u(b)
),
banded AS (SELECT doc_id, sig, b AS band, {_hex12_int_sql('hx')} AS band_hash FROM bandh),
kept AS (
  SELECT * FROM banded
  QUALIFY count(*) OVER (PARTITION BY band, band_hash) <= 500
),
pairs AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
         len([i for i in generate_series(1, 64) if l.sig[i] = r.sig[i]]) / 64.0 AS est_jaccard
  FROM kept l JOIN kept r ON l.band = r.band AND l.band_hash = r.band_hash
  WHERE l.doc_id < r.doc_id
)
SELECT id_a, id_b, est_jaccard FROM pairs
""".replace("{norm}", _X67_NORM)

X4_SQL = rf"""
WITH norm AS (
  SELECT doc_id, {{norm}} AS toks FROM documents
),
tok AS (SELECT doc_id, unnest(toks) AS t FROM norm),
vh AS (
  SELECT t, {_hex12_int_sql('hx')} AS h
  FROM (SELECT DISTINCT t, md5(t || '#' || 's') AS hx FROM tok)
),
votes AS (
  SELECT doc_id, i,
         SUM(CASE WHEN ((h >> i) & 1) = 1 THEN 1 ELSE -1 END) AS v
  FROM tok JOIN vh USING (t), unnest(generate_series(0, 47)) AS u(i)
  GROUP BY 1, 2
),
sigs AS (
  SELECT doc_id,
         SUM(CASE WHEN v > 0 THEN CAST(1 AS BIGINT) << i ELSE 0 END) AS sh
  FROM votes GROUP BY doc_id
),
chunked AS (
  SELECT doc_id, sh, c AS chunk, (sh >> (c * 12)) & 4095 AS chunk_val
  FROM sigs, unnest(generate_series(0, 3)) AS u(c)
),
pairs AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
         bit_count(xor(l.sh, r.sh)) AS hamming
  FROM chunked l JOIN chunked r
    ON l.chunk = r.chunk AND l.chunk_val = r.chunk_val
  WHERE l.doc_id < r.doc_id AND bit_count(xor(l.sh, r.sh)) <= 3
)
SELECT id_a, id_b, hamming FROM pairs
""".replace("{norm}", _X67_NORM)


def x5_ngram_jaccard(spark, sf_dir):
    """Exact 3-token-shingle Jaccard for consecutive doc-id pairs — the
    verification stage of LSH dedup, demonstrated on a deterministic
    pair set."""
    docs = _t(spark, sf_dir, "documents")
    pairs = docs.select(F.col("doc_id").alias("id_a")).withColumn(
        "id_b", F.col("id_a") + 1
    ).join(
        docs.select(F.col("doc_id").alias("id_b")), "id_b", "inner"
    )
    return dedup.ngram_jaccard_pairs(docs, pairs)


X5_SQL = r"""
WITH norm AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), '\s+'), t -> t <> '') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3
              THEN list_distinct([array_to_string(toks[i:i+2], ' ') for i in generate_series(1, len(toks) - 2)])
              ELSE [array_to_string(toks, ' ')]
         END AS sh
  FROM norm
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(CASE WHEN len(list_distinct(list_concat(a.sh, b.sh))) > 0
             THEN CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(list_distinct(list_concat(a.sh, b.sh)))
             ELSE 0 END, 6) AS jaccard
FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
"""


def x6_embedding_nn(spark, sf_dir):
    """Embedding-cosine near-dup: per-vector nearest neighbor within its
    label block + near-dup flag at 0.9."""
    return dedup.embedding_nn_pairs(_t(spark, sf_dir, "embeddings"))


X6_SQL = """
WITH elem AS (
  SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
dots AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id, SUM(a.v * b.v) AS dot
  FROM elem a JOIN elem b ON a.label = b.label AND a.i = b.i AND a.vec_id <> b.vec_id
  GROUP BY 1, 2
),
norms AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM elem GROUP BY 1),
sims AS (
  SELECT d.vec_id, d.neighbor_id,
         round(d.dot / (na.nrm * nb.nrm), 6) AS cosine
  FROM dots d
  JOIN norms na ON d.vec_id = na.vec_id
  JOIN norms nb ON d.neighbor_id = nb.vec_id
),
ranked AS (
  SELECT vec_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id) AS rn
  FROM sims
)
SELECT vec_id, neighbor_id, cosine, cosine >= 0.9 AS is_near_dup
FROM ranked WHERE rn = 1
"""

# --------------------------------------------------------------------------
# similarity search
# --------------------------------------------------------------------------

QUERY_IDS = [0, 1, 2, 3, 4]


def x7_sim_topk_bruteforce(spark, sf_dir):
    """Exact cosine top-5 for query vectors 0-4 (the ANN baseline)."""
    return simsearch.brute_force_topk(_t(spark, sf_dir, "embeddings"), QUERY_IDS, k=5)


X7_SQL = """
WITH elem AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
norms AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM elem GROUP BY 1),
dots AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, SUM(q.v * c.v) AS dot
  FROM elem q JOIN elem c ON q.i = c.i AND q.vec_id <> c.vec_id
  WHERE q.vec_id IN (0, 1, 2, 3, 4)
  GROUP BY 1, 2
),
sims AS (
  SELECT d.query_id, d.neighbor_id, round(d.dot / (nq.nrm * nc.nrm), 6) AS cosine
  FROM dots d
  JOIN norms nq ON d.query_id = nq.vec_id
  JOIN norms nc ON d.neighbor_id = nc.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
  FROM sims
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 5
"""


def x8_sim_topk_lsh(spark, sf_dir):
    """Approximate top-5 via sign-LSH (band bucket join, exact re-rank).

    Oracle-checkable since round 3: the catalog entry runs the md5-derived
    sparse ±1 plane family over floor(v·1e6) integer quantization
    (simsearch.add_det_lsh_signature) — projections are pure integer sums,
    so signatures, band keys, candidates, and the 6-dp cosine re-rank all
    mirror bit-for-bit into X8_SQL. The seeded Gaussian/Pandas-UDF family
    stays the library throughput default with its recall pytest."""
    return simsearch.lsh_topk(
        _t(spark, sf_dir, "embeddings"), QUERY_IDS, dim=64, k=5, plane_fn="md5"
    )


_X8_HEX = (
    "(" + " + ".join(
        f"CAST(ascii(substring(hx, {i}, 1)) - CASE WHEN "
        f"ascii(substring(hx, {i}, 1)) >= 97 THEN 87 ELSE 48 END AS BIGINT)"
        f" * {16 ** (12 - i)}"
        for i in range(1, 13)
    ) + ")"
)

X8_SQL = f"""
WITH pw AS (
  SELECT p, i,
         md5(CAST(p AS VARCHAR) || ':' || CAST(i AS VARCHAR) || '#lshw') AS hx
  FROM range(16) tp(p), range(64) ti(i)
),
planes AS (
  SELECT p, i,
         CASE ({_X8_HEX} % 6) WHEN 0 THEN 1 WHEN 1 THEN -1 ELSE 0 END AS w
  FROM pw
),
elem AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) - 1 AS i
  FROM embeddings
),
proj AS (
  SELECT e.vec_id, pl.p,
         SUM(CAST(floor(e.v * 1000000.0) AS BIGINT) * pl.w) AS s
  FROM elem e JOIN planes pl USING (i)
  GROUP BY 1, 2
),
bkeys AS (
  SELECT vec_id, p // 4 AS band,
         SUM(CASE WHEN s >= 0 THEN CAST(1 AS BIGINT) ELSE 0 END
             * (CAST(1 AS BIGINT) << CAST(3 - (p % 4) AS INT))) AS key
  FROM proj GROUP BY 1, 2
),
buckets AS (SELECT vec_id, band * 4294967296 + key AS bucket FROM bkeys),
cand AS (
  SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS neighbor_id
  FROM buckets qb JOIN buckets cb USING (bucket)
  WHERE qb.vec_id IN (0, 1, 2, 3, 4) AND qb.vec_id <> cb.vec_id
),
norms AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM elem GROUP BY 1),
dots AS (
  SELECT c.query_id, c.neighbor_id, SUM(q.v * n.v) AS dot
  FROM cand c
  JOIN elem q ON q.vec_id = c.query_id
  JOIN elem n ON n.vec_id = c.neighbor_id AND n.i = q.i
  GROUP BY 1, 2
),
sims AS (
  SELECT d.query_id, d.neighbor_id, round(d.dot / (nq.nrm * nc.nrm), 6) AS cosine
  FROM dots d
  JOIN norms nq ON d.query_id = nq.vec_id
  JOIN norms nc ON d.neighbor_id = nc.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
  FROM sims
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 5
"""


# --------------------------------------------------------------------------
# text analysis
# --------------------------------------------------------------------------

def x9_text_stats(spark, sf_dir):
    return textstats.text_stats(_t(spark, sf_dir, "documents"))


_STOP_EN = "['the','a','of','and','to','in','is']"

X9_SQL = rf"""
WITH base AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '') AS toks
  FROM documents
),
derived AS (
  SELECT doc_id, text, toks,
         len(toks) AS n_tokens,
         CAST(list_aggregate(list_transform(toks, t -> length(t)), 'sum') AS DOUBLE)
           / greatest(len(toks), 1) AS mtl,
         CAST(len(list_filter(list_transform(toks, t -> lower(t)),
                  t -> list_contains({_STOP_EN}, t))) AS DOUBLE)
           / greatest(len(toks), 1) AS swr,
         CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
           / greatest(length(text), 1) AS digr,
         CAST(length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g')) AS DOUBLE)
           / greatest(length(text), 1) AS punctr
  FROM base
)
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(n_tokens AS INT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT) AS n_pieces,
       round(mtl, 4) AS mean_token_len,
       round(punctr, 4) AS punct_ratio,
       round(digr, 4) AS digit_ratio,
       round(swr, 4) AS stopword_ratio,
       CAST(round(CASE WHEN n_tokens BETWEEN 10 AND 10000 THEN 0.4 ELSE 0 END
           + CASE WHEN mtl BETWEEN 3.0 AND 10.0 THEN 0.3 ELSE 0 END
           + CASE WHEN swr >= 0.01 THEN 0.2 ELSE 0 END
           + CASE WHEN digr <= 0.2 THEN 0.1 ELSE 0 END, 4) AS DOUBLE) AS quality_score
FROM derived
"""


def x10_text_langid(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    c = F.col("text")
    return docs.select(
        "doc_id",
        "lang",
        textstats.predict_lang(c).alias("pred_lang"),
        (textstats.predict_lang(c) == F.col("lang")).alias("is_match"),
    )


def _hits_sql(words: list[str]) -> str:
    arr = "[" + ",".join(f"'{w}'" for w in words) + "]"
    return (
        r"len(list_filter(list_transform(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> t <> ''), t -> t), "
        + f"t -> list_contains({arr}, t)))"
    )


X10_SQL = rf"""
WITH hits AS (
  SELECT doc_id, lang,
         {_hits_sql(textstats.STOPWORDS['en'])} AS h_en,
         {_hits_sql(textstats.STOPWORDS['es'])} AS h_es,
         {_hits_sql(textstats.STOPWORDS['fr'])} AS h_fr,
         {_hits_sql(textstats.STOPWORDS['de'])} AS h_de
  FROM documents
)
SELECT doc_id, lang,
       CASE WHEN greatest(h_en, h_es, h_fr, h_de) < 1 THEN 'und'
            WHEN h_en = greatest(h_en, h_es, h_fr, h_de) THEN 'en'
            WHEN h_es = greatest(h_en, h_es, h_fr, h_de) THEN 'es'
            WHEN h_fr = greatest(h_en, h_es, h_fr, h_de) THEN 'fr'
            ELSE 'de' END AS pred_lang,
       (CASE WHEN greatest(h_en, h_es, h_fr, h_de) < 1 THEN 'und'
            WHEN h_en = greatest(h_en, h_es, h_fr, h_de) THEN 'en'
            WHEN h_es = greatest(h_en, h_es, h_fr, h_de) THEN 'es'
            WHEN h_fr = greatest(h_en, h_es, h_fr, h_de) THEN 'fr'
            ELSE 'de' END) = lang AS is_match
FROM hits
"""


def x11_text_fingerprint(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    c = F.col("text")
    return docs.select(
        "doc_id",
        textstats.fingerprint_md5(c).alias("fp_md5"),
        textstats.fingerprint_rolling(c).alias("fp_rolling"),
    )


X11_SQL = r"""
WITH norm AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) AS nt
  FROM documents
)
SELECT doc_id,
       md5(nt) AS fp_md5,
       list_reduce(list_transform(string_split(nt, ''), ch -> CAST(ascii(ch) AS BIGINT)),
                   (acc, c) -> (acc * 31 + c) % 1000000007) AS fp_rolling
FROM norm
"""

# --------------------------------------------------------------------------
# multimodal
# --------------------------------------------------------------------------

def x12_multimodal_features(spark, sf_dir):
    """Opaque-binary pipeline: attach blob → mapInPandas feature extraction
    (byte-frame sampling + byte histogram). Scalar outputs are mirrored in
    plain SQL over the source text (the blob is its utf-8 bytes)."""
    docs = _t(spark, sf_dir, "documents")
    feats = multimodal.extract_features(multimodal.attach_blob(docs))
    return feats.select(
        "doc_id",
        "byte_len",
        "n_frames",
        F.round("mean_byte", 6).alias("mean_byte"),
        F.round(F.element_at("features", 1), 6).alias("f0"),
    )


X12_SQL = r"""
WITH codes AS (
  SELECT doc_id, octet_length(CAST(text AS BLOB)) AS byte_len,
         list_transform(string_split(text, ''), ch -> ascii(ch)) AS cs
  FROM documents
)
SELECT doc_id,
       CAST(byte_len AS BIGINT) AS byte_len,
       CAST(ceil(CAST(greatest(byte_len, 1) AS DOUBLE) / 256) AS BIGINT) AS n_frames,
       round(CAST(list_aggregate(cs, 'sum') AS DOUBLE) / greatest(byte_len, 1), 6) AS mean_byte,
       round(CAST(len(list_filter(cs, c -> c % 8 = 0)) AS DOUBLE) / greatest(byte_len, 1), 6) AS f0
FROM codes
"""

def x13_sim_topk_ivf(spark, sf_dir):
    """IVF-cell approximate top-5 (deterministic centroid sample, 4-probe).
    Fully deterministic (stride centroids, exact cosine, id tie-breaks),
    so unlike the seeded-LSH paths it carries a full DuckDB oracle in
    addition to the recall-vs-brute-force pytest."""
    return simsearch.ivf_topk(_t(spark, sf_dir, "embeddings"), QUERY_IDS, k=5)


X13_SQL = """
WITH elem AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
norms AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM elem GROUP BY 1),
cdots AS (
  SELECT a.vec_id, ce.vec_id AS cent_id, SUM(a.v * ce.v) AS dot
  FROM elem a JOIN elem ce ON a.i = ce.i
  WHERE ce.vec_id % 16 = 0
  GROUP BY 1, 2
),
csims AS (
  SELECT d.vec_id, d.cent_id, d.dot / (na.nrm * nc.nrm) AS sim
  FROM cdots d
  JOIN norms na ON d.vec_id = na.vec_id
  JOIN norms nc ON d.cent_id = nc.vec_id
),
corpus_cell AS (
  SELECT vec_id AS neighbor_id, cent_id
  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cent_id) AS rn
        FROM csims)
  WHERE rn = 1
),
query_cell AS (
  SELECT vec_id AS query_id, cent_id
  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cent_id) AS rn
        FROM csims WHERE vec_id IN (0, 1, 2, 3, 4))
  WHERE rn <= 4
),
pair_ids AS (
  SELECT DISTINCT query_id, neighbor_id
  FROM query_cell JOIN corpus_cell USING (cent_id)
  WHERE query_id <> neighbor_id
),
pdots AS (
  SELECT p.query_id, p.neighbor_id, SUM(q.v * c.v) AS dot
  FROM pair_ids p
  JOIN elem q ON q.vec_id = p.query_id
  JOIN elem c ON c.vec_id = p.neighbor_id AND c.i = q.i
  GROUP BY 1, 2
),
sims AS (
  SELECT d.query_id, d.neighbor_id, round(d.dot / (nq.nrm * nc.nrm), 6) AS cosine
  FROM pdots d
  JOIN norms nq ON d.query_id = nq.vec_id
  JOIN norms nc ON d.neighbor_id = nc.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
  FROM sims
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 5
"""


def x14_table_profile(spark, sf_dir):
    """One-pass per-column profile of orders (exact distinct mode so the
    oracle can mirror; approx mode is the scale default)."""
    return profile_table(_t(spark, sf_dir, "orders"), approx_distinct=False)


def _profile_col_sql(name: str, numeric: bool, cast_minmax: bool = True) -> str:
    mm = f"CAST(MIN({name}) AS VARCHAR)" if cast_minmax else f"MIN({name})"
    mx = f"CAST(MAX({name}) AS VARCHAR)" if cast_minmax else f"MAX({name})"
    mean = f"round(AVG({name}), 4)" if numeric else "CAST(NULL AS DOUBLE)"
    return (
        f"SELECT '{name}' AS \"column\", count(*) AS n_rows, "
        f"CAST(SUM(CASE WHEN {name} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls, "
        f"count(DISTINCT {name}) AS n_distinct, "
        f"{mm} AS min_val, {mx} AS max_val, {mean} AS mean_val FROM orders"
    )


X14_SQL = "\nUNION ALL\n".join(
    [
        _profile_col_sql("o_orderkey", True),
        _profile_col_sql("o_custkey", True),
        _profile_col_sql("o_orderstatus", False),
        _profile_col_sql("o_totalprice", True),
        _profile_col_sql("o_orderdate", False),
        _profile_col_sql("o_orderpriority", False),
    ]
)


def x15_approx_aggregates(spark, sf_dir):
    """Sketch aggregates (HyperLogLog++ distinct, approximate quantiles) —
    estimator implementations differ per engine, so rows-only check; the
    companion test bounds the error against exact values."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_median_price"),
        F.percentile_approx("l_extendedprice", 0.99).alias("approx_p99_price"),
    )


def x16_pii_scrub(spark, sf_dir):
    """PII scrub pass: per-doc replacement counts + scrubbed-text hash
    (hash instead of full text keeps the compared payload small)."""
    docs = _t(spark, sf_dir, "documents")
    c = F.col("text")
    counts = textstats.pii_counts(c)
    return docs.select(
        "doc_id",
        F.md5(textstats.scrub_pii(c)).alias("scrubbed_md5"),
        *[v.cast("long").alias(f"n_{k}") for k, v in counts.items()],
    )


X16_SQL = r"""
SELECT doc_id,
       md5(regexp_replace(regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             'https?://[^\s]+', '<URL>', 'g'),
             '[0-9]{7,}', '<NUMBER_LONG>', 'g')) AS scrubbed_md5,
       CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(text, 'https?://[^\s]+')) AS BIGINT) AS n_url,
       CAST(len(regexp_extract_all(text, '[0-9]{7,}')) AS BIGINT) AS n_number_long
FROM documents
"""


def x17_vocabulary(spark, sf_dir):
    """Corpus vocabulary top-100 (total count + doc frequency)."""
    return textstats.vocabulary(_t(spark, sf_dir, "documents"))


X17_SQL = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), '\s+'), t -> t <> '')) AS token
  FROM documents
)
SELECT token, count(*) AS n_total, count(DISTINCT doc_id) AS n_docs
FROM tok GROUP BY token
ORDER BY n_total DESC, token LIMIT 100
"""


def x18_quality_filter(spark, sf_dir):
    """Quality gate with deterministic first-failing-reason labels."""
    return textstats.quality_filter(_t(spark, sf_dir, "documents"))


X18_SQL = r"""
WITH base AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '') AS toks,
         CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
           / greatest(length(text), 1) AS digr
  FROM documents
),
derived AS (
  SELECT doc_id,
         CASE WHEN len(toks) < 20 THEN 'too_few_tokens'
              WHEN digr > 0.2 THEN 'too_many_digits'
              WHEN CAST(list_aggregate(list_transform(toks, t -> length(t)), 'sum') AS DOUBLE)
                   / greatest(len(toks), 1) < 3.0 THEN 'tokens_too_short'
         END AS reason
  FROM base
)
SELECT doc_id, reason IS NULL AS keep, coalesce(reason, 'ok') AS reason
FROM derived
"""


def x19_tf_idf(spark, sf_dir):
    """Sparse TF-IDF featurization (tf · ln(N/df), df ≥ 2)."""
    return textstats.tf_idf(_t(spark, sf_dir, "documents"))


X19_SQL = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), '\s+'), t -> t <> '')) AS token
  FROM documents
),
tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
dfreq AS (SELECT token, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2),
n AS (SELECT count(DISTINCT doc_id) AS n FROM documents)
SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
       round(tf.tf * ln(CAST(n.n AS DOUBLE) / dfreq.df), 6) AS tfidf
FROM tf JOIN dfreq USING (token) CROSS JOIN n
"""


def x20_frame_sample(spark, sf_dir):
    """Multimodal frame sampling: blob → every 2nd 256-byte frame via
    mapInPandas; compared on frame count + md5 of each frame's bytes."""
    docs = _t(spark, sf_dir, "documents")
    frames = multimodal.frame_sample(multimodal.attach_blob(docs))
    return frames.select(
        "doc_id", "frame_idx", F.md5("frame").alias("frame_md5")
    )


X20_SQL = """
WITH offs AS (
  SELECT doc_id, text,
         unnest(generate_series(1, greatest(length(text), 1), 256)) AS i
  FROM documents
)
SELECT doc_id, CAST((i - 1) // 256 AS BIGINT) AS frame_idx,
       md5(substring(text, i, 256)) AS frame_md5
FROM offs WHERE ((i - 1) // 256) % 2 = 0
"""


_NORM_TOKS_SQL = r"list_filter(regexp_split_to_array(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), '\s+'), t -> t <> '')"


def x21_chunk_documents(spark, sf_dir):
    """Context-window chunking: 100-token chunks, 20-token overlap."""
    from ..operators.chunking import chunk_documents

    return chunk_documents(_t(spark, sf_dir, "documents"))


X21_SQL = rf"""
WITH toked AS (
  SELECT doc_id, {_NORM_TOKS_SQL} AS tk FROM documents
),
idx AS (
  SELECT doc_id, tk,
         unnest(generate_series(0, CAST(greatest(ceil((len(tk) - 20) / 80.0), 1) AS BIGINT) - 1)) AS chunk_idx
  FROM toked
)
SELECT doc_id, chunk_idx,
       array_to_string(tk[chunk_idx * 80 + 1 : chunk_idx * 80 + 100], ' ') AS chunk_text,
       CAST(len(tk[chunk_idx * 80 + 1 : chunk_idx * 80 + 100]) AS INT) AS n_tokens
FROM idx
"""


def x22_pack_sequences(spark, sf_dir):
    """Token-budget sequence packing (512-token packs, id order)."""
    from ..operators.chunking import pack_sequences

    return pack_sequences(_t(spark, sf_dir, "documents"))


X22_SQL = rf"""
WITH sized AS (
  SELECT doc_id, len({_NORM_TOKS_SQL}) AS n_tokens FROM documents
),
cum AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
  FROM sized
)
SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
       CAST(floor((c - n_tokens) / 512.0) AS BIGINT) AS pack_id,
       CAST((c - n_tokens) % 512 AS BIGINT) AS pack_offset
FROM cum
"""


def x25_dedup_pipeline(spark, sf_dir):
    """End-to-end near-dup removal: candidate pairs → exact-Jaccard
    verification (≥ 0.5) → connected components → keep/drop per doc.

    Oracle-checkable since round 3: the catalog entry generates candidates
    with deterministic rare-shingle blocking (dedup.rare_shingle_pairs —
    hash-free, same fan-out bound as x67) instead of seeded MinHash-LSH,
    so the keep-set is exactly derivable by a DuckDB WITH RECURSIVE
    reachability oracle. The MinHash-LSH candidate generator remains the
    library's scale default for adversarial corpora and keeps its planted
    -dup pytest (x3); only the verification/clustering stages differ in
    nothing — both variants share them."""
    docs = _t(spark, sf_dir, "documents")
    cand = dedup.rare_shingle_pairs(docs)
    verified = dedup.ngram_jaccard_pairs(docs, cand).where(
        F.col("jaccard") >= 0.5
    )
    clusters = dedup.dedup_clusters(verified.select("id_a", "id_b"))
    return (
        docs.select("doc_id")
        .join(clusters, docs.doc_id == clusters.doc, "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
            (
                F.coalesce("cluster_id", F.col("doc_id")) == F.col("doc_id")
            ).alias("keep"),
        )
    )


def x23_stratified_sample(spark, sf_dir):
    """Deterministic stratified subsample: keep the first 20% of docs per
    language (doc_id order) — reproducible corpus downsampling (the seeded
    `sampleBy` analog whose sample is stable across engines/runs)."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("doc_id")
    n = Window.partitionBy("lang")
    return (
        docs.select(
            "doc_id",
            "lang",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(n).alias("n_lang"),
        )
        .where(F.col("rn") <= F.ceil(F.col("n_lang") * 0.2))
        .select("doc_id", "lang")
    )


X23_SQL = """
WITH ranked AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS n_lang
  FROM documents
)
SELECT doc_id, lang FROM ranked WHERE rn <= ceil(n_lang * 0.2)
"""


def x24_dataset_split(spark, sf_dir):
    """Stable train/val/test assignment from a content-independent hash of
    the id: bucket = md5 first-two-chars → 0..255; <5% val, <10% test,
    rest train. Identical assignment on any engine — the property that
    matters for split leakage audits."""
    docs = _t(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    bucket = (
        F.ascii(F.substring(h, 1, 1)) * 256 + F.ascii(F.substring(h, 2, 1))
    ) % 100
    split = (
        F.when(bucket < 5, "val").when(bucket < 15, "test").otherwise("train")
    )
    return docs.select("doc_id", split.alias("split")).groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_doc_id")
    )


X24_SQL = """
WITH assigned AS (
  SELECT doc_id,
         (ascii(substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 256
          + ascii(substring(md5(CAST(doc_id AS VARCHAR)), 2, 1))) % 100 AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < 5 THEN 'val' WHEN bucket < 15 THEN 'test'
            ELSE 'train' END AS split,
       count(*) AS n_docs, MIN(doc_id) AS min_doc_id
FROM assigned GROUP BY 1
"""


def x26_resize_images(spark, sf_dir):
    """Multimodal resize (stub decoder, nearest-neighbor byte sampling to
    16×8): compared on the md5 of the resized payload — the sampling index
    math is mirrored in plain SQL over the source text bytes."""
    docs = _t(spark, sf_dir, "documents")
    resized = multimodal.resize_images(
        multimodal.attach_blob(docs), width=16, height=8
    )
    return resized.select(
        "doc_id", "width", "height", F.md5("resized").alias("resized_md5")
    )


X26_SQL = """
WITH sampled AS (
  SELECT doc_id,
         array_to_string(
           list_transform(generate_series(0, 127),
                          i -> substring(text, 1 + (i * length(text)) // 128, 1)),
           '') AS resized
  FROM documents
)
SELECT doc_id, 16 AS width, 8 AS height, md5(resized) AS resized_md5
FROM sampled
"""


def x27_bloom_semi_join(spark, sf_dir):
    """Exact semi-join executed as bloom prune → semi join
    (operators/bloom.py): lineitem rows whose order is URGENT, aggregated
    by return flag. The bloom bitset filters the fact side above its scan,
    so the semi-join's exchange only carries surviving rows — the 100 TB
    shape for selective FK joins where the key side is too big to
    broadcast. Result is EXACT (the bloom's false positives are removed by
    the semi join), hence the plain IN-subquery oracle."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    kept = bloom.bloom_semi_join(li, o, "l_orderkey", "o_orderkey")
    return (
        kept.groupBy("l_returnflag")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


X27_SQL = """
SELECT l_returnflag,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_orderkey IN (
  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
)
GROUP BY l_returnflag
"""


def x28_repetition_stats(spark, sf_dir):
    """Intra-document repetition signals (textstats.repetition_stats):
    the published Gopher/RefinedWeb repetition filters, rounded to 4 dp
    for cross-engine comparability."""
    stats = textstats.repetition_stats(_t(spark, sf_dir, "documents"))
    return stats.select(
        "doc_id",
        "n_tokens",
        F.round("distinct_token_ratio", 4).alias("distinct_token_ratio"),
        F.round("top_token_frac", 4).alias("top_token_frac"),
        F.round("dup_bigram_frac", 4).alias("dup_bigram_frac"),
    )


X28_SQL = r"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\s+'),
                     x -> x <> '') AS t
  FROM documents
), tok AS (
  SELECT doc_id,
         unnest(t) AS tk,
         unnest(generate_series(1, len(t))) AS pos
  FROM base
), big AS (
  SELECT doc_id, tk,
         lead(tk) OVER (PARTITION BY doc_id ORDER BY pos) AS tk2
  FROM tok
), perdoc AS (
  SELECT doc_id,
         count(*) AS n_tokens,
         count(DISTINCT tk) AS n_distinct,
         count(tk2) AS n_bigrams,
         count(DISTINCT CASE WHEN tk2 IS NOT NULL
                             THEN tk || ' ' || tk2 END) AS n_distinct_bigrams
  FROM big GROUP BY doc_id
), topf AS (
  SELECT doc_id, max(c) AS top_c
  FROM (SELECT doc_id, tk, count(*) AS c FROM tok GROUP BY doc_id, tk)
  GROUP BY doc_id
)
SELECT p.doc_id,
       n_tokens,
       ROUND(n_distinct / CAST(n_tokens AS DOUBLE), 4) AS distinct_token_ratio,
       ROUND(top_c / CAST(n_tokens AS DOUBLE), 4) AS top_token_frac,
       CASE WHEN n_bigrams > 0
            THEN ROUND(1 - n_distinct_bigrams / CAST(n_bigrams AS DOUBLE), 4)
            ELSE 0.0 END AS dup_bigram_frac
FROM perdoc p JOIN topf USING (doc_id)
"""


def x29_incremental_dedup(spark, sf_dir):
    """Continuous-ingestion dedup (dedup.incremental_exact_dedup): odd
    doc_ids arrive as the new batch, even doc_ids are the historical
    corpus; survivors are batch docs (collapsed within-batch) whose
    normalized hash history has never seen."""
    docs = _t(spark, sf_dir, "documents")
    history = docs.where(F.col("doc_id") % 2 == 0)
    incoming = docs.where(F.col("doc_id") % 2 == 1)
    return dedup.incremental_exact_dedup(incoming, history)


X29_SQL = r"""
WITH hashed AS (
  SELECT doc_id,
         md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS ch
  FROM documents
), batch AS (
  SELECT ch AS content_hash, MIN(doc_id) AS keep_id, count(*) AS n_copies
  FROM hashed WHERE doc_id % 2 = 1 GROUP BY 1
)
SELECT content_hash, keep_id, n_copies
FROM batch
WHERE content_hash NOT IN (SELECT ch FROM hashed WHERE doc_id % 2 = 0)
"""


def x30_kmeans_cells(spark, sf_dir):
    """DataFrame-native k-means (operators/clustering.py): 3 Lloyd
    iterations over the embeddings, then the per-cell occupancy.

    Oracle-checkable since round 3 (the x13 determinism recipe): centroids
    seed from the k lowest vec_ids ("first" init — ORDER BY vec_id LIMIT k
    in SQL), distances HALF_UP-round to 6 decimals before each argmin, and
    centroid means round to 6 decimals after each update — so the Lloyd
    fixed point is identical across engines regardless of float partial-sum
    order, and the 3 iterations unroll into a DuckDB CTE chain
    (_kmeans_cells_sql). The seeded-hash init stays the default for
    library callers."""
    emb = _t(spark, sf_dir, "embeddings")
    model = clustering.kmeans_fit(
        emb, k=8, max_iter=3, init="first", round_decimals=6
    )
    return (
        clustering.assign_cells(emb, model.centroids, round_decimals=6)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


def _kmeans_cells_sql(k: int = 8, iters: int = 3, dec: int = 6) -> str:
    """Unrolled Lloyd iterations as a DuckDB CTE chain, mirroring
    clustering.kmeans_fit(init="first", round_decimals=dec) exactly:
    cent0 = k lowest-id vectors; per iteration assign (rounded dist²,
    lower-cid tie-break) then recompute rounded means (empty cells carry
    the previous centroid); a final assignment against cent{iters}
    mirrors assign_cells. Returns the CTE prefix ending with the final
    assignment CTE a{iters+1}(vec_id, cell)."""
    parts = [
        f"""WITH elem AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
kinit AS (
  SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid
  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k})
),
cent0 AS (SELECT n.cid, e.i, e.v AS c FROM elem e JOIN kinit n USING (vec_id))"""
    ]
    for t in range(1, iters + 2):
        p = t - 1
        parts.append(
            f"""d{t} AS (
  SELECT e.vec_id, c.cid, round(SUM((e.v - c.c) * (e.v - c.c)), {dec}) AS d
  FROM elem e JOIN cent{p} c ON e.i = c.i GROUP BY 1, 2
),
a{t} AS (
  SELECT vec_id, cid AS cell FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
    FROM d{t}
  ) WHERE rn = 1
)"""
        )
        if t <= iters:
            parts.append(
                f"""m{t} AS (
  SELECT a.cell AS cid, e.i, round(AVG(e.v), {dec}) AS c
  FROM elem e JOIN a{t} a USING (vec_id) GROUP BY 1, 2
),
cent{t} AS (
  SELECT p.cid, p.i, COALESCE(m.c, p.c) AS c
  FROM cent{p} p LEFT JOIN m{t} m ON m.cid = p.cid AND m.i = p.i
)"""
            )
    return ",\n".join(parts)


X30_SQL = f"""{_kmeans_cells_sql(8, 3, 6)}
SELECT CAST(cell AS INT) AS cell, count(*) AS n_vectors
FROM a4 GROUP BY 1
"""


def x31_hll_mergeable_sketches(spark, sf_dir):
    """Mergeable HLL sketches (Datasketches via hll_sketch_agg): per-type
    distinct-user sketches UNIONED into a global estimate without
    re-scanning — the re-aggregation property plain approx_count_distinct
    lacks, and the 100 TB shape for distinct counts over rollup
    hierarchies (sketch once per leaf, merge upward). Rows-only (estimator
    internals differ per engine); the companion pytest bounds the error
    against exact distinct counts."""
    ev = _t(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count(F.lit(1)).alias("n_events"),
    )
    leaf = per_type.select(
        "event_type",
        "n_events",
        F.hll_sketch_estimate("sk").alias("approx_users"),
    )
    total = per_type.agg(
        F.hll_union_agg("sk").alias("sk"), F.sum("n_events").alias("n_events")
    ).select(
        F.lit("__all__").alias("event_type"),
        "n_events",
        F.hll_sketch_estimate("sk").alias("approx_users"),
    )
    return leaf.unionAll(total)


def x32_expectations(spark, sf_dir):
    """Declarative data-quality gate (operators/expectations.py): every
    rule compiles into ONE aggregate pass; result is the per-rule
    violation count. On this clean testdata a negative rule (price
    capped at 1000) is included so the op demonstrably counts."""
    from ..operators.expectations import Expect, check_expectations

    o = _t(spark, sf_dir, "orders")
    rules = [
        Expect("o_orderkey", "unique"),
        Expect("o_custkey", "not_null"),
        Expect(
            "o_orderpriority",
            "in_set",
            ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"),
        ),
        Expect("o_totalprice", "between", (0.0, 1000.0)),
    ]
    return check_expectations(o, rules).select("rule", "violations")


X32_SQL = """
SELECT 'o_orderkey:unique' AS rule,
       CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS BIGINT) AS violations
FROM orders
UNION ALL
SELECT 'o_custkey:not_null',
       CAST(COALESCE(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT)
FROM orders
UNION ALL
SELECT 'o_orderpriority:in_set',
       CAST(COALESCE(SUM(CASE WHEN o_orderpriority IS NOT NULL
                               AND o_orderpriority NOT IN
            ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')
                              THEN 1 ELSE 0 END), 0) AS BIGINT)
FROM orders
UNION ALL
SELECT 'o_totalprice:between',
       CAST(COALESCE(SUM(CASE WHEN o_totalprice IS NOT NULL
                               AND (o_totalprice < 0.0 OR o_totalprice > 1000.0)
                              THEN 1 ELSE 0 END), 0) AS BIGINT)
FROM orders
"""


def x33_theta_set_sketches(spark, sf_dir):
    """Theta/KMV sketches (operators/theta.py): distinct event_ids per
    type (k=256 — smaller than the ~2000 true distinct, so the (k-1)/theta
    estimator is actually exercised), their union, and the INTERSECTION of
    click/view user sets — the set operation HLL (x31) cannot do. Rows-only
    (the estimator is hash-defined, not SQL-expressible); KMV over xxhash64
    is a pure set property, so results are partition-count-independent and
    cross-run stable. The companion pytest bounds every estimate against
    exact distinct counts."""
    ev = _t(spark, sf_dir, "events")
    sk = theta.theta_sketch(ev, ["event_type"], "event_id", k=256)
    leaf = sk.select(
        F.col("event_type").alias("set_name"),
        F.round(theta.theta_estimate(F.col("ks"), F.col("k")), 2).alias(
            "approx_distinct"
        ),
    )
    union = sk.agg(theta.theta_union_agg(F.col("ks"), 256).alias("ks")).select(
        F.lit("__union__").alias("set_name"),
        F.round(theta.theta_estimate(F.col("ks"), F.lit(256)), 2).alias(
            "approx_distinct"
        ),
    )
    usk = theta.theta_sketch(
        ev.where(F.col("event_type").isin("click", "view")),
        ["event_type"],
        "user_id",
        k=1024,
    )
    # pair the two 1-row sketches via conditional agg — no join needed
    inter = usk.agg(
        F.any_value(
            F.when(F.col("event_type") == "click", F.col("ks")), True
        ).alias("ks_a"),
        F.any_value(
            F.when(F.col("event_type") == "view", F.col("ks")), True
        ).alias("ks_b"),
    ).select(
        F.lit("click&view:user_id").alias("set_name"),
        F.round(
            theta.theta_intersect_estimate(
                F.col("ks_a"), F.col("ks_b"), F.lit(1024), F.lit(1024)
            ),
            2,
        ).alias("approx_distinct"),
    )
    return leaf.unionAll(union).unionAll(inter)


def x34_domain_caps(spark, sf_dir):
    """Per-domain quota (curation.cap_per_group): keep <= 15 docs per
    source, drawn by (md5(text), doc_id) so the selection is deterministic
    and content-unbiased — the C4/RefinedWeb-style cap that stops one hot
    domain from dominating the corpus. Bounded two-phase top-k, so a
    billion-row domain never funnels through one reducer."""
    d = _t(spark, sf_dir, "documents")
    return curation.cap_per_group(
        d, "source", 15, order_cols=[F.md5("text"), F.col("doc_id")]
    ).select(
        "source", "doc_id", F.col("group_rank").cast("bigint").alias("group_rank")
    )


X34_SQL = """
SELECT source, doc_id, CAST(rk AS BIGINT) AS group_rank
FROM (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source ORDER BY md5(text), doc_id) AS rk
  FROM documents
)
WHERE rk <= 15
"""


def x35_benchmark_contamination(spark, sf_dir):
    """Eval-leakage audit (curation.benchmark_contamination): docs with
    doc_id < 20 stand in for the benchmark; every other doc reports what
    fraction of its distinct 3-gram shingles appear anywhere in it. The
    benchmark side collapses to a broadcast shingle set, so the corpus
    side is one scan with a map-side probe — no corpus-text shuffle."""
    d = _t(spark, sf_dir, "documents")
    return curation.benchmark_contamination(
        d.where(F.col("doc_id") >= 20), d.where(F.col("doc_id") < 20)
    )


X35_SQL = r"""
WITH norm AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), '\s+'), t -> t <> '') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3
              THEN list_distinct([array_to_string(toks[i:i+2], ' ') for i in generate_series(1, len(toks) - 2)])
              ELSE [array_to_string(toks, ' ')]
         END AS sh
  FROM norm
),
bset AS (SELECT DISTINCT unnest(sh) AS s FROM sh WHERE doc_id < 20),
expl AS (SELECT doc_id, unnest(sh) AS s FROM sh WHERE doc_id >= 20),
hits AS (SELECT e.doc_id, count(*) AS n FROM expl e JOIN bset b USING (s) GROUP BY 1)
SELECT c.doc_id,
       CAST(len(c.sh) AS BIGINT) AS n_shingles,
       CAST(COALESCE(h.n, 0) AS BIGINT) AS n_contaminated,
       round(COALESCE(h.n, 0) * 1.0 / len(c.sh), 6) AS contamination_frac
FROM sh c LEFT JOIN hits h USING (doc_id)
WHERE c.doc_id >= 20
"""


def x36_semantic_dedup(spark, sf_dir):
    """SemDeDup-style semantic dedup (curation.semantic_dedup): k-means
    cells, then inside each cell drop every vector with a LOWER-id
    cell-mate at cosine >= 0.9 (one representative per near-dup
    neighborhood — a pure join, not a sequential greedy, so it is
    SQL-expressible). Oracle-checkable since round 3: the fit runs the
    same deterministic recipe as x30 ("first" init + 6-decimal rounding),
    and the cosine is rounded to 6 decimals before the threshold compare
    on both engines. Keep/drop semantics additionally pytest-covered with
    planted near-duplicate vectors."""
    emb = _t(spark, sf_dir, "embeddings")
    return curation.semantic_dedup(
        emb, k=8, threshold=0.9, max_iter=3, init="first", round_decimals=6
    )


X36_SQL = f"""{_kmeans_cells_sql(8, 3, 6)},
norms AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM elem GROUP BY 1),
cpairs AS (
  SELECT l.vec_id AS lv, r.vec_id AS rv
  FROM a4 l JOIN a4 r ON l.cell = r.cell AND r.vec_id < l.vec_id
),
cdots2 AS (
  SELECT c.lv, c.rv, SUM(x.v * y.v) AS dot
  FROM cpairs c
  JOIN elem x ON x.vec_id = c.lv
  JOIN elem y ON y.vec_id = c.rv AND y.i = x.i
  GROUP BY 1, 2
),
dropped AS (
  SELECT DISTINCT d.lv AS vid
  FROM cdots2 d
  JOIN norms nl ON nl.vec_id = d.lv
  JOIN norms nr ON nr.vec_id = d.rv
  WHERE nl.nrm > 0 AND nr.nrm > 0
    AND round(d.dot / (nl.nrm * nr.nrm), 6) >= 0.9
)
SELECT a.vec_id, CAST(a.cell AS INT) AS cell, dr.vid IS NULL AS keep
FROM a4 a LEFT JOIN dropped dr ON dr.vid = a.vec_id
"""


def x37_length_histogram(spark, sf_dir):
    """Sequence-length histogram (16-token buckets) — the planning input
    for sequence packing (x22): bucket shape decides pack budget and
    expected padding waste. Pure built-in expression pipeline over one
    scan; the groupBy shuffles only (bucket, count, sum) partials."""
    d = _t(spark, sf_dir, "documents")
    nt = F.size(textstats.tokens(textstats.normalize_text(F.col("text"))))
    return (
        d.select(
            (F.floor(nt / 16) * 16).cast("bigint").alias("bucket_lo"),
            nt.alias("nt"),
        )
        .groupBy("bucket_lo")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("nt").cast("bigint").alias("total_tokens"),
            F.round(F.avg("nt"), 6).alias("mean_tokens"),
        )
    )


X37_SQL = r"""
WITH norm AS (
  SELECT list_filter(regexp_split_to_array(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), '\s+'), t -> t <> '') AS toks
  FROM documents
),
n AS (SELECT len(toks) AS nt FROM norm)
SELECT CAST(nt // 16 * 16 AS BIGINT) AS bucket_lo,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(nt) AS BIGINT) AS total_tokens,
       round(avg(nt), 6) AS mean_tokens
FROM n GROUP BY 1
"""


def x38_collocation_pmi(spark, sf_dir):
    """Bigram collocation extraction by PMI (textstats.collocation_pmi):
    ln(p(w1,w2)/(p(w1)p(w2))) over normalized tokens, pairs seen ≥5
    times. min_count bounds the output, so the cross-engine compare
    never rides on double-keyed top-k selection."""
    return textstats.collocation_pmi(_t(spark, sf_dir, "documents"))


X38_SQL = r"""
WITH base AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), '\s+'), t -> t <> '') AS t
  FROM documents
), tok AS (
  SELECT doc_id, unnest(t) AS w, unnest(generate_series(1, len(t))) AS pos
  FROM base
), big AS (
  SELECT doc_id, w AS w1,
         lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM tok
), pairc AS (
  SELECT w1, w2, count(*) AS n_pair FROM big WHERE w2 IS NOT NULL GROUP BY 1, 2
), uni AS (
  SELECT w, count(*) AS c FROM tok GROUP BY 1
), tot AS (
  SELECT (SELECT CAST(sum(c) AS DOUBLE) FROM uni) AS n,
         (SELECT CAST(sum(n_pair) AS DOUBLE) FROM pairc) AS nb
)
SELECT w1, w2, n_pair, u1.c AS c1, u2.c AS c2,
       round(ln((CAST(n_pair AS DOUBLE) / nb)
                / ((CAST(u1.c AS DOUBLE) / n) * (CAST(u2.c AS DOUBLE) / n))), 6) AS pmi
FROM pairc
JOIN uni u1 ON pairc.w1 = u1.w
JOIN uni u2 ON pairc.w2 = u2.w
CROSS JOIN tot
WHERE n_pair >= 5
"""


def x39_unigram_logprob(spark, sf_dir):
    """Perplexity-proxy quality score (textstats.unigram_logprob): mean
    per-token ln((c+1)/(N+V)) under the corpus's own smoothed unigram
    model — the KenLM-filter stand-in; low scores flag rare-token soup."""
    return textstats.unigram_logprob(_t(spark, sf_dir, "documents"))


X39_SQL = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), '\s+'), t -> t <> '')) AS w
  FROM documents
), vocab AS (
  SELECT w, count(*) AS c FROM tok GROUP BY 1
), tot AS (
  SELECT CAST(sum(c) AS DOUBLE) AS n, CAST(count(*) AS DOUBLE) AS v FROM vocab
)
SELECT doc_id,
       count(*) AS n_tokens,
       round(avg(ln((CAST(c AS DOUBLE) + 1.0) / (n + 1.0 * v))), 4) AS mean_logprob
FROM tok JOIN vocab USING (w) CROSS JOIN tot
GROUP BY doc_id
"""


def x40_weighted_sample(spark, sf_dir):
    """Weighted sample without replacement (curation.weighted_sample):
    10 docs per language by sequential Poisson sampling, weight =
    length(text)+1 — longer docs proportionally likelier, yet the draw
    is a pure function of doc_id (engine/run/partitioning reproducible)."""
    d = _t(spark, sf_dir, "documents")
    return curation.weighted_sample(
        d.select(
            "doc_id", "lang", (F.length("text") + 1).cast("bigint").alias("w")
        ),
        k=10,
        weight_col=F.col("w"),
        strata_col="lang",
    )


_X40_U = " + ".join(
    # Horner would nest 6 deep; the positional-weight sum is the same
    # exact integer and keeps the SQL readable.
    f"(ascii(substring(h, {i}, 1)) - CASE WHEN ascii(substring(h, {i}, 1)) >= 97 "
    f"THEN 87 ELSE 48 END) * {16 ** (6 - i)}"
    for i in range(1, 7)
)

X40_SQL = f"""
WITH base AS (
  SELECT doc_id, lang, CAST(length(text) + 1 AS BIGINT) AS w,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents
), pri AS (
  SELECT doc_id, lang, w,
         CAST({_X40_U} AS DOUBLE) / CAST(w AS DOUBLE) AS pri
  FROM base
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY lang ORDER BY pri, doc_id) AS rn
  FROM pri
)
SELECT doc_id, lang, w, pri FROM ranked WHERE rn <= 10
"""


def x41_heavy_hitters(spark, sf_dir):
    """Heavy-hitter tokens (operators/heavyhitters.py): Misra-Gries
    candidate sketch per partition + exact recount — returns EXACTLY the
    tokens with frequency >= ceil(0.002·N), so the sketch inside is
    invisible to the oracle. The wide long-tail shuffle never happens:
    candidates are bounded at k per partition."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        F.explode(
            textstats.tokens(textstats.normalize_text(F.col("text")))
        ).alias("token")
    )
    return (
        heavyhitters.heavy_hitters(tok, "token", k=999, min_frac=0.002)
        .withColumnRenamed("item", "token")
    )


X41_SQL = r"""
WITH tok AS (
  SELECT unnest(list_filter(regexp_split_to_array(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), '\s+'), t -> t <> '')) AS token
  FROM documents
), tot AS (SELECT count(*) AS n FROM tok)
SELECT token, CAST(count(*) AS BIGINT) AS cnt
FROM tok CROSS JOIN tot
GROUP BY token, tot.n
HAVING count(*) >= ceil(0.002 * n)
"""


def x42_label_centroid_similarity(spark, sf_dir):
    """Embedding-space separability audit: cosine similarity between
    per-label centroids — high off-diagonal cosine flags label classes a
    classifier (or dedup threshold) cannot separate. posexplode →
    (label, dim) avg is map-side combinable and the pair join carries
    only labels²·d centroid cells, never vectors; the corpus is read
    once. Rounded to 4 dp so float partial-sum order cannot leak."""
    emb = _t(spark, sf_dir, "embeddings")
    pos = emb.select("label", F.posexplode("embedding").alias("pos", "val"))
    cent = pos.groupBy("label", "pos").agg(F.avg("val").alias("c"))
    a = cent.select(F.col("label").alias("la"), "pos", F.col("c").alias("ca"))
    b = cent.select(F.col("label").alias("lb"), "pos", F.col("c").alias("cb"))
    return (
        a.join(b, "pos")
        .where(F.col("la") < F.col("lb"))
        .groupBy("la", "lb")
        .agg(
            F.round(
                F.sum(F.col("ca") * F.col("cb"))
                / (
                    F.sqrt(F.sum(F.col("ca") * F.col("ca")))
                    * F.sqrt(F.sum(F.col("cb") * F.col("cb")))
                ),
                4,
            ).alias("cosine")
        )
    )


X42_SQL = """
WITH pos AS (
  SELECT label,
         unnest(embedding) AS val,
         unnest(generate_series(1, len(embedding))) AS pos
  FROM embeddings
), cent AS (
  SELECT label, pos, avg(CAST(val AS DOUBLE)) AS c FROM pos GROUP BY 1, 2
)
SELECT a.label AS la, b.label AS lb,
       round(sum(a.c * b.c)
             / (sqrt(sum(a.c * a.c)) * sqrt(sum(b.c * b.c))), 4) AS cosine
FROM cent a JOIN cent b USING (pos)
WHERE a.label < b.label
GROUP BY 1, 2
"""


def x44_pq_ann(spark, sf_dir):
    """Product-quantization ANN: 64-dim vectors compressed to 16 4-bit
    codes, ADC shortlist + exact re-rank, top-5 for query vectors 0-4
    (operators/pq.py).

    Oracle-checkable since round 3 (the x30 recipe scaled up): with
    round_decimals=6 every float step — normalized inputs, per-iteration
    Lloyd distances and means, ADC lookup entries and sums — rounds
    half-away to 6 dp, so the whole pipeline (codebook training on the
    deterministic 2048-row sample, nearest-code encoding, compressed
    shortlist, exact re-rank) replays bit-for-bit in _pq_ann_sql's
    unrolled CTE chain. The unrounded configuration stays the library
    default with its recall pytest."""
    from ..operators.pq import pq_topk

    return pq_topk(
        _t(spark, sf_dir, "embeddings"), QUERY_IDS, k=5, round_decimals=6
    )


def _pq_ann_sql(
    m: int = 16,
    kc: int = 16,
    dsub: int = 4,
    iters: int = 10,
    sample: int = 2048,
    k: int = 5,
    refine: int = 8,
    dec: int = 6,
    qids: str = "0, 1, 2, 3, 4",
) -> str:
    """Unrolled PQ pipeline as a DuckDB CTE chain mirroring
    pq.pq_topk(round_decimals=dec) exactly: normalize+round → per-subspace
    Lloyd (np.linspace "evenly spaced" init over the id-ordered sample,
    rounded distances with lower-code tie-break, rounded means, empty
    cells carry the previous centroid) → encode full corpus → rounded
    ADC lookup sums → top-(k·refine) shortlist → exact cosine re-rank on
    the RAW vectors (the X7 pattern). MATERIALIZED keeps each Lloyd
    layer computed once."""
    parts = [
        f"""WITH elem AS MATERIALIZED (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) - 1 AS i
  FROM embeddings
),
nrm AS MATERIALIZED (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM elem GROUP BY 1),
nv AS MATERIALIZED (
  SELECT e.vec_id, e.i // {dsub} AS j, e.i % {dsub} AS p,
         round(e.v / CASE WHEN n.nrm = 0 THEN 1 ELSE n.nrm END, {dec}) AS v
  FROM elem e JOIN nrm n USING (vec_id)
),
sn AS MATERIALIZED (
  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS rn
  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {sample})
),
scount AS (SELECT count(*) AS n FROM sn),
ii AS (
  SELECT t.c,
         CASE WHEN t.c = {kc - 1} THEN s.n - 1
              ELSE CAST(trunc(t.c * (CAST(s.n - 1 AS DOUBLE) / {kc - 1}.0)) AS BIGINT)
         END AS rn
  FROM range({kc}) t(c), scount s
),
sv AS MATERIALIZED (SELECT nv.* FROM nv JOIN sn USING (vec_id)),
cb0 AS MATERIALIZED (
  SELECT ii.c, nv.j, nv.p, nv.v AS w
  FROM ii JOIN sn ON sn.rn = ii.rn JOIN nv ON nv.vec_id = sn.vec_id
)"""
    ]
    for t in range(1, iters + 1):
        p = t - 1
        parts.append(
            f"""d{t} AS (
  SELECT s.vec_id, s.j, c.c, round(SUM((s.v - c.w) * (s.v - c.w)), {dec}) AS d
  FROM sv s JOIN cb{p} c ON c.j = s.j AND c.p = s.p
  GROUP BY 1, 2, 3
),
a{t} AS (
  SELECT vec_id, j, c FROM (
    SELECT vec_id, j, c,
           row_number() OVER (PARTITION BY vec_id, j ORDER BY d, c) AS rn
    FROM d{t}) WHERE rn = 1
),
u{t} AS (
  SELECT a.j, a.c, s.p, round(avg(s.v), {dec}) AS w
  FROM a{t} a JOIN sv s ON s.vec_id = a.vec_id AND s.j = a.j
  GROUP BY 1, 2, 3
),
cb{t} AS MATERIALIZED (
  SELECT pr.c, pr.j, pr.p, coalesce(u.w, pr.w) AS w
  FROM cb{p} pr LEFT JOIN u{t} u ON u.j = pr.j AND u.c = pr.c AND u.p = pr.p
)"""
        )
    parts.append(
        f"""ed AS (
  SELECT n.vec_id, n.j, c.c, round(SUM((n.v - c.w) * (n.v - c.w)), {dec}) AS d
  FROM nv n JOIN cb{iters} c ON c.j = n.j AND c.p = n.p
  GROUP BY 1, 2, 3
),
codes AS MATERIALIZED (
  SELECT vec_id, j, c AS code FROM (
    SELECT vec_id, j, c,
           row_number() OVER (PARTITION BY vec_id, j ORDER BY d, c) AS rn
    FROM ed) WHERE rn = 1
),
lut AS MATERIALIZED (
  SELECT q.vec_id AS query_id, c.j, c.c,
         round(SUM((c.w - q.v) * (c.w - q.v)), {dec}) AS ld
  FROM nv q JOIN cb{iters} c ON c.j = q.j AND c.p = q.p
  WHERE q.vec_id IN ({qids})
  GROUP BY 1, 2, 3
),
adc AS (
  SELECT l.query_id, cd.vec_id AS neighbor_id, round(SUM(l.ld), {dec}) AS adc_dist
  FROM codes cd JOIN lut l ON l.j = cd.j AND l.c = cd.code
  WHERE cd.vec_id <> l.query_id
  GROUP BY 1, 2
),
short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id ORDER BY adc_dist, neighbor_id) AS rn
    FROM adc) WHERE rn <= {k * refine}
),
dots AS (
  SELECT s.query_id, s.neighbor_id, SUM(q.v * n.v) AS dot
  FROM short s
  JOIN elem q ON q.vec_id = s.query_id
  JOIN elem n ON n.vec_id = s.neighbor_id AND n.i = q.i
  GROUP BY 1, 2
),
sims AS (
  SELECT d.query_id, d.neighbor_id, round(d.dot / (nq.nrm * nc.nrm), 6) AS cosine
  FROM dots d
  JOIN nrm nq ON d.query_id = nq.vec_id
  JOIN nrm nc ON d.neighbor_id = nc.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
  FROM sims
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {k}"""
    )
    return ",\n".join(parts)


X44_SQL = _pq_ann_sql()


def x43_substring_dupes(spark, sf_dir):
    """Span-level duplicate fingerprints: 40-char windows occurring in
    ≥2 distinct documents (see dedup.substring_duplicate_spans)."""
    return dedup.substring_duplicate_spans(_t(spark, sf_dir, "documents"))


X43_SQL = """
SELECT md5(substr(text, pos, 40)) AS gram,
       count(DISTINCT doc_id) AS n_docs,
       min(doc_id) AS first_doc,
       count(*) AS n_occurrences
FROM (
  SELECT doc_id, text,
         unnest(generate_series(1, length(text) - 39)) AS pos
  FROM documents WHERE length(text) >= 40
)
GROUP BY 1
HAVING count(DISTINCT doc_id) >= 2
"""


def x45_bm25_scores(spark, sf_dir):
    """Okapi BM25 retrieval over documents for a fixed query-term bag —
    the length-normalized lexical ranker (first-stage retrieval for RAG
    and curation). Built-in expressions only; df/corpus stats broadcast
    (operators/textstats.bm25_scores)."""
    return textstats.bm25_scores(
        _t(spark, sf_dir, "documents"), ["spark", "join", "window"]
    )


X45_SQL = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), '\s+'), t -> t <> '')) AS token
  FROM documents
),
-- derive dl from documents (not tok) so zero-token docs keep dl=0 and
-- enter avgdl exactly as the Spark side's token_count-over-all-docs does
dl AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), '\s+'), t -> t <> '')) AS dl
  FROM documents
),
matched AS (
  SELECT doc_id, token, count(*) AS tf FROM tok
  WHERE token IN ('spark', 'join', 'window') GROUP BY 1, 2
),
dfreq AS (SELECT token, count(DISTINCT doc_id) AS df FROM matched GROUP BY 1),
stats AS (
  SELECT (SELECT count(DISTINCT doc_id) FROM documents) AS n,
         (SELECT avg(dl) FROM dl) AS avgdl
)
SELECT m.doc_id,
       round(SUM(ln((s.n - f.df + 0.5) / (f.df + 0.5) + 1)
                 * m.tf * 2.2
                 / (m.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))), 6) AS bm25,
       count(*) AS n_matched_terms
FROM matched m
JOIN dfreq f USING (token)
JOIN dl d USING (doc_id)
CROSS JOIN stats s
GROUP BY m.doc_id
ORDER BY bm25 DESC, m.doc_id
LIMIT 20
"""


def x46_split_drift(spark, sf_dir):
    """Distribution-drift audit between hash-assigned train and test
    splits: per-language share in each split plus the (add-one smoothed)
    KL(train‖test) contribution — the pre-training sanity check that a
    deterministic split did not skew a covariate. Scale notes: two
    map-side-combinable counts over the scan; the per-split totals and
    the language universe are broadcast-sized; nothing shuffles document
    text."""
    docs = _t(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    bucket = (
        F.ascii(F.substring(h, 1, 1)) * 256 + F.ascii(F.substring(h, 2, 1))
    ) % 100
    split = (
        F.when(bucket < 5, "val").when(bucket < 15, "test").otherwise("train")
    )
    counts = (
        docs.select(split.alias("split"), "lang")
        .where(F.col("split") != "val")
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    langs = docs.select("lang").distinct()
    n_langs = langs.count()
    grid = langs.crossJoin(
        counts.select("split").distinct()
    )
    full = grid.join(counts, ["split", "lang"], "left").fillna(0, ["n"])
    totals = full.groupBy("split").agg(F.sum("n").alias("tot"))
    smoothed = full.join(F.broadcast(totals), "split").select(
        "lang",
        "split",
        "n",
        ((F.col("n") + 1) / (F.col("tot") + n_langs)).alias("p"),
    )
    tr = smoothed.where(F.col("split") == "train").select(
        "lang", F.col("n").alias("n_train"), F.col("p").alias("p_tr")
    )
    te = smoothed.where(F.col("split") == "test").select(
        "lang", F.col("n").alias("n_test"), F.col("p").alias("p_te")
    )
    return (
        tr.join(te, "lang")
        .select(
            "lang",
            "n_train",
            "n_test",
            F.round("p_tr", 6).alias("p_train"),
            F.round("p_te", 6).alias("p_test"),
            F.round(
                F.col("p_tr") * F.log(F.col("p_tr") / F.col("p_te")), 6
            ).alias("kl_term"),
        )
        .orderBy("lang")
    )


X46_SQL = """
WITH assigned AS (
  SELECT lang,
         CASE WHEN b < 5 THEN 'val' WHEN b < 15 THEN 'test' ELSE 'train' END AS split
  FROM (
    SELECT lang,
           (ascii(substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 256
            + ascii(substring(md5(CAST(doc_id AS VARCHAR)), 2, 1))) % 100 AS b
    FROM documents
  )
),
langs AS (SELECT DISTINCT lang FROM documents),
nl AS (SELECT count(*) AS n_langs FROM langs),
counts AS (
  SELECT s.split, l.lang, COALESCE(c.n, 0) AS n
  FROM (SELECT DISTINCT split FROM assigned WHERE split <> 'val') s
  CROSS JOIN langs l
  LEFT JOIN (
    SELECT split, lang, count(*) AS n FROM assigned
    WHERE split <> 'val' GROUP BY 1, 2
  ) c ON c.split = s.split AND c.lang = l.lang
),
totals AS (SELECT split, SUM(n) AS tot FROM counts GROUP BY 1),
sm AS (
  SELECT c.lang, c.split, c.n,
         (c.n + 1) / (t.tot + nl.n_langs) AS p
  FROM counts c JOIN totals t USING (split) CROSS JOIN nl
)
SELECT tr.lang,
       tr.n AS n_train,
       te.n AS n_test,
       round(tr.p, 6) AS p_train,
       round(te.p, 6) AS p_test,
       round(tr.p * ln(tr.p / te.p), 6) AS kl_term
FROM (SELECT * FROM sm WHERE split = 'train') tr
JOIN (SELECT * FROM sm WHERE split = 'test') te USING (lang)
ORDER BY tr.lang
"""


def x47_pagerank(spark, sf_dir):
    """PageRank (damping 0.85, 5 fixed power iterations) over the
    symmetric customer↔supplier trade graph derived from
    orders⋈lineitem — link analysis for corpus/citation graphs, here
    exercised on the relational testdata. Fixed iterations keep the
    computation expressible as an unrolled CTE chain for the oracle
    (operators/graph.py)."""
    from ..operators.graph import pagerank

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
    )
    edges = pairs.union(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return pagerank(edges, damping=0.85, iterations=5, top_k=50)


def _pr_iter_sql(prev: str, cur: str) -> str:
    return f"""
{cur} AS (
  SELECT n.node,
         (1 - 0.85) / any_value(nn.n)
         + 0.85 * COALESCE(SUM(p.r / d.outdeg), 0) AS r
  FROM nodes n
  CROSS JOIN nn
  LEFT JOIN edges e ON e.dst = n.node
  LEFT JOIN {prev} p ON p.node = e.src
  LEFT JOIN deg d ON d.src = e.src
  GROUP BY n.node
)"""


X47_SQL = (
    """
WITH pairs AS (
  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
edges AS (SELECT src, dst FROM pairs UNION SELECT dst, src FROM pairs),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
nn AS (SELECT count(*) AS n FROM nodes),
deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
r0 AS (SELECT node, 1.0 / nn.n AS r FROM nodes CROSS JOIN nn),"""
    + ",".join(_pr_iter_sql(f"r{i}", f"r{i + 1}") for i in range(5))
    + """
SELECT node, round(r, 6) AS pagerank
FROM r5 ORDER BY pagerank DESC, node LIMIT 50
"""
)


def x48_ab_welch_ttest(spark, sf_dir):
    """A/B experiment readout: users split into two variants by id
    parity; per event_type the per-variant sample stats plus Welch's
    t statistic and degrees of freedom over `value` — the unequal-
    variance two-sample test every experimentation platform computes.
    Scale notes: one map-side-combinable conditional aggregate per
    event_type (count/avg/var_samp under CASE); the t/dof arithmetic is
    a scalar projection over the G-row aggregate. Nothing but
    (event_type, value, parity) ever shuffles."""
    ev = _t(spark, sf_dir, "events")
    va = F.when(F.col("user_id") % 2 == 0, F.col("value"))
    vb = F.when(F.col("user_id") % 2 == 1, F.col("value"))
    agg = ev.groupBy("event_type").agg(
        F.count(va).alias("n_a"),
        F.count(vb).alias("n_b"),
        F.avg(va).alias("m_a"),
        F.avg(vb).alias("m_b"),
        F.var_samp(va).alias("v_a"),
        F.var_samp(vb).alias("v_b"),
    )
    se_a = F.col("v_a") / F.col("n_a")
    se_b = F.col("v_b") / F.col("n_b")
    t = (F.col("m_a") - F.col("m_b")) / F.sqrt(se_a + se_b)
    dof = (se_a + se_b) * (se_a + se_b) / (
        se_a * se_a / (F.col("n_a") - 1) + se_b * se_b / (F.col("n_b") - 1)
    )
    return agg.select(
        "event_type",
        "n_a",
        "n_b",
        F.round("m_a", 4).alias("mean_a"),
        F.round("m_b", 4).alias("mean_b"),
        F.round("v_a", 4).alias("var_a"),
        F.round("v_b", 4).alias("var_b"),
        F.round(t, 4).alias("welch_t"),
        F.round(dof, 2).alias("welch_dof"),
    ).orderBy("event_type")


X48_SQL = """
WITH agg AS (
  SELECT event_type,
         count(CASE WHEN user_id % 2 = 0 THEN value END) AS n_a,
         count(CASE WHEN user_id % 2 = 1 THEN value END) AS n_b,
         avg(CASE WHEN user_id % 2 = 0 THEN value END) AS m_a,
         avg(CASE WHEN user_id % 2 = 1 THEN value END) AS m_b,
         var_samp(CASE WHEN user_id % 2 = 0 THEN value END) AS v_a,
         var_samp(CASE WHEN user_id % 2 = 1 THEN value END) AS v_b
  FROM events GROUP BY event_type
)
SELECT event_type, n_a, n_b,
       round(m_a, 4) AS mean_a,
       round(m_b, 4) AS mean_b,
       round(v_a, 4) AS var_a,
       round(v_b, 4) AS var_b,
       round((m_a - m_b) / sqrt(v_a / n_a + v_b / n_b), 4) AS welch_t,
       round((v_a / n_a + v_b / n_b) * (v_a / n_a + v_b / n_b)
             / ((v_a / n_a) * (v_a / n_a) / (n_a - 1)
                + (v_b / n_b) * (v_b / n_b) / (n_b - 1)), 2) AS welch_dof
FROM agg ORDER BY event_type
"""


def x49_mmr_rerank(spark, sf_dir):
    """Maximal-marginal-relevance diversified top-10 for query vector 0
    (λ=0.7 over an exact top-50 shortlist).

    Oracle-checkable since round 3: the greedy selection — sequential in
    k but over a BOUNDED 50-candidate shortlist — replays in X49_SQL as a
    recursive CTE (one selected id per iteration, the chosen set carried
    as a list column); pairwise sims follow the identical float path in
    both engines (dot/(na·nb), 6-dp half-away rounding), so the walk and
    scores match bit-for-bit (operators/simsearch.mmr_topk)."""
    return simsearch.mmr_topk(_t(spark, sf_dir, "embeddings"), query_id=0, k=10)


X49_SQL = """
WITH RECURSIVE
elem AS MATERIALIZED (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
norms AS MATERIALIZED (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM elem GROUP BY 1),
qdots AS MATERIALIZED (
  SELECT c.vec_id AS neighbor_id, SUM(q.v * c.v) AS dot
  FROM elem q JOIN elem c ON q.i = c.i AND c.vec_id <> 0
  WHERE q.vec_id = 0
  GROUP BY 1
),
cand AS MATERIALIZED (
  SELECT neighbor_id, rel FROM (
    SELECT d.neighbor_id,
           round(d.dot / (nq.nrm * nc.nrm), 6) AS rel,
           row_number() OVER (ORDER BY round(d.dot / (nq.nrm * nc.nrm), 6) DESC, d.neighbor_id) AS rn
    FROM qdots d
    JOIN norms nq ON nq.vec_id = 0
    JOIN norms nc ON d.neighbor_id = nc.vec_id
  ) WHERE rn <= 50
),
-- MATERIALIZED + the celem pre-filter matter: the recursive term below
-- re-executes inlined CTEs on EVERY iteration, and an inlined pdots
-- (full-elem self-join with IN subqueries) costs ~19 s/iter at sf0.1
-- vs 0.2 s total in this shape.
celem AS MATERIALIZED (
  SELECT e.* FROM elem e WHERE e.vec_id IN (SELECT neighbor_id FROM cand)
),
pdots AS MATERIALIZED (
  SELECT a.vec_id AS ida, b.vec_id AS idb, SUM(a.v * b.v) AS dot
  FROM celem a JOIN celem b ON a.i = b.i AND a.vec_id <> b.vec_id
  GROUP BY 1, 2
),
psim AS MATERIALIZED (
  SELECT d.ida, d.idb, round(d.dot / (na.nrm * nb.nrm), 6) AS sim
  FROM pdots d
  JOIN norms na ON d.ida = na.vec_id
  JOIN norms nb ON d.idb = nb.vec_id
),
sel(rank, ids, vec_id, relevance, mmr_score) AS (
  (SELECT 1, [c.neighbor_id], c.neighbor_id, c.rel, round(0.7 * c.rel, 6)
   FROM cand c ORDER BY 0.7 * c.rel DESC, c.neighbor_id LIMIT 1)
  UNION ALL
  (SELECT s.rank + 1, list_append(s.ids, pick.nid), pick.nid, pick.rel, pick.score
   FROM sel s CROSS JOIN LATERAL (
     SELECT c.neighbor_id AS nid, c.rel,
            round(0.7 * c.rel - 0.3 * pen.mx, 6) AS score
     FROM cand c CROSS JOIN LATERAL (
       SELECT max(p.sim) AS mx FROM psim p
       WHERE p.ida = c.neighbor_id AND list_contains(s.ids, p.idb)
     ) pen
     WHERE NOT list_contains(s.ids, c.neighbor_id)
     ORDER BY 0.7 * c.rel - 0.3 * pen.mx DESC, c.neighbor_id LIMIT 1
   ) pick
   WHERE s.rank < 10)
)
SELECT CAST(rank AS INT) AS rank, vec_id, relevance, mmr_score FROM sel
"""


def x50_mixture_allocation(spark, sf_dir):
    """Temperature-scaled pre-training mixture (T=2, the flattening
    multilingual-sampling setting): per-source sampling share ∝
    token_share^(1/T) and a largest-remainder integer budget of 1000
    docs (operators/curation.mixture_allocation)."""
    return curation.mixture_allocation(
        _t(spark, sf_dir, "documents"), budget=1000, temperature=2.0
    )


X50_SQL = r"""
WITH g AS (
  SELECT source,
         count(*) AS n_docs,
         CAST(SUM(len(list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> ''))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1
),
tot AS (SELECT SUM(n_tokens) AS tot FROM g),
wtd AS (
  SELECT source, n_docs, n_tokens,
         pow(n_tokens / tot.tot, 1.0 / 2.0) AS w
  FROM g CROSS JOIN tot
),
ws AS (SELECT SUM(w) AS ws FROM wtd),
scored AS (
  SELECT source, n_docs, n_tokens,
         w / ws.ws AS p,
         floor(w / ws.ws * 1000) AS base,
         w / ws.ws * 1000 - floor(w / ws.ws * 1000) AS frac
  FROM wtd CROSS JOIN ws
),
ranked AS (
  SELECT *,
         row_number() OVER (ORDER BY frac DESC, source) AS fr,
         1000 - SUM(base) OVER () AS short
  FROM scored
)
SELECT source, n_docs, n_tokens,
       round(p, 6) AS p,
       CAST(base + CASE WHEN fr <= short THEN 1 ELSE 0 END AS BIGINT) AS alloc_docs
FROM ranked ORDER BY source
"""


def x51_within_label_topk(spark, sf_dir):
    """Label-coherence audit: the 3 most-similar embedding pairs within
    each label among SIGN-BUCKET COLLIDING candidates (which clusters
    hide near-identical vectors). Candidates are blocked on (label,
    8-bit sign bucket of the first 8 dims) — near-identical vectors
    collide by construction, so the audit's target pairs survive while
    the pair space is Σ per-(label,bucket)², not Σ per-label² (measured
    17.3× superlinear at 10× before the sign blocking, 256× fewer pairs
    after). The sign bucket is plain comparisons — deterministic and
    oracle-expressible, unlike seeded-hyperplane LSH. Cosine is
    JVM-side; the per-label top-3 is a window over the label
    partition."""
    from ..functions.vectors import cosine_from_norms, l2_norm

    emb = _t(spark, sf_dir, "embeddings")
    # F.get is null-safe past the array end (short vectors) — the NULL
    # comparison coalesces to 0, exactly the SQL CASE's ELSE branch
    bucket = sum(
        F.coalesce((F.get("embedding", i) >= 0).cast("int"), F.lit(0))
        * (1 << i)
        for i in range(8)
    ).alias("bkt")
    # norms once per vector, not per pair (bit-identical cosine)
    a = emb.select(
        "label", bucket, F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("va"),
    ).withColumn("na", l2_norm(F.col("va")))
    b = emb.select(
        "label", bucket, F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vb"),
    ).withColumn("nb", l2_norm(F.col("vb")))
    pairs = a.join(b, ["label", "bkt"]).where(F.col("id_a") < F.col("id_b"))
    sim = F.round(
        cosine_from_norms(F.col("va"), F.col("vb"), F.col("na"), F.col("nb")), 6
    )
    from pyspark.sql import Window

    w = Window.partitionBy("label").orderBy(
        F.desc("cosine"), "id_a", "id_b"
    )
    return (
        pairs.select("label", "id_a", "id_b", sim.alias("cosine"))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 3)
        .select("label", "id_a", "id_b", "cosine", "rank")
    )


X51_SQL = """
WITH bkt AS (
  SELECT vec_id, label,
         (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END)
         + (CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END)
         + (CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END)
         + (CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END)
         + (CASE WHEN embedding[5] >= 0 THEN 16 ELSE 0 END)
         + (CASE WHEN embedding[6] >= 0 THEN 32 ELSE 0 END)
         + (CASE WHEN embedding[7] >= 0 THEN 64 ELSE 0 END)
         + (CASE WHEN embedding[8] >= 0 THEN 128 ELSE 0 END) AS bkt
  FROM embeddings
),
elem AS (
  SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
norms AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM elem GROUP BY 1),
cand AS (
  SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b
  FROM bkt a JOIN bkt b ON a.label = b.label AND a.bkt = b.bkt
                       AND a.vec_id < b.vec_id
),
dots AS (
  SELECT c.label, c.id_a, c.id_b, SUM(ea.v * eb.v) AS dot
  FROM cand c
  JOIN elem ea ON ea.vec_id = c.id_a
  JOIN elem eb ON eb.vec_id = c.id_b AND eb.i = ea.i
  GROUP BY 1, 2, 3
),
sims AS (
  SELECT d.label, d.id_a, d.id_b,
         round(d.dot / (na.nrm * nb.nrm), 6) AS cosine
  FROM dots d
  JOIN norms na ON d.id_a = na.vec_id
  JOIN norms nb ON d.id_b = nb.vec_id
),
ranked AS (
  SELECT label, id_a, id_b, cosine,
         CAST(ROW_NUMBER() OVER (PARTITION BY label
                                 ORDER BY cosine DESC, id_a, id_b) AS INT) AS rank
  FROM sims
)
SELECT label, id_a, id_b, cosine, rank FROM ranked WHERE rank <= 3
"""


def x52_bigram_entropy(spark, sf_dir):
    """Corpus bigram conditional entropy H(next|prev) in nats, plus the
    implied perplexity — the single-number language-model audit that
    complements x38's per-pair PMI and x39's unigram log-prob (a
    repetitive/templated corpus shows anomalously low H). Conditional
    distribution is normalized by the PREFIX bigram total (Σ_b n(a,b)),
    not the unigram count, so it sums to 1 exactly.

    Scale notes: the bigram and prefix aggregates are map-side
    combinable (vocab-sized shuffles, never documents); the entropy is
    ONE 1-row aggregate; join prefix→pairs is AQE-broadcastable."""
    from ..operators.textstats import normalize_text, tokens
    from ..operators.dedup import _fan_out
    from pyspark.sql import Window

    tok = _fan_out(_t(spark, sf_dir, "documents")).select(
        F.col("doc_id").alias("doc"),
        F.posexplode(tokens(normalize_text(F.col("text")))).alias("pos", "w"),
    )
    w = Window.partitionBy("doc").orderBy("pos")
    pairc = (
        tok.select("doc", "w", F.lead("w", 1).over(w).alias("w2"))
        .where(F.col("w2").isNotNull())
        .groupBy(F.col("w").alias("w1"), "w2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
    )
    prefix = pairc.groupBy("w1").agg(F.sum("n_pair").alias("pc"))
    tot = pairc.agg(F.sum("n_pair").cast("double").alias("nb"))
    return (
        pairc.join(prefix, "w1")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.count(F.lit(1)).alias("n_distinct_bigrams"),
            F.sum("n_pair").alias("n_bigrams"),
            F.round(
                -F.sum(
                    (F.col("n_pair") / F.col("nb"))
                    * F.log(F.col("n_pair") / F.col("pc"))
                ),
                6,
            ).alias("cond_entropy_nats"),
        )
        .select(
            "n_distinct_bigrams",
            "n_bigrams",
            "cond_entropy_nats",
            F.round(F.exp("cond_entropy_nats"), 4).alias("perplexity"),
        )
    )


X52_SQL = r"""
WITH base AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), '\s+'), t -> t <> '') AS t
  FROM documents
), tok AS (
  SELECT doc_id, unnest(t) AS w, unnest(generate_series(1, len(t))) AS pos
  FROM base
), big AS (
  SELECT doc_id, w AS w1,
         lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM tok
), pairc AS (
  SELECT w1, w2, count(*) AS n_pair FROM big WHERE w2 IS NOT NULL GROUP BY 1, 2
), prefix AS (
  SELECT w1, sum(n_pair) AS pc FROM pairc GROUP BY 1
), tot AS (
  SELECT CAST(sum(n_pair) AS DOUBLE) AS nb FROM pairc
), ent AS (
  SELECT count(*) AS n_distinct_bigrams,
         CAST(sum(n_pair) AS BIGINT) AS n_bigrams,
         round(-sum((n_pair / tot.nb) * ln(n_pair / CAST(pc AS DOUBLE))), 6)
           AS cond_entropy_nats
  FROM pairc JOIN prefix USING (w1) CROSS JOIN tot
  GROUP BY tot.nb
)
SELECT n_distinct_bigrams, n_bigrams, cond_entropy_nats,
       round(exp(cond_entropy_nats), 4) AS perplexity
FROM ent
"""


def x53_split_leakage(spark, sf_dir):
    """Split-leakage audit: documents whose normalized 160-char OPENING
    PASSAGE lands in BOTH the train and test splits of the x24 hash
    assignment — the exact-dup counterpart of x46's distribution drift
    (leaked content inflates eval). The prefix fingerprint (vs whole-doc
    hash) catches shared boilerplate/header contamination and keeps the
    audit non-vacuous at small SF, where full-content duplicates don't
    exist; whole-doc leakage is a strict subset of prefix leakage. Scale
    notes: one (hash, split) aggregate — the shuffle carries md5+counts,
    never text; the HAVING-both filter is a 2-value conditional count on
    the same aggregate, no self-join."""
    docs = _t(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    bucket = (
        F.ascii(F.substring(h, 1, 1)) * 256 + F.ascii(F.substring(h, 2, 1))
    ) % 100
    split = (
        F.when(bucket < 5, "val").when(bucket < 15, "test").otherwise("train")
    )
    content = F.md5(
        F.substring(
            F.trim(
                F.regexp_replace(
                    F.regexp_replace(
                        F.lower(F.col("text")), "[^a-z0-9\\s]", " "
                    ),
                    "\\s+",
                    " ",
                )
            ),
            1,
            160,
        )
    )
    return (
        docs.select(content.alias("content_hash"), split.alias("split"), "doc_id")
        .where(F.col("split") != "val")
        .groupBy("content_hash")
        .agg(
            F.sum((F.col("split") == "train").cast("int")).alias("n_train"),
            F.sum((F.col("split") == "test").cast("int")).alias("n_test"),
            F.min(F.when(F.col("split") == "train", F.col("doc_id"))).alias(
                "train_doc"
            ),
            F.min(F.when(F.col("split") == "test", F.col("doc_id"))).alias(
                "test_doc"
            ),
        )
        .where((F.col("n_train") > 0) & (F.col("n_test") > 0))
        .orderBy("content_hash")
    )


X53_SQL = r"""
WITH assigned AS (
  SELECT doc_id,
         md5(substring(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), 1, 160)) AS content_hash,
         CASE WHEN b < 5 THEN 'val' WHEN b < 15 THEN 'test' ELSE 'train' END AS split
  FROM (
    SELECT doc_id, text,
           (ascii(substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 256
            + ascii(substring(md5(CAST(doc_id AS VARCHAR)), 2, 1))) % 100 AS b
    FROM documents
  )
)
SELECT content_hash,
       CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
       CAST(SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test,
       MIN(CASE WHEN split = 'train' THEN doc_id END) AS train_doc,
       MIN(CASE WHEN split = 'test' THEN doc_id END) AS test_doc
FROM assigned
WHERE split <> 'val'
GROUP BY content_hash
HAVING SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) > 0
   AND SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) > 0
ORDER BY content_hash
"""


def x54_int8_quantization_audit(spark, sf_dir):
    """Embedding int8-quantization error audit: per label, the mean and
    max per-vector MSE of symmetric per-vector int8 quantization
    (scale = 127/max|v|, the faiss/sentence-transformers convention) —
    the go/no-go check before shipping a 4× smaller vector index.
    All math is JVM-side array lambdas over the scan (no UDF, no
    shuffle of vectors — only (label, mse) pairs aggregate)."""
    emb = _t(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    mx = F.array_max(F.transform(v, F.abs))
    scale = F.lit(127.0) / F.col("mx")
    err_sq = F.transform(
        F.col("v"),
        lambda x: F.pow(x - F.round(x * scale) / scale, 2),
    )
    mse = F.aggregate(err_sq, F.lit(0.0), lambda a, x: a + x) / F.size("v")
    return (
        emb.select("label", v.alias("v"), mx.alias("mx"))
        .where(F.col("mx") > 0)
        .select("label", mse.alias("mse"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("mse"), 8).alias("mean_mse"),
            F.round(F.max("mse"), 8).alias("max_mse"),
        )
        .orderBy("label")
    )


X54_SQL = """
WITH prep AS (
  SELECT label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
         list_aggregate(list_transform(embedding,
                                       x -> abs(CAST(x AS DOUBLE))),
                        'max') AS mx
  FROM embeddings
),
scored AS (
  SELECT label,
         list_aggregate(list_transform(v,
             x -> pow(x - round(x * (127.0 / mx)) / (127.0 / mx), 2)),
           'sum') / len(v) AS mse
  FROM prep WHERE mx > 0
)
SELECT label,
       count(*) AS n_vecs,
       round(avg(mse), 8) AS mean_mse,
       round(max(mse), 8) AS max_mse
FROM scored GROUP BY label ORDER BY label
"""


def x55_countmin_freq(spark, sf_dir):
    """Count-min sketch frequency estimation (operators/countmin.py):
    build a 4x512 md5-hashed grid over the whitespace-token stream of
    `documents`, then point-query it for the 20 exact-top tokens and
    report estimate vs truth. The sketch shuffle is capped at
    depth*width rows no matter the corpus size — the frequency profile
    to reach for when even a Misra-Gries candidate set would be too
    big. Fully oracle-checked: the md5 bucket fold replays bit-for-bit
    in DuckDB."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        F.explode(
            textstats.tokens(textstats.normalize_text(F.col("text")))
        ).alias("token")
    )
    sketch = countmin.cm_build(tok, "token", depth=4, width=512)
    top = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .orderBy(F.desc("true_cnt"), "token")
        .limit(20)
    )
    est = countmin.cm_estimate(sketch, top, "token", width=512, depth=4)
    return (
        top.join(est, "token")
        .select("token", "true_cnt", "est_cnt")
        .orderBy(F.desc("true_cnt"), "token")
    )


X55_SQL = r"""
WITH tok AS (
  SELECT unnest(list_filter(regexp_split_to_array(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), '\s+'), t -> t <> '')) AS token
  FROM documents
),
depths AS (SELECT unnest(range(4)) AS depth),
hashed AS (
  SELECT depth, token, md5(depth || ':' || token) AS h
  FROM tok CROSS JOIN depths
),
cells AS (
  SELECT depth,
         ((ascii(substring(h, 1, 1)) - CASE WHEN ascii(substring(h, 1, 1)) >= 97 THEN 87 ELSE 48 END) * 4096
          + (ascii(substring(h, 2, 1)) - CASE WHEN ascii(substring(h, 2, 1)) >= 97 THEN 87 ELSE 48 END) * 256
          + (ascii(substring(h, 3, 1)) - CASE WHEN ascii(substring(h, 3, 1)) >= 97 THEN 87 ELSE 48 END) * 16
          + (ascii(substring(h, 4, 1)) - CASE WHEN ascii(substring(h, 4, 1)) >= 97 THEN 87 ELSE 48 END)) % 512 AS bucket,
         count(*) AS cnt
  FROM hashed
  GROUP BY 1, 2
),
top AS (
  SELECT token, count(*) AS true_cnt FROM tok GROUP BY token
  ORDER BY true_cnt DESC, token LIMIT 20
),
probe_h AS (
  SELECT t.token, t.true_cnt, d.depth, md5(d.depth || ':' || t.token) AS h
  FROM top t CROSS JOIN depths d
),
probe AS (
  SELECT token, true_cnt, depth,
         ((ascii(substring(h, 1, 1)) - CASE WHEN ascii(substring(h, 1, 1)) >= 97 THEN 87 ELSE 48 END) * 4096
          + (ascii(substring(h, 2, 1)) - CASE WHEN ascii(substring(h, 2, 1)) >= 97 THEN 87 ELSE 48 END) * 256
          + (ascii(substring(h, 3, 1)) - CASE WHEN ascii(substring(h, 3, 1)) >= 97 THEN 87 ELSE 48 END) * 16
          + (ascii(substring(h, 4, 1)) - CASE WHEN ascii(substring(h, 4, 1)) >= 97 THEN 87 ELSE 48 END)) % 512 AS bucket
  FROM probe_h
)
SELECT p.token, p.true_cnt, MIN(COALESCE(c.cnt, 0)) AS est_cnt
FROM probe p LEFT JOIN cells c USING (depth, bucket)
GROUP BY p.token, p.true_cnt
ORDER BY p.true_cnt DESC, p.token
"""


def x56_compression_signal(spark, sf_dir):
    """Compression-ratio quality signal (textstats.compression_signal):
    zlib-compressed length / raw length per document — the classic
    cheap proxy for boilerplate and low-entropy junk (highly repetitive
    text compresses far below ~0.5). Arrow-batched mapInPandas, one
    scan, no shuffle; rows-only check (no zlib in the oracle), with the
    monotonicity semantics pinned in pytest."""
    return textstats.compression_signal(_t(spark, sf_dir, "documents"))


def x57_triangle_count(spark, sf_dir):
    """Global triangle count (operators/graph.py:triangle_count) over the
    supplier co-occurrence graph (suppliers sharing an order, from
    lineitem's self-join on l_orderkey) — the clustering/community
    density primitive for corpus-similarity and citation graphs.
    Degree-ordered edge orientation bounds wedge generation at O(m^1.5)
    where a hub node would otherwise go quadratic; the oracle is the
    canonical a<b<c triple-join count."""
    from ..operators.graph import triangle_count

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    a = li.withColumnsRenamed({"l_suppkey": "src"})
    b = li.withColumnsRenamed({"l_suppkey": "dst"})
    edges = a.join(b, "l_orderkey").where(F.col("src") < F.col("dst"))
    return triangle_count(edges.select("src", "dst"))


X57_SQL = """
WITH e AS (
  SELECT DISTINCT a.l_suppkey AS a, b.l_suppkey AS b
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
),
nodes AS (
  SELECT count(DISTINCT n) AS n_nodes
  FROM (SELECT a AS n FROM e UNION ALL SELECT b AS n FROM e)
),
edges AS (SELECT count(*) AS n_edges FROM e),
tris AS (
  SELECT count(*) AS n_triangles
  FROM e e1
  JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
  JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
)
SELECT n_nodes, n_edges, n_triangles FROM nodes, edges, tris
"""


def x58_quantile_sketch(spark, sf_dir):
    """Mergeable KLL/MRL-style quantile sketch (operators/quantiles.py):
    p50/p90/p99 of events.value from a bounded compactor sketch built
    map-side per Arrow batch and tree-merged — the persist-and-re-aggregate
    quantile primitive the sketch family was missing (HLL/theta give
    distincts, count-min frequencies; this gives rank statistics that
    merge across days/partitions without re-scanning). Rows-only (the
    compaction rule is not SQL-expressible); the companion pytest bounds
    rank error against exact quantiles and pins merge associativity."""
    from ..operators import quantiles

    ev = _t(spark, sf_dir, "events").select("value")
    sk = quantiles.quantile_sketch(ev, "value", k=200)
    return quantiles.sketch_quantiles(sk, [0.5, 0.9, 0.99], k=200).select(
        "prob", F.round("approx_value", 4).alias("approx_value")
    )


def x59_embedding_dim_stats(spark, sf_dir):
    """Per-dimension embedding statistics (mean/std/min/max) — the
    feature-normalization pre-pass for training (z-scoring a corpus of
    vectors needs per-dim moments first). posexplode fans each vector into
    (dim, value) rows whose groupBy(dim) partially aggregates map-side, so
    the shuffle carries |dims| rows per task, never vectors; at 100 TB this
    is one scan + a 64-key exchange. Values cast to double BEFORE
    aggregation so both engines sum in double precision."""
    emb = _t(spark, sf_dir, "embeddings")
    exploded = emb.select(
        F.posexplode("embedding").alias("pos", "v")
    ).select((F.col("pos") + 1).alias("dim"), F.col("v").cast("double").alias("v"))
    return (
        exploded.groupBy("dim")
        .agg(
            F.round(F.avg("v"), 4).alias("mean_v"),
            F.round(F.stddev_samp("v"), 4).alias("std_v"),
            F.round(F.min("v"), 4).alias("min_v"),
            F.round(F.max("v"), 4).alias("max_v"),
        )
    )


X59_SQL = """
-- "+ 0" collapses IEEE -0.0 (DuckDB round keeps the sign of a tiny
-- negative mean; Spark's round yields +0.0)
SELECT dim,
       round(avg(v), 4) + 0 AS mean_v,
       round(stddev_samp(v), 4) + 0 AS std_v,
       round(min(v), 4) + 0 AS min_v,
       round(max(v), 4) + 0 AS max_v
FROM (
  SELECT generate_subscripts(embedding, 1) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
)
GROUP BY dim
"""


def x60_fuzzy_entity_match(spark, sf_dir):
    """Record linkage (operators/linkage.py): near-duplicate part names
    1-3 Levenshtein edits apart within first-token blocks — the
    entity-resolution primitive (catalog/vendor-feed reconciliation).
    Two-stage, and the staging IS the scale design: rows dedup to
    DISTINCT-name entities first (a map-side-combinable groupBy — 64
    entities here at every SF), THEN the blocked fuzzy self-join runs
    over entities, so candidate pairs are bounded by vocab², independent
    of row count. Linking raw part rows instead re-creates a
    quadratic-in-n pair set (measured 15k pairs at sf0.01 → 1.5M at
    sf0.1 on this catalog's 64-name vocabulary) for zero extra
    information — n_linked_rows carries the row-level multiplicity.
    Exact-duplicate names (edit 0) stay on the cheaper exact-dedup path
    (x1)."""
    from ..operators import linkage

    part = _t(spark, sf_dir, "part")
    names = part.groupBy("p_name").agg(
        F.min("p_partkey").alias("nid"), F.count(F.lit(1)).alias("n_rows")
    )
    pairs = linkage.blocked_fuzzy_pairs(
        names, "nid", "p_name", F.split(F.col("p_name"), " ").getItem(0)
    )
    a = names.select(F.col("nid").alias("a_id"), F.col("n_rows").alias("a_rows"))
    b = names.select(F.col("nid").alias("b_id"), F.col("n_rows").alias("b_rows"))
    return (
        pairs.join(F.broadcast(a), "a_id")
        .join(F.broadcast(b), "b_id")
        .select(
            "blk",
            "a_id",
            "b_id",
            "edit_distance",
            (F.col("a_rows") * F.col("b_rows")).alias("n_linked_rows"),
        )
    )


X60_SQL = """
WITH names AS (
  SELECT p_name, min(p_partkey) AS nid, count(*) AS n_rows
  FROM part GROUP BY p_name
),
b AS (SELECT nid, p_name, n_rows, split_part(p_name, ' ', 1) AS blk FROM names)
SELECT a.blk AS blk, a.nid AS a_id, c.nid AS b_id,
       levenshtein(a.p_name, c.p_name) AS edit_distance,
       a.n_rows * c.n_rows AS n_linked_rows
FROM b a JOIN b c
  ON a.blk = c.blk AND a.nid < c.nid
WHERE levenshtein(a.p_name, c.p_name) BETWEEN 1 AND 3
"""


def x61_k_anonymity(spark, sf_dir):
    """k-anonymity release gate (operators/quality.py): class-size
    histogram over the customer quasi-identifiers (nation, segment,
    balance band) with the under-k risk flag — the governance audit
    that complements PII scrubbing (x16) before a dataset ships. Two
    map-side-combinable rollups; shuffles carry per-class then per-size
    rows only."""
    from ..operators.quality import k_anonymity_histogram

    cust = _t(spark, sf_dir, "customer")
    return k_anonymity_histogram(
        cust,
        {
            "nation": F.col("c_nationkey"),
            "segment": F.col("c_mktsegment"),
            "bal_band": F.floor(F.col("c_acctbal") / 2000),
        },
        k=4,
    )


X61_SQL = """
WITH classes AS (
  SELECT c_nationkey AS nation, c_mktsegment AS segment,
         floor(c_acctbal / 2000) AS bal_band, count(*) AS class_size
  FROM customer GROUP BY 1, 2, 3
)
SELECT class_size, count(*) AS n_classes,
       class_size * count(*) AS n_rows,
       class_size < 4 AS at_risk
FROM classes GROUP BY class_size
"""


def x62_incremental_rollup(spark, sf_dir):
    """Incremental rollup maintenance (operators/incremental.py): the
    events KPI rollup built by folding three deterministic sub-batches
    through the partial-aggregate state — O(batch) per update instead of
    O(history), with the fold provably equal to the one-shot aggregate
    (this oracle row IS that proof: DuckDB computes the direct GROUP BY).
    All measures algebraic; each merge shuffles |keys| state rows only."""
    from ..operators import incremental as inc

    measures = {
        "n_events": ("count", "*"),
        "sum_value": ("sum", "value"),
        "min_value": ("min", "value"),
        "max_value": ("max", "value"),
        "avg_value": ("avg", "value"),
    }
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("day"),
        "value",
        F.pmod(F.col("event_id"), F.lit(3)).alias("_b"),
    )
    state = None
    for b in range(3):
        batch = ev.where(F.col("_b") == b).drop("_b")
        partials = inc.aggregate_partials(batch, ["event_type", "day"], measures)
        state = inc.merge_state(state, partials, ["event_type", "day"], measures)
    out = inc.render(state, measures)
    # avg from the ROUNDED sum (both engines divide bit-identical inputs —
    # raw-sum division straddled a .5 rounding boundary at sf0.01)
    return out.select(
        "event_type",
        "day",
        "n_events",
        F.round("sum_value", 4).alias("sum_value"),
        F.round("min_value", 4).alias("min_value"),
        F.round("max_value", 4).alias("max_value"),
        F.round(F.round("sum_value", 4) / F.col("n_events"), 4).alias("avg_value"),
    )


X62_SQL = """
SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_events,
       round(sum(value), 4) AS sum_value,
       round(min(value), 4) AS min_value,
       round(max(value), 4) AS max_value,
       round(round(sum(value), 4) / count(*), 4) AS avg_value
FROM events GROUP BY event_type, CAST(ts AS DATE)
"""


def x63_approx_groupby(spark, sf_dir):
    """Approximate query processing (operators/aqp.py): per-event-type
    revenue totals from a 10% Bernoulli sample with Horvitz-Thompson
    scale-up and 95% CIs — the interactive first pass at 100 TB (sample
    predicate pushed into the scan; the exact query is the same plan
    minus the sample). Rows-only: Spark's split-deterministic sampler is
    not reproducible in the oracle engine; the CI-coverage pytest pins
    the estimator semantics instead."""
    from ..operators.aqp import approx_groupby_sum

    ev = _t(spark, sf_dir, "events")
    out = approx_groupby_sum(ev, ["event_type"], "value", fraction=0.1, seed=42)
    return out.select(
        "event_type",
        "n_sampled",
        F.round("est_count", 2).alias("est_count"),
        F.round("est_total", 2).alias("est_total"),
        F.round("se_total", 2).alias("se_total"),
    )


def x64_group_quantiles(spark, sf_dir):
    """Per-group quantiles from keyed mergeable sketches
    (operators/quantiles.py:group_quantiles): p50/p90 of events.value per
    (event_type, day). Two-tier build — per-batch partial sketches
    map-side, sketch-only shuffle keyed by group — and the rank rule
    matches SQL quantile_disc EXACTLY while a group fits one uncompacted
    buffer (k=4096 ≥ max group 739 here), which is what makes this
    oracle row a hard equality check on the sketch machinery; larger
    groups degrade gracefully to ~log2(n/k)/k rank error (pytest covers
    that regime)."""
    from ..operators import quantiles

    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day"), "value"
    )
    return quantiles.group_quantiles(
        ev, ["event_type", "day"], "value", [0.5, 0.9], k=4096
    )


X64_SQL = """
SELECT event_type, CAST(ts AS DATE) AS day, CAST(0.5 AS DOUBLE) AS prob,
       quantile_disc(value, 0.5) AS approx_value
FROM events GROUP BY 1, 2
UNION ALL
SELECT event_type, CAST(ts AS DATE) AS day, CAST(0.9 AS DOUBLE) AS prob,
       quantile_disc(value, 0.9) AS approx_value
FROM events GROUP BY 1, 2
"""


def x65_event_trigrams(spark, sf_dir):
    """Sequential pattern mining, order 3: per-user event-type trigram
    counts (the length-3 extension of q43's Markov transitions —
    clickstream path mining for funnel design). Two leads inside ONE
    per-user window (partition = user_id, total-ordered by ts,event_id),
    so parallelism is #users and the shuffle carries (user, type, ts)
    only; the trigram rollup is map-side combinable. min_count prunes the
    long tail before it shuffles."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = ev.select(
        F.col("event_type").alias("step1"),
        F.lead("event_type", 1).over(w).alias("step2"),
        F.lead("event_type", 2).over(w).alias("step3"),
    ).where(F.col("step3").isNotNull())
    return (
        tri.groupBy("step1", "step2", "step3")
        .agg(F.count(F.lit(1)).alias("n_paths"))
        .where(F.col("n_paths") >= 10)
    )


X65_SQL = """
WITH tri AS (
  SELECT event_type AS step1,
         lead(event_type, 1) OVER w AS step2,
         lead(event_type, 2) OVER w AS step3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT step1, step2, step3, count(*) AS n_paths
FROM tri WHERE step3 IS NOT NULL
GROUP BY step1, step2, step3
HAVING count(*) >= 10
"""


def _geo_coord_sql(key_expr: str, salt: str, mod: int, div: int, shift: int) -> str:
    """SQL twin of the md5-derived synthetic coordinate (the x40
    hex-decode trick over md5(key || salt))."""
    h = f"md5(CAST({key_expr} AS VARCHAR) || '{salt}')"
    u = " + ".join(
        f"(ascii(substring({h}, {i}, 1)) - CASE WHEN ascii(substring({h}, {i}, 1)) >= 97 "
        f"THEN 87 ELSE 48 END) * {16 ** (6 - i)}"
        for i in range(1, 7)
    )
    return f"(CAST(({u}) % {mod} AS DOUBLE) / {div} - {shift})"


def x66_geo_radius_join(spark, sf_dir):
    """Geospatial radius join (operators/geo.py): customers to suppliers
    within 150 km over md5-derived synthetic coordinates (lat ±45, lon
    ±180 — the testdata carries no geo columns, so coordinates are a
    deterministic pure function of the keys, reproduced exactly by the
    oracle). The engine runs the GRID form (3×3 neighbor cells, Σ|cell|²
    candidates); the oracle runs the naive quadratic radius join — a pass
    proves the grid loses no pairs, the j9 verification pattern."""
    from ..operators.curation import _hex_uniform_int
    from ..operators.geo import grid_radius_join

    def coords(df, key, prefix):
        k = F.col(key)
        lat = (
            _hex_uniform_int(F.concat(k.cast("string"), F.lit("-lat"))) % 90000
        ).cast("double") / 1000 - 45
        lon = (
            _hex_uniform_int(F.concat(k.cast("string"), F.lit("-lon"))) % 360000
        ).cast("double") / 1000 - 180
        return df.select(k.alias("id"), lat.alias("lat"), lon.alias("lon"))

    cust = coords(_t(spark, sf_dir, "customer"), "c_custkey", "c")
    supp = coords(_t(spark, sf_dir, "supplier"), "s_suppkey", "s")
    pairs = grid_radius_join(cust, supp, radius_km=150.0, cell_deg=2.0, max_abs_lat=45.0)
    return pairs.select(
        F.col("l_id").alias("c_custkey"),
        F.col("r_id").alias("s_suppkey"),
        F.round("dist_km", 3).alias("dist_km"),
    )


X66_SQL = f"""
WITH cust AS (
  SELECT c_custkey,
         {_geo_coord_sql('c_custkey', '-lat', 90000, 1000, 45)} AS lat,
         {_geo_coord_sql('c_custkey', '-lon', 360000, 1000, 180)} AS lon
  FROM customer
), supp AS (
  SELECT s_suppkey,
         {_geo_coord_sql('s_suppkey', '-lat', 90000, 1000, 45)} AS lat,
         {_geo_coord_sql('s_suppkey', '-lon', 360000, 1000, 180)} AS lon
  FROM supplier
), pairs AS (
  SELECT c_custkey, s_suppkey,
         2 * 6371.0 * asin(sqrt(
           sin(radians(s.lat - c.lat) / 2) * sin(radians(s.lat - c.lat) / 2)
           + cos(radians(c.lat)) * cos(radians(s.lat))
             * sin(radians(s.lon - c.lon) / 2) * sin(radians(s.lon - c.lon) / 2)
         )) AS dist_km
  FROM cust c CROSS JOIN supp s
)
SELECT c_custkey, s_suppkey, round(dist_km, 3) AS dist_km
FROM pairs WHERE dist_km <= 150.0
"""


def x67_dedup_components(spark, sf_dir):
    """Standalone connected-components dedup (operators/dedup.py:
    blocked_dedup_components): rare-shingle blocking (df in [2,5] —
    fan-out bounded by C(5,2) per shingle, never quadratic) → exact
    3-shingle Jaccard confirm at 0.3 → transitive closure via
    distributed label propagation. Every stage is deterministic, so the
    full iterative algorithm is hash-verified against a DuckDB
    WITH RECURSIVE reachability oracle — upgrading the components step
    that x25 could only rows-only-check."""
    return dedup.blocked_dedup_components(_t(spark, sf_dir, "documents"))


X67_SQL = rf"""
WITH RECURSIVE norm AS MATERIALIZED (
  SELECT doc_id, {_X67_NORM} AS toks FROM documents
),
shn AS MATERIALIZED (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3
              THEN list_distinct([array_to_string(toks[i:i+2], ' ') for i in generate_series(1, len(toks) - 2)])
              WHEN len(toks) > 0
              THEN [array_to_string(toks, ' ')]
              ELSE CAST([] AS VARCHAR[])
         END AS sh
  FROM norm
),
flat AS MATERIALIZED (SELECT DISTINCT doc_id, unnest(sh) AS s FROM shn),
rare AS MATERIALIZED (SELECT s FROM flat GROUP BY s HAVING count(*) BETWEEN 2 AND 5),
cand AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
  FROM flat a JOIN rare USING (s) JOIN flat b USING (s)
  WHERE a.doc_id < b.doc_id
),
conf AS MATERIALIZED (
  SELECT ia, ib
  FROM cand JOIN shn x ON x.doc_id = ia JOIN shn y ON y.doc_id = ib
  WHERE round(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
        / len(list_distinct(list_concat(x.sh, y.sh))), 6) >= 0.3
),
edges AS MATERIALIZED (SELECT ia AS a, ib AS b FROM conf UNION SELECT ib, ia FROM conf),
reach AS (
  SELECT a AS node, a AS r FROM edges
  UNION
  SELECT e.a AS node, reach.r AS r FROM edges e JOIN reach ON reach.node = e.b
)
SELECT node AS doc, MIN(r) AS cluster_id FROM reach GROUP BY node
"""

# x25's oracle: the same blocked-components chain at confirm threshold 0.5,
# projected to a keep/drop decision for EVERY document (docs outside any
# confirmed component keep themselves). The Jaccard is rounded to 6 decimals
# before the threshold compare to mirror ngram_jaccard_pairs exactly.
X25_SQL = rf"""
WITH RECURSIVE norm AS MATERIALIZED (
  SELECT doc_id, {_X67_NORM} AS toks FROM documents
),
shn AS MATERIALIZED (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3
              THEN list_distinct([array_to_string(toks[i:i+2], ' ') for i in generate_series(1, len(toks) - 2)])
              WHEN len(toks) > 0
              THEN [array_to_string(toks, ' ')]
              ELSE CAST([] AS VARCHAR[])
         END AS sh
  FROM norm
),
flat AS MATERIALIZED (SELECT DISTINCT doc_id, unnest(sh) AS s FROM shn),
rare AS MATERIALIZED (SELECT s FROM flat GROUP BY s HAVING count(*) BETWEEN 2 AND 5),
cand AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
  FROM flat a JOIN rare USING (s) JOIN flat b USING (s)
  WHERE a.doc_id < b.doc_id
),
conf AS MATERIALIZED (
  SELECT ia, ib
  FROM cand JOIN shn x ON x.doc_id = ia JOIN shn y ON y.doc_id = ib
  WHERE round(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
        / len(list_distinct(list_concat(x.sh, y.sh))), 6) >= 0.5
),
edges AS MATERIALIZED (SELECT ia AS a, ib AS b FROM conf UNION SELECT ib, ia FROM conf),
reach AS (
  SELECT a AS node, a AS r FROM edges
  UNION
  SELECT e.a AS node, reach.r AS r FROM edges e JOIN reach ON reach.node = e.b
),
comp AS MATERIALIZED (SELECT node AS doc, MIN(r) AS cluster_id FROM reach GROUP BY node)
SELECT d.doc_id,
       COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
       COALESCE(c.cluster_id, d.doc_id) = d.doc_id AS keep
FROM documents d LEFT JOIN comp c ON c.doc = d.doc_id
"""


def x68_dup_ngram_coverage(spark, sf_dir):
    """Per-doc duplicate-5-gram coverage fraction (operators/dedup.py:
    duplicate_ngram_coverage) — the RefinedWeb/MassiveText
    "fraction of tokens inside duplicated n-grams" quality signal,
    computed cross-corpus: positioned shingles once via posexplode+LEAD,
    df aggregate on (shingle, doc) pairs, bounded position fan-out for
    coverage. Text never moves after the scan."""
    return dedup.duplicate_ngram_coverage(_t(spark, sf_dir, "documents"))


X68_SQL = rf"""
WITH norm AS (
  SELECT doc_id, {_X67_NORM} AS toks FROM documents
),
shp AS (
  SELECT doc_id, i, array_to_string(toks[i:i+4], ' ') AS s
  FROM norm, unnest(generate_series(1, greatest(len(toks) - 4, 0))) AS u(i)
),
dup AS (
  SELECT s FROM (SELECT DISTINCT doc_id, s FROM shp) GROUP BY s HAVING count(*) >= 2
),
cov AS (
  SELECT doc_id, count(DISTINCT cp) AS dup_tokens
  FROM (SELECT doc_id, unnest(generate_series(i, i + 4)) AS cp
        FROM shp SEMI JOIN dup USING (s))
  GROUP BY doc_id
)
SELECT n.doc_id, len(n.toks) AS n_tokens,
       coalesce(c.dup_tokens, 0) AS dup_tokens,
       round(CAST(coalesce(c.dup_tokens, 0) AS DOUBLE) / len(n.toks), 6) AS dup_frac
FROM norm n LEFT JOIN cov c USING (doc_id)
WHERE len(n.toks) > 0
"""


def x69_inverted_index(spark, sf_dir):
    """Inverted-index artifact (operators/textstats.inverted_index):
    per-term df, collection frequency, and ascending doc-id posting
    list, with a RELATIVE df cutoff (terms in > 90% of docs are
    stopword-class and never materialize a list). Only (term, doc, tf)
    rows shuffle; text stays at the scan."""
    return textstats.inverted_index(_t(spark, sf_dir, "documents"))


X69_SQL = rf"""
WITH tok AS (
  SELECT doc_id, unnest({_X67_NORM}) AS term FROM documents
),
tf AS (
  SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2
)
SELECT term,
       count(*) AS df,
       CAST(sum(tf) AS BIGINT) AS cf,
       string_agg(doc_id, ',' ORDER BY doc_id) AS postings
FROM tf
GROUP BY term
HAVING count(*) >= 2
   AND count(*) <= 0.9 * (SELECT count(*) FROM documents)
"""


def x70_ndcg_eval(spark, sf_dir):
    """Retrieval-quality eval (operators/textstats.ndcg_eval): NDCG@10
    of the BM25 ranking per single-term query with graded relevance =
    term frequency — the metric watched when tuning k1/b. Same query
    bag as x45; windows partition by term, so parallelism is bounded by
    |queries|, each partition carrying only (term, doc, tf, dl) rows."""
    return textstats.ndcg_eval(
        _t(spark, sf_dir, "documents"), ["spark", "join", "window"]
    )


X70_SQL = rf"""
WITH tok AS (
  SELECT doc_id, toks FROM (SELECT doc_id, {_X67_NORM} AS toks FROM documents)
),
flat AS (
  SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM tok
),
tf AS (
  SELECT term, doc_id, dl, count(*) AS tf
  FROM flat WHERE term IN ('spark', 'join', 'window')
  GROUP BY 1, 2, 3
),
dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
stats AS (SELECT count(*) AS n, avg(len(toks)) AS avgdl FROM tok),
scored AS (
  SELECT t.term, t.doc_id, t.tf AS rel,
         ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1)
           * t.tf * 2.2 / (t.tf + 1.2 * (1 - 0.75 + 0.75 * t.dl / s.avgdl)) AS score
  FROM tf t JOIN dfx d USING (term) CROSS JOIN stats s
),
ranked AS (
  SELECT term, rel,
         row_number() OVER (PARTITION BY term ORDER BY score DESC, doc_id) AS rk,
         row_number() OVER (PARTITION BY term ORDER BY rel DESC, doc_id) AS irk
  FROM scored
)
SELECT term,
       count(*) AS n_candidates,
       round(sum(CASE WHEN rk <= 10 THEN rel / log2(rk + 1.0) ELSE 0 END)
             / sum(CASE WHEN irk <= 10 THEN rel / log2(irk + 1.0) ELSE 0 END), 6) AS ndcg
FROM ranked
GROUP BY term
"""


def x71_materialize_mixture(spark, sf_dir):
    """Mixture MATERIALIZATION (curation.materialize_mixture): actually
    draw the temperature-scaled per-source quotas x50 plans — broadcast
    G-row allocation joined to docs, deterministic md5 priority,
    variable-quota two-phase bounded top-k. Same (T=2, budget=1000)
    settings as x50, so the drawn counts reconcile with its plan."""
    return curation.materialize_mixture(
        _t(spark, sf_dir, "documents"), budget=1000, temperature=2.0
    )


X71_SQL = rf"""
WITH g AS (
  SELECT source,
         count(*) AS n_docs,
         SUM(len(list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> ''))) AS n_tokens
  FROM documents GROUP BY 1
),
tot AS (SELECT SUM(n_tokens) AS tot FROM g),
wtd AS (
  SELECT source, n_docs, n_tokens, pow(n_tokens / tot.tot, 1.0 / 2.0) AS w
  FROM g CROSS JOIN tot
),
ws AS (SELECT SUM(w) AS ws FROM wtd),
scored AS (
  SELECT source,
         floor(w / ws.ws * 1000) AS base,
         w / ws.ws * 1000 - floor(w / ws.ws * 1000) AS frac
  FROM wtd CROSS JOIN ws
),
alloc AS (
  SELECT source,
         CAST(base + CASE WHEN row_number() OVER (ORDER BY frac DESC, source)
                          <= 1000 - SUM(base) OVER () THEN 1 ELSE 0 END AS BIGINT) AS alloc_docs
  FROM scored
),
pri AS (
  SELECT source, doc_id, md5(CAST(doc_id AS VARCHAR) || '-mix') AS h
  FROM documents
),
drawn AS (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source ORDER BY ({_X40_U}), doc_id) AS rn
  FROM pri
)
SELECT d.source, d.doc_id, CAST(d.rn AS BIGINT) AS draw_rank
FROM drawn d JOIN alloc a USING (source)
WHERE d.rn <= a.alloc_docs
"""


def x72_purged_temporal_split(spark, sf_dir):
    """Leakage-safe TEMPORAL train/test split with a purge embargo (the
    financial-ML purged-split discipline, after de Prado): train is
    strictly before the cutoff, test strictly after cutoff + embargo,
    and the embargo window is EXCLUDED — rows whose time is too close
    to the boundary leak forward-looking signal into features built
    with trailing windows, so they belong to neither split. Hash splits
    (x24) can't give this guarantee for time-series features. One
    scan, one map-side-combinable aggregate; the split expression is a
    pure date comparison, so partition pruning on o_orderdate still
    applies under either split at scale."""
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    cutoff = F.lit("1999-01-01").cast("date")
    embargo_end = F.date_add(cutoff, 30)
    split = (
        F.when(d < cutoff, "train")
        .when(d >= embargo_end, "test")
        .otherwise("embargo")
    )
    return (
        o.select(
            split.alias("split"),
            d.alias("d"),
            F.col("o_totalprice"),
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
            F.min("d").alias("first_date"),
            F.max("d").alias("last_date"),
        )
    )


X72_SQL = """
SELECT CASE WHEN CAST(o_orderdate AS DATE) < DATE '1999-01-01' THEN 'train'
            WHEN CAST(o_orderdate AS DATE) >= DATE '1999-01-31' THEN 'test'
            ELSE 'embargo' END AS split,
       count(*) AS n_orders,
       round(SUM(o_totalprice), 2) AS total_price,
       MIN(CAST(o_orderdate AS DATE)) AS first_date,
       MAX(CAST(o_orderdate AS DATE)) AS last_date
FROM orders
GROUP BY 1
"""


def x73_negative_sampling(spark, sf_dir):
    """Contrastive negative sampling over embeddings: for each anchor
    vector, 3 deterministic cross-label negatives — the pair-mining
    stage of contrastive/triplet training. Candidates are blocked on a
    16-way md5 bucket of the NEGATIVE id, so each anchor joins one
    bucket (1/16 of the corpus), never the full table: the per-anchor
    candidate count is bounded and the draw stays a pure function of
    the id pair (engine/run/partitioning reproducible). Shuffle carries
    (ids, label, bucket) only — vectors are not needed for mining."""
    emb = _t(spark, sf_dir, "embeddings")
    from ..operators.curation import _hex_uniform_int

    a = emb.select(F.col("vec_id").alias("anchor_id"), F.col("label").alias("a_label"))
    neg_bucket = _hex_uniform_int(F.concat(F.col("vec_id").cast("string"), F.lit("-nb"))) % 16
    n = emb.select(
        F.col("vec_id").alias("neg_id"),
        F.col("label").alias("n_label"),
        neg_bucket.alias("bkt"),
    )
    anchor_bucket = (
        _hex_uniform_int(F.concat(F.col("anchor_id").cast("string"), F.lit("-ab"))) % 16
    )
    pri = _hex_uniform_int(
        F.concat(
            F.col("anchor_id").cast("string"), F.lit("/"), F.col("neg_id").cast("string")
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("anchor_id").orderBy("pri", "neg_id")
    return (
        a.withColumn("bkt", anchor_bucket)
        .join(n, "bkt")
        .where(F.col("a_label") != F.col("n_label"))
        .select("anchor_id", "neg_id", pri.alias("pri"))
        .withColumn("neg_rank", F.row_number().over(w))
        .where(F.col("neg_rank") <= 3)
        .select(
            "anchor_id", "neg_id", F.col("neg_rank").cast("long").alias("neg_rank")
        )
    )


_X73_U = lambda col: " + ".join(  # noqa: E731 — SQL macro, mirrors _hex_uniform_int
    f"(ascii(substring({col}, {i}, 1)) - CASE WHEN ascii(substring({col}, {i}, 1)) >= 97 "
    f"THEN 87 ELSE 48 END) * {16 ** (6 - i)}"
    for i in range(1, 7)
)

X73_SQL = f"""
WITH a AS (
  SELECT vec_id AS anchor_id, label AS a_label,
         ({_X73_U("md5(CAST(vec_id AS VARCHAR) || '-ab')")}) % 16 AS bkt
  FROM embeddings
),
n AS (
  SELECT vec_id AS neg_id, label AS n_label,
         ({_X73_U("md5(CAST(vec_id AS VARCHAR) || '-nb')")}) % 16 AS bkt
  FROM embeddings
),
pairs AS (
  SELECT anchor_id, neg_id,
         ({_X73_U("md5(CAST(anchor_id AS VARCHAR) || '/' || CAST(neg_id AS VARCHAR))")}) AS pri
  FROM a JOIN n USING (bkt)
  WHERE a.a_label <> n.n_label
),
ranked AS (
  SELECT anchor_id, neg_id,
         row_number() OVER (PARTITION BY anchor_id ORDER BY pri, neg_id) AS rn
  FROM pairs
)
SELECT anchor_id, neg_id, CAST(rn AS BIGINT) AS neg_rank
FROM ranked WHERE rn <= 3
"""


def x74_bpe_merges(spark, sf_dir):
    """Distributed BPE merge training (operators/bpe.py): 10 merges
    learned at VOCABULARY scale (the corpus folds to distinct words
    once; every iteration runs on the vocab frame with a 1-row argmax
    collect).

    Oracle-checkable since round 3: the training loop is integer-exact
    and deterministic (freq desc, pair-lexicographic tie-break), so
    X74_SQL replays it as a recursive CTE over the vocab — adjacent-pair
    counts via a LATERAL comprehension, the global argmax via a
    full-ordering window, and the left-to-right greedy non-overlapping
    merge application as a list_reduce string fold that mirrors
    bpe._apply_merge's prev-carry accumulator exactly. The merge
    sequence is additionally pytest-pinned on the canonical Sennrich
    example."""
    from ..operators.bpe import bpe_merges_df

    return bpe_merges_df(_t(spark, sf_dir, "documents"), n_merges=10)


def x75_bpe_encode(spark, sf_dir):
    """Tokenizer-aware per-doc length accounting: apply x74's learned
    merges to the distinct-word frame (vocab-sized), broadcast the
    word→piece-count map back over the corpus word stream, and report
    (n_words, n_chars, n_pieces, pieces_per_word).

    Oracle-checkable since round 3: X75_SQL runs the same recursive
    training chain as X74_SQL and reads each word's FINAL tokenization
    off the last recursion layer (every word advances every iteration,
    so max(it) carries the full vocab), then joins piece counts back
    over the per-doc word stream."""
    from ..operators.bpe import bpe_encode_counts

    return bpe_encode_counts(_t(spark, sf_dir, "documents"), n_merges=10)


def _bpe_chain_sql(n_merges: int) -> str:
    """The shared recursive BPE-training CTE prefix (through ``sel``),
    mirroring bpe.bpe_train(n_merges=...) bit-for-bit. Integer weights
    and string symbols only — no float conventions needed."""
    fold = """list_reduce(string_split(sym, ' '), (acc, x) ->
  CASE WHEN x = r AND (acc = l OR ends_with(acc, ' ' || l))
       THEN CASE WHEN acc = l THEN l || r
            ELSE left(acc, length(acc) - length(l)) || l || r END
       ELSE acc || ' ' || x END)"""
    return f"""WITH RECURSIVE
norm AS (SELECT doc_id, {_X67_NORM} AS toks FROM documents),
vocab AS (
  SELECT word, count(*) AS weight
  FROM (SELECT unnest(toks) AS word FROM norm) GROUP BY word
),
base AS (
  SELECT word, weight,
         array_to_string(regexp_split_to_array(word, ''), ' ') || ' ▁' AS sym
  FROM vocab
),
sel(word, weight, sym, it, l, r, freq) AS (
  SELECT word, weight, sym, 0,
         CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT)
  FROM base
  UNION ALL
  SELECT word, weight, {fold} AS sym, it + 1, l, r, freq
  FROM (
    SELECT word, weight, sym, it, best_a AS l, best_b AS r, best_f AS freq
    FROM (
      SELECT q.*,
             first_value(pa) OVER w AS best_a,
             first_value(pb) OVER w AS best_b,
             first_value(pf) OVER w AS best_f,
             row_number() OVER (PARTITION BY word ORDER BY pa NULLS LAST, pb NULLS LAST) AS rn
      FROM (
        SELECT s.word, s.weight, s.sym, s.it, p.pa, p.pb,
               CASE WHEN p.pa IS NULL THEN NULL
                    ELSE SUM(s.weight * p.n) OVER (PARTITION BY p.pa, p.pb) END AS pf
        FROM (SELECT word, weight, sym, it, string_split(sym, ' ') AS t
              FROM sel WHERE it < {n_merges}) s
        LEFT JOIN LATERAL (
          SELECT u.pr['a'] AS pa, u.pr['b'] AS pb, count(*) AS n
          FROM unnest([{{'a': s.t[i], 'b': s.t[i + 1]}}
                       for i in generate_series(1, len(s.t) - 1)]) AS u(pr)
          GROUP BY 1, 2
        ) p ON TRUE
      ) q
      WINDOW w AS (ORDER BY pf DESC NULLS LAST, pa NULLS LAST, pb NULLS LAST)
    ) z
    WHERE rn = 1 AND best_f IS NOT NULL AND best_f >= 2
  ) picked
)"""


X74_SQL = f"""{_bpe_chain_sql(10)}
SELECT DISTINCT CAST(it AS BIGINT) AS merge_rank, l AS "left", r AS "right", freq
FROM sel WHERE it >= 1
"""

X75_SQL = f"""{_bpe_chain_sql(10)},
final AS (
  SELECT word, len(string_split(sym, ' ')) AS wp
  FROM sel WHERE it = (SELECT max(it) FROM sel)
),
stream AS (SELECT doc_id, unnest(toks) AS word FROM norm)
SELECT s.doc_id,
       count(*) AS n_words,
       CAST(SUM(length(s.word)) AS BIGINT) AS n_chars,
       CAST(SUM(f.wp) AS BIGINT) AS n_pieces,
       round(CAST(SUM(f.wp) AS DOUBLE) / count(*), 6) AS pieces_per_word
FROM stream s JOIN final f USING (word)
GROUP BY s.doc_id
"""


def x76_label_noise(spark, sf_dir):
    """Label-noise detection via neighborhood disagreement (the
    confident-learning signal): for each vector, the fraction of its
    k=5 nearest SIGN-BUCKET neighbors carrying a DIFFERENT label; high
    disagreement with enough neighbors flags a suspect label. The
    block is the x51 8-bit sign bucket — label-independent (so
    cross-label neighbors are visible) and deterministic; pair space
    stays Σ per-bucket², never n². Cosine and ranking are JVM-side."""
    from pyspark.sql import Window

    from ..functions.vectors import cosine_from_norms, l2_norm

    emb = _t(spark, sf_dir, "embeddings")
    bucket = sum(
        F.coalesce((F.get("embedding", i) >= 0).cast("int"), F.lit(0)) * (1 << i)
        for i in range(8)
    ).alias("bkt")
    # norms once per vector, not per pair (bit-identical cosine)
    e = emb.select(
        F.col("vec_id").alias("vid"), "label", bucket, F.col("embedding").alias("v")
    ).withColumn("nrm", l2_norm(F.col("v")))
    a, b = e.alias("a"), e.alias("b")
    pairs = a.join(
        b, (F.col("a.bkt") == F.col("b.bkt")) & (F.col("a.vid") != F.col("b.vid"))
    ).select(
        F.col("a.vid").alias("vec_id"),
        F.col("a.label").alias("label"),
        F.col("b.label").alias("n_label"),
        F.col("b.vid").alias("nid"),
        # 6-decimal rounding BEFORE the rank window (the x13/x7 convention):
        # Spark's sequential zip_with fold and DuckDB's unordered SUM can
        # differ in the last ulp, which would flip row_number at near-ties
        F.round(
            cosine_from_norms(
                F.col("a.v"), F.col("b.v"), F.col("a.nrm"), F.col("b.nrm")
            ),
            6,
        ).alias("sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), "nid")
    top = pairs.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 5)
    return (
        top.groupBy("vec_id", "label")
        .agg(
            F.count(F.lit(1)).alias("n_neighbors"),
            F.count_if(F.col("n_label") != F.col("label")).alias("n_disagree"),
        )
        .select(
            "vec_id",
            "label",
            "n_neighbors",
            "n_disagree",
            F.round(F.col("n_disagree") / F.col("n_neighbors"), 6).alias(
                "disagree_frac"
            ),
            (
                (F.col("n_neighbors") >= 3)
                & (F.col("n_disagree") / F.col("n_neighbors") >= 0.6)
            ).alias("suspect"),
        )
    )


X76_SQL = """
WITH e AS (
  SELECT vec_id, label, embedding,
         (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END)
       + (CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END)
       + (CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END)
       + (CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END)
       + (CASE WHEN embedding[5] >= 0 THEN 16 ELSE 0 END)
       + (CASE WHEN embedding[6] >= 0 THEN 32 ELSE 0 END)
       + (CASE WHEN embedding[7] >= 0 THEN 64 ELSE 0 END)
       + (CASE WHEN embedding[8] >= 0 THEN 128 ELSE 0 END) AS bkt
  FROM embeddings
),
elem AS (
  SELECT vec_id, bkt, label, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM e
),
norms AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM elem GROUP BY 1),
dots AS (
  SELECT a.vec_id, a.label, b.vec_id AS nid, b.label AS n_label,
         SUM(a.v * b.v) AS dot
  FROM elem a JOIN elem b ON a.bkt = b.bkt AND a.i = b.i AND a.vec_id <> b.vec_id
  GROUP BY 1, 2, 3, 4
),
sims AS (
  SELECT d.vec_id, d.label, d.nid, d.n_label,
         round(d.dot / (na.nrm * nb.nrm), 6) AS sim
  FROM dots d
  JOIN norms na ON d.vec_id = na.vec_id
  JOIN norms nb ON d.nid = nb.vec_id
),
top AS (
  SELECT * FROM (
    SELECT vec_id, label, n_label,
           row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, nid) AS rn
    FROM sims
  ) WHERE rn <= 5
)
SELECT vec_id, label,
       count(*) AS n_neighbors,
       CAST(count(*) FILTER (n_label <> label) AS BIGINT) AS n_disagree,
       round(CAST(count(*) FILTER (n_label <> label) AS DOUBLE) / count(*), 6) AS disagree_frac,
       (count(*) >= 3 AND CAST(count(*) FILTER (n_label <> label) AS DOUBLE) / count(*) >= 0.6) AS suspect
FROM top
GROUP BY vec_id, label
"""


def x77_quality_psi(spark, sf_dir):
    """Per-source quality drift as Population Stability Index: each
    source's quality-score histogram (10 equal-width bins, Laplace
    0.5-smoothed) vs the corpus-wide one; PSI = Σ (p_s − p_c)·ln(p_s /
    p_c) — the data-monitoring metric that flags a crawl source going
    bad between snapshots. Two map-side-combinable aggregates + a
    10×|sources| grid (broadcast-tiny); the score is the closed-form
    x9 heuristic so the oracle mirrors it bit-for-bit."""
    from ..operators.textstats import quality_score

    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "source",
        F.least(F.floor(quality_score(F.col("text")) * 10), F.lit(9))
        .cast("int")
        .alias("b"),
    )
    per_sb = scored.groupBy("source", "b").agg(F.count(F.lit(1)).alias("n_sb"))
    per_s = scored.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    per_b = scored.groupBy("b").agg(F.count(F.lit(1)).alias("n_b"))
    total = scored.agg(F.count(F.lit(1)).alias("n"))
    grid = per_s.crossJoin(spark.range(10).select(F.col("id").cast("int").alias("b")))
    joined = (
        grid.join(per_sb, ["source", "b"], "left")
        .join(F.broadcast(per_b), "b", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "source",
            "n_s",
            ((F.coalesce("n_sb", F.lit(0)) + 0.5) / (F.col("n_s") + 5)).alias("ps"),
            ((F.coalesce("n_b", F.lit(0)) + 0.5) / (F.col("n") + 5)).alias("pc"),
        )
    )
    return (
        joined.groupBy("source")
        .agg(
            F.max("n_s").alias("n_docs"),
            F.round(F.sum((F.col("ps") - F.col("pc")) * F.log(F.col("ps") / F.col("pc"))), 6).alias("psi"),
        )
        .select("source", F.col("n_docs").cast("long").alias("n_docs"), "psi")
    )


X77_SQL = rf"""
WITH base AS (
  SELECT source, text,
         list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '') AS toks
  FROM documents
),
q AS (
  SELECT source,
         (CASE WHEN len(toks) BETWEEN 10 AND 10000 THEN 0.4 ELSE 0.0 END
          + CASE WHEN CAST(list_aggregate(list_transform(toks, t -> length(t)), 'sum') AS DOUBLE)
                      / greatest(len(toks), 1) BETWEEN 3.0 AND 10.0 THEN 0.3 ELSE 0.0 END
          + CASE WHEN CAST(len(list_filter(list_transform(toks, t -> lower(t)),
                               t -> list_contains({_STOP_EN}, t))) AS DOUBLE)
                      / greatest(len(toks), 1) >= 0.01 THEN 0.2 ELSE 0.0 END
          + CASE WHEN CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
                      / greatest(length(text), 1) <= 0.2 THEN 0.1 ELSE 0.0 END) AS score
  FROM base
),
binned AS (SELECT source, CAST(least(floor(score * 10), 9) AS INT) AS b FROM q),
per_sb AS (SELECT source, b, count(*) AS n_sb FROM binned GROUP BY 1, 2),
per_s AS (SELECT source, count(*) AS n_s FROM binned GROUP BY 1),
per_b AS (SELECT b, count(*) AS n_b FROM binned GROUP BY 1),
total AS (SELECT count(*) AS n FROM binned),
grid AS (
  SELECT s.source, s.n_s, g.b
  FROM per_s s CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS b) g
),
joined AS (
  SELECT gr.source, gr.n_s,
         (COALESCE(sb.n_sb, 0) + 0.5) / (gr.n_s + 5) AS ps,
         (COALESCE(pb.n_b, 0) + 0.5) / (t.n + 5) AS pc
  FROM grid gr
  LEFT JOIN per_sb sb ON gr.source = sb.source AND gr.b = sb.b
  LEFT JOIN per_b pb ON gr.b = pb.b
  CROSS JOIN total t
)
SELECT source, CAST(MAX(n_s) AS BIGINT) AS n_docs,
       round(SUM((ps - pc) * ln(ps / pc)), 6) AS psi
FROM joined
GROUP BY source
"""


# --------------------------------------------------------------------------
# y — round-3 additions (verdict r2 #7: LM-quality scoring, hard-negative
# mining, embedding covariance, cross-split n-gram contamination)
# --------------------------------------------------------------------------

# the x24/x53 md5 split, shared by y1/y4 oracles
_Y_SPLIT_INNER = (
    "(ascii(substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 256"
    " + ascii(substring(md5(CAST(doc_id AS VARCHAR)), 2, 1))) % 100"
)
_Y_SPLIT_CASE = "CASE WHEN b < 5 THEN 'val' WHEN b < 15 THEN 'test' ELSE 'train' END"


def _split_docs(spark, sf_dir):
    """documents + the deterministic x24 md5 split assignment."""
    docs = _t(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    bucket = (
        F.ascii(F.substring(h, 1, 1)) * 256 + F.ascii(F.substring(h, 2, 1))
    ) % 100
    split = (
        F.when(bucket < 5, "val").when(bucket < 15, "test").otherwise("train")
    )
    return docs.withColumn("split", split)


def y1_backoff_bigram_lm(spark, sf_dir):
    """Stupid-backoff bigram LM quality scoring (textstats.
    backoff_bigram_logprob — the KenLM-filter shape, self-contained):
    counts learned on the md5-split TRAIN docs, held-out val/test docs
    scored per transition (ln c2/c1 when the bigram was seen in train,
    else ln 0.4·(c1(w2)+1)/(N+V)). Held-out scoring is what makes
    backoff fire — a corpus scored under its own counts has seen every
    one of its bigrams (which is all x39's unigram variant can do)."""
    assigned = _split_docs(spark, sf_dir)
    return textstats.backoff_bigram_logprob(
        assigned.where(F.col("split") == "train"),
        assigned.where(F.col("split") != "train"),
    )


Y1_SQL = rf"""
WITH base AS (
  SELECT doc_id, {_X67_NORM} AS toks,
         {_Y_SPLIT_CASE} AS split
  FROM (SELECT doc_id, text, {_Y_SPLIT_INNER} AS b FROM documents)
),
ttok AS (SELECT unnest(toks) AS w FROM base WHERE split = 'train'),
uni AS (SELECT w, count(*) AS c FROM ttok GROUP BY 1),
tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS n, CAST(count(*) AS DOUBLE) AS v FROM uni),
ttrans AS (
  SELECT toks[i] AS w1, toks[i + 1] AS w2
  FROM base, unnest(generate_series(1, len(toks) - 1)) AS u(i)
  WHERE split = 'train'
),
big AS (SELECT w1, w2, count(*) AS c2 FROM ttrans GROUP BY 1, 2),
strans AS (
  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
  FROM base, unnest(generate_series(1, len(toks) - 1)) AS u(i)
  WHERE split <> 'train'
),
scored AS (
  SELECT s.doc_id,
         b.c2 IS NULL AS backoff,
         CASE WHEN b.c2 IS NOT NULL THEN ln(CAST(b.c2 AS DOUBLE) / u1.c)
              ELSE ln(0.4 * (COALESCE(u2.c, 0) + 1.0) / (t.n + t.v))
         END AS sc
  FROM strans s
  LEFT JOIN big b ON b.w1 = s.w1 AND b.w2 = s.w2
  LEFT JOIN uni u1 ON u1.w = s.w1
  LEFT JOIN uni u2 ON u2.w = s.w2
  CROSS JOIN tot t
)
SELECT doc_id,
       count(*) AS n_transitions,
       CAST(count(*) FILTER (backoff) AS BIGINT) AS n_backoff,
       round(avg(sc), 4) AS mean_logscore
FROM scored GROUP BY doc_id
"""


def y2_hard_negatives(spark, sf_dir):
    """Hard-negative mining (simsearch.hard_negative_topk): per anchor,
    the top-3 most-similar DIFFERENT-label vectors inside the
    label-independent 8-bit sign bucket — the refinement over x73's
    random negative sampling (near-boundary cross-label pairs are the
    ones that move a contrastive loss)."""
    return simsearch.hard_negative_topk(_t(spark, sf_dir, "embeddings"))


_Y2_BKT = " + ".join(
    f"(CASE WHEN embedding[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
    for i in range(8)
)

Y2_SQL = f"""
WITH e AS (
  SELECT vec_id, label, embedding, {_Y2_BKT} AS bkt
  FROM embeddings
),
elem AS (
  SELECT vec_id, bkt, label, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM e
),
norms AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM elem GROUP BY 1),
dots AS (
  SELECT a.vec_id AS anchor_id, a.label AS anchor_label,
         b.vec_id AS neg_id, b.label AS neg_label,
         SUM(a.v * b.v) AS dot
  FROM elem a
  JOIN elem b ON a.bkt = b.bkt AND a.i = b.i AND a.label <> b.label
  GROUP BY 1, 2, 3, 4
),
sims AS (
  SELECT d.anchor_id, d.anchor_label, d.neg_id, d.neg_label,
         round(d.dot / (na.nrm * nb.nrm), 6) AS cosine
  FROM dots d
  JOIN norms na ON d.anchor_id = na.vec_id
  JOIN norms nb ON d.neg_id = nb.vec_id
),
ranked AS (
  SELECT anchor_id, anchor_label, neg_id, neg_label, cosine,
         CAST(row_number() OVER (
           PARTITION BY anchor_id ORDER BY cosine DESC, neg_id
         ) AS INT) AS rank
  FROM sims
)
SELECT anchor_id, anchor_label, neg_id, neg_label, cosine, rank
FROM ranked WHERE rank <= 3
"""


def y3_embedding_covariance(spark, sf_dir):
    """Distributed covariance matrix of the embedding space
    (profile.embedding_covariance): upper triangle as (i, j, cov) —
    each Arrow batch folds to triangle-sized partials via one numpy
    outer product in mapInPandas, so the reduce never carries vectors."""
    from ..operators.profile import embedding_covariance

    return embedding_covariance(_t(spark, sf_dir, "embeddings"))


Y3_SQL = """
WITH elem AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
p AS (
  SELECT a.i AS i, b.i AS j, count(*) AS n,
         SUM(a.v) AS si, SUM(b.v) AS sj, SUM(a.v * b.v) AS sp
  FROM elem a JOIN elem b ON a.vec_id = b.vec_id AND a.i <= b.i
  GROUP BY 1, 2
)
SELECT CAST(i - 1 AS INT) AS i, CAST(j - 1 AS INT) AS j,
       round((sp - si * sj / n) / n, 6) + 0.0 AS cov
FROM p
"""


def y4_split_ngram_contamination(spark, sf_dir):
    """Cross-split 5-gram contamination audit (dedup.
    split_ngram_contamination): per held-out doc, the fraction of its
    distinct 5-grams that occur in ANY train doc under the x24 md5
    split — the near-dup complement of x53's exact-hash leakage check
    (GPT-3 §4 eval-decontamination, turned inward)."""
    return dedup.split_ngram_contamination(_t(spark, sf_dir, "documents"))


Y4_SQL = rf"""
WITH base AS (
  SELECT doc_id, {_X67_NORM} AS toks,
         {_Y_SPLIT_CASE} AS split
  FROM (SELECT doc_id, text, {_Y_SPLIT_INNER} AS b FROM documents)
),
shn AS (
  SELECT doc_id, split,
         CASE WHEN len(toks) >= 5
              THEN list_distinct([array_to_string(toks[i:i+4], ' ') for i in generate_series(1, len(toks) - 4)])
              WHEN len(toks) > 0
              THEN [array_to_string(toks, ' ')]
              ELSE CAST([] AS VARCHAR[])
         END AS sh
  FROM base
),
flat AS (SELECT DISTINCT doc_id, split, unnest(sh) AS s FROM shn),
train_s AS (SELECT DISTINCT s FROM flat WHERE split = 'train'),
agg AS (
  SELECT h.doc_id, h.split, count(*) AS n_shingles,
         CAST(count(*) FILTER (t.s IS NOT NULL) AS BIGINT) AS n_shared
  FROM (SELECT * FROM flat WHERE split <> 'train') h
  LEFT JOIN train_s t ON t.s = h.s
  GROUP BY 1, 2
)
SELECT doc_id, split, n_shingles, n_shared,
       round(CAST(n_shared AS DOUBLE) / n_shingles, 6) AS shared_frac,
       CAST(n_shared AS DOUBLE) / n_shingles >= 0.5 AS contaminated
FROM agg
"""


def x78_ks_drift(spark, sf_dir):
    """Exact two-sample Kolmogorov–Smirnov drift between the two md5
    halves of orders.o_totalprice (profile.ks_two_sample) — the
    distribution-drift monitor between snapshot halves. The global
    ordered CDF runs on scalable_running_sum (range-bucketed prefix
    sums + broadcast offsets), exercising the round-3-fixed helper on
    TWO stacked cumulative columns; integer cumulative counts divide
    only at the end, so the statistic is bit-identical cross-engine
    with no rounding convention needed."""
    return profile.ks_two_sample(
        _t(spark, sf_dir, "orders"), "o_totalprice", "o_orderkey"
    )


X78_SQL = """
WITH assigned AS (
  SELECT o_totalprice AS val,
         CASE WHEN (ascii(substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)) * 256
                  + ascii(substring(md5(CAST(o_orderkey AS VARCHAR)), 2, 1))) % 100 < 50
              THEN 1 ELSE 0 END AS a
  FROM orders
),
grouped AS (
  SELECT val, SUM(a) AS cnt_a, SUM(1 - a) AS cnt_b FROM assigned GROUP BY val
),
cum AS (
  SELECT val,
         SUM(cnt_a) OVER (ORDER BY val ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
         SUM(cnt_b) OVER (ORDER BY val ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b
  FROM grouped
),
tot AS (SELECT CAST(SUM(cnt_a) AS BIGINT) AS n_a,
               CAST(SUM(cnt_b) AS BIGINT) AS n_b FROM grouped),
scored AS (
  SELECT t.n_a, t.n_b,
         abs(CAST(c.cum_a AS DOUBLE) / t.n_a - CAST(c.cum_b AS DOUBLE) / t.n_b) AS d,
         CAST(c.val AS DOUBLE) AS val
  FROM cum c CROSS JOIN tot t
)
SELECT n_a, n_b, round(max(d), 6) AS ks_stat,
       round(min(val) FILTER (d = (SELECT max(d) FROM scored)), 2) AS at_value
FROM scored GROUP BY n_a, n_b
"""


def x79_containment_dupes(spark, sf_dir):
    """Asymmetric near-dup pairs via the overlap coefficient
    |S(a)∩S(b)| / min(|S(a)|,|S(b)|) >= 0.5 over rare-shingle-blocked
    candidates (dedup.containment_pairs) — catches short-doc-inside-long
    quoting that whole-doc Jaccard structurally misses. Deterministic
    (no hash family needed), so fully oracle-checked."""
    return dedup.containment_pairs(_t(spark, sf_dir, "documents"))


X79_SQL = rf"""
WITH norm AS (
  SELECT doc_id, {_X67_NORM} AS toks FROM documents
),
shn AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3
              THEN list_distinct([array_to_string(toks[i:i+2], ' ') for i in generate_series(1, len(toks) - 2)])
              WHEN len(toks) > 0
              THEN [array_to_string(toks, ' ')]
              ELSE CAST([] AS VARCHAR[])
         END AS sh
  FROM norm
),
flat AS (SELECT DISTINCT doc_id, unnest(sh) AS s FROM shn),
rare AS (SELECT s FROM flat GROUP BY s HAVING count(*) BETWEEN 2 AND 5),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM flat a JOIN rare USING (s) JOIN flat b USING (s)
  WHERE a.doc_id < b.doc_id
)
SELECT c.id_a, c.id_b,
       CAST(len(list_intersect(x.sh, y.sh)) AS INT) AS n_inter,
       CAST(len(x.sh) AS INT) AS size_a,
       CAST(len(y.sh) AS INT) AS size_b,
       round(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
             / least(len(x.sh), len(y.sh)), 6) AS containment
FROM cand c JOIN shn x ON x.doc_id = c.id_a JOIN shn y ON y.doc_id = c.id_b
WHERE round(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
            / least(len(x.sh), len(y.sh)), 6) >= 0.5
"""


_X80_BUCKET = (
    "(ascii(substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)) * 256"
    " + ascii(substring(md5(CAST(o_orderkey AS VARCHAR)), 2, 1))) % 100"
)


def _x80_snapshots(spark, sf_dir):
    """Two deterministic overlapping snapshots of orders: old = md5
    buckets [0, 60), new = buckets [40, 100) with a planted mutation
    (custkey + 1 on every 7th orderkey) so all three diff statuses
    fire."""
    from ..plans import extensions as _self  # noqa: F401  (doc anchor)

    o = _t(spark, sf_dir, "orders")
    hx = F.md5(F.col("o_orderkey").cast("string"))
    bucket = (
        F.ascii(F.substring(hx, 1, 1)) * 256 + F.ascii(F.substring(hx, 2, 1))
    ) % 100
    base = o.select(
        "o_orderkey", bucket.alias("_b"), "o_custkey", "o_orderstatus",
        "o_orderpriority",
    )
    old = base.where(F.col("_b") < 60).drop("_b")
    new = (
        base.where(F.col("_b") >= 40)
        .drop("_b")
        .withColumn(
            "o_custkey",
            F.when(
                F.col("o_orderkey") % 7 == 0, F.col("o_custkey") + 1
            ).otherwise(F.col("o_custkey")),
        )
    )
    return old, new


def x83_minhash_calibration(spark, sf_dir):
    """Estimator-calibration audit: score the MinHash-LSH Jaccard
    ESTIMATES (x3's md5-family est_jaccard) against the EXACT shingle
    Jaccard on the same candidate pairs — (n_pairs, mae, mean_bias,
    max_abs_err), the sketch-credibility check a pipeline runs before
    trusting a threshold. Both sides are deterministic (md5 hash family;
    exact set Jaccard), so the whole audit oracle-checks; error means
    are computed in INTEGER micro-units with half-up division (the x82
    lesson — float means of 1e-6-grid values tie at .5 constantly), and
    `div`/`//` agree across engines because the sign-split keeps every
    operand positive."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, hash_fn="md5")
    exact = dedup.ngram_jaccard_pairs(docs, pairs.select("id_a", "id_b"))
    cal = pairs.join(exact, ["id_a", "id_b"])
    diff = (
        F.round(F.col("est_jaccard") * 1e6).cast("long")
        - F.round(F.col("jaccard") * 1e6).cast("long")
    )
    agg = cal.select(diff.alias("diff")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.abs("diff")).alias("sabs"),
        F.sum("diff").alias("s"),
        F.max(F.abs("diff")).alias("mx"),
    )
    return agg.select(
        F.col("n").alias("n_pairs"),
        (F.expr("(2 * sabs + n) div (2 * n)") / 1e6).alias("mae"),
        (
            F.when(F.col("s") >= 0, F.expr("(2 * s + n) div (2 * n)"))
            .otherwise(-F.expr("(2 * (-s) + n) div (2 * n)"))
            / 1e6
        ).alias("mean_bias"),
        (F.col("mx") / 1e6).alias("max_abs_err"),
    )


X83_SQL = X3_SQL.replace(
    ")\nSELECT id_a, id_b, est_jaccard FROM pairs",
    """),
cal AS (
  SELECT CAST(round(p.est_jaccard * 1000000) AS BIGINT)
         - CAST(round(round(CAST(len(list_intersect(list_distinct(x.sh), list_distinct(y.sh))) AS DOUBLE)
                 / len(list_distinct(list_concat(x.sh, y.sh))), 6) * 1000000) AS BIGINT) AS diff
  FROM pairs p
  JOIN shn x ON x.doc_id = p.id_a
  JOIN shn y ON y.doc_id = p.id_b
)
SELECT count(*) AS n_pairs,
       ((2 * SUM(abs(diff)) + count(*)) // (2 * count(*))) / 1000000.0 AS mae,
       CASE WHEN SUM(diff) >= 0
            THEN ((2 * SUM(diff) + count(*)) // (2 * count(*))) / 1000000.0
            ELSE -(((2 * (-SUM(diff)) + count(*)) // (2 * count(*))) / 1000000.0)
       END AS mean_bias,
       MAX(abs(diff)) / 1000000.0 AS max_abs_err
FROM cal""",
)


def x82_audio_energy(spark, sf_dir):
    """Audio-style windowed RMS energy + silence detection over the
    opaque blob column (multimodal.audio_window_energy): 128-sample
    8-bit-PCM frames, 6-dp-rounded window RMS, silence fraction at
    rms < 20, and the peak window — the VAD/silence-trim signal an
    audio curation pipeline runs before transcription. Decode is the
    sanctioned byte-view stub; the Spark plumbing (binary column,
    Arrow-batched mapInPandas, numpy reshape per batch) is the real
    contract, and every statistic mirrors into X82_SQL's byte
    arithmetic (the corpus is pure ASCII, so ascii(substring) IS the
    byte — asserted by the driver compare itself)."""
    docs = _t(spark, sf_dir, "documents")
    return multimodal.audio_window_energy(multimodal.attach_blob(docs))


X82_SQL = """
WITH idx AS (
  SELECT doc_id, text,
         unnest(generate_series(1, (length(text) // 128) * 128)) AS i
  FROM documents
  WHERE length(text) >= 128
),
samples AS (
  SELECT doc_id, (i - 1) // 128 AS w,
         CAST(ascii(substring(text, i, 1)) AS DOUBLE) - 128.0 AS s
  FROM idx
),
win AS (
  SELECT doc_id, w, round(sqrt(avg(s * s)), 6) AS rms
  FROM samples GROUP BY 1, 2
),
agg AS (
  SELECT doc_id,
         count(*) AS n_windows,
         -- integer micro-unit mean with half-up division: a float avg of
         -- 6-dp values ties at .5 constantly and ulp order flips it
         ((2 * SUM(CAST(round(rms * 1000000) AS BIGINT)) + count(*))
          // (2 * count(*))) / 1000000.0 AS mean_rms,
         round(CAST(count(*) FILTER (rms < 20.0) AS DOUBLE) / count(*), 6) AS silence_frac
  FROM win GROUP BY doc_id
),
peak AS (
  SELECT doc_id, rms AS peak_rms, CAST(w AS INT) AS peak_window
  FROM (
    SELECT doc_id, rms, w,
           row_number() OVER (PARTITION BY doc_id ORDER BY rms DESC, w) AS rn
    FROM win
  ) WHERE rn = 1
)
SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_samples,
       a.n_windows, a.mean_rms, a.silence_frac, p.peak_rms, p.peak_window
FROM documents d JOIN agg a USING (doc_id) JOIN peak p USING (doc_id)
"""


def x80_snapshot_diff(spark, sf_dir):
    """CDC-style snapshot reconciliation (reconcile.snapshot_diff): per-PK
    added/removed/changed between two deterministic md5-bucket snapshots
    of orders (a planted +1-custkey mutation on every 7th key makes
    'changed' fire). One PK hash join; wide rows never shuffle — only
    (pk, 48-bit md5 fingerprint) pairs; output is sized by the CHANGE
    volume, not the table."""
    from ..operators.reconcile import snapshot_diff

    old, new = _x80_snapshots(spark, sf_dir)
    return snapshot_diff(
        old, new, ["o_orderkey"],
        ["o_custkey", "o_orderstatus", "o_orderpriority"],
    )


_X80_FP = _hex12_int_sql("hx")

X80_SQL = f"""
WITH b AS (
  SELECT o_orderkey, {_X80_BUCKET} AS bucket,
         o_custkey, o_orderstatus, o_orderpriority
  FROM orders
),
old AS (SELECT * FROM b WHERE bucket < 60),
neu AS (
  SELECT o_orderkey, o_orderstatus, o_orderpriority,
         CASE WHEN o_orderkey % 7 = 0 THEN o_custkey + 1
              ELSE o_custkey END AS o_custkey
  FROM b WHERE bucket >= 40
),
ofp AS (
  SELECT o_orderkey, {_X80_FP} AS fp FROM (
    SELECT o_orderkey,
           md5(concat_ws(chr(31), CAST(o_custkey AS VARCHAR),
                         CAST(o_orderstatus AS VARCHAR),
                         CAST(o_orderpriority AS VARCHAR)) || '#row') AS hx
    FROM old)
),
nfp AS (
  SELECT o_orderkey, {_X80_FP} AS fp FROM (
    SELECT o_orderkey,
           md5(concat_ws(chr(31), CAST(o_custkey AS VARCHAR),
                         CAST(o_orderstatus AS VARCHAR),
                         CAST(o_orderpriority AS VARCHAR)) || '#row') AS hx
    FROM neu)
)
SELECT o_orderkey,
       CASE WHEN o.fp IS NULL THEN 'added'
            WHEN n.fp IS NULL THEN 'removed'
            WHEN o.fp <> n.fp THEN 'changed' END AS status
FROM ofp o FULL OUTER JOIN nfp n USING (o_orderkey)
WHERE o.fp IS NULL OR n.fp IS NULL OR o.fp <> n.fp
"""


def x81_table_checksum(spark, sf_dir):
    """Order/partition-independent table checksum
    (reconcile.table_checksum) over orders' engine-stable columns: exact
    row count + BIT_XOR of per-row 48-bit md5 folds — the 16-byte
    cross-system content-equality probe. One scan, map-side combinable,
    1-row result."""
    from ..operators.reconcile import table_checksum

    return table_checksum(
        _t(spark, sf_dir, "orders"),
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"],
    )


X81_SQL = f"""
WITH fp AS (
  SELECT {_X80_FP} AS fp FROM (
    SELECT md5(concat_ws(chr(31), CAST(o_orderkey AS VARCHAR),
                         CAST(o_custkey AS VARCHAR),
                         CAST(o_orderstatus AS VARCHAR),
                         CAST(o_orderpriority AS VARCHAR)) || '#row') AS hx
    FROM orders)
)
SELECT count(*) AS n_rows, bit_xor(fp) AS checksum FROM fp
"""


def x84_cluster_canonical(spark, sf_dir):
    """Duplicate-cluster canonicalization (dedup.canonical_representatives,
    verdict r3/r4 optional item b): x67's blocked components, then per
    cluster elect the member with the best x9 quality score (ties → min
    doc id) — the keep-decision of a curation pipeline, upgraded from
    "keep min id" to "keep the best copy". Composes existing ops only;
    deterministic end to end, so the components chain AND the argmax are
    both value-hash oracle-checked."""
    return dedup.canonical_representatives(_t(spark, sf_dir, "documents"))


# X67's recursive-components chain, extended with the X9 quality mirror and
# a per-cluster argmax. Surgery on the final SELECT (the X83 pattern) keeps
# the two oracles' shared blocking/closure logic in one place.
X84_SQL = X67_SQL.replace(
    "SELECT node AS doc, MIN(r) AS cluster_id FROM reach GROUP BY node",
    rf""", comp AS (
  SELECT node AS doc, MIN(r) AS cluster_id FROM reach GROUP BY node
),
qual AS (
  SELECT doc_id,
         CAST(round(CASE WHEN n_tokens BETWEEN 10 AND 10000 THEN 0.4 ELSE 0 END
             + CASE WHEN mtl BETWEEN 3.0 AND 10.0 THEN 0.3 ELSE 0 END
             + CASE WHEN swr >= 0.01 THEN 0.2 ELSE 0 END
             + CASE WHEN digr <= 0.2 THEN 0.1 ELSE 0 END, 4) AS DOUBLE) AS q
  FROM (
    SELECT doc_id,
           len(toks) AS n_tokens,
           CAST(list_aggregate(list_transform(toks, t -> length(t)), 'sum') AS DOUBLE)
             / greatest(len(toks), 1) AS mtl,
           CAST(len(list_filter(list_transform(toks, t -> lower(t)),
                    t -> list_contains({_STOP_EN}, t))) AS DOUBLE)
             / greatest(len(toks), 1) AS swr,
           CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
             / greatest(length(text), 1) AS digr
    FROM (
      SELECT doc_id, text,
             list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '') AS toks
      FROM documents
    )
  )
),
ranked AS (
  SELECT c.cluster_id, c.doc, qual.q,
         ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                            ORDER BY qual.q DESC, c.doc) AS rn,
         COUNT(*) OVER (PARTITION BY c.cluster_id) AS n_members
  FROM comp c JOIN qual ON qual.doc_id = c.doc
)
SELECT cluster_id, n_members, doc AS canonical_doc, q AS canonical_quality
FROM ranked WHERE rn = 1""",
)


def x85_duplicate_spans(spark, sf_dir):
    """Maximal duplicated character spans per document
    (dedup.duplicate_span_intervals, verdict r3/r4 optional item a):
    x43's 40-char duplicate fingerprints upgraded to span granularity —
    overlapping/adjacent duplicated windows merge into maximal (start,
    end) intervals via per-document gaps-and-islands, the Lee et al.
    exact-substring dedup output shape. Deterministic md5 fingerprints,
    so the full interval-merge is value-hash oracle-checked."""
    return dedup.duplicate_span_intervals(_t(spark, sf_dir, "documents"))


# Shared CTE chain for the x85/x86/x87 exact-substring family: duplicated
# 40-char fingerprints → per-document gaps-and-islands → maximal spans.
_X85_CHAIN = """
WITH g AS (
  SELECT doc_id, pos, md5(substr(text, pos, 40)) AS gram
  FROM (
    SELECT doc_id, text, unnest(generate_series(1, length(text) - 39)) AS pos
    FROM documents WHERE length(text) >= 40
  )
),
dup AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
hits AS (SELECT doc_id, pos FROM g JOIN dup USING (gram)),
flagged AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 40
              THEN 1 ELSE 0 END AS brk
  FROM hits
),
isl AS (
  SELECT doc_id, pos,
         CAST(SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS island
  FROM flagged
),
spans AS (
  SELECT doc_id AS doc,
         CAST(MIN(pos) AS INT) AS span_start,
         CAST(MAX(pos) + 39 AS INT) AS span_end,
         CAST(MAX(pos) + 39 - MIN(pos) + 1 AS INT) AS span_chars,
         COUNT(*) AS n_windows
  FROM isl GROUP BY doc_id, island
)"""

X85_SQL = _X85_CHAIN + """
SELECT doc, span_start, span_end, span_chars, n_windows FROM spans
"""


def x86_boilerplate_catalog(spark, sf_dir):
    """Boilerplate-block catalog (dedup.span_boilerplate_blocks): the
    maximal duplicated spans from x85, extracted and fingerprinted into
    the blocklist a curation pipeline scrubs against — (block_hash,
    span_chars, n_docs, n_spans, first_doc) per distinct block text."""
    return dedup.span_boilerplate_blocks(_t(spark, sf_dir, "documents"))


X86_SQL = _X85_CHAIN + """
SELECT md5(substr(d.text, s.span_start, s.span_chars)) AS block_hash,
       s.span_chars,
       COUNT(DISTINCT s.doc) AS n_docs,
       COUNT(*) AS n_spans,
       MIN(s.doc) AS first_doc
FROM spans s JOIN documents d ON d.doc_id = s.doc
GROUP BY 1, 2
"""


def x87_scrub_accounting(spark, sf_dir):
    """Per-document exact-substring scrub audit (dedup.span_scrub_stats):
    chars each doc loses if its x85 duplicated spans are cut — the
    dup_frac accounting that decides cut-vs-drop thresholds before a
    destructive scrub. Every document gets a row (zero for span-free)."""
    return dedup.span_scrub_stats(_t(spark, sf_dir, "documents"))


X87_SQL = _X85_CHAIN + """
, per_doc AS (
  SELECT doc, CAST(SUM(span_chars) AS BIGINT) AS dup_chars,
         COUNT(*) AS n_spans
  FROM spans GROUP BY doc
)
SELECT d.doc_id AS doc,
       CAST(length(d.text) AS INT) AS n_chars,
       COALESCE(p.dup_chars, 0) AS dup_chars,
       COALESCE(p.n_spans, 0) AS n_spans,
       round(CAST(COALESCE(p.dup_chars, 0) AS DOUBLE)
             / greatest(length(d.text), 1), 6) AS dup_frac
FROM documents d LEFT JOIN per_doc p ON p.doc = d.doc_id
"""


def x88_quality_calibration(spark, sf_dir):
    """Cross-source quality-score calibration
    (curation.calibrate_quality): each doc's within-source percent-rank
    mapped through the corpus inverse-ECDF — quantile normalization
    before mixing heterogeneous sources. The corpus CDF is bounded by
    the 16-point quality lattice (collected, re-embedded as literal
    arrays); rank arithmetic is exact int/int in both engines, so every
    value is oracle-checked bit-for-bit."""
    return curation.calibrate_quality(_t(spark, sf_dir, "documents"))


X88_SQL = rf"""
WITH qual AS (
  SELECT doc_id, source,
         CAST(round(CASE WHEN n_tokens BETWEEN 10 AND 10000 THEN 0.4 ELSE 0 END
             + CASE WHEN mtl BETWEEN 3.0 AND 10.0 THEN 0.3 ELSE 0 END
             + CASE WHEN swr >= 0.01 THEN 0.2 ELSE 0 END
             + CASE WHEN digr <= 0.2 THEN 0.1 ELSE 0 END, 4) AS DOUBLE) AS q
  FROM (
    SELECT doc_id, source,
           len(toks) AS n_tokens,
           CAST(list_aggregate(list_transform(toks, t -> length(t)), 'sum') AS DOUBLE)
             / greatest(len(toks), 1) AS mtl,
           CAST(len(list_filter(list_transform(toks, t -> lower(t)),
                    t -> list_contains({_STOP_EN}, t))) AS DOUBLE)
             / greatest(len(toks), 1) AS swr,
           CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
             / greatest(length(text), 1) AS digr
    FROM (
      SELECT doc_id, source, text,
             list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '') AS toks
      FROM documents
    )
  )
),
cdf AS (
  SELECT q AS qv,
         CAST(SUM(COUNT(*)) OVER (ORDER BY q
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           / (SELECT COUNT(*) FROM qual) AS cf
  FROM qual GROUP BY q
),
ranked AS (
  SELECT doc_id, source, q,
         percent_rank() OVER (PARTITION BY source ORDER BY q, doc_id) AS r
  FROM qual
)
SELECT rk.doc_id, rk.source, rk.q,
       round(rk.r, 6) AS src_rank,
       (SELECT MIN(qv) FROM cdf WHERE cf >= rk.r) AS q_calibrated
FROM ranked rk
"""


def x89_pca_whiten(spark, sf_dir):
    """PCA whitening of the embeddings table (profile.pca_whiten):
    distributed single-pass covariance → bounded 64×64 driver-side
    eigendecomposition (sign-canonicalized, deterministic) → top-8
    whitened projection as k literal-array zip_with folds per row.
    Rows-only (eigendecomposition is not SQL-expressible); pytest pins
    the full numpy replica + whitened-covariance≈identity property."""
    return profile.pca_whiten(_t(spark, sf_dir, "embeddings"))


def x90_budget_selection(spark, sf_dir):
    """Quality-greedy selection under a per-source token budget
    (curation.select_within_token_budget): each source keeps its
    best-quality prefix whose running token total fits 1000 tokens —
    materializing a token quota rather than a doc-count quota."""
    return curation.select_within_token_budget(
        _t(spark, sf_dir, "documents"), budget_tokens=1000
    )


X90_SQL = rf"""
WITH q AS (
  SELECT doc_id, source,
         CAST(round(CASE WHEN n_tokens BETWEEN 10 AND 10000 THEN 0.4 ELSE 0 END
             + CASE WHEN mtl BETWEEN 3.0 AND 10.0 THEN 0.3 ELSE 0 END
             + CASE WHEN swr >= 0.01 THEN 0.2 ELSE 0 END
             + CASE WHEN digr <= 0.2 THEN 0.1 ELSE 0 END, 4) AS DOUBLE) AS q,
         CAST(n_tokens AS INT) AS n_tokens
  FROM (
    SELECT doc_id, source,
           len(toks) AS n_tokens,
           CAST(list_aggregate(list_transform(toks, t -> length(t)), 'sum') AS DOUBLE)
             / greatest(len(toks), 1) AS mtl,
           CAST(len(list_filter(list_transform(toks, t -> lower(t)),
                    t -> list_contains({_STOP_EN}, t))) AS DOUBLE)
             / greatest(len(toks), 1) AS swr,
           CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
             / greatest(length(text), 1) AS digr
    FROM (
      SELECT doc_id, source, text,
             list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '') AS toks
      FROM documents
    )
  )
),
ranked AS (
  SELECT doc_id, source, q, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY q DESC, doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum_tokens
  FROM q
)
SELECT doc_id, source, q, n_tokens, cum_tokens
FROM ranked WHERE cum_tokens <= 1000
"""


def x91_dsir_weights(spark, sf_dir):
    """DSIR-style importance weights (curation.dsir_importance_weights):
    mean per-token log-likelihood ratio of the add-1-smoothed src0
    unigram LM vs the corpus LM, for every out-of-target doc — the
    importance-resampling signal that steers a raw crawl toward a
    curated target distribution. Mean rounded to 4 dp (y1 convention)
    so summation order cannot leak cross-engine."""
    return curation.dsir_importance_weights(
        _t(spark, sf_dir, "documents"), target_source="src0"
    )


X91_SQL = rf"""
WITH tok AS (
  SELECT doc_id, source, unnest({_X67_NORM}) AS w FROM documents
),
tfreq AS (
  SELECT w, count(*) AS ct FROM tok WHERE source = 'src0' GROUP BY w
),
cfreq AS (SELECT w, count(*) AS cc FROM tok GROUP BY w),
tot AS (
  SELECT CAST(SUM(cc) AS DOUBLE) AS nc, CAST(COUNT(*) AS DOUBLE) AS v
  FROM cfreq
),
ttot AS (SELECT CAST(COALESCE(SUM(ct), 0) AS DOUBLE) AS nt FROM tfreq),
scored AS (
  SELECT p.doc_id, p.source,
         COUNT(*) AS n_tokens,
         round(AVG(ln((COALESCE(f.ct, 0) + 1) / (ttot.nt + tot.v))
                 - ln((c.cc + 1) / (tot.nc + tot.v))), 4) + 0.0
           AS mean_log_ratio
  FROM tok p
  JOIN cfreq c USING (w)
  LEFT JOIN tfreq f USING (w)
  CROSS JOIN tot CROSS JOIN ttot
  WHERE p.source <> 'src0'
  GROUP BY p.doc_id, p.source
)
SELECT doc_id, source, n_tokens, mean_log_ratio,
       mean_log_ratio > 0 AS target_like
FROM scored
"""


def x92_padding_audit(spark, sf_dir):
    """Sequence-length bucketing padding audit: clip each doc's token
    count at max_seq=256, assign the power-of-2 length bucket
    (16/32/64/128/256 — exact integer CASE, no float log), and report
    per bucket how many padded tokens a bucketed batcher would burn —
    the throughput accounting that decides bucket boundaries before
    packing (x22 packs; this measures what naive bucketing costs).
    One scan + a 5-group aggregate; every term map-side combinable."""
    docs = _t(spark, sf_dir, "documents")
    n = F.least(textstats.token_count(F.col("text")), F.lit(256))
    bucket = (
        F.when(n <= 16, 16)
        .when(n <= 32, 32)
        .when(n <= 64, 64)
        .when(n <= 128, 128)
        .otherwise(256)
    )
    return (
        docs.select(n.alias("eff_tokens"), bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("eff_tokens").cast("long").alias("sum_tokens"),
            (F.count(F.lit(1)) * F.col("bucket")).alias("sum_padded"),
            F.round(
                F.lit(1.0)
                - F.sum("eff_tokens") / (F.count(F.lit(1)) * F.col("bucket")),
                6,
            ).alias("waste_frac"),
        )
    )


X92_SQL = r"""
WITH t AS (
  SELECT least(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                               x -> x <> '')), 256) AS eff_tokens
  FROM documents
),
b AS (
  SELECT eff_tokens,
         CASE WHEN eff_tokens <= 16 THEN 16
              WHEN eff_tokens <= 32 THEN 32
              WHEN eff_tokens <= 64 THEN 64
              WHEN eff_tokens <= 128 THEN 128
              ELSE 256 END AS bucket
  FROM t
)
SELECT bucket, COUNT(*) AS n_docs,
       CAST(SUM(eff_tokens) AS BIGINT) AS sum_tokens,
       COUNT(*) * bucket AS sum_padded,
       round(1.0 - CAST(SUM(eff_tokens) AS DOUBLE) / (COUNT(*) * bucket), 6)
         AS waste_frac
FROM b GROUP BY bucket
"""


def x93_cross_source_dupes(spark, sf_dir):
    """Cross-source duplication matrix: confirmed near-dup pairs (the
    x67 blocking + Jaccard-confirm chain) rolled up by unordered source
    pair — which sources copy from which, the provenance diagnostic
    that decides source-level dedup priorities. Pair fan-out stays
    df-bounded (never n²); the rollup shuffles (src, src) keys only."""
    docs = _t(spark, sf_dir, "documents")
    cands = dedup.rare_shingle_pairs(docs)
    conf = dedup.ngram_jaccard_pairs(docs, cands).where(
        F.col("jaccard") >= 0.3
    )
    src = docs.select("doc_id", "source")
    pairs = conf.join(
        src.withColumnsRenamed({"doc_id": "id_a", "source": "src_a"}), "id_a"
    ).join(
        src.withColumnsRenamed({"doc_id": "id_b", "source": "src_b"}), "id_b"
    )
    return (
        pairs.select(
            F.least("src_a", "src_b").alias("source_a"),
            F.greatest("src_a", "src_b").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# reuse the X67 chain through its confirmed-pairs CTE, then roll up by
# unordered source pair instead of running the closure
X93_SQL = X67_SQL.replace(
    """edges AS MATERIALIZED (SELECT ia AS a, ib AS b FROM conf UNION SELECT ib, ia FROM conf),
reach AS (
  SELECT a AS node, a AS r FROM edges
  UNION
  SELECT e.a AS node, reach.r AS r FROM edges e JOIN reach ON reach.node = e.b
)
SELECT node AS doc, MIN(r) AS cluster_id FROM reach GROUP BY node""",
    """srcpairs AS (
  SELECT least(da.source, db.source) AS source_a,
         greatest(da.source, db.source) AS source_b
  FROM conf
  JOIN documents da ON da.doc_id = conf.ia
  JOIN documents db ON db.doc_id = conf.ib
)
SELECT source_a, source_b, COUNT(*) AS n_pairs
FROM srcpairs GROUP BY source_a, source_b""",
)


def x94_zipf_fit(spark, sf_dir):
    """Per-source Zipf-law fit (textstats.zipf_fit): OLS of ln(freq) on
    ln(rank) over each source's top-100 tokens — natural language sits
    near slope −1; flat or cliff-shaped fits flag templated/generated
    sources before they enter a mixture. Regression input is ≤ 100 rows
    per source by construction."""
    return textstats.zipf_fit(_t(spark, sf_dir, "documents"))


X94_SQL = rf"""
WITH tok AS (
  SELECT source, unnest({_X67_NORM}) AS w FROM documents
),
freq AS (SELECT source, w, count(*) AS c FROM tok GROUP BY 1, 2),
totals AS (
  SELECT source, count(*) AS n_types, CAST(sum(c) AS BIGINT) AS n_tokens
  FROM freq GROUP BY 1
),
ranked AS (
  SELECT source, ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y
  FROM (
    SELECT source, c,
           row_number() OVER (PARTITION BY source ORDER BY c DESC, w) AS rank
    FROM freq
  ) WHERE rank <= 100
),
fit AS (
  SELECT source, count(*) AS n_ranks,
         covar_pop(x, y) / var_pop(x) AS slope,
         avg(x) AS mx, avg(y) AS my
  FROM ranked GROUP BY 1 HAVING count(*) >= 10
)
SELECT f.source, t.n_types, t.n_tokens, f.n_ranks,
       round(f.slope, 4) AS zipf_slope,
       round(f.my - f.slope * f.mx, 4) AS zipf_intercept
FROM fit f JOIN totals t USING (source)
"""


def x95_hamming_ann(spark, sf_dir):
    """Binary-embedding ANN (simsearch.hamming_topk): 64 sign bits
    packed into two 32-bit words (16 bytes/vector), per-query top-10 by
    Hamming distance — the memory-tier companion to x7/x8/x13/x44.
    Integer-exact end to end."""
    return simsearch.hamming_topk(
        _t(spark, sf_dir, "embeddings"), query_ids=[0, 1, 2, 3, 4], k=10
    )


def _x95_word_sql(j: int) -> str:
    return " + ".join(
        f"CASE WHEN embedding[{j * 32 + i + 1}] >= 0 THEN {1 << i} ELSE 0 END"
        for i in range(32)
    )


X95_SQL = f"""
WITH packed AS (
  SELECT vec_id,
         CAST({_x95_word_sql(0)} AS BIGINT) AS w0,
         CAST({_x95_word_sql(1)} AS BIGINT) AS w1
  FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, w0 AS q0, w1 AS q1
  FROM packed WHERE vec_id IN (0, 1, 2, 3, 4)
),
scored AS (
  SELECT q.query_id, p.vec_id AS neighbor_id,
         CAST(bit_count(xor(p.w0, q.q0))
              + bit_count(xor(p.w1, q.q1)) AS INT) AS hamming
  FROM packed p CROSS JOIN q
  WHERE p.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, hamming, CAST(rank AS INT) AS rank
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY hamming, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 10
"""


def x96_char_entropy(spark, sf_dir):
    """Character-entropy garbage detector (textstats.char_entropy):
    per-doc Shannon entropy in nats over the a-z/0-9/space alphabet via
    37 length-minus-replace counters — one codegen'd row-local pass, no
    explode, no shuffle."""
    return textstats.char_entropy(_t(spark, sf_dir, "documents"))


_X96_ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789 "
_X96_COUNTS = ",\n         ".join(
    f"length(t) - length(replace(t, '{ch}', '')) AS c{i}"
    for i, ch in enumerate(_X96_ALPHABET)
)
_X96_N = " + ".join(f"c{i}" for i in range(len(_X96_ALPHABET)))
_X96_ENT = "\n           + ".join(
    f"CASE WHEN c{i} > 0 THEN -(CAST(c{i} AS DOUBLE) / n_alpha)"
    f" * ln(CAST(c{i} AS DOUBLE) / n_alpha) ELSE 0.0 END"
    for i in range(len(_X96_ALPHABET))
)

X96_SQL = f"""
WITH low AS (SELECT doc_id, lower(text) AS t FROM documents),
c AS (
  SELECT doc_id,
         {_X96_COUNTS}
  FROM low
),
n AS (SELECT *, CAST({_X96_N} AS BIGINT) AS n_alpha FROM c),
e AS (
  SELECT doc_id, n_alpha,
         {_X96_ENT} AS ent
  FROM n
),
fin AS (
  SELECT doc_id, n_alpha,
         CASE WHEN n_alpha > 0 THEN round(ent, 6) ELSE 0.0 END
           AS char_entropy
  FROM e
)
SELECT doc_id, n_alpha, char_entropy,
       (n_alpha = 0) OR (char_entropy < 2.0) AS is_low_entropy
FROM fin
"""


def x97_dataset_card(spark, sf_dir):
    """Per-source dataset card (curation.dataset_card): volume, language
    mix, exact-dup rate, mean quality — the datasheet a corpus release
    ships. One scan, one source-keyed aggregate."""
    return curation.dataset_card(_t(spark, sf_dir, "documents"))


X97_SQL = rf"""
WITH base AS (
  SELECT source, lang, text,
         list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '') AS toks,
         CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
           / greatest(length(text), 1) AS digr
  FROM documents
),
derived AS (
  SELECT source, lang, text, len(toks) AS n_tok,
         CAST(list_aggregate(list_transform(toks, t -> length(t)), 'sum') AS DOUBLE)
           / greatest(len(toks), 1) AS mtl,
         CAST(len(list_filter(list_transform(toks, t -> lower(t)),
                  t -> list_contains({_STOP_EN}, t))) AS DOUBLE)
           / greatest(len(toks), 1) AS swr,
         digr
  FROM base
),
q AS (
  SELECT source, lang, text, n_tok,
         CASE WHEN n_tok BETWEEN 10 AND 10000 THEN 0.4 ELSE 0.0 END
           + CASE WHEN mtl BETWEEN 3.0 AND 10.0 THEN 0.3 ELSE 0.0 END
           + CASE WHEN swr >= 0.01 THEN 0.2 ELSE 0.0 END
           + CASE WHEN digr <= 0.2 THEN 0.1 ELSE 0.0 END AS quality
  FROM derived
)
SELECT source,
       count(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       CAST(SUM(length(text)) AS BIGINT) AS n_chars,
       count(DISTINCT lang) AS n_langs,
       round(avg(CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END), 6) AS share_en,
       round(1.0 - CAST(count(DISTINCT md5(text)) AS DOUBLE) / count(*), 6)
         AS dup_rate,
       round(avg(quality), 6) AS mean_quality
FROM q GROUP BY source
"""


# Shared shingle CTE prefix (the X67 norm→shn→flat chain with flat keyed
# as ``doc``) for the source-level shingle audits x98/x99.
_SHINGLE3_CTES = rf"""
WITH norm AS MATERIALIZED (
  SELECT doc_id, {_X67_NORM} AS toks FROM documents
),
shn AS MATERIALIZED (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3
              THEN list_distinct([array_to_string(toks[i:i+2], ' ') for i in generate_series(1, len(toks) - 2)])
              WHEN len(toks) > 0
              THEN [array_to_string(toks, ' ')]
              ELSE CAST([] AS VARCHAR[])
         END AS sh
  FROM norm
),
flat AS MATERIALIZED (SELECT DISTINCT doc_id AS doc, unnest(sh) AS s FROM shn),
src AS (SELECT doc_id AS doc, source FROM documents)
"""


def x98_shingle_novelty(spark, sf_dir):
    """First-seen novelty attribution (dedup.shingle_novelty): each
    distinct corpus 3-shingle is credited to the source of its earliest
    document; per source, novel vs repeated content share — the
    marginal-contribution diagnostic for mixture design."""
    return dedup.shingle_novelty(_t(spark, sf_dir, "documents"))


X98_SQL = (
    _SHINGLE3_CTES
    + """,
per_source AS (
  SELECT source, count(*) AS n_occurrences, count(DISTINCT s) AS n_distinct
  FROM flat JOIN src USING (doc) GROUP BY 1
),
first AS (SELECT s, min(doc) AS doc FROM flat GROUP BY 1),
novel AS (SELECT source, count(*) AS n_novel FROM first JOIN src USING (doc) GROUP BY 1)
SELECT p.source, p.n_occurrences, p.n_distinct,
       coalesce(n.n_novel, 0) AS n_novel,
       round(CAST(coalesce(n.n_novel, 0) AS DOUBLE) / p.n_distinct, 6)
         AS novelty_rate
FROM per_source p LEFT JOIN novel n USING (source)
"""
)


def x99_source_overlap(spark, sf_dir):
    """Source-pair content overlap (dedup.source_shingle_overlap):
    Jaccard between per-source distinct-shingle sets, full matrix —
    the corpus-space companion to x93's confirmed doc-pair counts."""
    return dedup.source_shingle_overlap(_t(spark, sf_dir, "documents"))


X99_SQL = (
    _SHINGLE3_CTES
    + """,
srcsh AS MATERIALIZED (SELECT DISTINCT source, s FROM flat JOIN src USING (doc)),
sizes AS (SELECT source, count(*) AS n FROM srcsh GROUP BY 1),
shared AS (
  SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared
  FROM srcsh a JOIN srcsh b USING (s)
  WHERE a.source < b.source GROUP BY 1, 2
),
grid AS (
  SELECT sa.source AS source_a, sa.n AS n_a, sb.source AS source_b, sb.n AS n_b
  FROM sizes sa CROSS JOIN sizes sb WHERE sa.source < sb.source
)
SELECT g.source_a, g.source_b, g.n_a, g.n_b,
       coalesce(sh.n_shared, 0) AS n_shared,
       round(CAST(coalesce(sh.n_shared, 0) AS DOUBLE)
             / (g.n_a + g.n_b - coalesce(sh.n_shared, 0)), 6) AS jaccard
FROM grid g LEFT JOIN shared sh USING (source_a, source_b)
"""
)


def x100_lang_source_mi(spark, sf_dir):
    """Language×source mutual information (profile.categorical_mi):
    per-cell joint probability, pointwise MI, and MI contribution — the
    covariate-confounding audit that decides whether splits must
    stratify on both columns."""
    return profile.categorical_mi(_t(spark, sf_dir, "documents"))


X100_SQL = """
WITH joint AS (SELECT lang, source, count(*) AS n FROM documents GROUP BY 1, 2),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM joint),
ma AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_a FROM joint GROUP BY 1),
mb AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_b FROM joint GROUP BY 1)
SELECT j.lang, j.source, j.n, ma.n_a, mb.n_b,
       round(CAST(j.n AS DOUBLE) / t.n_total, 6) AS p_joint,
       round(ln(CAST(j.n AS DOUBLE) * t.n_total / (ma.n_a * mb.n_b)), 6)
         AS pmi,
       round((CAST(j.n AS DOUBLE) / t.n_total)
             * ln(CAST(j.n AS DOUBLE) * t.n_total / (ma.n_a * mb.n_b)), 6)
         AS mi_contrib
FROM joint j JOIN ma USING (lang) JOIN mb USING (source) CROSS JOIN tot t
"""


def x101_retention_sweep(spark, sf_dir):
    """Quality-filter tuning curve (curation.retention_sweep): per
    (threshold, source), documents and tokens surviving quality_score >=
    t — the sweep run before committing to a cutoff. The corpus
    collapses to the 16-point (source, quality) lattice first; the
    threshold grid explodes over cells, never documents."""
    return curation.retention_sweep(_t(spark, sf_dir, "documents"))


X101_SQL = rf"""
WITH base AS (
  SELECT source, text,
         list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '') AS toks
  FROM documents
),
qual AS (
  SELECT source, nt,
         CAST(round(CASE WHEN nt BETWEEN 10 AND 10000 THEN 0.4 ELSE 0 END
             + CASE WHEN mtl BETWEEN 3.0 AND 10.0 THEN 0.3 ELSE 0 END
             + CASE WHEN swr >= 0.01 THEN 0.2 ELSE 0 END
             + CASE WHEN digr <= 0.2 THEN 0.1 ELSE 0 END, 4) AS DOUBLE) AS q
  FROM (
    SELECT source,
           len(toks) AS nt,
           CAST(list_aggregate(list_transform(toks, t -> length(t)), 'sum') AS DOUBLE)
             / greatest(len(toks), 1) AS mtl,
           CAST(len(list_filter(list_transform(toks, t -> lower(t)),
                    t -> list_contains({_STOP_EN}, t))) AS DOUBLE)
             / greatest(len(toks), 1) AS swr,
           CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
             / greatest(length(text), 1) AS digr
    FROM base
  )
),
cells AS (
  SELECT source, q, count(*) AS n_docs, CAST(SUM(nt) AS BIGINT) AS n_tokens
  FROM qual GROUP BY 1, 2
),
grid AS (
  SELECT c.*, t.threshold
  FROM cells c CROSS JOIN
       (SELECT CAST(unnest([0.0, 0.3, 0.5, 0.7, 0.8, 1.0]) AS DOUBLE) AS threshold) t
)
SELECT threshold, source,
       CAST(SUM(CASE WHEN q >= threshold THEN n_docs ELSE 0 END) AS BIGINT) AS docs_kept,
       CAST(SUM(CASE WHEN q >= threshold THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_kept,
       round(CAST(SUM(CASE WHEN q >= threshold THEN n_docs ELSE 0 END) AS DOUBLE)
             / SUM(n_docs), 6) AS doc_retention,
       round(CAST(SUM(CASE WHEN q >= threshold THEN n_tokens ELSE 0 END) AS DOUBLE)
             / SUM(n_tokens), 6) AS token_retention
FROM grid GROUP BY 1, 2
"""


def x102_langid_confusion(spark, sf_dir):
    """Language-ID evaluation (textstats.langid_eval): per language,
    support / prediction count / hits and precision-recall-F1 of the
    x10 stopword-argmax heuristic against the declared label — the
    trust audit before routing filters by predicted language. One
    |langs|^2-cell confusion aggregate; metrics derive from cells."""
    return textstats.langid_eval(_t(spark, sf_dir, "documents"))


_X102_PRED = """CASE WHEN greatest(h_en, h_es, h_fr, h_de) < 1 THEN 'und'
            WHEN h_en = greatest(h_en, h_es, h_fr, h_de) THEN 'en'
            WHEN h_es = greatest(h_en, h_es, h_fr, h_de) THEN 'es'
            WHEN h_fr = greatest(h_en, h_es, h_fr, h_de) THEN 'fr'
            ELSE 'de' END"""

X102_SQL = rf"""
WITH hits AS (
  SELECT doc_id, lang,
         {_hits_sql(textstats.STOPWORDS['en'])} AS h_en,
         {_hits_sql(textstats.STOPWORDS['es'])} AS h_es,
         {_hits_sql(textstats.STOPWORDS['fr'])} AS h_fr,
         {_hits_sql(textstats.STOPWORDS['de'])} AS h_de
  FROM documents
),
pred AS (SELECT lang AS declared, {_X102_PRED} AS predicted FROM hits),
cells AS (SELECT declared, predicted, count(*) AS n FROM pred GROUP BY 1, 2),
d AS (SELECT declared AS lang, CAST(SUM(n) AS BIGINT) AS n_declared FROM cells GROUP BY 1),
p AS (SELECT predicted AS lang, CAST(SUM(n) AS BIGINT) AS n_predicted FROM cells GROUP BY 1),
c AS (SELECT declared AS lang, CAST(SUM(n) AS BIGINT) AS n_correct
      FROM cells WHERE declared = predicted GROUP BY 1),
base AS (
  SELECT COALESCE(d.lang, p.lang) AS lang,
         COALESCE(d.n_declared, 0) AS n_declared,
         COALESCE(p.n_predicted, 0) AS n_predicted,
         COALESCE(c.n_correct, 0) AS n_correct
  FROM d FULL JOIN p ON d.lang = p.lang
  LEFT JOIN c ON COALESCE(d.lang, p.lang) = c.lang
),
m AS (
  SELECT lang, n_declared, n_predicted, n_correct,
         CASE WHEN n_predicted > 0
              THEN CAST(n_correct AS DOUBLE) / n_predicted ELSE 0.0 END AS pr,
         CASE WHEN n_declared > 0
              THEN CAST(n_correct AS DOUBLE) / n_declared ELSE 0.0 END AS rc
  FROM base
)
SELECT lang, n_declared, n_predicted, n_correct,
       round(pr, 6) AS "precision",
       round(rc, 6) AS recall,
       round(CASE WHEN pr + rc > 0 THEN 2.0 * pr * rc / (pr + rc) ELSE 0.0 END, 6) AS f1
FROM m
"""


def x103_coverage_sample(spark, sf_dir):
    """Cluster-coverage subsample (clustering.coverage_sample): a
    200-vector budget allocated across the x30 k-means cells
    proportional to sqrt(cell size) (largest-remainder, capped at cell
    size), each cell's quota drawn by deterministic md5 priority — the
    diversity-preserving alternative to uniform subsampling (head
    clusters capped, tail clusters still represented). The oracle
    replays the x30 Lloyd fixed point then mirrors the x50 allocation
    and x40 priority conventions."""
    emb = _t(spark, sf_dir, "embeddings")
    model = clustering.kmeans_fit(
        emb, k=8, max_iter=3, init="first", round_decimals=6
    )
    return clustering.coverage_sample(emb, model.centroids, budget=200)


X103_SQL = f"""{_kmeans_cells_sql(8, 3, 6)},
sizes AS (SELECT cell, count(*) AS n FROM a4 GROUP BY 1),
ws AS (SELECT SUM(sqrt(CAST(n AS DOUBLE))) AS ws FROM sizes),
scored AS (
  SELECT cell, n,
         floor(sqrt(CAST(n AS DOUBLE)) / ws.ws * 200) AS base,
         sqrt(CAST(n AS DOUBLE)) / ws.ws * 200
           - floor(sqrt(CAST(n AS DOUBLE)) / ws.ws * 200) AS frac
  FROM sizes CROSS JOIN ws
),
alloc AS (
  SELECT cell,
         least(base + CASE WHEN row_number() OVER (ORDER BY frac DESC, cell)
                           <= 200 - SUM(base) OVER () THEN 1 ELSE 0 END,
               n) AS quota
  FROM scored
),
pri AS (
  SELECT cell, vec_id, md5(CAST(vec_id AS VARCHAR) || '-cov') AS h
  FROM a4
),
drawn AS (
  SELECT cell, vec_id,
         row_number() OVER (PARTITION BY cell ORDER BY ({_X40_U}), vec_id) AS rn
  FROM pri
)
SELECT CAST(d.cell AS INT) AS cell, d.vec_id, CAST(d.rn AS BIGINT) AS draw_rank
FROM drawn d JOIN alloc a USING (cell)
WHERE d.rn <= a.quota
"""


def x104_label_separability(spark, sf_dir):
    """Per-dimension Fisher discriminant audit
    (profile.label_separability): between-label vs within-label variance
    per embedding dimension — which dimensions actually separate the
    classes. Sum-of-moments identities over one (dim, label) aggregate;
    the shuffle carries dims x labels rows, never vectors."""
    return profile.label_separability(_t(spark, sf_dir, "embeddings"))


X104_SQL = """
WITH exploded AS (
  SELECT label, generate_subscripts(embedding, 1) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
),
cells AS (
  SELECT dim, label, count(*) AS n, avg(v) AS m, avg(v * v) AS m2
  FROM exploded GROUP BY 1, 2
),
agg AS (
  SELECT dim, count(*) AS n_labels,
         CAST(SUM(n) AS DOUBLE) AS s0,
         SUM(n * m) AS s1,
         SUM(n * m * m) AS s2,
         SUM(n * m2) AS sw
  FROM cells GROUP BY 1
)
SELECT dim, n_labels,
       round(s1 / s0, 6) + 0 AS grand_mean,
       round(s2 / s0 - (s1 / s0) * (s1 / s0), 6) + 0 AS between_var,
       round((sw - s2) / s0, 6) + 0 AS within_var,
       CASE WHEN (sw - s2) / s0 > 0
            THEN round((s2 / s0 - (s1 / s0) * (s1 / s0)) / ((sw - s2) / s0), 6) + 0
       END AS fisher_ratio
FROM agg
"""


def x105_ann_recall(spark, sf_dir):
    """ANN index certification (simsearch.ann_recall): recall@10 of the
    x95 binary Hamming index against the x7 exact cosine baseline, per
    query — the eval a pipeline runs before trusting an ANN tier with
    retrieval traffic. Both sub-scans are the audited index shapes; the
    eval itself joins two broadcast-sized |Q| x k frames."""
    return simsearch.ann_recall(
        _t(spark, sf_dir, "embeddings"), QUERY_IDS, k=10
    )


X105_SQL = f"""
WITH elem AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
norms AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM elem GROUP BY 1),
dots AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, SUM(q.v * c.v) AS dot
  FROM elem q JOIN elem c ON q.i = c.i AND q.vec_id <> c.vec_id
  WHERE q.vec_id IN (0, 1, 2, 3, 4)
  GROUP BY 1, 2
),
sims AS (
  SELECT d.query_id, d.neighbor_id, round(d.dot / (nq.nrm * nc.nrm), 6) AS cosine
  FROM dots d
  JOIN norms nq ON d.query_id = nq.vec_id
  JOIN norms nc ON d.neighbor_id = nc.vec_id
),
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, neighbor_id) AS rank
    FROM sims
  ) WHERE rank <= 10
),
packed AS (
  SELECT vec_id,
         CAST({_x95_word_sql(0)} AS BIGINT) AS w0,
         CAST({_x95_word_sql(1)} AS BIGINT) AS w1
  FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, w0 AS q0, w1 AS q1
  FROM packed WHERE vec_id IN (0, 1, 2, 3, 4)
),
hscored AS (
  SELECT q.query_id, p.vec_id AS neighbor_id,
         bit_count(xor(p.w0, q.q0)) + bit_count(xor(p.w1, q.q1)) AS hamming
  FROM packed p CROSS JOIN q
  WHERE p.vec_id <> q.query_id
),
approx AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY hamming, neighbor_id) AS rank
    FROM hscored
  ) WHERE rank <= 10
)
SELECT e.query_id,
       CAST(count(*) AS BIGINT) AS n_exact,
       CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       round(CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS recall
FROM exact e LEFT JOIN approx a
  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
GROUP BY 1
"""


def x106_dedup_savings(spark, sf_dir):
    """Dedup impact accounting (dedup.dedup_savings): per source, the
    documents and tokens removed when every x67 near-dup cluster keeps
    its best-quality copy (the x84 elect rule) — the before/after report
    a curation pipeline publishes with the dedup pass. The oracle
    extends the X67 recursive-components chain with the X84 quality
    argmax and a source-keyed token rollup."""
    return dedup.dedup_savings(_t(spark, sf_dir, "documents"))


# X67's recursive-components chain, extended (the X84 surgery pattern) with
# the quality elect, the rn>1 removal set, and a per-source token rollup.
X106_SQL = X67_SQL.replace(
    "SELECT node AS doc, MIN(r) AS cluster_id FROM reach GROUP BY node",
    rf""", comp AS (
  SELECT node AS doc, MIN(r) AS cluster_id FROM reach GROUP BY node
),
toks2 AS (
  SELECT doc_id, source, text,
         list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '') AS toks
  FROM documents
),
qual AS (
  SELECT doc_id,
         CAST(round(CASE WHEN n_tokens BETWEEN 10 AND 10000 THEN 0.4 ELSE 0 END
             + CASE WHEN mtl BETWEEN 3.0 AND 10.0 THEN 0.3 ELSE 0 END
             + CASE WHEN swr >= 0.01 THEN 0.2 ELSE 0 END
             + CASE WHEN digr <= 0.2 THEN 0.1 ELSE 0 END, 4) AS DOUBLE) AS q
  FROM (
    SELECT doc_id,
           len(toks) AS n_tokens,
           CAST(list_aggregate(list_transform(toks, t -> length(t)), 'sum') AS DOUBLE)
             / greatest(len(toks), 1) AS mtl,
           CAST(len(list_filter(list_transform(toks, t -> lower(t)),
                    t -> list_contains({_STOP_EN}, t))) AS DOUBLE)
             / greatest(len(toks), 1) AS swr,
           CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
             / greatest(length(text), 1) AS digr
    FROM toks2
  )
),
ranked AS (
  SELECT c.cluster_id, c.doc,
         ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                            ORDER BY qual.q DESC, c.doc) AS rn
  FROM comp c JOIN qual ON qual.doc_id = c.doc
),
removed AS (SELECT doc FROM ranked WHERE rn > 1)
SELECT t.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN r.doc IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS docs_removed,
       CAST(SUM(len(t.toks)) AS BIGINT) AS tokens_total,
       CAST(SUM(CASE WHEN r.doc IS NOT NULL THEN len(t.toks) ELSE 0 END) AS BIGINT) AS tokens_removed,
       round(CAST(SUM(CASE WHEN r.doc IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS doc_savings,
       round(CAST(SUM(CASE WHEN r.doc IS NOT NULL THEN len(t.toks) ELSE 0 END) AS DOUBLE)
             / SUM(len(t.toks)), 6) AS token_savings
FROM toks2 t LEFT JOIN removed r ON t.doc_id = r.doc
GROUP BY 1""",
)


def x107_cohort_retention(spark, sf_dir):
    """Weekly cohort retention matrix (funnel.cohort_retention): users
    cohorted by the ISO week of their first event; per (cohort_week,
    week_offset), active members and the retained fraction. First-event
    times from a per-user window min (one keyed shuffle); the matrix is
    a distinct over (date, long, long) rows — events never shuffle
    twice."""
    return funnel.cohort_retention(_t(spark, sf_dir, "events"))


X107_SQL = """
WITH cohorted AS (
  SELECT user_id,
         CAST(date_trunc('week', ts) AS DATE) AS event_week,
         CAST(date_trunc('week', MIN(ts) OVER (PARTITION BY user_id)) AS DATE)
           AS cohort_week
  FROM events
),
active AS (
  SELECT DISTINCT cohort_week,
         CAST(date_diff('day', cohort_week, event_week) / 7 AS BIGINT)
           AS week_offset,
         user_id
  FROM cohorted
),
counts AS (
  SELECT cohort_week, week_offset, CAST(count(*) AS BIGINT) AS n_active
  FROM active GROUP BY 1, 2
),
sizes AS (
  SELECT cohort_week, n_active AS cohort_size FROM counts WHERE week_offset = 0
)
SELECT c.cohort_week, c.week_offset, c.n_active, s.cohort_size,
       round(CAST(c.n_active AS DOUBLE) / s.cohort_size, 6) AS retention
FROM counts c JOIN sizes s USING (cohort_week)
"""


def x108_funnel_conversion(spark, sf_dir):
    """Ordered funnel (funnel.funnel_conversion): view -> click ->
    purchase, each step reached only by an event strictly after the
    user's previous-step reach time (earliest valid time kept). One
    filtered scan + keyed hash join per step; conversions computed on
    the 3-row summary."""
    return funnel.funnel_conversion(_t(spark, sf_dir, "events"))


X108_SQL = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t FROM events
  WHERE event_type = 'view' GROUP BY 1
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t
  GROUP BY 1
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t
  GROUP BY 1
),
summary AS (
  SELECT 1 AS step_idx, 'view' AS step, CAST(count(*) AS BIGINT) AS n_users FROM s1
  UNION ALL
  SELECT 2, 'click', CAST(count(*) AS BIGINT) FROM s2
  UNION ALL
  SELECT 3, 'purchase', CAST(count(*) AS BIGINT) FROM s3
)
SELECT step_idx, step, n_users,
       round(CAST(n_users AS DOUBLE)
             / first_value(n_users) OVER (ORDER BY step_idx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 6)
         AS conv_from_top,
       round(CAST(n_users AS DOUBLE)
             / COALESCE(lag(n_users) OVER (ORDER BY step_idx), n_users), 6)
         AS conv_from_prev
FROM summary
"""


def x109_rfm_segments(spark, sf_dir):
    """RFM segmentation rollup (funnel.rfm_segments): quartile-score
    every user on recency/frequency/monetary against corpus boundaries
    (one 1-row exact-percentile aggregate broadcast back — no global
    sort, no single-partition ntile), then roll up the <= 64 (r, f, m)
    segments."""
    return funnel.rfm_segments(_t(spark, sf_dir, "events"))


X109_SQL = """
WITH per_user AS (
  SELECT user_id, MAX(ts) AS last_ts, CAST(count(*) AS BIGINT) AS frequency,
         round(SUM(value), 4) AS monetary
  FROM events GROUP BY 1
),
gl AS (
  SELECT MAX(last_ts) AS now_ts,
         quantile_cont(frequency, [0.25, 0.5, 0.75]) AS f_q,
         quantile_cont(monetary, [0.25, 0.5, 0.75]) AS m_q
  FROM per_user
),
scored0 AS (
  SELECT user_id, frequency, monetary,
         date_diff('day', CAST(last_ts AS DATE), CAST(now_ts AS DATE))
           AS recency_days,
         f_q, m_q
  FROM per_user CROSS JOIN gl
),
rq AS (
  SELECT quantile_cont(CAST(recency_days AS DOUBLE), [0.25, 0.5, 0.75]) AS r_q
  FROM scored0
),
scored AS (
  SELECT frequency, monetary,
         5 - (CASE WHEN recency_days <= round(r_q[1], 6) THEN 1
                   WHEN recency_days <= round(r_q[2], 6) THEN 2
                   WHEN recency_days <= round(r_q[3], 6) THEN 3
                   ELSE 4 END) AS r_score,
         CASE WHEN frequency <= round(f_q[1], 6) THEN 1
              WHEN frequency <= round(f_q[2], 6) THEN 2
              WHEN frequency <= round(f_q[3], 6) THEN 3
              ELSE 4 END AS f_score,
         CASE WHEN monetary <= round(m_q[1], 6) THEN 1
              WHEN monetary <= round(m_q[2], 6) THEN 2
              WHEN monetary <= round(m_q[3], 6) THEN 3
              ELSE 4 END AS m_score
  FROM scored0 CROSS JOIN rq
)
SELECT r_score, f_score, m_score,
       CAST(count(*) AS BIGINT) AS n_users,
       round(avg(frequency), 6) AS avg_frequency,
       round(avg(monetary), 6) AS avg_monetary
FROM scored GROUP BY 1, 2, 3
"""


def x110_type_cooccurrence(spark, sf_dir):
    """Market-basket lift between event types
    (funnel.type_cooccurrence_lift): per unordered type pair, users
    exhibiting both, support, confidence, lift over independence. The
    corpus collapses to distinct (user, type) first; the pair self-join
    is co-partitioned on user with C(|types|, 2) per-user fan-out."""
    return funnel.type_cooccurrence_lift(_t(spark, sf_dir, "events"))


X110_SQL = """
WITH utypes AS (SELECT DISTINCT user_id, event_type AS etype FROM events),
tot AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n FROM utypes),
marg AS (
  SELECT etype, CAST(count(*) AS BIGINT) AS n_type FROM utypes GROUP BY 1
),
pairs AS (
  SELECT a.etype AS type_a, b.etype AS type_b,
         CAST(count(*) AS BIGINT) AS n_both
  FROM utypes a JOIN utypes b
    ON a.user_id = b.user_id AND a.etype < b.etype
  GROUP BY 1, 2
)
SELECT type_a, type_b, n_both,
       round(CAST(n_both AS DOUBLE) / t.n, 6) AS support,
       round(CAST(n_both AS DOUBLE) / ma.n_type, 6) AS confidence,
       round(CAST(n_both AS DOUBLE) * t.n
             / (CAST(ma.n_type AS DOUBLE) * mb.n_type), 6) AS lift
FROM pairs
JOIN marg ma ON ma.etype = type_a
JOIN marg mb ON mb.etype = type_b
CROSS JOIN tot t
"""


def x111_session_paths(spark, sf_dir):
    """Top session paths (funnel.session_top_paths): 30-min gap
    sessionization (gaps-and-islands on the per-user window), sessions
    rendered as ordered '>'-joined type strings, top-20 by count with
    (count desc, path asc) tiebreak via TakeOrdered — never a global
    sort."""
    return funnel.session_top_paths(_t(spark, sf_dir, "events"))


X111_SQL = """
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         date_diff('second',
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                   ts) AS gap
  FROM events
),
sess AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(CASE WHEN gap > 1800 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_no
  FROM ordered
),
paths AS (
  SELECT string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM sess GROUP BY user_id, session_no
)
SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
FROM paths GROUP BY 1
ORDER BY n_sessions DESC, path
LIMIT 20
"""


def x112_interarrival_profile(spark, sf_dir):
    """Per-type cadence profile (funnel.interarrival_profile):
    power-of-2-second inter-arrival buckets attributed to the latter
    event's type — burst-vs-slow-cycle separation, the bot/replay
    detection input. Exact integer bucket compares (no float log), one
    keyed lag window, |types| x 18 cells."""
    return funnel.interarrival_profile(_t(spark, sf_dir, "events"))


_X112_CASE = "CASE WHEN gap_s <= 1 THEN 0\n" + "\n".join(
    f"              WHEN gap_s <= {1 << k} THEN {k}" for k in range(1, 17)
) + "\n              ELSE 17 END"

X112_SQL = f"""
WITH gaps AS (
  SELECT event_type,
         date_diff('second',
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                   ts) AS gap_s
  FROM events
),
cells AS (
  SELECT event_type,
         {_X112_CASE} AS gap_bucket,
         CAST(count(*) AS BIGINT) AS n_gaps
  FROM gaps WHERE gap_s IS NOT NULL
  GROUP BY 1, 2
),
tot AS (
  SELECT event_type, CAST(SUM(n_gaps) AS BIGINT) AS n_type
  FROM cells GROUP BY 1
)
SELECT c.event_type, c.gap_bucket, c.n_gaps,
       round(CAST(c.n_gaps AS DOUBLE) / t.n_type, 6) AS share
FROM cells c JOIN tot t USING (event_type)
"""


def x113_lf_agreement(spark, sf_dir):
    """Weak-supervision LF agreement matrix (textstats.lf_agreement):
    pairwise agreement/conflict/co-fire counts of the four quality_score
    component heuristics treated as binary voters — the Snorkel
    label-model input audit. One global 10-sum aggregate; the 6-pair
    matrix is a constant-width stack of the 1-row result."""
    return textstats.lf_agreement(_t(spark, sf_dir, "documents"))


_X113_PAIRS = [
    ("lf_len", "lf_mtl"), ("lf_len", "lf_stop"), ("lf_len", "lf_digit"),
    ("lf_mtl", "lf_stop"), ("lf_mtl", "lf_digit"), ("lf_stop", "lf_digit"),
]

_X113_AGGS = ",\n         ".join(
    f"CAST(SUM(CASE WHEN {a} = {b} THEN 1 ELSE 0 END) AS BIGINT) AS ag_{a}_{b},\n"
    f"         CAST(SUM(CASE WHEN {a} = 1 AND {b} = 1 THEN 1 ELSE 0 END) AS BIGINT)"
    f" AS bo_{a}_{b}"
    for a, b in _X113_PAIRS
)

_X113_ROWS = "\nUNION ALL\n".join(
    f"SELECT '{a}' AS lf_a, '{b}' AS lf_b, ag_{a}_{b} AS n_agree,\n"
    f"       CAST(n_docs - ag_{a}_{b} AS BIGINT) AS n_conflict,\n"
    f"       bo_{a}_{b} AS n_both_fire,\n"
    f"       round(CAST(ag_{a}_{b} AS DOUBLE) / n_docs, 6) AS agree_rate\n"
    f"FROM agg"
    for a, b in _X113_PAIRS
)

X113_SQL = rf"""
WITH base AS (
  SELECT text,
         list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '') AS toks
  FROM documents
),
feats AS (
  SELECT len(toks) AS nt,
         CAST(list_aggregate(list_transform(toks, t -> length(t)), 'sum') AS DOUBLE)
           / greatest(len(toks), 1) AS mtl,
         CAST(len(list_filter(list_transform(toks, t -> lower(t)),
                  t -> list_contains({_STOP_EN}, t))) AS DOUBLE)
           / greatest(len(toks), 1) AS swr,
         CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
           / greatest(length(text), 1) AS digr
  FROM base
),
votes AS (
  SELECT CASE WHEN nt BETWEEN 10 AND 10000 THEN 1 ELSE 0 END AS lf_len,
         CASE WHEN mtl BETWEEN 3.0 AND 10.0 THEN 1 ELSE 0 END AS lf_mtl,
         CASE WHEN swr >= 0.01 THEN 1 ELSE 0 END AS lf_stop,
         CASE WHEN digr <= 0.2 THEN 1 ELSE 0 END AS lf_digit
  FROM feats
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         {_X113_AGGS}
  FROM votes
)
{_X113_ROWS}
"""


def x114_readability(spark, sf_dir):
    """Flesch reading-ease per document (textstats.readability): words /
    sentence-run / vowel-group counts via three regexp counters in one
    codegen'd row-local pass — no explode, no shuffle."""
    return textstats.readability(_t(spark, sf_dir, "documents"))


X114_SQL = r"""
WITH counts AS (
  SELECT doc_id,
         greatest(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                                  t -> t <> '')), 1) AS n_words,
         greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sentences,
         greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1)
           AS n_syllables
  FROM documents
)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(n_sentences AS BIGINT) AS n_sentences,
       CAST(n_syllables AS BIGINT) AS n_syllables,
       round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
             - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 4) AS flesch,
       round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
             - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 4) >= 60.0
         AS is_easy
FROM counts
"""


def x115_vocab_richness(spark, sf_dir):
    """Per-source lexical richness (textstats.vocab_richness): token
    volume, vocabulary size, type-token ratio, hapax share — the cheap
    template detector complementing x94's Zipf slope. One explode into a
    map-side-combinable (source, token) count; the rollup runs on
    vocab-sized cells."""
    return textstats.vocab_richness(_t(spark, sf_dir, "documents"))


X115_SQL = r"""
WITH base AS (
  SELECT source,
         list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                     t -> t <> '') AS toks
  FROM documents
),
flat AS (SELECT source, unnest(toks) AS token FROM base),
cells AS (
  SELECT source, token, CAST(count(*) AS BIGINT) AS cnt
  FROM flat GROUP BY 1, 2
)
SELECT source,
       CAST(SUM(cnt) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       round(CAST(count(*) AS DOUBLE) / SUM(cnt), 6) AS ttr,
       round(CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS hapax_ratio
FROM cells GROUP BY 1
"""


def x116_hourly_bursts(spark, sf_dir):
    """Hourly burst monitor (funnel.hourly_bursts): (event_type, hour)
    cells z-scored against the type's mean/stddev hourly rate over
    observed hours, flagged at z >= 3 — the volume-anomaly check run
    before trusting volume-sensitive stats. Events collapse to cells in
    one aggregate; per-type moments broadcast back."""
    return funnel.hourly_bursts(_t(spark, sf_dir, "events"))


X116_SQL = """
WITH cells AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type, avg(n_events) AS mean_n, stddev_pop(n_events) AS sd_n
  FROM cells GROUP BY 1
)
SELECT c.event_type, c.hour, c.n_events,
       round(s.mean_n, 6) AS mean_hourly,
       CASE WHEN s.sd_n > 0
            THEN round((c.n_events - s.mean_n) / s.sd_n, 6)
            ELSE 0.0 END AS z_score,
       (CASE WHEN s.sd_n > 0
             THEN round((c.n_events - s.mean_n) / s.sd_n, 6)
             ELSE 0.0 END) >= 3.0 AS is_burst
FROM cells c JOIN stats s USING (event_type)
"""


def x117_order_total_audit(spark, sf_dir):
    """Denormalization-consistency audit (reconcile.order_total_audit):
    recompute each order's total from its line items and band the
    relative error vs the stored o_totalprice — the post-load
    referential check. Orderkey-keyed recompute + co-partitioned join;
    the rollup lands on 5 band cells."""
    from ..operators.reconcile import order_total_audit

    return order_total_audit(
        _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "lineitem")
    )


X117_SQL = """
WITH li AS (
  SELECT l_orderkey AS o_orderkey,
         round(SUM(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2)
           AS li_total
  FROM lineitem GROUP BY 1
),
joined AS (
  SELECT round(abs(li.li_total - o.o_totalprice) / o.o_totalprice, 6)
           AS rel_err
  FROM orders o JOIN li USING (o_orderkey)
),
banded AS (
  SELECT rel_err,
         CASE WHEN rel_err <= 0.0 THEN 0
              WHEN rel_err <= 0.0001 THEN 1
              WHEN rel_err <= 0.01 THEN 2
              WHEN rel_err <= 0.05 THEN 3
              ELSE 4 END AS err_band
  FROM joined
),
agg AS (
  SELECT err_band, CAST(count(*) AS BIGINT) AS n_orders,
         round(MIN(rel_err), 6) AS min_rel_err,
         round(MAX(rel_err), 6) AS max_rel_err
  FROM banded GROUP BY 1
),
tot AS (SELECT CAST(SUM(n_orders) AS BIGINT) AS n_total FROM agg)
SELECT err_band, n_orders,
       round(CAST(n_orders AS DOUBLE) / t.n_total, 6) AS share,
       min_rel_err, max_rel_err
FROM agg CROSS JOIN tot t
"""


def x118_scd2_intervals(spark, sf_dir):
    """Type-2 SCD history from the event log (merge.scd2_intervals):
    per-user consecutive runs of the props.k attribute collapsed into
    [valid_from, valid_to) intervals, valid_to NULL on the current row.
    One keyed shuffle drives the lag/cumsum/lead windows."""
    from ..operators.merge import scd2_intervals

    return scd2_intervals(_t(spark, sf_dir, "events"))


X118_SQL = """
WITH marked AS (
  SELECT user_id, ts, event_id,
         CAST(props->>'$.k' AS INTEGER) AS attr,
         CASE WHEN lag(CAST(props->>'$.k' AS INTEGER))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NOT DISTINCT FROM CAST(props->>'$.k' AS INTEGER)
              THEN 0 ELSE 1 END AS is_change
  FROM events
),
runs AS (
  SELECT user_id, ts, attr,
         SUM(is_change) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS run_id
  FROM marked
),
intervals AS (
  SELECT user_id, run_id, MIN(ts) AS valid_from, MIN(attr) AS attr,
         CAST(count(*) AS BIGINT) AS n_events
  FROM runs GROUP BY 1, 2
)
SELECT user_id, attr, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY run_id)
         AS valid_to,
       n_events
FROM intervals
"""


def x119_user_concentration(spark, sf_dir):
    """Traffic-concentration audit (funnel.user_concentration): HHI over
    user event shares + top-10 user share — the hot-key early warning
    for per-user keyed operators. Closed-form 1-row aggregate (no global
    rank); top-k via TakeOrdered with a tie-invariant sum."""
    return funnel.user_concentration(_t(spark, sf_dir, "events"))


X119_SQL = """
WITH per_user AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_u FROM events GROUP BY 1
),
totals AS (
  SELECT CAST(count(*) AS BIGINT) AS n_users,
         CAST(SUM(n_u) AS BIGINT) AS n_events,
         SUM(CAST(n_u AS DOUBLE) * n_u) AS sum_sq
  FROM per_user
),
top AS (
  SELECT CAST(SUM(n_u) AS BIGINT) AS top_events FROM (
    SELECT n_u FROM per_user ORDER BY n_u DESC, user_id LIMIT 10
  )
)
SELECT n_users, n_events,
       round(sum_sq / (CAST(n_events AS DOUBLE) * n_events), 6) AS hhi,
       round(CAST(top_events AS DOUBLE) / n_events, 6) AS top10_share
FROM totals CROSS JOIN top
"""


def x120_brand_discount_corr(spark, sf_dir):
    """Pricing-behavior scan (profile.grouped_correlation): per-brand
    Pearson correlation between line discount and quantity, in closed
    form from the five moment sums (identical expression tree in both
    engines; zero-variance groups NULL). Part broadcasts onto the
    lineitem scan; the shuffle carries |brands| x 6 doubles."""
    return profile.grouped_correlation(
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "part"),
        group_col="p_brand",
        x_col="l_discount",
        y_col="l_quantity",
        join_keys=("l_partkey", "p_partkey"),
    )


X120_SQL = """
WITH joined AS (
  SELECT p.p_brand,
         CAST(l.l_discount AS DOUBLE) AS x,
         CAST(l.l_quantity AS DOUBLE) AS y
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
agg AS (
  SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
  FROM joined GROUP BY 1
)
SELECT p_brand, n,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
            THEN round((n * sxy - sx * sy)
                       / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)),
                       6)
       END AS pearson_r
FROM agg
"""


def x121_nn_hubness(spark, sf_dir):
    """Embedding hubness audit (profile.nn_hubness): in-degree
    distribution of the x6 blocked NN graph, zeros included — the
    high-dimensional hub pathology check run before ANN serving. The
    oracle extends X6's chain with the in-degree left join and
    histogram."""
    return profile.nn_hubness(_t(spark, sf_dir, "embeddings"))


# X6's blocked-NN chain, extended (the X84 surgery pattern) with the
# zero-inclusive in-degree left join and the degree histogram.
X121_SQL = X6_SQL.replace(
    """SELECT vec_id, neighbor_id, cosine, cosine >= 0.9 AS is_near_dup
FROM ranked WHERE rn = 1""",
    """, nn AS (SELECT vec_id, neighbor_id FROM ranked WHERE rn = 1),
indeg AS (
  SELECT e.vec_id, CAST(COALESCE(c.cnt, 0) AS BIGINT) AS in_degree
  FROM (SELECT DISTINCT vec_id FROM embeddings) e
  LEFT JOIN (SELECT neighbor_id, count(*) AS cnt FROM nn GROUP BY 1) c
    ON e.vec_id = c.neighbor_id
),
hist AS (
  SELECT in_degree, CAST(count(*) AS BIGINT) AS n_vectors
  FROM indeg GROUP BY 1
),
tot AS (SELECT CAST(SUM(n_vectors) AS BIGINT) AS n FROM hist)
SELECT in_degree, n_vectors,
       round(CAST(n_vectors AS DOUBLE) / t.n, 6) AS share
FROM hist CROSS JOIN tot t""",
)


def x122_acquisition_mix(spark, sf_dir):
    """New-vs-returning customer mix by order month
    (funnel.acquisition_mix): per month, orders, distinct customers,
    first-ever-month customers, and the new share — the acquisition
    decomposition complementing x107's retention matrix."""
    return funnel.acquisition_mix(_t(spark, sf_dir, "orders"))


X122_SQL = """
WITH base AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         o_custkey AS custkey,
         CAST(date_trunc('month',
              MIN(o_orderdate) OVER (PARTITION BY o_custkey)) AS DATE)
           AS first_month
  FROM orders
)
SELECT month,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(count(DISTINCT custkey) AS BIGINT) AS n_customers,
       CAST(count(DISTINCT CASE WHEN month = first_month THEN custkey END)
            AS BIGINT) AS n_new_customers,
       round(CAST(count(DISTINCT CASE WHEN month = first_month THEN custkey END)
                  AS DOUBLE)
             / count(DISTINCT custkey), 6) AS new_customer_share
FROM base GROUP BY 1
"""


def x123_temperature_mixture(spark, sf_dir):
    """Temperature-sampling mixture design (curation.temperature_mixture,
    alpha = 0.3): per-source token share, alpha-smoothed sampling
    weight, and oversampling factor — the multilingual upweighting step
    before x50/x71 materialize a mixture. G-row math off one keyed
    count + 1-row totals."""
    return curation.temperature_mixture(_t(spark, sf_dir, "documents"))


X123_SQL = rf"""
WITH counts AS (
  SELECT source,
         CAST(SUM(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                                  t -> t <> ''))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1
),
tot AS (SELECT CAST(SUM(n_tokens) AS DOUBLE) AS n_total FROM counts),
shares AS (
  SELECT source, n_tokens,
         n_tokens / t.n_total AS p,
         pow(n_tokens / t.n_total, 0.3) AS pa
  FROM counts CROSS JOIN tot t
),
pt AS (SELECT SUM(pa) AS pa_total FROM shares)
SELECT source, n_tokens,
       round(p, 6) AS token_share,
       round(pa / pt.pa_total, 6) AS sample_weight,
       round((pa / pt.pa_total) / p, 6) AS oversample_factor
FROM shares CROSS JOIN pt
"""


def x124_label_compactness(spark, sf_dir):
    """Intra-class compactness audit (profile.label_compactness): per
    label, member-to-centroid cosine mean/min and the below-0.5 outlier
    share — the mislabel detector complementing x42's between-label
    view. Runs in exploded (label, dim) cell space, the x104 contract."""
    return profile.label_compactness(_t(spark, sf_dir, "embeddings"))


X124_SQL = """
WITH elem AS (
  SELECT vec_id AS vid, label, generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
),
cent AS (SELECT label, i, avg(v) AS c FROM elem GROUP BY 1, 2),
cnorm AS (SELECT label, sqrt(SUM(c * c)) AS cn FROM cent GROUP BY 1),
per_member AS (
  SELECT e.vid, e.label,
         SUM(e.v * c.c) AS dot,
         sqrt(SUM(e.v * e.v)) AS vn
  FROM elem e JOIN cent c ON e.label = c.label AND e.i = c.i
  GROUP BY 1, 2
),
cosines AS (
  SELECT m.label,
         CAST(round(m.dot / (m.vn * n.cn) * 1e6, 0) AS BIGINT) AS icos
  FROM per_member m JOIN cnorm n ON m.label = n.label
)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_members,
       round(CAST(SUM(icos) AS DOUBLE) / count(*) / 1e6, 6) AS mean_cos,
       CAST(MIN(icos) AS DOUBLE) / 1e6 AS min_cos,
       round(CAST(SUM(CASE WHEN icos < 500000 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS outlier_share
FROM cosines GROUP BY 1
"""


def x125_revenue_moving_avg(spark, sf_dir):
    """Daily revenue 7-day moving average + deviation
    (windows.revenue_moving_average): integer-cents frame sums (exact
    sliding arithmetic — no float pane drift), calendar-bounded window.
    The x124 determinism lesson applied to time series."""
    from ..operators.windows import revenue_moving_average

    return revenue_moving_average(_t(spark, sf_dir, "orders"))


X125_SQL = """
WITH daily AS (
  SELECT o_orderdate AS day,
         CAST(round(SUM(o_totalprice) * 100, 0) AS BIGINT) AS rev_cents
  FROM orders GROUP BY 1
),
framed AS (
  SELECT day, rev_cents,
         SUM(rev_cents) OVER (ORDER BY day
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS sum_c,
         CAST(count(*) OVER (ORDER BY day
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
           AS n_in_window
  FROM daily
)
SELECT day,
       round(rev_cents / 100.0, 2) AS revenue,
       n_in_window,
       round((CAST(sum_c AS DOUBLE) / n_in_window) / 100.0, 4) AS moving_avg,
       round(rev_cents / (CAST(sum_c AS DOUBLE) / n_in_window) - 1.0, 6)
         AS deviation
FROM framed
"""


def x126_ship_latency_sla(spark, sf_dir):
    """Fulfilment-latency SLA by return flag (profile.ship_latency_sla):
    integer day lags -> exact mean and interpolated p50/p90 that match
    across engines bit-for-bit; orderkey-keyed join."""
    return profile.ship_latency_sla(
        _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "lineitem")
    )


X126_SQL = """
WITH days AS (
  SELECT l.l_returnflag AS returnflag,
         CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS DOUBLE) AS d
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT returnflag,
       CAST(count(*) AS BIGINT) AS n_lineitems,
       round(avg(d), 4) AS mean_days,
       round(quantile_cont(d, 0.5), 4) AS p50_days,
       round(quantile_cont(d, 0.9), 4) AS p90_days,
       CAST(MAX(d) AS BIGINT) AS max_days
FROM days GROUP BY 1
"""


def x127_nation_clv(spark, sf_dir):
    """CLV geography rollup (profile.nation_clv): per nation, customer
    count, mean/median CLV, and top-decile revenue share — integer-cents
    quantization (the x124/x125 convention) keeps percentile boundaries
    and share sums exact in both engines."""
    return profile.nation_clv(
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "nation"),
    )


X127_SQL = """
WITH clv AS (
  SELECT o_custkey AS c_custkey,
         CAST(round(SUM(o_totalprice) * 100, 0) AS BIGINT) AS clv_cents
  FROM orders GROUP BY 1
),
per_cust AS (
  SELECT n.n_name AS nation, clv.clv_cents
  FROM clv
  JOIN customer c ON clv.c_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
),
bounds AS (
  SELECT nation, quantile_cont(CAST(clv_cents AS DOUBLE), 0.9) AS p90
  FROM per_cust GROUP BY 1
)
SELECT p.nation,
       CAST(count(*) AS BIGINT) AS n_customers,
       round(CAST(SUM(clv_cents) AS DOUBLE) / count(*) / 100.0, 4)
         AS mean_clv,
       round(quantile_cont(CAST(clv_cents AS DOUBLE), 0.5) / 100.0, 4)
         AS median_clv,
       round(CAST(SUM(CASE WHEN clv_cents >= b.p90 THEN clv_cents ELSE 0 END)
                  AS DOUBLE)
             / SUM(clv_cents), 6) AS top_decile_share
FROM per_cust p JOIN bounds b USING (nation)
GROUP BY 1
"""


def x128_transition_matrix(spark, sf_dir):
    """Event-type Markov transition matrix (funnel.transition_matrix):
    per consecutive (prev, next) pair within user histories, the count,
    P(next|prev), marginal P(next), and lift — one keyed lag window,
    |types|^2 cells, broadcast totals."""
    return funnel.transition_matrix(_t(spark, sf_dir, "events"))


X128_SQL = """
WITH seq AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type,
         event_type AS next_type
  FROM events
),
trans AS (
  SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n_trans
  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
),
ft AS (SELECT prev_type, CAST(SUM(n_trans) AS BIGINT) AS n_from
       FROM trans GROUP BY 1),
tt AS (SELECT next_type, CAST(SUM(n_trans) AS BIGINT) AS n_to
       FROM trans GROUP BY 1),
g AS (SELECT CAST(SUM(n_trans) AS DOUBLE) AS n_all FROM trans)
SELECT t.prev_type, t.next_type, t.n_trans,
       round(CAST(t.n_trans AS DOUBLE) / ft.n_from, 6) AS p_next_given_prev,
       round(tt.n_to / g.n_all, 6) AS p_next,
       round((CAST(t.n_trans AS DOUBLE) / ft.n_from)
             / (tt.n_to / g.n_all), 6) AS lift
FROM trans t
JOIN ft USING (prev_type)
JOIN tt USING (next_type)
CROSS JOIN g
"""


def x129_norm_profile(spark, sf_dir):
    """Embedding L2-norm QA histogram (profile.norm_profile): 0.5-wide
    norm bins + zero-vector accounting — the degenerate-encoder check
    before any cosine math. Row-local fold (array-order IEEE adds, no
    shuffle wobble), bin-sized groupBy, broadcast 1-row total."""
    return profile.norm_profile(_t(spark, sf_dir, "embeddings"))


X129_SQL = """
WITH norms AS (
  SELECT sqrt(list_aggregate(
           list_transform(embedding, x -> CAST(x AS DOUBLE) * x), 'sum'))
         AS nrm
  FROM embeddings
),
binned AS (
  SELECT CAST(floor(nrm / 0.5) AS BIGINT) AS bin,
         CASE WHEN nrm = 0.0 THEN 1 ELSE 0 END AS is_zero
  FROM norms
),
hist AS (
  SELECT bin, CAST(count(*) AS BIGINT) AS n_vectors,
         CAST(SUM(is_zero) AS BIGINT) AS n_zero
  FROM binned GROUP BY 1
),
tot AS (SELECT CAST(SUM(n_vectors) AS DOUBLE) AS n FROM hist)
SELECT bin,
       round(bin * CAST(0.5 AS DOUBLE), 2) AS bin_lo,
       round((bin + 1) * CAST(0.5 AS DOUBLE), 2) AS bin_hi,
       n_vectors, n_zero,
       round(n_vectors / t.n, 6) AS share
FROM hist CROSS JOIN tot t
"""


def x130_repeated_sentences(spark, sf_dir):
    """Sentence-granular boilerplate catalog (dedup.repeated_sentences):
    top-20 sentences repeated across >= 2 docs, with doc/occurrence
    counts and the scrub payload — the template detector at real
    sentence boundaries (x86 approximates with fixed-width char grams).
    Map-side collapse to per-sentence counts; TakeOrdered top-k."""
    from ..operators.dedup import repeated_sentences

    return repeated_sentences(_t(spark, sf_dir, "documents"))


X130_SQL = """
WITH sent AS (
  SELECT d.doc_id AS doc, trim(t.s) AS sentence
  FROM documents d,
       unnest(regexp_split_to_array(d.text, '[.!?]+')) AS t(s)
  WHERE length(trim(t.s)) >= 20
),
counts AS (
  SELECT md5(sentence) AS sentence_md5,
         CAST(count(DISTINCT doc) AS BIGINT) AS n_docs,
         CAST(count(*) AS BIGINT) AS n_occurrences,
         MIN(sentence) AS sentence
  FROM sent GROUP BY 1
)
SELECT sentence_md5, n_docs, n_occurrences,
       CAST(length(sentence) AS BIGINT) AS n_chars, sentence
FROM counts WHERE n_docs >= 2
ORDER BY n_docs DESC, sentence_md5
LIMIT 20
"""


def x131_keyness_terms(spark, sf_dir):
    """Per-language distinctive terms (textstats.keyness_terms): top-10
    tokens by add-1 smoothed log rate-ratio vs the rest of the corpus —
    corpus-linguistics keyness (x19's TF-IDF is per-doc; this is
    per-group). Two-phase bounded per-group top-k, vocab-sized cell
    joins, broadcast totals."""
    return textstats.keyness_terms(_t(spark, sf_dir, "documents"))


X131_SQL = r"""
WITH flat AS (
  SELECT lang AS grp,
         unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                            t -> t <> '')) AS token
  FROM documents
),
cells AS (
  SELECT grp, token, CAST(count(*) AS BIGINT) AS c FROM flat GROUP BY 1, 2
),
gt AS (SELECT grp, CAST(SUM(c) AS BIGINT) AS n_g FROM cells GROUP BY 1),
tt AS (SELECT token, CAST(SUM(c) AS BIGINT) AS n_t FROM cells GROUP BY 1),
corpus AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n_all,
         CAST(count(DISTINCT token) AS BIGINT) AS v
  FROM cells
),
scored AS (
  SELECT cells.grp, cells.token, cells.c,
         round(ln(((c + 1) / CAST(n_g + v AS DOUBLE))
                  / ((n_t - c + 1) / CAST(n_all - n_g + v AS DOUBLE))), 6)
           AS keyness
  FROM cells JOIN gt USING (grp) JOIN tt USING (token) CROSS JOIN corpus
)
SELECT grp AS lang, CAST(rank AS BIGINT) AS rank, token,
       c AS n_in_group, keyness
FROM (
  SELECT *, row_number() OVER (PARTITION BY grp
                               ORDER BY keyness DESC, token) AS rank
  FROM scored
)
WHERE rank <= 10
"""


def x132_chunking_audit(spark, sf_dir):
    """RAG-chunking cost accounting (chunking.chunking_audit): per
    chunks-per-doc value, doc counts and source-vs-emitted token sums
    with the overlap overhead factor — the context-window budget check
    before materializing a chunked corpus. Mirrors X21's closed-form
    slice arithmetic."""
    from ..operators.chunking import chunking_audit

    return chunking_audit(_t(spark, sf_dir, "documents"))


X132_SQL = rf"""
WITH toked AS (
  SELECT doc_id, {_NORM_TOKS_SQL} AS tk FROM documents
),
idx AS (
  SELECT doc_id, tk,
         unnest(generate_series(0,
           CAST(greatest(ceil((len(tk) - 20) / 80.0), 1) AS BIGINT) - 1))
           AS chunk_idx
  FROM toked
),
chunks AS (
  SELECT doc_id,
         CAST(len(tk[chunk_idx * 80 + 1 : chunk_idx * 80 + 100]) AS BIGINT)
           AS n_tokens
  FROM idx
),
per_doc AS (
  SELECT doc_id AS doc, CAST(count(*) AS BIGINT) AS n_chunks,
         CAST(SUM(n_tokens) AS BIGINT) AS emitted_tokens
  FROM chunks GROUP BY 1
),
src AS (
  SELECT doc_id AS doc, CAST(len(tk) AS BIGINT) AS source_tokens FROM toked
)
SELECT p.n_chunks, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(s.source_tokens) AS BIGINT) AS source_tokens,
       CAST(SUM(p.emitted_tokens) AS BIGINT) AS emitted_tokens,
       round(CAST(SUM(p.emitted_tokens) AS DOUBLE) / SUM(s.source_tokens), 6)
         AS overhead_factor
FROM per_doc p JOIN src s USING (doc)
GROUP BY 1
"""


def x133_rate_anomalies(spark, sf_dir):
    """Bot/replay-abuse audit (funnel.rate_anomalies): top-20 users by
    peak events-per-minute with volume context — two keyed cell
    aggregates + TakeOrdered, no global sort."""
    return funnel.rate_anomalies(_t(spark, sf_dir, "events"))


X133_SQL = """
WITH cells AS (
  SELECT user_id, date_trunc('minute', ts) AS minute,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
per_user AS (
  SELECT user_id,
         CAST(SUM(n) AS BIGINT) AS n_events,
         CAST(count(*) AS BIGINT) AS n_active_minutes,
         CAST(MAX(n) AS BIGINT) AS peak_per_minute
  FROM cells GROUP BY 1
)
SELECT user_id, n_events, n_active_minutes, peak_per_minute,
       round(CAST(n_events AS DOUBLE) / n_active_minutes, 4)
         AS mean_per_active_minute
FROM per_user
ORDER BY peak_per_minute DESC, user_id
LIMIT 20
"""


def x134_order_aging(spark, sf_dir):
    """Backlog aging (profile.order_aging): per (status, priority),
    count/share/revenue and mean/max age vs the latest order date —
    row-local age projection against a broadcast anchor, one cell
    aggregate; integer-cents revenue (the x125 convention)."""
    return profile.order_aging(_t(spark, sf_dir, "orders"))


X134_SQL = """
WITH anchor AS (SELECT MAX(o_orderdate) AS anchor FROM orders),
aged AS (
  SELECT o_orderstatus, o_orderpriority,
         CAST(date_diff('day', o_orderdate, a.anchor) AS BIGINT) AS age_days,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders CROSS JOIN anchor a
),
cells AS (
  SELECT o_orderstatus, o_orderpriority,
         CAST(count(*) AS BIGINT) AS n_orders,
         round(CAST(SUM(age_days) AS DOUBLE) / count(*), 4) AS mean_age_days,
         MAX(age_days) AS max_age_days,
         round(CAST(SUM(cents) AS DOUBLE) / 100.0, 2) AS revenue
  FROM aged GROUP BY 1, 2
),
tot AS (SELECT CAST(SUM(n_orders) AS DOUBLE) AS n_total FROM cells)
SELECT o_orderstatus, o_orderpriority, n_orders,
       round(n_orders / t.n_total, 6) AS share,
       mean_age_days, max_age_days, revenue
FROM cells CROSS JOIN tot t
"""


def x135_code_switch(spark, sf_dir):
    """Code-switching audit (textstats.code_switch_profile): per doc,
    sentence-level language mix (distinct predicted langs, dominant
    share, is_mixed) from the x10 heuristic applied per sentence —
    (doc, predicted) cells, per-doc argmax window over tiny cells."""
    return textstats.code_switch_profile(_t(spark, sf_dir, "documents"))


_X135_HITS = "\n         ".join(
    f"{_hits_sql(textstats.STOPWORDS[l]).replace('trim(lower(text))', 'trim(lower(sentence))')} AS h_{l},"
    for l in ("en", "es", "fr", "de")
).rstrip(",")

X135_SQL = rf"""
WITH sent AS (
  SELECT d.doc_id AS doc, trim(t.s) AS sentence
  FROM documents d,
       unnest(regexp_split_to_array(d.text, '[.!?]+')) AS t(s)
  WHERE length(trim(t.s)) >= 20
),
hits AS (
  SELECT doc,
         {_X135_HITS}
  FROM sent
),
pred AS (SELECT doc, {_X102_PRED} AS pred FROM hits),
cells AS (
  SELECT doc, pred, CAST(count(*) AS BIGINT) AS n FROM pred GROUP BY 1, 2
),
ranked AS (
  SELECT doc, pred, n,
         row_number() OVER (PARTITION BY doc ORDER BY n DESC, pred) AS rn
  FROM cells
)
SELECT doc AS doc_id,
       CAST(SUM(n) AS BIGINT) AS n_sentences,
       CAST(count(*) AS BIGINT) AS n_langs,
       MIN(CASE WHEN rn = 1 THEN pred END) AS dominant_lang,
       round(CAST(MIN(CASE WHEN rn = 1 THEN n END) AS DOUBLE) / SUM(n), 6)
         AS dominant_share,
       count(*) >= 2 AS is_mixed
FROM ranked GROUP BY 1
"""


def x136_weekday_seasonality(spark, sf_dir):
    """Weekday seasonality + chi-square uniformity contributions
    (funnel.weekday_seasonality): 7 ISO-weekday cells off a row-local
    projection; exact integer counts make the statistic engine-exact."""
    return funnel.weekday_seasonality(_t(spark, sf_dir, "orders"))


X136_SQL = """
WITH cells AS (
  SELECT CAST(isodow(o_orderdate) AS BIGINT) AS weekday,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1
),
tot AS (SELECT CAST(SUM(n_orders) AS DOUBLE) AS n_total FROM cells)
SELECT weekday, n_orders,
       round(n_orders / t.n_total, 6) AS share,
       round(t.n_total / 7.0, 4) AS expected,
       round(n_orders / (t.n_total / 7.0) - 1.0, 6) AS deviation,
       round((n_orders - t.n_total / 7.0) * (n_orders - t.n_total / 7.0)
             / (t.n_total / 7.0), 6) AS chi2_contrib
FROM cells CROSS JOIN tot t
"""


def x137_iqr_outliers(spark, sf_dir):
    """Tukey IQR-fence outliers per market segment
    (profile.iqr_outliers): exact integer-cents quartiles, 1.5-IQR
    fences, outlier counts/shares — one percentile aggregate broadcast
    back + one counting pass."""
    return profile.iqr_outliers(_t(spark, sf_dir, "customer"))


X137_SQL = """
WITH vals AS (
  SELECT c_mktsegment AS grp,
         CAST(round(c_acctbal * 100, 0) AS BIGINT) AS cents
  FROM customer
),
fences AS (
  SELECT grp,
         quantile_cont(CAST(cents AS DOUBLE), 0.25) AS q1c,
         quantile_cont(CAST(cents AS DOUBLE), 0.75) AS q3c
  FROM vals GROUP BY 1
)
SELECT v.grp AS c_mktsegment,
       CAST(count(*) AS BIGINT) AS n,
       round(MIN(q1c) / 100.0, 4) AS q1,
       round(MIN(q3c) / 100.0, 4) AS q3,
       round(MIN(q1c - 1.5 * (q3c - q1c)) / 100.0, 4) AS lo_fence,
       round(MIN(q3c + 1.5 * (q3c - q1c)) / 100.0, 4) AS hi_fence,
       CAST(SUM(CASE WHEN v.cents < q1c - 1.5 * (q3c - q1c)
                       OR v.cents > q3c + 1.5 * (q3c - q1c)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       round(CAST(SUM(CASE WHEN v.cents < q1c - 1.5 * (q3c - q1c)
                             OR v.cents > q3c + 1.5 * (q3c - q1c)
                           THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
         AS outlier_share
FROM vals v JOIN fences f USING (grp)
GROUP BY 1
"""


def x138_value_streaks(spark, sf_dir):
    """Hot-streak detection (funnel.value_streaks): top-5 longest runs
    of consecutive observed days whose daily mean event value beats the
    overall mean — integer-micro day means (engine-exact boundaries),
    two-rank island numbering on the calendar-bounded cell frame,
    TakeOrdered."""
    return funnel.value_streaks(_t(spark, sf_dir, "events"))


X138_SQL = """
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(SUM(CAST(round(value * 1e6, 0) AS BIGINT)) AS BIGINT) AS micro,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
g AS (SELECT CAST(SUM(micro) AS DOUBLE) AS g_micro,
             CAST(SUM(n) AS DOUBLE) AS g_n
      FROM daily),
marked AS (
  SELECT day,
         CAST(micro AS DOUBLE) / n AS day_mean_micro,
         g.g_micro / g.g_n AS glob_mean_micro
  FROM daily CROSS JOIN g
  WHERE CAST(micro AS DOUBLE) / n > g.g_micro / g.g_n
),
runs AS (
  SELECT day, day_mean_micro, glob_mean_micro,
         day - CAST(row_number() OVER (ORDER BY day) AS INTEGER) AS anchor
  FROM marked
)
SELECT MIN(day) AS start_day, MAX(day) AS end_day,
       CAST(count(*) AS BIGINT) AS n_days,
       round(avg(day_mean_micro / glob_mean_micro - 1.0), 6) AS mean_lift
FROM runs GROUP BY anchor
ORDER BY n_days DESC, start_day
LIMIT 5
"""


def x139_bpe_fertility(spark, sf_dir):
    """Tokenizer-fertility fairness audit (bpe.bpe_fertility_by_lang):
    per language, BPE pieces per word and chars per piece under x74's
    10 learned merges — the languages a merge table under-serves pay
    more sequence length per character. Vocab-sized merge application,
    broadcast word->pieces map, language-keyed cells."""
    from ..operators.bpe import bpe_fertility_by_lang

    return bpe_fertility_by_lang(_t(spark, sf_dir, "documents"), n_merges=10)


X139_SQL = f"""{_bpe_chain_sql(10)},
final AS (
  SELECT word, len(string_split(sym, ' ')) AS wp
  FROM sel WHERE it = (SELECT max(it) FROM sel)
),
stream AS (SELECT doc_id, unnest(toks) AS word FROM norm)
SELECT d.lang,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(SUM(length(s.word)) AS BIGINT) AS n_chars,
       CAST(SUM(f.wp) AS BIGINT) AS n_pieces,
       round(CAST(SUM(f.wp) AS DOUBLE) / count(*), 6) AS pieces_per_word,
       round(CAST(SUM(length(s.word)) AS DOUBLE) / SUM(f.wp), 6)
         AS chars_per_piece
FROM stream s
JOIN final f USING (word)
JOIN documents d USING (doc_id)
GROUP BY 1
"""


def x140_isotropy_audit(spark, sf_dir):
    """Per-label embedding isotropy (profile.isotropy_audit): mean
    pairwise cosine across all ordered pairs inside each label via the
    closed form ||SUM(u)||^2 - SUM(||u||^2) on micro-quantized unit
    vectors — one (label, dim) aggregate, no pair join anywhere."""
    return profile.isotropy_audit(_t(spark, sf_dir, "embeddings"))


X140_SQL = """
WITH normed AS (
  SELECT label, vec_id,
         sqrt(list_sum(list_transform(
           embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
         ))) AS nrm,
         embedding
  FROM embeddings
),
q AS (
  SELECT label, vec_id,
         CAST(round(CAST(unnest(embedding) AS DOUBLE) / nrm * 1e6, 0)
              AS BIGINT) AS q
  FROM normed WHERE nrm > 0
),
dims AS (
  SELECT label,
         SUM(q * q) AS selfsq
  FROM q GROUP BY 1
),
svec AS (
  SELECT label, i, SUM(qq) AS s
  FROM (
    SELECT label, vec_id,
           CAST(round(CAST(unnest(embedding) AS DOUBLE) / nrm * 1e6, 0)
                AS BIGINT) AS qq,
           generate_subscripts(embedding, 1) AS i
    FROM normed WHERE nrm > 0
  ) GROUP BY 1, 2
),
ss AS (
  SELECT label, SUM(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) AS ss2
  FROM svec GROUP BY 1
),
cnt AS (
  SELECT label, CAST(count(*) AS BIGINT) AS n
  FROM normed WHERE nrm > 0 GROUP BY 1
)
SELECT c.label, c.n,
       round((ss.ss2 - d.selfsq) / (CAST(c.n AS DOUBLE) * (c.n - 1.0))
             / 1e12, 6) AS mean_pairwise_cosine
FROM cnt c JOIN ss USING (label) JOIN dims d USING (label)
WHERE c.n > 1
"""


def x141_winsorization(spark, sf_dir):
    """Winsorization impact report (profile.winsorization_report): per
    order priority, exact p01/p99 integer-cents fences, clamp counts,
    and the raw->clamped mean shift — one G-row percentile aggregate
    broadcast back + one counting/means pass."""
    return profile.winsorization_report(_t(spark, sf_dir, "orders"))


X141_SQL = """
WITH vals AS (
  SELECT o_orderpriority AS grp,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders
),
fences AS (
  SELECT grp,
         quantile_cont(CAST(cents AS DOUBLE), 0.01) AS loc,
         quantile_cont(CAST(cents AS DOUBLE), 0.99) AS hic
  FROM vals GROUP BY 1
),
agg AS (
  SELECT v.grp,
         CAST(count(*) AS BIGINT) AS n,
         round(MIN(loc) / 100.0, 4) AS lo_fence,
         round(MIN(hic) / 100.0, 4) AS hi_fence,
         CAST(SUM(CASE WHEN v.cents < loc THEN 1 ELSE 0 END) AS BIGINT)
           AS n_lo,
         CAST(SUM(CASE WHEN v.cents > hic THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hi,
         round(avg(CAST(v.cents AS DOUBLE)) / 100.0, 4) AS raw_mean,
         round(avg(LEAST(GREATEST(CAST(v.cents AS DOUBLE), loc), hic))
               / 100.0, 4) AS wins_mean
  FROM vals v JOIN fences f USING (grp)
  GROUP BY 1
)
SELECT grp AS o_orderpriority, n, lo_fence, hi_fence, n_lo, n_hi,
       round(CAST(n_lo + n_hi AS DOUBLE) / n, 6) AS clamp_share,
       raw_mean, wins_mean,
       round(wins_mean - raw_mean, 4) AS mean_shift
FROM agg
"""


def x142_deseasonalized_anomalies(spark, sf_dir):
    """Weekday-adjusted daily revenue anomalies
    (funnel.deseasonalized_anomalies): daily integer-cents cells, 7-row
    weekday factor + 1-row moments broadcast back, |z| >= 2 days only —
    the x125/x136 composition."""
    return funnel.deseasonalized_anomalies(_t(spark, sf_dir, "orders"))


X142_SQL = """
WITH daily AS (
  SELECT o_orderdate AS day,
         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS rev_cents,
         dayofweek(o_orderdate) + 1 AS weekday
  FROM orders GROUP BY 1
),
wk AS (SELECT weekday, avg(rev_cents) AS wk_mean FROM daily GROUP BY 1),
g AS (SELECT avg(rev_cents) AS g_mean FROM daily),
deseason AS (
  SELECT d.day, d.weekday, d.rev_cents,
         d.rev_cents / (w.wk_mean / g.g_mean) AS adj
  FROM daily d JOIN wk w USING (weekday) CROSS JOIN g
),
m AS (SELECT avg(adj) AS m, stddev_pop(adj) AS sd FROM deseason)
SELECT day, weekday,
       round(rev_cents / 100.0, 2) AS revenue,
       round(adj / 100.0, 2) AS deseasonalized,
       CASE WHEN m.sd > 0 THEN round((adj - m.m) / m.sd, 6) ELSE 0.0 END
         AS z_score
FROM deseason CROSS JOIN m
WHERE abs(CASE WHEN m.sd > 0 THEN round((adj - m.m) / m.sd, 6)
               ELSE 0.0 END) >= 2.0
ORDER BY day
"""


def x143_heavy_user_profile(spark, sf_dir):
    """Skew-proof heavy-user profile (funnel.heavy_user_profile):
    salted (user, md5-shard) partial counts/sums folded per user +
    two-stage pair-collapse exact distinct types — no reducer ever
    holds a hot user's full stream; the oracle is the naive single
    GROUP BY, proving plan-for-plan equality."""
    return funnel.heavy_user_profile(_t(spark, sf_dir, "events"))


X143_SQL = """
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
       round(CAST(SUM(CAST(round(value * 1e6, 0) AS BIGINT)) AS DOUBLE)
             / 1e6, 4) AS total_value
FROM events
GROUP BY 1
ORDER BY n_events DESC, user_id
LIMIT 20
"""


def x144_embedding_split_drift(spark, sf_dir):
    """Per-label embedding drift between md5 halves
    (profile.embedding_split_drift): centroid cosine + centroid L2 on
    micro-quantized component sums — one (label, dim) aggregate, the
    vector-space companion to x78's scalar KS."""
    return profile.embedding_split_drift(_t(spark, sf_dir, "embeddings"))


X144_SQL = """
WITH q AS (
  SELECT label,
         CASE WHEN (ascii(substring(md5(CAST(vec_id AS VARCHAR)), 1, 1)) * 256
                  + ascii(substring(md5(CAST(vec_id AS VARCHAR)), 2, 1))) % 100 < 50
              THEN 1 ELSE 0 END AS a,
         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1e6, 0) AS BIGINT)
           AS qv,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
dims AS (
  SELECT label, i,
         SUM(a * qv) AS sa,
         SUM((1 - a) * qv) AS sb,
         SUM(a) AS na_i,
         SUM(1 - a) AS nb_i
  FROM q GROUP BY 1, 2
),
per_label AS (
  SELECT label,
         CAST(MAX(na_i) AS BIGINT) AS n_a,
         CAST(MAX(nb_i) AS BIGINT) AS n_b,
         SUM(CAST(sa AS DOUBLE) * sb) AS dot,
         SUM(CAST(sa AS DOUBLE) * sa) AS aa,
         SUM(CAST(sb AS DOUBLE) * sb) AS bb,
         SUM(pow(CAST(sa AS DOUBLE) / GREATEST(na_i, 1)
                 - CAST(sb AS DOUBLE) / GREATEST(nb_i, 1), 2)) AS dsq
  FROM dims GROUP BY 1
)
SELECT label, n_a, n_b,
       round(dot / sqrt(aa * bb), 6) AS centroid_cosine,
       round(sqrt(dsq) / 1e6, 6) AS centroid_l2
FROM per_label
WHERE n_a > 0 AND n_b > 0 AND aa > 0 AND bb > 0
"""


def x145_fulfillment_latency(spark, sf_dir):
    """Order-completion latency per priority
    (profile.fulfillment_latency): max(l_shipdate) per order joined
    co-partitioned on orderkey, integer day lags, exact
    mean/p50/p90/p99/max per priority cell."""
    return profile.fulfillment_latency(
        _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "lineitem")
    )


X145_SQL = """
WITH last AS (
  SELECT l_orderkey AS o_orderkey, MAX(l_shipdate) AS last_ship
  FROM lineitem GROUP BY 1
),
days AS (
  SELECT o.o_orderpriority,
         CAST(date_diff('day', o.o_orderdate, l.last_ship) AS DOUBLE) AS d
  FROM orders o JOIN last l USING (o_orderkey)
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(avg(d), 4) AS mean_days,
       round(quantile_cont(d, 0.5), 4) AS p50_days,
       round(quantile_cont(d, 0.9), 4) AS p90_days,
       round(quantile_cont(d, 0.99), 4) AS p99_days,
       CAST(MAX(d) AS BIGINT) AS max_days
FROM days GROUP BY 1
"""


def x146_lm_score_deciles(spark, sf_dir):
    """Perplexity-filtering decile report (textstats.lm_score_deciles):
    y1's held-out stupid-backoff doc scores bucketed by 9 exact decile
    edges (1-row broadcast), 10-cell band rollup — the keep-threshold
    artifact for CCNet-style perplexity filtering."""
    assigned = _split_docs(spark, sf_dir)
    return textstats.lm_score_deciles(
        assigned.where(F.col("split") == "train"),
        assigned.where(F.col("split") != "train"),
    )


X146_SQL = f"""
WITH perdoc AS ({Y1_SQL}),
edges AS (
  SELECT quantile_cont(mean_logscore,
           [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS e
  FROM perdoc
),
banded AS (
  SELECT p.n_transitions, p.n_backoff, p.mean_logscore,
         1 + len(list_filter(e.e, x -> p.mean_logscore > x)) AS decile
  FROM perdoc p CROSS JOIN edges e
)
SELECT decile,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(mean_logscore), 4) AS mean_logscore,
       round(avg(CAST(n_backoff AS DOUBLE) / n_transitions), 6)
         AS mean_backoff_share,
       CAST(SUM(n_transitions) AS BIGINT) AS n_transitions
FROM banded GROUP BY 1
"""


def x147_benford_audit(spark, sf_dir):
    """Benford first-digit forensic audit on order totals
    (profile.benford_audit): 9-cell digit histogram vs log10(1+1/d)
    expectation with chi-square contributions — one map-side aggregate
    + broadcast 1-row total."""
    return profile.benford_audit(_t(spark, sf_dir, "orders"))


X147_SQL = """
WITH cells AS (
  SELECT CAST(substring(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT)
                             AS VARCHAR), 1, 1) AS INT) AS digit,
         CAST(count(*) AS BIGINT) AS n
  FROM orders
  WHERE CAST(round(o_totalprice * 100, 0) AS BIGINT) > 0
  GROUP BY 1
),
tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS total FROM cells)
SELECT digit, n,
       round(n / total, 6) AS obs_share,
       round(log10(1.0 + 1.0 / digit), 6) AS exp_share,
       round(n / total - log10(1.0 + 1.0 / digit), 6) AS deviation,
       round(total * pow(n / total - log10(1.0 + 1.0 / digit), 2)
             / log10(1.0 + 1.0 / digit), 6) AS chi2_contrib
FROM cells CROSS JOIN tot
ORDER BY digit
"""


def x148_neardup_contamination(spark, sf_dir):
    """Near-duplicate split contamination
    (dedup.neardup_split_contamination): x3's banded MinHash-LSH
    candidates (md5 hash family, hot-bucket cap) filtered to
    cross-split pairs with est_jaccard >= 0.5, rolled up per split
    pair — the fuzzy companion to y4's exact n-gram check."""
    return dedup.neardup_split_contamination(
        _split_docs(spark, sf_dir), hash_fn="md5"
    )


X148_SQL = f"""
WITH cand AS ({X3_SQL}),
sp AS (
  SELECT doc_id,
         CASE WHEN ({_Y_SPLIT_INNER}) < 5 THEN 'val'
              WHEN ({_Y_SPLIT_INNER}) < 15 THEN 'test'
              ELSE 'train' END AS split
  FROM documents
),
labeled AS (
  SELECT LEAST(sa.split, sb.split) AS split_lo,
         GREATEST(sa.split, sb.split) AS split_hi,
         p.id_a, p.id_b, p.est_jaccard
  FROM cand p
  JOIN sp sa ON p.id_a = sa.doc_id
  JOIN sp sb ON p.id_b = sb.doc_id
  WHERE sa.split <> sb.split AND p.est_jaccard >= 0.5
),
per_pair AS (
  SELECT split_lo, split_hi,
         CAST(count(*) AS BIGINT) AS n_pairs,
         round(avg(est_jaccard), 6) AS mean_est_jaccard
  FROM labeled GROUP BY 1, 2
),
involved AS (
  SELECT split_lo, split_hi,
         CAST(count(*) AS BIGINT) AS n_docs_involved
  FROM (
    SELECT DISTINCT split_lo, split_hi, d
    FROM (
      SELECT split_lo, split_hi, unnest([id_a, id_b]) AS d FROM labeled
    )
  ) GROUP BY 1, 2
)
SELECT split_lo, split_hi, n_pairs, n_docs_involved, mean_est_jaccard
FROM per_pair JOIN involved USING (split_lo, split_hi)
"""


def x149_revenue_trend(spark, sf_dir):
    """Per-priority revenue time trend (funnel.revenue_trend):
    population OLS of integer-cents daily revenue on the day index via
    the built-in regr_* family — (group, day) cells + a broadcast 1-row
    min date + a G-cell regression aggregate."""
    return funnel.revenue_trend(_t(spark, sf_dir, "orders"))


X149_SQL = """
WITH daily AS (
  SELECT o_orderpriority AS grp, o_orderdate AS day,
         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1, 2
),
t0 AS (SELECT MIN(day) AS d0 FROM daily),
pts AS (
  SELECT grp,
         CAST(date_diff('day', t0.d0, day) AS DOUBLE) AS x,
         CAST(cents AS DOUBLE) / 100.0 AS y
  FROM daily CROSS JOIN t0
)
SELECT grp AS o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_days,
       round(regr_slope(y, x), 4) AS slope_per_day,
       round(regr_intercept(y, x), 4) AS intercept,
       round(regr_r2(y, x), 6) AS r2
FROM pts GROUP BY 1
"""


def x150_l_diversity(spark, sf_dir):
    """l-diversity release gate (quality.l_diversity_report): per
    (nation, segment) quasi-identifier class over customers, the
    distinct count and entropy of the generalized balance band — the
    uniform-sensitive-value attack k-anonymity (x61) can't see."""
    from ..operators.quality import l_diversity_report

    cust = _t(spark, sf_dir, "customer")
    return l_diversity_report(
        cust,
        {
            "nationkey": F.col("c_nationkey"),
            "segment": F.col("c_mktsegment"),
        },
        F.floor(F.col("c_acctbal") / 2000).cast("long"),
    )


X150_SQL = """
WITH cells AS (
  SELECT c_nationkey AS nationkey, c_mktsegment AS segment,
         CAST(floor(c_acctbal / 2000) AS BIGINT) AS sv,
         CAST(count(*) AS BIGINT) AS c
  FROM customer GROUP BY 1, 2, 3
)
SELECT nationkey, segment,
       CAST(SUM(c) AS BIGINT) AS k,
       CAST(count(*) AS BIGINT) AS l_distinct,
       round(ln(CAST(SUM(c) AS DOUBLE))
             - SUM(CAST(c AS DOUBLE) * ln(c)) / SUM(c), 6) AS entropy,
       count(*) < 3 AS at_risk
FROM cells GROUP BY 1, 2
"""


def x151_basket_lift(spark, sf_dir):
    """Brand-level market-basket lift (funnel.basket_lift): partkey-
    keyed lineitem->part attachment, distinct (order, brand) baskets,
    orderkey-keyed pair self-join bounded at |brands|^2 per order,
    brand-cell rollup + broadcast 1-row order total."""
    return funnel.basket_lift(
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part")
    )


X151_SQL = """
WITH items AS (
  SELECT l.l_orderkey, p.p_brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
baskets AS (SELECT DISTINCT l_orderkey AS okey, p_brand AS brand FROM items),
n AS (SELECT CAST(count(DISTINCT okey) AS DOUBLE) AS n_orders FROM baskets),
marg AS (
  SELECT brand, CAST(count(*) AS BIGINT) AS nb FROM baskets GROUP BY 1
),
pairs AS (
  SELECT a.brand AS brand_a, b.brand AS brand_b,
         CAST(count(*) AS BIGINT) AS n_pair
  FROM baskets a JOIN baskets b ON a.okey = b.okey AND a.brand < b.brand
  GROUP BY 1, 2
  HAVING count(*) >= 2
)
SELECT p.brand_a, p.brand_b, p.n_pair,
       ma.nb AS n_a, mb.nb AS n_b,
       round(p.n_pair / n.n_orders, 6) AS support,
       round(p.n_pair * n.n_orders / (CAST(ma.nb AS DOUBLE) * mb.nb), 6)
         AS lift
FROM pairs p
JOIN marg ma ON p.brand_a = ma.brand
JOIN marg mb ON p.brand_b = mb.brand
CROSS JOIN n
"""


def x152_truncation_loss(spark, sf_dir):
    """Context-window truncation loss audit
    (textstats.truncation_loss): row-local token counts folded into
    256-token length bands with tokens lost beyond a 512 window — the
    truncate-vs-chunk sizing table."""
    return textstats.truncation_loss(_t(spark, sf_dir, "documents"))


X152_SQL = f"""
WITH norm AS (SELECT doc_id, {_X67_NORM} AS toks FROM documents),
cells AS (
  SELECT CAST(floor(len(toks) / 256) AS BIGINT) AS band,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(toks)) AS BIGINT) AS total_tokens,
         CAST(SUM(GREATEST(len(toks) - 512, 0)) AS BIGINT) AS lost_tokens
  FROM norm GROUP BY 1
)
SELECT band, band * 256 AS band_lo, (band + 1) * 256 - 1 AS band_hi,
       n_docs, total_tokens, lost_tokens,
       round(CAST(lost_tokens AS DOUBLE) / total_tokens, 6) AS loss_share
FROM cells
"""


def x153_rolling_active_users(spark, sf_dir):
    """Exact rolling 7-day active users (funnel.rolling_active_users):
    one corpus-sized (user, day) cell aggregate, x7 fan-out on the CELL
    frame (never events), distinct fold per window end clamped to the
    observed max day."""
    return funnel.rolling_active_users(_t(spark, sf_dir, "events"))


X153_SQL = """
WITH cells AS (
  SELECT user_id AS u, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
maxd AS (SELECT MAX(day) AS max_day FROM cells),
fanned AS (
  SELECT c.u, c.n, c.day + CAST(i AS INT) AS win_end
  FROM cells c, unnest(generate_series(0, 6)) AS g(i)
  CROSS JOIN maxd m
  WHERE c.day + CAST(i AS INT) <= m.max_day
)
SELECT win_end AS day,
       CAST(count(DISTINCT u) AS BIGINT) AS active_users,
       CAST(SUM(n) AS BIGINT) AS n_events
FROM fanned
GROUP BY 1
"""


def x154_session_timeout_sweep(spark, sf_dir):
    """Sessionization sensitivity sweep (funnel.session_timeout_sweep):
    per-user lag gaps in integer microseconds, ONE 1-row aggregate with
    a conditional count per timeout, stacked to a row per threshold."""
    return funnel.session_timeout_sweep(_t(spark, sf_dir, "events"))


X154_SQL = """
WITH gaps AS (
  SELECT user_id AS u,
         epoch_us(ts) - epoch_us(lag(ts) OVER (
           PARTITION BY user_id ORDER BY ts, event_id)) AS gap
  FROM events
),
one AS (
  SELECT CAST(count(DISTINCT u) AS BIGINT) AS n_users,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(SUM(CASE WHEN gap > 300000000 THEN 1 ELSE 0 END) AS BIGINT) AS g300,
         CAST(SUM(CASE WHEN gap > 900000000 THEN 1 ELSE 0 END) AS BIGINT) AS g900,
         CAST(SUM(CASE WHEN gap > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS g1800,
         CAST(SUM(CASE WHEN gap > 3600000000 THEN 1 ELSE 0 END) AS BIGINT) AS g3600
  FROM gaps
)
SELECT t.timeout_s,
       n_users + t.g AS n_sessions,
       round(CAST(n_rows AS DOUBLE) / (n_users + t.g), 6)
         AS events_per_session
FROM one, LATERAL (
  SELECT * FROM (VALUES
    (CAST(300 AS BIGINT), g300),
    (CAST(900 AS BIGINT), g900),
    (CAST(1800 AS BIGINT), g1800),
    (CAST(3600 AS BIGINT), g3600)
  ) AS v(timeout_s, g)
) t
"""


def x155_conversion_latency(spark, sf_dir):
    """View->purchase time-to-convert summary
    (funnel.conversion_latency): user-keyed conditional mins
    (co-partitioned join, no window), integer-micro lags, 1-row
    summary with rate + mean/p50/p90 seconds."""
    return funnel.conversion_latency(_t(spark, sf_dir, "events"))


X155_SQL = """
WITH per_user AS (
  SELECT user_id AS u,
         MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_from
  FROM events GROUP BY 1
),
conv AS (
  SELECT e.user_id AS u, MIN(p.t_from) AS t_from,
         MIN(CASE WHEN e.event_type = 'purchase'
                   AND epoch_us(e.ts) >= p.t_from
                  THEN epoch_us(e.ts) END) AS t_to
  FROM events e JOIN per_user p ON e.user_id = p.u
  WHERE p.t_from IS NOT NULL
  GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_with_view,
       CAST(count(t_to) AS BIGINT) AS n_converted,
       round(CAST(count(t_to) AS DOUBLE) / count(*), 6) AS conversion_rate,
       round(avg((t_to - t_from) / 1e6), 4) AS mean_latency_s,
       round(quantile_cont((t_to - t_from) / 1e6, 0.5), 4) AS p50_latency_s,
       round(quantile_cont((t_to - t_from) / 1e6, 0.9), 4) AS p90_latency_s
FROM conv
"""


def x156_wilson_error_rates(spark, sf_dir):
    """Wilson-lower-bound error-rate screening
    (funnel.wilson_error_rates): one user-keyed aggregate, closed-form
    Wilson interval from exact integers, top-20 by lower bound — the
    small-sample-proof ranking."""
    return funnel.wilson_error_rates(_t(spark, sf_dir, "events"))


X156_SQL = """
WITH cells AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_errors
  FROM events GROUP BY 1
),
scored AS (
  SELECT user_id, n_events, n_errors,
         round(CAST(n_errors AS DOUBLE) / n_events, 6) AS error_share,
         round(((CAST(n_errors AS DOUBLE) / n_events
                 + 3.8416 / (2 * n_events))
                - 1.96 * sqrt((CAST(n_errors AS DOUBLE) / n_events
                               * (1 - CAST(n_errors AS DOUBLE) / n_events)
                               + 3.8416 / (4 * n_events)) / n_events))
               / (1 + 3.8416 / n_events), 6) AS wilson_lo,
         round(((CAST(n_errors AS DOUBLE) / n_events
                 + 3.8416 / (2 * n_events))
                + 1.96 * sqrt((CAST(n_errors AS DOUBLE) / n_events
                               * (1 - CAST(n_errors AS DOUBLE) / n_events)
                               + 3.8416 / (4 * n_events)) / n_events))
               / (1 + 3.8416 / n_events), 6) AS wilson_hi
  FROM cells
)
SELECT user_id, n_events, n_errors, error_share, wilson_lo, wilson_hi
FROM scored
ORDER BY wilson_lo DESC, user_id
LIMIT 20
"""


def x157_heaps_law(spark, sf_dir):
    """Heaps'-law vocabulary growth fit (textstats.heaps_law): 10 md5
    corpus prefixes, cumulative-distinct via per-type min bucket (one
    corpus aggregate, never prefix re-scans), ln-ln OLS via regr_* on
    the 10-point frame."""
    return textstats.heaps_law(_t(spark, sf_dir, "documents"))


X157_SQL = f"""
WITH norm AS (
  SELECT (ascii(substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 256
          + ascii(substring(md5(CAST(doc_id AS VARCHAR)), 2, 1))) % 10 AS b,
         {_X67_NORM} AS toks
  FROM documents
),
tok AS (SELECT b, unnest(toks) AS t FROM norm),
per_bucket AS (
  SELECT b, CAST(count(*) AS BIGINT) AS n_tok FROM tok GROUP BY 1
),
new_types AS (
  SELECT b, CAST(count(*) AS BIGINT) AS n_new
  FROM (SELECT t, MIN(b) AS b FROM tok GROUP BY 1) GROUP BY 1
),
cells AS (
  SELECT COALESCE(p.b, n.b) AS b,
         COALESCE(p.n_tok, 0) AS n_tok,
         COALESCE(n.n_new, 0) AS n_new
  FROM per_bucket p FULL JOIN new_types n USING (b)
),
pts AS (
  SELECT b + 1 AS k,
         CAST(SUM(n_tok) OVER (ORDER BY b) AS BIGINT) AS cum_tokens,
         CAST(SUM(n_new) OVER (ORDER BY b) AS BIGINT) AS cum_types
  FROM cells
),
kept AS (SELECT * FROM pts WHERE cum_tokens > 0),
fit AS (
  SELECT round(regr_slope(ln(cum_types), ln(cum_tokens)), 6) + 0.0 AS beta,
         round(exp(regr_intercept(ln(cum_types), ln(cum_tokens))), 4)
           AS heaps_k
  FROM kept
)
SELECT k, cum_tokens, cum_types, beta, heaps_k
FROM kept CROSS JOIN fit
"""


def x158_filter_agreement(spark, sf_dir):
    """Quality-filter agreement matrix (textstats.filter_agreement):
    x18's three rejection reasons as independent row-local flags, ONE
    1-row aggregate of 6 conditional sums, constant-width stack to the
    3 unordered pairs with overlap Jaccard."""
    return textstats.filter_agreement(_t(spark, sf_dir, "documents"))


X158_SQL = r"""
WITH flags AS (
  SELECT CASE WHEN len(list_filter(
                regexp_split_to_array(trim(text), '\s+'), t -> t <> ''
              )) < 20 THEN 1 ELSE 0 END AS fa,
         CASE WHEN CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))
                        AS DOUBLE) / greatest(length(text), 1) > 0.2
              THEN 1 ELSE 0 END AS fb,
         CASE WHEN CAST(list_aggregate(list_transform(
                     list_filter(regexp_split_to_array(trim(text), '\s+'),
                                 t -> t <> ''),
                     t -> length(t)), 'sum') AS DOUBLE)
                   / greatest(len(list_filter(
                       regexp_split_to_array(trim(text), '\s+'),
                       t -> t <> '')), 1) < 3.0
              THEN 1 ELSE 0 END AS fd
  FROM documents
),
one AS (
  SELECT CAST(SUM(fa) AS BIGINT) AS na, CAST(SUM(fb) AS BIGINT) AS nb,
         CAST(SUM(fd) AS BIGINT) AS nd,
         CAST(SUM(fa * fb) AS BIGINT) AS nab,
         CAST(SUM(fa * fd) AS BIGINT) AS nad,
         CAST(SUM(fb * fd) AS BIGINT) AS nbd
  FROM flags
),
stacked AS (
  SELECT 'too_few_tokens' AS filter_a, 'too_many_digits' AS filter_b,
         na AS n_a, nb AS n_b, nab AS n_both FROM one
  UNION ALL
  SELECT 'too_few_tokens', 'tokens_too_short', na, nd, nad FROM one
  UNION ALL
  SELECT 'too_many_digits', 'tokens_too_short', nb, nd, nbd FROM one
)
SELECT filter_a, filter_b, n_a, n_b, n_both,
       CASE WHEN n_a + n_b - n_both > 0
            THEN round(CAST(n_both AS DOUBLE) / (n_a + n_b - n_both), 6)
            ELSE 0.0 END AS jaccard
FROM stacked
"""


def x159_vocab_coverage(spark, sf_dir):
    """Vocabulary coverage by language (textstats.vocab_coverage_by_
    lang): token- and type-level OOV shares of the held-out md5 splits
    under the train-split vocabulary — word-keyed left join, language
    cells."""
    assigned = _split_docs(spark, sf_dir)
    return textstats.vocab_coverage_by_lang(
        assigned.where(F.col("split") == "train"),
        assigned.where(F.col("split") != "train"),
    )


X159_SQL = f"""
WITH base AS (
  SELECT doc_id, lang, {_X67_NORM} AS toks,
         {_Y_SPLIT_CASE} AS split
  FROM (SELECT doc_id, lang, text, {_Y_SPLIT_INNER} AS b FROM documents)
),
vocab AS (
  SELECT DISTINCT unnest(toks) AS word FROM base WHERE split = 'train'
),
held AS (
  SELECT b.lang, u.word, v.word IS NOT NULL AS in_vocab
  FROM base b, unnest(b.toks) AS u(word)
  LEFT JOIN vocab v ON u.word = v.word
  WHERE b.split <> 'train'
),
tok AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN NOT in_vocab THEN 1 ELSE 0 END) AS BIGINT)
           AS oov_tokens
  FROM held GROUP BY 1
),
typ AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_types,
         CAST(SUM(CASE WHEN NOT in_vocab THEN 1 ELSE 0 END) AS BIGINT)
           AS oov_types
  FROM (SELECT DISTINCT lang, word, in_vocab FROM held) GROUP BY 1
)
SELECT lang, n_tokens, oov_tokens,
       round(CAST(oov_tokens AS DOUBLE) / n_tokens, 6) AS oov_token_share,
       n_types, oov_types,
       round(CAST(oov_types AS DOUBLE) / n_types, 6) AS oov_type_share
FROM tok JOIN typ USING (lang)
"""


def x160_fk_coverage(spark, sf_dir):
    """Whole-schema FK integrity matrix (quality.fk_coverage_matrix):
    one left-anti join per FK edge of the TPC-H-ish graph, orphan
    counts/shares per edge — q28's one-edge orphan check generalized."""
    from ..operators.quality import fk_coverage_matrix

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return fk_coverage_matrix(
        {
            "orders.custkey": (o, F.col("o_custkey"), c, F.col("c_custkey")),
            "lineitem.orderkey": (
                li, F.col("l_orderkey"), o, F.col("o_orderkey")),
            "lineitem.partkey": (
                li, F.col("l_partkey"), p, F.col("p_partkey")),
            "lineitem.suppkey": (
                li, F.col("l_suppkey"), s, F.col("s_suppkey")),
            "customer.nationkey": (
                c, F.col("c_nationkey"), n, F.col("n_nationkey")),
            "supplier.nationkey": (
                s, F.col("s_nationkey"), n, F.col("n_nationkey")),
            "nation.regionkey": (
                n, F.col("n_regionkey"), r, F.col("r_regionkey")),
        }
    )


X160_SQL = """
WITH e1 AS (
  SELECT 'orders.custkey' AS edge, CAST(count(*) AS BIGINT) AS n_child,
         CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_orphans
  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
),
e2 AS (
  SELECT 'lineitem.orderkey', CAST(count(*) AS BIGINT),
         CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
              AS BIGINT)
  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
),
e3 AS (
  SELECT 'lineitem.partkey', CAST(count(*) AS BIGINT),
         CAST(SUM(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END)
              AS BIGINT)
  FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
),
e4 AS (
  SELECT 'lineitem.suppkey', CAST(count(*) AS BIGINT),
         CAST(SUM(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END)
              AS BIGINT)
  FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
),
e5 AS (
  SELECT 'customer.nationkey', CAST(count(*) AS BIGINT),
         CAST(SUM(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END)
              AS BIGINT)
  FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
),
e6 AS (
  SELECT 'supplier.nationkey', CAST(count(*) AS BIGINT),
         CAST(SUM(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END)
              AS BIGINT)
  FROM supplier s LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
),
e7 AS (
  SELECT 'nation.regionkey', CAST(count(*) AS BIGINT),
         CAST(SUM(CASE WHEN r.r_regionkey IS NULL THEN 1 ELSE 0 END)
              AS BIGINT)
  FROM nation n LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
),
u AS (
  SELECT * FROM e1 UNION ALL SELECT * FROM e2 UNION ALL SELECT * FROM e3
  UNION ALL SELECT * FROM e4 UNION ALL SELECT * FROM e5
  UNION ALL SELECT * FROM e6 UNION ALL SELECT * FROM e7
)
SELECT edge, n_child, n_orphans,
       round(CAST(n_orphans AS DOUBLE) / GREATEST(n_child, 1), 6)
         AS orphan_share
FROM u
"""


def x161_churn_risk(spark, sf_dir):
    """Personal-cadence churn risk per segment (funnel.churn_risk):
    custkey-keyed lag gaps, per-customer median gap, broadcast anchor
    date, at-risk = silence > 2x own median; segment cells."""
    return funnel.churn_risk(
        _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    )


X161_SQL = """
WITH gaps AS (
  SELECT o_custkey, o_orderdate,
         date_diff('day', lag(o_orderdate) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           o_orderdate) AS gap
  FROM orders
),
per_cust AS (
  SELECT o_custkey,
         CAST(count(*) AS BIGINT) AS n_orders,
         MAX(o_orderdate) AS last_date,
         quantile_cont(CAST(gap AS DOUBLE), 0.5) AS med_gap
  FROM gaps GROUP BY 1
  HAVING count(*) >= 3
),
anchor AS (SELECT MAX(o_orderdate) AS max_date FROM orders),
flagged AS (
  SELECT p.o_custkey, p.med_gap,
         CASE WHEN date_diff('day', p.last_date, a.max_date)
                   > 2.0 * p.med_gap THEN 1 ELSE 0 END AS at_risk
  FROM per_cust p CROSS JOIN anchor a
)
SELECT c.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(SUM(f.at_risk) AS BIGINT) AS n_at_risk,
       round(CAST(SUM(f.at_risk) AS DOUBLE) / count(*), 6)
         AS at_risk_share,
       round(quantile_cont(f.med_gap, 0.5), 4)
         AS median_personal_gap_days
FROM flagged f JOIN customer c ON f.o_custkey = c.c_custkey
GROUP BY 1
"""


def x162_clean_eval(spark, sf_dir):
    """Decontaminated-eval extraction accounting
    (dedup.clean_eval_report): held-out docs surviving exclusion of
    every x3-candidate near-dup of a TRAIN doc (md5 hash family,
    est Jaccard >= 0.5), per language."""
    return dedup.clean_eval_report(_split_docs(spark, sf_dir), hash_fn="md5")


X162_SQL = f"""
WITH cand AS ({X3_SQL}),
sp AS (
  SELECT doc_id, lang,
         CASE WHEN ({_Y_SPLIT_INNER}) < 5 THEN 'val'
              WHEN ({_Y_SPLIT_INNER}) < 15 THEN 'test'
              ELSE 'train' END AS split
  FROM documents
),
labeled AS (
  SELECT p.id_a, p.id_b, sa.split AS sp_a, sb.split AS sp_b
  FROM cand p
  JOIN sp sa ON p.id_a = sa.doc_id
  JOIN sp sb ON p.id_b = sb.doc_id
  WHERE p.est_jaccard >= 0.5
),
contaminated AS (
  SELECT DISTINCT id FROM (
    SELECT id_b AS id FROM labeled
    WHERE sp_a = 'train' AND sp_b <> 'train'
    UNION
    SELECT id_a FROM labeled
    WHERE sp_b = 'train' AND sp_a <> 'train'
  )
),
held AS (SELECT doc_id, lang FROM sp WHERE split <> 'train'),
kept AS (
  SELECT h.lang, CAST(count(*) AS BIGINT) AS n_kept
  FROM held h LEFT JOIN contaminated c ON h.doc_id = c.id
  WHERE c.id IS NULL
  GROUP BY 1
),
tot AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_heldout
  FROM held GROUP BY 1
)
SELECT t.lang, t.n_heldout,
       COALESCE(k.n_kept, 0) AS n_kept,
       t.n_heldout - COALESCE(k.n_kept, 0) AS n_excluded,
       round(CAST(COALESCE(k.n_kept, 0) AS DOUBLE) / t.n_heldout, 6)
         AS kept_share
FROM tot t LEFT JOIN kept k USING (lang)
"""


def x163_vocab_budget(spark, sf_dir):
    """Vocabulary budget coverage curve (textstats.vocab_budget_curve):
    top-K-types token coverage via the count-value histogram cumsum
    (tiny frame), block-aligned on frequency ties."""
    return textstats.vocab_budget_curve(_t(spark, sf_dir, "documents"))


X163_SQL = f"""
WITH norm AS (SELECT {_X67_NORM} AS toks FROM documents),
vocab AS (
  SELECT t, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(toks) AS t FROM norm) GROUP BY 1
),
hist AS (
  SELECT c, CAST(count(*) AS BIGINT) AS n_types,
         CAST(c * count(*) AS BIGINT) AS n_tokens
  FROM vocab GROUP BY 1
),
cum AS (
  SELECT CAST(SUM(n_types) OVER (ORDER BY c DESC) AS BIGINT) AS cum_types,
         CAST(SUM(n_tokens) OVER (ORDER BY c DESC) AS BIGINT) AS cum_tokens
  FROM hist
),
tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS total_tokens FROM vocab),
tgt AS (SELECT unnest([100, 1000, 5000, 10000]) AS target_k),
best AS (
  SELECT t.target_k, CAST(MIN(c.cum_types) AS BIGINT) AS k_eff
  FROM cum c JOIN tgt t ON c.cum_types >= t.target_k
  GROUP BY 1
)
SELECT CAST(b.target_k AS BIGINT) AS target_k, b.k_eff,
       round(CAST(c.cum_tokens AS DOUBLE) / tot.total_tokens, 6)
         AS coverage
FROM best b
JOIN (SELECT DISTINCT cum_types, cum_tokens FROM cum) c
  ON b.k_eff = c.cum_types
CROSS JOIN tot
"""


def x164_transition_dwell(spark, sf_dir):
    """Per-transition dwell-time profile (funnel.transition_dwell):
    user-keyed lag window, integer-micro dwells, |types|^2 cells with
    exact mean + interpolated median seconds — the timing layer on
    x128's count matrix."""
    return funnel.transition_dwell(_t(spark, sf_dir, "events"))


X164_SQL = """
WITH trans AS (
  SELECT lag(event_type) OVER w AS prev_type,
         event_type,
         epoch_us(ts) - lag(epoch_us(ts)) OVER w AS dwell_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT prev_type, event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(avg(dwell_us) / 1e6, 4) AS mean_dwell_s,
       round(quantile_cont(CAST(dwell_us AS DOUBLE), 0.5) / 1e6, 4)
         AS p50_dwell_s
FROM trans
WHERE prev_type IS NOT NULL
GROUP BY 1, 2
"""


def x165_revenue_gini(spark, sf_dir):
    """Per-priority revenue Gini (profile.revenue_gini): exact
    histogram form on integer-cents cells (bounded by the price
    domain), group-partitioned cumulative walk, G-cell fold."""
    return profile.revenue_gini(_t(spark, sf_dir, "orders"))


X165_SQL = """
WITH cells AS (
  SELECT o_orderpriority AS grp,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
         CAST(count(*) AS BIGINT) AS c
  FROM orders GROUP BY 1, 2
),
walked AS (
  SELECT grp, cents, c,
         CAST(SUM(c) OVER (PARTITION BY grp ORDER BY cents) AS BIGINT)
           AS cum_c
  FROM cells
),
per_grp AS (
  SELECT grp,
         CAST(SUM(c) AS BIGINT) AS n_orders,
         CAST(SUM(cents * c) AS BIGINT) AS tot_cents,
         SUM(CAST(cents AS DOUBLE) * c * (cum_c - c + 1 + cum_c) / 2.0)
           AS rank_mass
  FROM walked GROUP BY 1
)
SELECT grp AS o_orderpriority, n_orders,
       round(tot_cents / 100.0, 2) AS total_revenue,
       round(2.0 * rank_mass / (CAST(n_orders AS DOUBLE) * tot_cents)
             - (n_orders + 1.0) / n_orders, 6) AS gini
FROM per_grp
"""


def x166_retention_halflife(spark, sf_dir):
    """Cohort retention half-life (funnel.retention_halflife): ln
    decay fit over x107's retention curve (offsets 1-8, >= 3 points),
    -ln2/slope per cohort."""
    return funnel.retention_halflife(_t(spark, sf_dir, "events"))


X166_SQL = f"""
WITH ret AS ({X107_SQL}),
pts AS (
  SELECT cohort_week, CAST(week_offset AS DOUBLE) AS x, retention
  FROM ret
  WHERE week_offset BETWEEN 1 AND 8 AND retention > 0
),
fit AS (
  SELECT cohort_week,
         CAST(count(*) AS BIGINT) AS n_points,
         regr_slope(ln(retention), x) AS slope
  FROM pts GROUP BY 1
  HAVING count(*) >= 3
)
SELECT cohort_week, n_points,
       round(slope, 6) AS decay_slope,
       CASE WHEN slope < 0 THEN round(0.6931471805599453 / -slope, 4)
       END AS halflife_weeks
FROM fit
"""


def x167_brand_type_chi2(spark, sf_dir):
    """Brand x type chi-square independence table
    (profile.chi2_independence): bounded contingency cells, broadcast
    margins + 1-row grand total, per-cell contributions."""
    return profile.chi2_independence(_t(spark, sf_dir, "part"))


X167_SQL = """
WITH cells AS (
  SELECT p_brand AS r, p_type AS c,
         CAST(count(*) AS BIGINT) AS n
  FROM part GROUP BY 1, 2
),
rmarg AS (SELECT r, CAST(SUM(n) AS BIGINT) AS n_r FROM cells GROUP BY 1),
cmarg AS (SELECT c, CAST(SUM(n) AS BIGINT) AS n_c FROM cells GROUP BY 1),
tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS N FROM cells)
SELECT cells.r AS p_brand, cells.c AS p_type, cells.n,
       round(n_r * n_c / t.N, 6) AS expected,
       round((cells.n - n_r * n_c / t.N)
             * (cells.n - n_r * n_c / t.N)
             / (n_r * n_c / t.N), 6) AS chi2_contrib
FROM cells
JOIN rmarg USING (r)
JOIN cmarg USING (c)
CROSS JOIN tot t
"""


def x168_quality_outliers(spark, sf_dir):
    """Multivariate quality-outlier screen (textstats.quality_outliers):
    4 row-local style features z-scored against broadcast 1-row corpus
    moments, summed squared z rounded BEFORE ordering, top-20."""
    return textstats.quality_outliers(_t(spark, sf_dir, "documents"))


_X168_FEATS = r"""
  SELECT doc_id,
         CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                              t -> t <> '')) AS DOUBLE) AS f1,
         CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
           / greatest(length(text), 1) AS f2,
         CAST(list_aggregate(list_transform(
                list_filter(regexp_split_to_array(trim(text), '\s+'),
                            t -> t <> ''),
                t -> length(t)), 'sum') AS DOUBLE)
           / greatest(len(list_filter(
               regexp_split_to_array(trim(text), '\s+'), t -> t <> '')), 1)
           AS f3,
         CAST(length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g'))
              AS DOUBLE) / greatest(length(text), 1) AS f4
  FROM documents
"""

X168_SQL = f"""
WITH feats AS ({_X168_FEATS}),
m AS (
  SELECT avg(f1) AS m1, stddev_pop(f1) AS s1,
         avg(f2) AS m2, stddev_pop(f2) AS s2,
         avg(f3) AS m3, stddev_pop(f3) AS s3,
         avg(f4) AS m4, stddev_pop(f4) AS s4
  FROM feats
),
zs AS (
  SELECT doc_id, f1, f2, f3, f4,
         CASE WHEN s1 > 0 THEN (f1 - m1) / s1 ELSE 0 END AS z1,
         CASE WHEN s2 > 0 THEN (f2 - m2) / s2 ELSE 0 END AS z2,
         CASE WHEN s3 > 0 THEN (f3 - m3) / s3 ELSE 0 END AS z3,
         CASE WHEN s4 > 0 THEN (f4 - m4) / s4 ELSE 0 END AS z4
  FROM feats CROSS JOIN m
),
scored AS (
  SELECT doc_id,
         CAST(f1 AS BIGINT) AS n_tokens,
         round(f2, 6) AS digit_ratio,
         round(f3, 6) AS mean_token_len,
         round(f4, 6) AS punct_ratio,
         round(z1 * z1 + z2 * z2 + z3 * z3 + z4 * z4, 6)
           AS outlier_score
  FROM zs
)
SELECT * FROM scored
ORDER BY outlier_score DESC, doc_id
LIMIT 20
"""


def x169_linenumber_audit(spark, sf_dir):
    """Line-numbering integrity audit (quality.linenumber_audit): per
    order 1..n contiguity (dups + gaps), one orderkey aggregate +
    1-row fold."""
    from ..operators.quality import linenumber_audit

    return linenumber_audit(_t(spark, sf_dir, "lineitem"))


X169_SQL = """
WITH per_order AS (
  SELECT l_orderkey,
         CAST(count(*) AS BIGINT) AS cnt,
         CAST(MIN(l_linenumber) AS BIGINT) AS mn,
         CAST(MAX(l_linenumber) AS BIGINT) AS mx,
         CAST(count(DISTINCT l_linenumber) AS BIGINT) AS dn
  FROM lineitem GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN dn < cnt THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_lines,
       CAST(SUM(CASE WHEN dn = cnt AND (mx <> cnt OR mn <> 1)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_gapped,
       round(CAST(SUM(CASE WHEN dn < cnt OR mx <> cnt OR mn <> 1
                           THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
         AS bad_share
FROM per_order
"""


def x170_weighted_median(spark, sf_dir):
    """Quantity-weighted median price per return flag
    (profile.weighted_median): integer-cents value histogram,
    group-partitioned cumulative-weight walk, lower-median at
    2*cum_w >= tot_w — halves never materialize."""
    return profile.weighted_median(_t(spark, sf_dir, "lineitem"))


X170_SQL = """
WITH cells AS (
  SELECT l_returnflag AS grp,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents,
         CAST(SUM(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT) AS w,
         CAST(count(*) AS BIGINT) AS n
  FROM lineitem GROUP BY 1, 2
),
walked AS (
  SELECT grp, cents, w,
         CAST(SUM(w) OVER (PARTITION BY grp ORDER BY cents) AS BIGINT)
           AS cum_w
  FROM cells
),
tot AS (
  SELECT grp, CAST(SUM(w) AS BIGINT) AS tot_w,
         CAST(SUM(n) AS BIGINT) AS n_lines
  FROM cells GROUP BY 1
),
hit AS (
  SELECT wk.grp, MIN(wk.cents) AS med_cents
  FROM walked wk JOIN tot USING (grp)
  WHERE 2 * wk.cum_w >= tot.tot_w
  GROUP BY 1
)
SELECT t.grp AS l_returnflag, t.n_lines, t.tot_w,
       round(h.med_cents / 100.0, 2) AS weighted_median
FROM tot t JOIN hit h USING (grp)
"""


def x171_pii_cooccurrence(spark, sf_dir):
    """PII linkability audit (textstats.pii_cooccurrence): row-local
    presence flags for the x16 pattern family, <=4-cell type-count
    histogram + broadcast total."""
    return textstats.pii_cooccurrence(_t(spark, sf_dir, "documents"))


X171_SQL = r"""
WITH flags AS (
  SELECT CASE WHEN regexp_matches(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')
         THEN 1 ELSE 0 END AS has_email,
         CASE WHEN regexp_matches(text, 'https?://[^\s]+')
         THEN 1 ELSE 0 END AS has_url,
         CASE WHEN regexp_matches(text, '[0-9]{7,}')
         THEN 1 ELSE 0 END AS has_number_long
  FROM documents
),
cells AS (
  SELECT has_email + has_url + has_number_long AS n_pii_types,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(SUM(has_email) AS BIGINT) AS n_email,
         CAST(SUM(has_url) AS BIGINT) AS n_url,
         CAST(SUM(has_number_long) AS BIGINT) AS n_number_long
  FROM flags GROUP BY 1
),
tot AS (SELECT CAST(SUM(n_docs) AS DOUBLE) AS total FROM cells)
SELECT n_pii_types, n_docs,
       round(n_docs / total, 6) AS share,
       n_email, n_url, n_number_long
FROM cells CROSS JOIN tot
"""


def x172_decile_mobility(spark, sf_dir):
    """User value-decile mobility between window halves
    (funnel.decile_mobility): integer-micro per-half folds, two exact
    decile-edge broadcasts, 10x10 transition cells with row shares."""
    return funnel.decile_mobility(_t(spark, sf_dir, "events"))


X172_SQL = """
WITH bounds AS (
  SELECT epoch_us(MIN(ts)) AS t0, epoch_us(MAX(ts)) AS t1 FROM events
),
tagged AS (
  SELECT user_id AS u,
         CAST(round(value * 1e6, 0) AS BIGINT) AS micro,
         epoch_us(ts) <= (b.t0 + b.t1) / 2 AS first_half
  FROM events CROSS JOIN bounds b
),
per_user AS (
  SELECT u,
         SUM(CASE WHEN first_half THEN micro END) AS v1,
         SUM(CASE WHEN NOT first_half THEN micro END) AS v2
  FROM tagged GROUP BY 1
  HAVING SUM(CASE WHEN first_half THEN micro END) IS NOT NULL
     AND SUM(CASE WHEN NOT first_half THEN micro END) IS NOT NULL
),
edges AS (
  SELECT quantile_cont(CAST(v1 AS DOUBLE),
           [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS e1,
         quantile_cont(CAST(v2 AS DOUBLE),
           [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS e2
  FROM per_user
),
banded AS (
  SELECT 1 + len(list_filter(e.e1, x -> CAST(p.v1 AS DOUBLE) > x))
           AS decile_then,
         1 + len(list_filter(e.e2, x -> CAST(p.v2 AS DOUBLE) > x))
           AS decile_now
  FROM per_user p CROSS JOIN edges e
),
cells AS (
  SELECT decile_then, decile_now, CAST(count(*) AS BIGINT) AS n_users
  FROM banded GROUP BY 1, 2
),
rt AS (
  SELECT decile_then, CAST(SUM(n_users) AS BIGINT) AS row_total
  FROM cells GROUP BY 1
)
SELECT c.decile_then, c.decile_now, c.n_users,
       round(CAST(c.n_users AS DOUBLE) / r.row_total, 6) AS row_share
FROM cells c JOIN rt r USING (decile_then)
"""


def x173_quality_by_length(spark, sf_dir):
    """Quality-vs-length profile (textstats.quality_by_length): exact
    token-count decile edges (1-row broadcast), per-bin quality-score
    quartiles — is the length filter secretly the quality filter?"""
    return textstats.quality_by_length(_t(spark, sf_dir, "documents"))


X173_SQL = rf"""
WITH base AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '') AS toks
  FROM documents
),
derived AS (
  SELECT len(toks) AS n_tokens,
         CAST(list_aggregate(list_transform(toks, t -> length(t)), 'sum') AS DOUBLE)
           / greatest(len(toks), 1) AS mtl,
         CAST(len(list_filter(list_transform(toks, t -> lower(t)),
                  t -> list_contains({_STOP_EN}, t))) AS DOUBLE)
           / greatest(len(toks), 1) AS swr,
         CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
           / greatest(length(text), 1) AS digr
  FROM base
),
feats AS (
  SELECT CAST(n_tokens AS DOUBLE) AS n_tok,
         CAST(round(CASE WHEN n_tokens BETWEEN 10 AND 10000 THEN 0.4 ELSE 0 END
             + CASE WHEN mtl BETWEEN 3.0 AND 10.0 THEN 0.3 ELSE 0 END
             + CASE WHEN swr >= 0.01 THEN 0.2 ELSE 0 END
             + CASE WHEN digr <= 0.2 THEN 0.1 ELSE 0 END, 2) AS DOUBLE) AS q
  FROM derived
),
edges AS (
  SELECT quantile_cont(n_tok,
           [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS e
  FROM feats
),
banded AS (
  SELECT 1 + len(list_filter(e.e, x -> f.n_tok > x)) AS length_decile,
         f.n_tok, f.q
  FROM feats f CROSS JOIN edges e
)
SELECT length_decile,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(n_tok), 2) AS mean_tokens,
       round(quantile_cont(q, 0.25), 4) AS q25_quality,
       round(quantile_cont(q, 0.5), 4) AS p50_quality,
       round(quantile_cont(q, 0.75), 4) AS q75_quality
FROM banded GROUP BY 1
"""


def x174_single_source_risk(spark, sf_dir):
    """Single-source supply risk per brand (profile.single_source_risk):
    distinct (part, supplier) pairs -> per-part supplier depth ->
    partkey-keyed brand attachment -> brand cells."""
    return profile.single_source_risk(
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part")
    )


X174_SQL = """
WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
per_part AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_suppliers
  FROM pairs GROUP BY 1
)
SELECT p.p_brand,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(SUM(CASE WHEN n_suppliers = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_single_source,
       round(CAST(SUM(CASE WHEN n_suppliers = 1 THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS single_source_share,
       round(avg(n_suppliers), 4) AS mean_suppliers_per_part
FROM per_part pp JOIN part p ON pp.l_partkey = p.p_partkey
GROUP BY 1
"""


def x175_new_vs_returning(spark, sf_dir):
    """Weekly new-vs-returning decomposition (funnel.new_vs_returning):
    per-user first-seen week (one keyed window), distinct (week, user)
    cells, |weeks|-cell rollup."""
    return funnel.new_vs_returning(_t(spark, sf_dir, "events"))


X175_SQL = """
WITH weekly AS (
  SELECT DISTINCT user_id AS u,
         CAST(date_trunc('week', ts) AS DATE) AS week,
         CAST(date_trunc('week', MIN(ts) OVER (PARTITION BY user_id))
              AS DATE) AS first_week
  FROM events
)
SELECT week,
       CAST(count(*) AS BIGINT) AS active_users,
       CAST(SUM(CASE WHEN week = first_week THEN 1 ELSE 0 END) AS BIGINT)
         AS new_users,
       CAST(count(*) - SUM(CASE WHEN week = first_week THEN 1 ELSE 0 END)
            AS BIGINT) AS returning_users,
       round(CAST(SUM(CASE WHEN week = first_week THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS new_share
FROM weekly GROUP BY 1
"""


def x176_source_jsd(spark, sf_dir):
    """Pairwise source JSD (textstats.source_jsd): add-1 smoothed
    unigram distributions over the union vocab, dense |V| x G fill,
    word-keyed pair join, G^2/2-cell fold."""
    return textstats.source_jsd(_t(spark, sf_dir, "documents"))


X176_SQL = f"""
WITH norm AS (SELECT source AS s, {_X67_NORM} AS toks FROM documents),
counts AS (
  SELECT s, w, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT s, unnest(toks) AS w FROM norm) GROUP BY 1, 2
),
vocab AS (SELECT DISTINCT w FROM counts),
sources AS (SELECT DISTINCT s FROM counts),
vt AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM vocab),
nt AS (SELECT s, CAST(SUM(c) AS DOUBLE) AS n_s FROM counts GROUP BY 1),
dense AS (
  SELECT sr.s, vb.w,
         (COALESCE(c.c, 0) + 1.0) / (nt.n_s + vt.v) AS p
  FROM vocab vb
  CROSS JOIN sources sr
  LEFT JOIN counts c ON c.s = sr.s AND c.w = vb.w
  JOIN nt ON nt.s = sr.s
  CROSS JOIN vt
)
SELECT a.s AS source_a, b.s AS source_b,
       round(SUM(0.5 * a.p * ln(a.p / ((a.p + b.p) / 2.0))
                 + 0.5 * b.p * ln(b.p / ((a.p + b.p) / 2.0))), 6)
         AS jsd_nats
FROM dense a JOIN dense b ON a.w = b.w AND a.s < b.s
GROUP BY 1, 2
"""


def x177_sample_representativeness(spark, sf_dir):
    """Deterministic-sample representativeness audit
    (curation.sample_representativeness): md5 10% sample vs corpus
    language mix — share diffs + chi-square contributions per
    category."""
    from ..operators.curation import sample_representativeness

    return sample_representativeness(_t(spark, sf_dir, "documents"))


X177_SQL = """
WITH cells AS (
  SELECT lang AS cat,
         CAST(count(*) AS BIGINT) AS n_corpus,
         CAST(SUM(CASE WHEN (ascii(substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 256
                           + ascii(substring(md5(CAST(doc_id AS VARCHAR)), 2, 1))) % 100 < 10
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_sample
  FROM documents GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(n_corpus) AS DOUBLE) AS tc,
         CAST(SUM(n_sample) AS DOUBLE) AS ts
  FROM cells
)
SELECT cat AS lang, n_corpus, n_sample,
       round(n_corpus / tc, 6) AS corpus_share,
       round(n_sample / ts, 6) AS sample_share,
       round(n_sample / ts - n_corpus / tc, 6) AS share_diff,
       round((n_sample - n_corpus / tc * ts)
             * (n_sample - n_corpus / tc * ts)
             / (n_corpus / tc * ts), 6) AS chi2_contrib
FROM cells CROSS JOIN tot
"""


def x178_dedup_worklist(spark, sf_dir):
    """Dedup triage worklist (dedup.dedup_worklist): x67 components +
    row-local token counts -> top-20 clusters by wasted tokens (total
    minus longest member)."""
    return dedup.dedup_worklist(_t(spark, sf_dir, "documents"))


X178_SQL = X67_SQL.replace(
    "SELECT node AS doc, MIN(r) AS cluster_id FROM reach GROUP BY node",
    """, comp AS (
  SELECT node AS doc, MIN(r) AS cluster_id FROM reach GROUP BY node
),
sizes AS (
  SELECT c.cluster_id,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(n.toks)) AS BIGINT) AS total_tokens,
         CAST(MAX(len(n.toks)) AS BIGINT) AS kept_tokens
  FROM comp c JOIN norm n ON n.doc_id = c.doc
  GROUP BY 1
)
SELECT cluster_id, n_docs, total_tokens, kept_tokens,
       total_tokens - kept_tokens AS wasted_tokens
FROM sizes
ORDER BY wasted_tokens DESC, cluster_id
LIMIT 20""",
)


def x179_activity_heatmap(spark, sf_dir):
    """Weekday x hour load heatmap (funnel.activity_heatmap): one
    168-cell aggregate + broadcast total; shares and uniform-cell load
    ratios."""
    return funnel.activity_heatmap(_t(spark, sf_dir, "events"))


X179_SQL = """
WITH cells AS (
  SELECT dayofweek(ts) + 1 AS weekday, hour(ts) AS hour,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
),
tot AS (
  SELECT CAST(SUM(n_events) AS DOUBLE) AS total,
         CAST(count(*) AS DOUBLE) AS n_cells
  FROM cells
)
SELECT weekday, hour, n_events,
       round(n_events / total, 6) AS share,
       round(n_events / (total / n_cells), 6) AS load_ratio
FROM cells CROSS JOIN tot
"""


def x180_cusum_changepoint(spark, sf_dir):
    """CUSUM change-point detection on the daily event-value series
    (funnel.cusum_changepoint): one-sided CUSUMs via the prefix-sum /
    running-extrema identity, every float fold an ordered window over
    the bounded day-cell frame."""
    return funnel.cusum_changepoint(_t(spark, sf_dir, "events"))


X180_SQL = """
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(SUM(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS micro,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
base AS (
  SELECT day, CAST(micro AS DOUBLE) / n / 1e6 AS day_mean FROM daily
),
leveled AS (
  SELECT day, day_mean,
         SUM(day_mean) OVER wf / COUNT(*) OVER wf AS level
  FROM base
  WINDOW wf AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                AND UNBOUNDED FOLLOWING)
),
prefixed AS (
  SELECT day, day_mean, level,
         SUM(day_mean - level) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
                                     PRECEDING AND CURRENT ROW) AS p
  FROM leveled
),
scored AS (
  SELECT day, day_mean, level, p,
         p - least(MIN(p) OVER wu, 0.0) AS s_pos,
         greatest(MAX(p) OVER wu, 0.0) - p AS s_neg
  FROM prefixed
  WINDOW wu AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW)
)
SELECT day, round(day_mean, 6) AS day_mean, round(level, 6) AS level,
       round(p, 6) AS cusum, round(s_pos, 6) AS s_pos,
       round(s_neg, 6) AS s_neg,
       CAST(ROW_NUMBER() OVER (ORDER BY round(greatest(s_pos, s_neg), 6)
                               DESC, day) AS BIGINT) AS change_rank
FROM scored
ORDER BY day
"""


def x181_revenue_autocorrelation(spark, sf_dir):
    """Daily-revenue autocorrelation at lags 1..7
    (funnel.revenue_autocorrelation): Pearson r per lag from ordered
    full-frame window moments over the integer-cents day cells."""
    return funnel.revenue_autocorrelation(_t(spark, sf_dir, "orders"))


X181_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS rev_cents
  FROM orders GROUP BY 1
),
pairs AS (
  SELECT l.lag AS lag, d.day AS day,
         CAST(d.rev_cents AS DOUBLE) AS x,
         CAST(p.rev_cents AS DOUBLE) AS y
  FROM daily d
  CROSS JOIN (SELECT CAST(unnest(generate_series(1, 7)) AS BIGINT) AS lag) l
  JOIN daily p ON p.day = d.day - CAST(l.lag AS INT)
),
moments AS (
  SELECT lag, day,
         CAST(COUNT(*) OVER wf AS DOUBLE) AS np,
         SUM(x) OVER wf AS sx, SUM(y) OVER wf AS sy,
         SUM(x * y) OVER wf AS sxy,
         SUM(x * x) OVER wf AS sxx,
         SUM(y * y) OVER wf AS syy,
         ROW_NUMBER() OVER (PARTITION BY lag ORDER BY day) AS rn
  FROM pairs
  WINDOW wf AS (PARTITION BY lag ORDER BY day ROWS BETWEEN UNBOUNDED
                PRECEDING AND UNBOUNDED FOLLOWING)
)
SELECT lag, CAST(np AS BIGINT) AS n_pairs,
       CASE WHEN np * sxx - sx * sx > 0 AND np * syy - sy * sy > 0
            THEN round((np * sxy - sx * sy)
                       / sqrt((np * sxx - sx * sx) * (np * syy - sy * sy)), 6)
            END AS pearson_r
FROM moments WHERE rn = 1 ORDER BY lag
"""



def x182_calendar_coverage(spark, sf_dir):
    """Calendar completeness audit per event type
    (funnel.calendar_coverage): day-spine anti-join on bounded
    (type, day) cell frames; silent-day counts + first/last gap."""
    return funnel.calendar_coverage(_t(spark, sf_dir, "events"))


X182_SQL = """
WITH obs AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day
  FROM events GROUP BY 1, 2
),
span AS (
  SELECT MIN(CAST(date_trunc('day', ts) AS DATE)) AS d0,
         MAX(CAST(date_trunc('day', ts) AS DATE)) AS d1
  FROM events
),
spine AS (
  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM span
),
grid AS (
  SELECT t.event_type, s.day
  FROM (SELECT DISTINCT event_type FROM obs) t CROSS JOIN spine s
),
missing AS (
  SELECT g.event_type, g.day FROM grid g
  WHERE NOT EXISTS (SELECT 1 FROM obs o
                    WHERE o.event_type = g.event_type AND o.day = g.day)
),
miss AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_missing,
         MIN(day) AS first_missing, MAX(day) AS last_missing
  FROM missing GROUP BY 1
),
per_type AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days_observed
  FROM obs GROUP BY 1
)
SELECT p.event_type, p.n_days_observed,
       CAST(coalesce(m.n_missing, 0) AS BIGINT) AS n_missing,
       round(p.n_days_observed
             / CAST(p.n_days_observed + coalesce(m.n_missing, 0) AS DOUBLE),
             6) AS coverage,
       m.first_missing, m.last_missing
FROM per_type p LEFT JOIN miss m USING (event_type)
ORDER BY event_type
"""


def x183_price_dispersion(spark, sf_dir):
    """Per-part price-dispersion screen (profile.price_dispersion):
    worst-20 CV of line prices off exact integer-cents moments; part
    joins only to the 20 survivors."""
    return profile.price_dispersion(
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part")
    )


X183_SQL = """
WITH cells AS (
  SELECT l_partkey AS p_partkey, CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS s,
         CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS ss
  FROM lineitem GROUP BY 1
),
scored AS (
  SELECT p_partkey, n,
         round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 6)
           AS mean_price,
         round(sqrt((CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
                     - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) / 100.0, 6)
           AS sd_price,
         CASE WHEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) > 0
              THEN round(sqrt((CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
                               - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                              / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                         / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 6)
              END AS cv
  FROM cells WHERE n >= 5
  ORDER BY cv DESC, p_partkey LIMIT 20
)
SELECT s.p_partkey, p.p_brand, p.p_type, s.n, s.mean_price, s.sd_price, s.cv
FROM scored s JOIN part p USING (p_partkey)
ORDER BY s.cv DESC, s.p_partkey
"""



def x184_session_depth(spark, sf_dir):
    """Session depth distribution + bounce rate
    (funnel.session_depth_profile): power-of-2 depth buckets over
    30-min-gap sessions; bounded cells, 1-row total broadcast."""
    return funnel.session_depth_profile(_t(spark, sf_dir, "events"))


X184_SQL = """
WITH ordered AS (
  SELECT user_id, ts, event_id,
         date_diff('second',
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                   ts) AS gap
  FROM events
),
sess AS (
  SELECT user_id,
         SUM(CASE WHEN gap > 1800 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_no
  FROM ordered
),
depths AS (
  SELECT CAST(count(*) AS BIGINT) AS depth
  FROM sess GROUP BY user_id, session_no
),
buckets AS (
  SELECT CASE WHEN depth <= 2 THEN depth
              ELSE CAST(pow(2.0, ceil(log2(depth)) - 1) AS BIGINT) + 1
         END AS bucket_lo,
         CASE WHEN depth <= 2 THEN depth
              ELSE CAST(pow(2.0, ceil(log2(depth))) AS BIGINT)
         END AS bucket_hi
  FROM depths
),
cells AS (
  SELECT bucket_lo, bucket_hi, CAST(count(*) AS BIGINT) AS n_sessions
  FROM buckets GROUP BY 1, 2
),
tot AS (SELECT CAST(SUM(n_sessions) AS DOUBLE) AS total FROM cells)
SELECT bucket_lo, bucket_hi, n_sessions,
       round(n_sessions / total, 6) AS share,
       round(SUM(n_sessions) OVER (ORDER BY bucket_lo ROWS BETWEEN
             UNBOUNDED PRECEDING AND CURRENT ROW) / total, 6) AS cum_share
FROM cells CROSS JOIN tot
ORDER BY bucket_lo
"""


def x185_knn_label_agreement(spark, sf_dir):
    """Label-noise screen by neighbor agreement
    (profile.knn_label_agreement): label-blind md5-bucket NN graph,
    per-label same-label share — the confident-learning signal."""
    return profile.knn_label_agreement(_t(spark, sf_dir, "embeddings"))


X185_SQL = f"""
WITH bucketed AS (
  SELECT vec_id, embedding,
         ({_X73_U("md5(CAST(vec_id AS VARCHAR) || '-knb')")}) % 16 AS bkt
  FROM embeddings
),
elem AS (
  SELECT vec_id, bkt, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM bucketed
),
dots AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id, SUM(a.v * b.v) AS dot
  FROM elem a JOIN elem b
    ON a.bkt = b.bkt AND a.i = b.i AND a.vec_id <> b.vec_id
  GROUP BY 1, 2
),
norms AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM elem GROUP BY 1),
sims AS (
  SELECT d.vec_id, d.neighbor_id,
         round(d.dot / (na.nrm * nb.nrm), 6) AS cosine
  FROM dots d
  JOIN norms na ON d.vec_id = na.vec_id
  JOIN norms nb ON d.neighbor_id = nb.vec_id
),
ranked AS (
  SELECT vec_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY cosine DESC, neighbor_id) AS rn
  FROM sims
),
nn AS (
  SELECT vec_id, neighbor_id, cosine >= 0.9 AS is_near_dup
  FROM ranked WHERE rn = 1
),
edges AS (
  SELECT la.label AS label, lb.label AS n_label, n.is_near_dup
  FROM nn n
  JOIN embeddings la ON n.vec_id = la.vec_id
  JOIN embeddings lb ON n.neighbor_id = lb.vec_id
),
cells AS (
  SELECT label,
         CAST(count(*) AS BIGINT) AS n_vectors,
         CAST(SUM(CASE WHEN label = n_label THEN 1 ELSE 0 END) AS BIGINT)
           AS n_agree,
         round(avg(CASE WHEN is_near_dup THEN 1.0 ELSE 0.0 END), 6)
           AS near_dup_share
  FROM edges GROUP BY 1
)
SELECT label, n_vectors, n_agree,
       round(n_agree / CAST(n_vectors AS DOUBLE), 6) AS agreement,
       near_dup_share
FROM cells
ORDER BY label
"""



def x186_mannwhitney_quality(spark, sf_dir):
    """Exact tie-corrected Mann-Whitney U of quality between md5
    halves (profile.mannwhitney_quality): <= 11 lattice cells, ordered
    midrank window, one 1-row closed-form fold."""
    return profile.mannwhitney_quality(_t(spark, sf_dir, "documents"))


_X186_NA = "CAST(n_a AS DOUBLE)"
_X186_NB = "CAST(n_b AS DOUBLE)"
_X186_UA = f"ra - {_X186_NA} * ({_X186_NA} + 1.0) / 2.0"
_X186_S2 = (
    f"{_X186_NA} * {_X186_NB} / 12.0 * (({_X186_NA} + {_X186_NB} + 1.0) "
    f"- tie / (({_X186_NA} + {_X186_NB}) * ({_X186_NA} + {_X186_NB} - 1.0)))"
)

X186_SQL = rf"""
WITH base AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '') AS toks
  FROM documents
),
q AS (
  SELECT doc_id,
         (CASE WHEN len(toks) BETWEEN 10 AND 10000 THEN 0.4 ELSE 0.0 END
          + CASE WHEN CAST(list_aggregate(list_transform(toks, t -> length(t)), 'sum') AS DOUBLE)
                      / greatest(len(toks), 1) BETWEEN 3.0 AND 10.0 THEN 0.3 ELSE 0.0 END
          + CASE WHEN CAST(len(list_filter(list_transform(toks, t -> lower(t)),
                               t -> list_contains({_STOP_EN}, t))) AS DOUBLE)
                      / greatest(len(toks), 1) >= 0.01 THEN 0.2 ELSE 0.0 END
          + CASE WHEN CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
                      / greatest(length(text), 1) <= 0.2 THEN 0.1 ELSE 0.0 END) AS score
  FROM base
),
scored AS (
  SELECT CAST(round(score * 10) AS BIGINT) AS s10,
         CASE WHEN (ascii(substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 256
                    + ascii(substring(md5(CAST(doc_id AS VARCHAR)), 2, 1))) % 100 < 50
              THEN 1 ELSE 0 END AS in_a
  FROM q
),
cells AS (
  SELECT s10, CAST(SUM(in_a) AS BIGINT) AS n_a,
         CAST(count(*) - SUM(in_a) AS BIGINT) AS n_b
  FROM scored GROUP BY 1
),
ranked AS (
  SELECT s10, n_a, n_b,
         CAST(coalesce(SUM(n_a + n_b) OVER (ORDER BY s10 ROWS BETWEEN
              UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
           + (CAST(n_a + n_b AS DOUBLE) + 1.0) / 2.0 AS midrank,
         CAST(n_a + n_b AS DOUBLE) AS t
  FROM cells
),
agg AS (
  SELECT CAST(SUM(n_a) AS BIGINT) AS n_a, CAST(SUM(n_b) AS BIGINT) AS n_b,
         SUM(n_a * midrank) AS ra,
         SUM(t * t * t - t) AS tie
  FROM ranked
)
SELECT n_a, n_b,
       {_X186_UA} AS u_a,
       {_X186_NA} * {_X186_NB} - ({_X186_UA}) AS u_b,
       CASE WHEN {_X186_S2} > 0
            THEN round((({_X186_UA}) - {_X186_NA} * {_X186_NB} / 2.0)
                       / sqrt({_X186_S2}), 6)
            END AS z_score
FROM agg
"""


def x187_editdist_confirm(spark, sf_dir):
    """Edit-distance confirmation of the x3 LSH candidates
    (dedup.editdist_confirm_pairs): true Levenshtein over normalized
    160-char opening passages, <= 20 edits kept — the precision layer
    separating near-dups from shingle coincidences."""
    return dedup.editdist_confirm_pairs(
        _t(spark, sf_dir, "documents"), hash_fn="md5"
    )


_X187_PREF = (
    r"substring(trim(regexp_replace(regexp_replace(lower(text), "
    r"'[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), 1, 160)"
)

X187_SQL = f"""
WITH cand AS ({X3_SQL}),
pref AS (
  SELECT doc_id, {_X187_PREF} AS p FROM documents
)
SELECT c.id_a, c.id_b, c.est_jaccard,
       CAST(levenshtein(pa.p, pb.p) AS BIGINT) AS edit_distance,
       round(1.0 - CAST(levenshtein(pa.p, pb.p) AS DOUBLE)
             / CAST(greatest(greatest(length(pa.p), length(pb.p)), 1)
                    AS DOUBLE), 6) AS prefix_sim
FROM cand c
JOIN pref pa ON c.id_a = pa.doc_id
JOIN pref pb ON c.id_b = pb.doc_id
WHERE levenshtein(pa.p, pb.p) <= 20
ORDER BY c.id_a, c.id_b
"""



def x188_vocab_estimate(spark, sf_dir):
    """Unseen-vocabulary estimation per source
    (textstats.vocab_estimate): Good-Turing coverage + bias-corrected
    Chao1 off the exact integer frequency spectrum."""
    return textstats.vocab_estimate(_t(spark, sf_dir, "documents"))


X188_SQL = r"""
WITH base AS (
  SELECT source,
         list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                     t -> t <> '') AS toks
  FROM documents
),
flat AS (SELECT source, unnest(toks) AS token FROM base),
cells AS (
  SELECT source, token, CAST(count(*) AS BIGINT) AS cnt
  FROM flat GROUP BY 1, 2
),
agg AS (
  SELECT source,
         CAST(SUM(cnt) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_types,
         CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN cnt = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
  FROM cells GROUP BY 1
)
SELECT source, n_tokens, n_types, n1, n2,
       round(1.0 - CAST(n1 AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
         AS gt_coverage,
       round(CAST(n_types AS DOUBLE)
             + CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0)
               / (2.0 * (CAST(n2 AS DOUBLE) + 1.0)), 6) AS chao1,
       round(CAST(n_types AS DOUBLE)
             + CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0)
               / (2.0 * (CAST(n2 AS DOUBLE) + 1.0))
             - CAST(n_types AS DOUBLE), 6) AS est_unseen
FROM agg
ORDER BY source
"""


def x189_activity_powerlaw(spark, sf_dir):
    """Power-law MLE over user activity (funnel.activity_powerlaw):
    Clauset-style alpha off the bounded activity histogram; the one
    float fold is an ordered full-frame window."""
    return funnel.activity_powerlaw(_t(spark, sf_dir, "events"))


X189_SQL = """
WITH per_user AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1
),
hist AS (
  SELECT x, CAST(count(*) AS BIGINT) AS c FROM per_user GROUP BY 1
),
scored AS (
  SELECT x,
         CAST(SUM(c) OVER wf AS BIGINT) AS n_users,
         CAST(SUM(CASE WHEN x >= 2 THEN c ELSE 0 END) OVER wf AS BIGINT)
           AS n_tail,
         MAX(x) OVER wf AS max_activity,
         SUM(CASE WHEN x >= 2
                  THEN CAST(c AS DOUBLE) * ln(CAST(x AS DOUBLE) / 1.5)
                  ELSE 0.0 END) OVER wf AS ln_sum,
         ROW_NUMBER() OVER (ORDER BY x) AS rn
  FROM hist
  WINDOW wf AS (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
                AND UNBOUNDED FOLLOWING)
)
SELECT CAST(2 AS BIGINT) AS xmin, n_users, n_tail, max_activity,
       CASE WHEN ln_sum > 0
            THEN round(1.0 + CAST(n_tail AS DOUBLE) / ln_sum, 6)
            END AS alpha
FROM scored WHERE rn = 1
"""


def x190_dup_cluster_histogram(spark, sf_dir):
    """Near-dup cluster-size distribution (dedup.dup_cluster_histogram):
    the x67 components rolled to a size histogram with cluster- and
    doc-mass shares."""
    return dedup.dup_cluster_histogram(_t(spark, sf_dir, "documents"))


X190_SQL = X67_SQL.replace(
    "SELECT node AS doc, MIN(r) AS cluster_id FROM reach GROUP BY node",
    """, comp AS (
  SELECT node AS doc, MIN(r) AS cluster_id FROM reach GROUP BY node
),
sizes AS (
  SELECT cluster_id, CAST(count(*) AS BIGINT) AS csize
  FROM comp GROUP BY 1
),
hist AS (
  SELECT csize, CAST(count(*) AS BIGINT) AS n_clusters
  FROM sizes GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(n_clusters) AS DOUBLE) AS tc,
         CAST(SUM(csize * n_clusters) AS DOUBLE) AS td
  FROM hist
)
SELECT csize, n_clusters,
       CAST(csize * n_clusters AS BIGINT) AS n_docs,
       round(n_clusters / tc, 6) AS cluster_share,
       round(csize * n_clusters / td, 6) AS doc_share
FROM hist CROSS JOIN tot
ORDER BY csize""",
)



_X19X_DAILY = """
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
"""


def x191_theilsen_trend(spark, sf_dir):
    """Theil-Sen robust revenue trend (funnel.theilsen_trend): median
    pairwise slope + median-residual intercept over calendar-bounded
    day cells — the outlier-proof companion to x149's OLS."""
    return funnel.theilsen_trend(_t(spark, sf_dir, "orders"))


X191_SQL = f"""
WITH daily AS ({_X19X_DAILY}),
t0 AS (SELECT MIN(day) AS d0 FROM daily),
cells AS (
  SELECT CAST(date_diff('day', d0, day) AS BIGINT) AS t, cents
  FROM daily CROSS JOIN t0
),
slopes AS (
  SELECT CAST(b.cents - a.cents AS DOUBLE) / CAST(b.t - a.t AS DOUBLE)
    AS slope
  FROM cells a JOIN cells b ON a.t < b.t
),
fit AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         quantile_cont(slope, 0.5) AS slope_c
  FROM slopes
),
resid AS (
  SELECT f.n_pairs, f.slope_c,
         CAST(c.cents AS DOUBLE) - f.slope_c * c.t AS r
  FROM cells c CROSS JOIN fit f
),
out AS (
  SELECT n_pairs, slope_c,
         CAST(count(*) AS BIGINT) AS n_days,
         quantile_cont(r, 0.5) AS icept_c
  FROM resid GROUP BY 1, 2
)
SELECT n_days, n_pairs,
       round(slope_c / 100.0, 6) AS slope_per_day,
       round(icept_c / 100.0, 6) AS intercept
FROM out
"""


def x192_forecast_backtest(spark, sf_dir):
    """Naive / seasonal-naive forecast backtest with MASE
    (funnel.forecast_backtest): the q46 QA gate off exact integer-cents
    absolute errors on day cells."""
    return funnel.forecast_backtest(_t(spark, sf_dir, "orders"))


X192_SQL = f"""
WITH daily AS ({_X19X_DAILY}),
nv AS (
  SELECT CAST(count(*) AS BIGINT) AS n_naive,
         CAST(SUM(abs(d.cents - p.cents)) AS BIGINT) AS s_naive
  FROM daily d JOIN daily p ON p.day = d.day - 1
),
sn AS (
  SELECT CAST(count(*) AS BIGINT) AS n_seasonal,
         CAST(SUM(abs(d.cents - p.cents)) AS BIGINT) AS s_seasonal
  FROM daily d JOIN daily p ON p.day = d.day - 7
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily)
SELECT n_days, n_naive, n_seasonal,
       round(CAST(s_naive AS DOUBLE) / n_naive / 100.0, 6) AS mae_naive,
       round(CAST(s_seasonal AS DOUBLE) / n_seasonal / 100.0, 6)
         AS mae_seasonal,
       CASE WHEN s_naive > 0
            THEN round((CAST(s_seasonal AS DOUBLE) / n_seasonal / 100.0)
                       / (CAST(s_naive AS DOUBLE) / n_naive / 100.0), 6)
            END AS mase_seasonal
FROM tot CROSS JOIN nv CROSS JOIN sn
"""


def x193_weekly_mix_psi(spark, sf_dir):
    """Weekly event-mix PSI against the all-time mix
    (funnel.weekly_mix_psi): x77's statistic as a time series; add-1
    smoothing over the full week x type grid."""
    return funnel.weekly_mix_psi(_t(spark, sf_dir, "events"))


X193_SQL = """
WITH cells AS (
  SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
         event_type AS etype, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
weeks AS (SELECT week, CAST(SUM(n) AS BIGINT) AS n_week
          FROM cells GROUP BY 1),
types AS (SELECT etype, CAST(SUM(n) AS BIGINT) AS n_type
          FROM cells GROUP BY 1),
grand AS (SELECT CAST(SUM(n) AS BIGINT) AS n_all,
                 CAST(count(DISTINCT etype) AS BIGINT) AS n_types
          FROM cells),
grid AS (
  SELECT w.week, w.n_week, t.etype, t.n_type, g.n_all, g.n_types
  FROM weeks w CROSS JOIN types t CROSS JOIN grand g
),
filled AS (
  SELECT g.week, g.etype, g.n_week,
         CAST(coalesce(c.n, 0) AS BIGINT) AS n_wt,
         g.n_type, g.n_all, g.n_types
  FROM grid g LEFT JOIN cells c
    ON c.week = g.week AND c.etype = g.etype
),
termed AS (
  SELECT week, n_week, etype,
         ((CAST(n_wt AS DOUBLE) + 1.0)
            / (CAST(n_week AS DOUBLE) + n_types)
          - (CAST(n_type AS DOUBLE) + 1.0)
            / (CAST(n_all AS DOUBLE) + n_types))
         * ln(((CAST(n_wt AS DOUBLE) + 1.0)
               / (CAST(n_week AS DOUBLE) + n_types))
              / ((CAST(n_type AS DOUBLE) + 1.0)
                 / (CAST(n_all AS DOUBLE) + n_types))) AS term
  FROM filled
),
scored AS (
  SELECT week, n_week,
         SUM(term) OVER (PARTITION BY week ORDER BY etype ROWS BETWEEN
                         UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS psi,
         ROW_NUMBER() OVER (PARTITION BY week ORDER BY etype) AS rn
  FROM termed
)
SELECT week, n_week AS n_events, round(psi, 6) AS psi
FROM scored WHERE rn = 1 ORDER BY week
"""



def x194_cohort_ltv(spark, sf_dir):
    """Weekly-cohort LTV curves (funnel.cohort_ltv): per (cohort,
    offset) active counts, exact-cents revenue, cumulative revenue and
    cumulative LTV per cohort member."""
    return funnel.cohort_ltv(_t(spark, sf_dir, "orders"))


X194_SQL = """
WITH based AS (
  SELECT o_custkey AS custkey,
         CAST(date_trunc('week', o_orderdate) AS DATE) AS wk,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         MIN(CAST(date_trunc('week', o_orderdate) AS DATE))
           OVER (PARTITION BY o_custkey) AS cohort
  FROM orders
),
cells AS (
  SELECT cohort,
         CAST(date_diff('day', cohort, wk) / 7 AS BIGINT) AS "offset",
         CAST(count(DISTINCT custkey) AS BIGINT) AS n_active,
         CAST(SUM(cents) AS BIGINT) AS rev_cents
  FROM based
  WHERE CAST(date_diff('day', cohort, wk) / 7 AS BIGINT) <= 12
  GROUP BY 1, 2
),
sizes AS (
  SELECT cohort, n_active AS cohort_size FROM cells WHERE "offset" = 0
),
cum AS (
  SELECT c.cohort, c."offset", c.n_active, s.cohort_size, c.rev_cents,
         SUM(c.rev_cents) OVER (PARTITION BY c.cohort ORDER BY c."offset"
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cents
  FROM cells c JOIN sizes s USING (cohort)
)
SELECT cohort, "offset", n_active, cohort_size,
       round(rev_cents / 100.0, 2) AS revenue,
       round(cum_cents / 100.0, 2) AS cum_revenue,
       round(cum_cents / CAST(cohort_size AS DOUBLE) / 100.0, 6)
         AS cum_ltv_per_user
FROM cum
ORDER BY cohort, "offset"
"""


def x195_abc_classification(spark, sf_dir):
    """ABC inventory classification (profile.abc_classification):
    revenue-value block walk with the x163 tie convention + a NONE
    class from the part-dimension anti-join."""
    return profile.abc_classification(
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part")
    )


X195_SQL = """
WITH per_part AS (
  SELECT l_partkey AS p_partkey,
         CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS rev
  FROM lineitem GROUP BY 1
),
blocks AS (
  SELECT rev, CAST(count(*) AS BIGINT) AS n_parts FROM per_part GROUP BY 1
),
tot AS (SELECT CAST(SUM(rev * n_parts) AS DOUBLE) AS trev FROM blocks),
classed AS (
  SELECT rev, n_parts,
         CASE WHEN CAST(coalesce(SUM(rev * n_parts) OVER wb, 0) AS DOUBLE)
                   / trev < 0.8 THEN 'A'
              WHEN CAST(coalesce(SUM(rev * n_parts) OVER wb, 0) AS DOUBLE)
                   / trev < 0.95 THEN 'B'
              ELSE 'C' END AS abc_class
  FROM blocks CROSS JOIN tot
  WINDOW wb AS (ORDER BY rev DESC ROWS BETWEEN UNBOUNDED PRECEDING
                AND 1 PRECEDING)
),
sold AS (
  SELECT abc_class, CAST(SUM(n_parts) AS BIGINT) AS n_parts,
         CAST(SUM(rev * n_parts) AS BIGINT) AS rev_cents
  FROM classed GROUP BY 1
),
never AS (
  SELECT 'NONE' AS abc_class, CAST(count(*) AS BIGINT) AS n_parts,
         CAST(0 AS BIGINT) AS rev_cents
  FROM part p
  WHERE NOT EXISTS (SELECT 1 FROM per_part pp
                    WHERE pp.p_partkey = p.p_partkey)
),
unioned AS (SELECT * FROM sold UNION ALL SELECT * FROM never),
tot2 AS (
  SELECT CAST(SUM(rev_cents) AS DOUBLE) AS t,
         CAST(SUM(n_parts) AS DOUBLE) AS tp
  FROM unioned
)
SELECT abc_class, n_parts,
       round(rev_cents / 100.0, 2) AS revenue,
       round(rev_cents / t, 6) AS revenue_share,
       round(n_parts / tp, 6) AS part_share
FROM unioned CROSS JOIN tot2
ORDER BY abc_class
"""


def x196_basket_diversity(spark, sf_dir):
    """Per-segment brand-entropy profile (funnel.basket_diversity):
    per-customer ordered entropy folds quantized to micro-nats before
    the segment rollup."""
    return funnel.basket_diversity(
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "part"),
        _t(spark, sf_dir, "customer"),
    )


X196_SQL = """
WITH cust_lines AS (
  SELECT o.o_custkey AS custkey, p.p_brand
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey
),
cells AS (
  SELECT custkey, p_brand, CAST(count(*) AS BIGINT) AS n
  FROM cust_lines GROUP BY 1, 2
),
with_tot AS (
  SELECT custkey, p_brand, n,
         CAST(SUM(n) OVER wc AS DOUBLE) AS ncust
  FROM cells
  WINDOW wc AS (PARTITION BY custkey ORDER BY p_brand ROWS BETWEEN
                UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
),
folded AS (
  SELECT custkey,
         SUM(-(CAST(n AS DOUBLE) / ncust) * ln(CAST(n AS DOUBLE) / ncust))
           OVER wc AS h,
         CAST(COUNT(*) OVER wc AS BIGINT) AS n_brands,
         ROW_NUMBER() OVER (PARTITION BY custkey ORDER BY p_brand) AS rn
  FROM with_tot
  WINDOW wc AS (PARTITION BY custkey ORDER BY p_brand ROWS BETWEEN
                UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
),
quant AS (
  SELECT custkey, CAST(round(h * 1e6) AS BIGINT) AS h_micro, n_brands
  FROM folded WHERE rn = 1
),
seg AS (
  SELECT q.h_micro, q.n_brands, c.c_mktsegment
  FROM quant q JOIN customer c ON q.custkey = c.c_custkey
)
SELECT c_mktsegment AS segment,
       CAST(count(*) AS BIGINT) AS n_customers,
       round(CAST(SUM(h_micro) AS DOUBLE) / count(*) / 1e6, 6)
         AS mean_entropy,
       round(quantile_cont(CAST(h_micro AS DOUBLE), 0.5) / 1e6, 6)
         AS p50_entropy,
       round(CAST(SUM(CASE WHEN n_brands = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS single_brand_share
FROM seg GROUP BY 1 ORDER BY 1
"""



def x197_dedup_threshold_roc(spark, sf_dir):
    """MinHash cutoff operating points (dedup.dedup_threshold_roc):
    precision/recall/FPR at thresholds 0.1..0.9 against exact
    3-shingle Jaccard truth over the banded candidate set."""
    return dedup.dedup_threshold_roc(
        _t(spark, sf_dir, "documents"), hash_fn="md5"
    )


X197_SQL = rf"""
WITH cand AS ({X3_SQL}),
norm2 AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), '\s+'), t -> t <> '') AS toks
  FROM documents
),
sh2 AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3
              THEN list_distinct([array_to_string(toks[i:i+2], ' ') for i in generate_series(1, len(toks) - 2)])
              ELSE [array_to_string(toks, ' ')]
         END AS sh
  FROM norm2
),
labeled AS (
  SELECT c.est_jaccard,
         round(CASE WHEN len(list_distinct(list_concat(a.sh, b.sh))) > 0
               THEN CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                    / len(list_distinct(list_concat(a.sh, b.sh)))
               ELSE 0 END, 6) >= 0.5 AS is_pos
  FROM cand c
  JOIN sh2 a ON c.id_a = a.doc_id
  JOIN sh2 b ON c.id_b = b.doc_id
),
swept AS (
  SELECT t.threshold, e.est_jaccard, e.is_pos
  FROM labeled e CROSS JOIN
       (SELECT unnest(generate_series(1, 9)) / 10.0 AS threshold) t
),
cells AS (
  SELECT threshold,
         CAST(SUM(CASE WHEN is_pos AND est_jaccard >= threshold
                       THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(SUM(CASE WHEN NOT is_pos AND est_jaccard >= threshold
                       THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(SUM(CASE WHEN is_pos AND est_jaccard < threshold
                       THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         CAST(SUM(CASE WHEN NOT is_pos AND est_jaccard < threshold
                       THEN 1 ELSE 0 END) AS BIGINT) AS tn
  FROM swept GROUP BY 1
)
SELECT threshold, tp, fp, fn, tn,
       CASE WHEN tp + fp > 0
            THEN round(tp / CAST(tp + fp AS DOUBLE), 6) END AS precision,
       CASE WHEN tp + fn > 0
            THEN round(tp / CAST(tp + fn AS DOUBLE), 6) END AS recall,
       CASE WHEN fp + tn > 0
            THEN round(fp / CAST(fp + tn AS DOUBLE), 6) END AS fpr
FROM cells
ORDER BY threshold
"""


def x198_supplier_spc(spark, sf_dir):
    """Supplier lead-time XmR control chart (profile.supplier_spc):
    mean + 2.66 x mean-moving-range control limit, worst-20 by breach
    share."""
    return profile.supplier_spc(
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "supplier"),
    )


X198_SQL = """
WITH lat AS (
  SELECT l.l_suppkey AS suppkey, l.l_orderkey AS okey,
         l.l_linenumber AS lineno, CAST(o.o_orderdate AS DATE) AS odate,
         CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                        CAST(l.l_shipdate AS DATE)) AS BIGINT) AS lag_days
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
mr AS (
  SELECT suppkey, lag_days,
         abs(lag_days - lag(lag_days) OVER (PARTITION BY suppkey
             ORDER BY odate, okey, lineno, lag_days)) AS mrange
  FROM lat
),
cells AS (
  SELECT suppkey, CAST(count(*) AS BIGINT) AS n_shipments,
         CAST(SUM(lag_days) AS BIGINT) AS s_lag,
         CAST(count(mrange) AS BIGINT) AS n_mr,
         CAST(SUM(mrange) AS BIGINT) AS s_mr
  FROM mr GROUP BY 1
),
limits AS (
  SELECT suppkey, n_shipments,
         round(CAST(s_lag AS DOUBLE) / n_shipments, 6) AS mean_lag,
         round(CAST(s_mr AS DOUBLE) / n_mr, 6) AS mean_mrange,
         round(CAST(s_lag AS DOUBLE) / n_shipments
               + 2.66 * (CAST(s_mr AS DOUBLE) / n_mr), 6) AS ucl
  FROM cells WHERE n_mr >= 1
),
breaches AS (
  SELECT l.suppkey, CAST(count(*) AS BIGINT) AS n_breaches
  FROM lat l JOIN limits li ON l.suppkey = li.suppkey
  WHERE CAST(l.lag_days AS DOUBLE) > li.ucl
  GROUP BY 1
),
ranked AS (
  SELECT li.suppkey, li.n_shipments, li.mean_lag, li.mean_mrange, li.ucl,
         CAST(coalesce(b.n_breaches, 0) AS BIGINT) AS n_breaches,
         round(coalesce(b.n_breaches, 0)
               / CAST(li.n_shipments AS DOUBLE), 6) AS breach_share
  FROM limits li LEFT JOIN breaches b USING (suppkey)
  ORDER BY breach_share DESC, suppkey LIMIT 20
)
SELECT r.suppkey, s.s_name, r.n_shipments, r.mean_lag, r.mean_mrange,
       r.ucl, r.n_breaches, r.breach_share
FROM ranked r JOIN supplier s ON r.suppkey = s.s_suppkey
ORDER BY r.breach_share DESC, r.suppkey
"""


def x199_novelty_position(spark, sf_dir):
    """Lead-bias audit (textstats.novelty_position): first-occurrence
    position deciles of each (doc, type) pair; 10 cells + cumulative
    share."""
    return textstats.novelty_position(_t(spark, sf_dir, "documents"))


X199_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                     t -> t <> '') AS toks
  FROM documents
),
toked AS (
  SELECT doc_id, unnest(toks) AS token,
         generate_subscripts(toks, 1) AS pos1,
         len(toks) AS n
  FROM toks WHERE len(toks) > 0
),
firsts AS (
  SELECT doc_id, token,
         CAST(MIN(pos1) AS BIGINT) - 1 AS "off",
         CAST(MIN(n) AS BIGINT) AS n
  FROM toked GROUP BY 1, 2
),
binned AS (
  SELECT CAST(least(floor(("off" * 10) / n), 9) AS BIGINT) AS decile
  FROM firsts
),
cells AS (
  SELECT decile, CAST(count(*) AS BIGINT) AS n_types_introduced
  FROM binned GROUP BY 1
),
tot AS (SELECT CAST(SUM(n_types_introduced) AS DOUBLE) AS total FROM cells)
SELECT decile, n_types_introduced,
       round(n_types_introduced / total, 6) AS share,
       round(SUM(n_types_introduced) OVER (ORDER BY decile ROWS BETWEEN
             UNBOUNDED PRECEDING AND CURRENT ROW) / total, 6) AS cum_share
FROM cells CROSS JOIN tot
ORDER BY decile
"""



def x200_neyman_allocation(spark, sf_dir):
    """Neyman-optimal labeling-budget allocation per source
    (curation.neyman_allocation): N_h x sigma_h weights off exact
    lattice moments + the x50 largest-remainder split."""
    return curation.neyman_allocation(_t(spark, sf_dir, "documents"))


X200_SQL = rf"""
WITH base AS (
  SELECT source, text,
         list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '') AS toks
  FROM documents
),
q AS (
  SELECT source,
         (CASE WHEN len(toks) BETWEEN 10 AND 10000 THEN 0.4 ELSE 0.0 END
          + CASE WHEN CAST(list_aggregate(list_transform(toks, t -> length(t)), 'sum') AS DOUBLE)
                      / greatest(len(toks), 1) BETWEEN 3.0 AND 10.0 THEN 0.3 ELSE 0.0 END
          + CASE WHEN CAST(len(list_filter(list_transform(toks, t -> lower(t)),
                               t -> list_contains({_STOP_EN}, t))) AS DOUBLE)
                      / greatest(len(toks), 1) >= 0.01 THEN 0.2 ELSE 0.0 END
          + CASE WHEN CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
                      / greatest(length(text), 1) <= 0.2 THEN 0.1 ELSE 0.0 END) AS score
  FROM base
),
st AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(SUM(s10) AS BIGINT) AS s, CAST(SUM(s10 * s10) AS BIGINT) AS ss
  FROM (SELECT source, CAST(round(score * 10) AS BIGINT) AS s10 FROM q)
  GROUP BY 1
),
weighted AS (
  SELECT source, n_docs,
         sqrt((CAST(n_docs AS DOUBLE) * CAST(ss AS DOUBLE)
               - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
              / (CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE))) / 10.0
           AS sigma,
         CAST(n_docs AS DOUBLE)
         * (sqrt((CAST(n_docs AS DOUBLE) * CAST(ss AS DOUBLE)
                  - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                 / (CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE))) / 10.0)
           AS w
  FROM st
),
wsum AS (SELECT SUM(w) AS ws FROM weighted),
scored AS (
  SELECT source, n_docs, sigma, w / ws AS p,
         CAST(floor((w / ws) * 1000) AS BIGINT) AS base,
         (w / ws) * 1000 - floor((w / ws) * 1000) AS frac
  FROM weighted CROSS JOIN wsum
),
ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (ORDER BY frac DESC, source) AS fr,
         1000 - SUM(base) OVER () AS short
  FROM scored
)
SELECT source, n_docs, round(sigma, 6) AS sigma, round(p, 6) AS p,
       CAST(base + CASE WHEN fr <= short THEN 1 ELSE 0 END AS BIGINT)
         AS alloc_docs
FROM ranked
ORDER BY source
"""


def x201_markov_entropy_rate(spark, sf_dir):
    """Entropy rate of the event Markov chain
    (funnel.markov_entropy_rate): x128's matrix compressed to one
    predictability number; ordered entropy folds on type cells."""
    return funnel.markov_entropy_rate(_t(spark, sf_dir, "events"))


X201_SQL = """
WITH trans AS (
  SELECT a, b, CAST(count(*) AS BIGINT) AS n_ab
  FROM (
    SELECT lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS a,
           event_type AS b
    FROM events
  ) WHERE a IS NOT NULL GROUP BY 1, 2
),
with_tot AS (
  SELECT a, b, n_ab, CAST(SUM(n_ab) OVER wr AS DOUBLE) AS n_a
  FROM trans
  WINDOW wr AS (PARTITION BY a ORDER BY b ROWS BETWEEN UNBOUNDED
                PRECEDING AND UNBOUNDED FOLLOWING)
),
rows_h AS (
  SELECT a, n_a,
         SUM(-(CAST(n_ab AS DOUBLE) / n_a)
             * ln(CAST(n_ab AS DOUBLE) / n_a)) OVER wr AS h_row,
         ROW_NUMBER() OVER (PARTITION BY a ORDER BY b) AS rn
  FROM with_tot
  WINDOW wr AS (PARTITION BY a ORDER BY b ROWS BETWEEN UNBOUNDED
                PRECEDING AND UNBOUNDED FOLLOWING)
),
folded AS (
  SELECT a, SUM(n_a) OVER wa AS n_all,
         SUM(n_a * h_row) OVER wa AS hsum,
         CAST(COUNT(*) OVER wa AS BIGINT) AS n_states,
         ROW_NUMBER() OVER (ORDER BY a) AS rn2
  FROM rows_h WHERE rn = 1
  WINDOW wa AS (ORDER BY a ROWS BETWEEN UNBOUNDED PRECEDING AND
                UNBOUNDED FOLLOWING)
)
SELECT CAST(n_all AS BIGINT) AS n_transitions, n_states,
       round(hsum / n_all, 6) AS entropy_rate,
       round(ln(CAST(n_states AS DOUBLE)), 6) AS max_entropy,
       CASE WHEN n_states > 1
            THEN round(1.0 - (hsum / n_all)
                       / ln(CAST(n_states AS DOUBLE)), 6)
            END AS predictability
FROM folded WHERE rn2 = 1
"""


def x202_peak_concurrency(spark, sf_dir):
    """Peak concurrent sessions (funnel.peak_concurrency): sweep-line
    max of open 30-min-gap sessions on the scalable prefix sum;
    closed-interval tie rule."""
    return funnel.peak_concurrency(_t(spark, sf_dir, "events"))


X202_SQL = """
WITH ordered AS (
  SELECT user_id, ts, event_id,
         date_diff('second',
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                   ts) AS gap
  FROM events
),
sessn AS (
  SELECT user_id, ts,
         SUM(CASE WHEN gap > 1800 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_no
  FROM ordered
),
sess AS (
  SELECT user_id, session_no, MIN(ts) AS t0, MAX(ts) AS t1
  FROM sessn GROUP BY 1, 2
),
bounds AS (
  SELECT t, CAST(SUM(sign) AS BIGINT) AS delta,
         epoch_us(t) * 2 + CASE WHEN sign = -1 THEN 1 ELSE 0 END AS okey
  FROM (
    SELECT t0 AS t, 1 AS sign FROM sess
    UNION ALL
    SELECT t1 AS t, -1 AS sign FROM sess
  ) GROUP BY t, sign
),
running AS (
  SELECT t, SUM(delta) OVER (ORDER BY okey ROWS BETWEEN UNBOUNDED
             PRECEDING AND CURRENT ROW) AS conc
  FROM bounds
),
peak AS (SELECT CAST(MAX(conc) AS BIGINT) AS peak_concurrency FROM running),
firstp AS (
  SELECT MIN(t) AS first_peak_ts
  FROM running JOIN peak ON conc = peak_concurrency
),
ns AS (SELECT CAST(count(*) AS BIGINT) AS n_sessions FROM sess)
SELECT n_sessions, peak_concurrency, first_peak_ts
FROM ns CROSS JOIN peak CROSS JOIN firstp
"""



def x203_stratified_estimate(spark, sf_dir):
    """Design-based stratified mean-quality estimator under the x200
    Neyman allocation (curation.stratified_estimate): estimate, SE,
    and 95% interval off exact lattice moments."""
    return curation.stratified_estimate(_t(spark, sf_dir, "documents"))


X203_SQL = rf"""
WITH alloc AS ({X200_SQL}),
qb AS (
  SELECT source, text,
         list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '') AS toks
  FROM documents
),
qq AS (
  SELECT source,
         (CASE WHEN len(toks) BETWEEN 10 AND 10000 THEN 0.4 ELSE 0.0 END
          + CASE WHEN CAST(list_aggregate(list_transform(toks, t -> length(t)), 'sum') AS DOUBLE)
                      / greatest(len(toks), 1) BETWEEN 3.0 AND 10.0 THEN 0.3 ELSE 0.0 END
          + CASE WHEN CAST(len(list_filter(list_transform(toks, t -> lower(t)),
                               t -> list_contains({_STOP_EN}, t))) AS DOUBLE)
                      / greatest(len(toks), 1) >= 0.01 THEN 0.2 ELSE 0.0 END
          + CASE WHEN CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
                      / greatest(length(text), 1) <= 0.2 THEN 0.1 ELSE 0.0 END) AS score
  FROM qb
),
qst AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_h,
         CAST(SUM(s10) AS BIGINT) AS s, CAST(SUM(s10 * s10) AS BIGINT) AS ss
  FROM (SELECT source, CAST(round(score * 10) AS BIGINT) AS s10 FROM qq)
  GROUP BY 1
),
joined AS (
  SELECT q.source, q.n_h, q.s, q.ss, a.alloc_docs
  FROM qst q JOIN alloc a USING (source)
),
tot AS (SELECT CAST(SUM(n_h) AS DOUBLE) AS n_total FROM joined),
termed AS (
  SELECT source, alloc_docs, n_total,
         (CAST(n_h AS DOUBLE) / n_total)
           * (CAST(s AS DOUBLE) / CAST(n_h AS DOUBLE) / 10.0) AS mean_term,
         CASE WHEN alloc_docs > 0
              THEN (CAST(n_h AS DOUBLE) / n_total)
                   * (CAST(n_h AS DOUBLE) / n_total)
                   * ((CAST(n_h AS DOUBLE) * CAST(ss AS DOUBLE)
                       - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                      / (CAST(n_h AS DOUBLE) * CAST(n_h AS DOUBLE)) / 100.0)
                   / CAST(alloc_docs AS DOUBLE)
              ELSE 0.0 END AS var_term
  FROM joined CROSS JOIN tot
),
folded AS (
  SELECT CAST(n_total AS BIGINT) AS n_total,
         CAST(SUM(alloc_docs) OVER wf AS BIGINT) AS n_sampled,
         SUM(mean_term) OVER wf AS est,
         sqrt(SUM(var_term) OVER wf) AS se,
         ROW_NUMBER() OVER (ORDER BY source) AS rn
  FROM termed
  WINDOW wf AS (ORDER BY source ROWS BETWEEN UNBOUNDED PRECEDING AND
                UNBOUNDED FOLLOWING)
)
SELECT n_total, n_sampled,
       round(est, 6) AS est_mean_quality,
       round(se, 6) AS se,
       round(est - 1.96 * se, 6) AS ci95_lo,
       round(est + 1.96 * se, 6) AS ci95_hi
FROM folded WHERE rn = 1
"""


def x204_km_survival(spark, sf_dir):
    """Kaplan-Meier reorder survival (funnel.km_survival): censored
    product-limit curve over integer-day gap cells."""
    return funnel.km_survival(_t(spark, sf_dir, "orders"))


X204_SQL = """
WITH base AS (
  SELECT o_custkey AS custkey, CAST(o_orderdate AS DATE) AS day FROM orders
),
gaps AS (
  SELECT custkey, day,
         date_diff('day', lag(day) OVER (PARTITION BY custkey
                                         ORDER BY day), day) AS gap,
         ROW_NUMBER() OVER (PARTITION BY custkey ORDER BY day DESC) AS rdesc
  FROM base
),
events AS (
  SELECT CAST(gap AS BIGINT) AS t, 1 AS is_event
  FROM gaps WHERE gap IS NOT NULL
),
anchor AS (SELECT MAX(day) AS anchor FROM base),
censored AS (
  SELECT CAST(date_diff('day', day, anchor) AS BIGINT) AS t, 0 AS is_event
  FROM gaps CROSS JOIN anchor WHERE rdesc = 1
),
durs AS (
  SELECT * FROM (
    SELECT * FROM events UNION ALL SELECT * FROM censored
  ) WHERE t <= 365
),
cells AS (
  SELECT t, CAST(SUM(is_event) AS BIGINT) AS d,
         CAST(SUM(1 - is_event) AS BIGINT) AS c
  FROM durs GROUP BY 1
),
tot AS (SELECT CAST(SUM(d + c) AS BIGINT) AS n0 FROM cells),
risky AS (
  SELECT t, d, c,
         CAST(n0 - coalesce(SUM(d + c) OVER (ORDER BY t ROWS BETWEEN
              UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
  FROM cells CROSS JOIN tot
),
surv AS (
  SELECT t, n_risk, d,
         CASE WHEN MAX(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
                   OVER wc = 1 THEN 0.0
              ELSE exp(SUM(CASE WHEN d < n_risk
                           THEN ln(1.0 - CAST(d AS DOUBLE)
                                   / CAST(n_risk AS DOUBLE))
                           ELSE 0.0 END) OVER wc)
         END AS s
  FROM risky WHERE d > 0
  WINDOW wc AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND
                CURRENT ROW)
)
SELECT t AS t_days, n_risk, d AS n_events, round(s, 6) AS survival
FROM surv ORDER BY t_days
"""



def x205_path_trigrams(spark, sf_dir):
    """Frequent 3-step session motifs (funnel.path_trigrams): sliding
    in-session trigrams, top-20 with shares."""
    return funnel.path_trigrams(_t(spark, sf_dir, "events"))


X205_SQL = """
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         date_diff('second',
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                   ts) AS gap
  FROM events
),
sess AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(CASE WHEN gap > 1800 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_no
  FROM ordered
),
triples AS (
  SELECT lag(event_type, 2) OVER w3 AS t1,
         lag(event_type, 1) OVER w3 AS t2,
         event_type AS t3
  FROM sess
  WINDOW w3 AS (PARTITION BY user_id, session_no ORDER BY ts, event_id)
),
cells AS (
  SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n_occurrences
  FROM triples WHERE t1 IS NOT NULL GROUP BY 1, 2, 3
),
tot AS (SELECT CAST(SUM(n_occurrences) AS DOUBLE) AS total FROM cells)
SELECT t1 || '>' || t2 || '>' || t3 AS motif, n_occurrences,
       round(n_occurrences / total, 6) AS share
FROM cells CROSS JOIN tot
ORDER BY n_occurrences DESC, motif
LIMIT 20
"""


def x206_eb_shrinkage(spark, sf_dir):
    """Empirical-Bayes shrinkage of per-source quality means
    (curation.eb_quality_shrinkage): normal method-of-moments prior,
    exact lattice moments."""
    return curation.eb_quality_shrinkage(_t(spark, sf_dir, "documents"))


X206_SQL = rf"""
WITH qb AS (
  SELECT source, text,
         list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '') AS toks
  FROM documents
),
qq AS (
  SELECT source,
         (CASE WHEN len(toks) BETWEEN 10 AND 10000 THEN 0.4 ELSE 0.0 END
          + CASE WHEN CAST(list_aggregate(list_transform(toks, t -> length(t)), 'sum') AS DOUBLE)
                      / greatest(len(toks), 1) BETWEEN 3.0 AND 10.0 THEN 0.3 ELSE 0.0 END
          + CASE WHEN CAST(len(list_filter(list_transform(toks, t -> lower(t)),
                               t -> list_contains({_STOP_EN}, t))) AS DOUBLE)
                      / greatest(len(toks), 1) >= 0.01 THEN 0.2 ELSE 0.0 END
          + CASE WHEN CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
                      / greatest(length(text), 1) <= 0.2 THEN 0.1 ELSE 0.0 END) AS score
  FROM qb
),
qst AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_h,
         CAST(SUM(s10) AS BIGINT) AS s, CAST(SUM(s10 * s10) AS BIGINT) AS ss
  FROM (SELECT source, CAST(round(score * 10) AS BIGINT) AS s10 FROM qq)
  GROUP BY 1
),
tots AS (
  SELECT CAST(SUM(n_h) AS BIGINT) AS n_tot, CAST(SUM(s) AS BIGINT) AS s_tot
  FROM qst
),
based AS (
  SELECT source, n_h,
         CAST(s AS DOUBLE) / CAST(n_h AS DOUBLE) / 10.0 AS mean_h,
         CAST(s_tot AS DOUBLE) / CAST(n_tot AS DOUBLE) / 10.0 AS grand,
         (CAST(n_h AS DOUBLE) * CAST(ss AS DOUBLE)
          - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
           / CAST(n_h AS DOUBLE) / 100.0 AS nvar_h,
         CAST(n_h AS DOUBLE)
           * (CAST(s AS DOUBLE) / CAST(n_h AS DOUBLE) / 10.0
              - CAST(s_tot AS DOUBLE) / CAST(n_tot AS DOUBLE) / 10.0)
           * (CAST(s AS DOUBLE) / CAST(n_h AS DOUBLE) / 10.0
              - CAST(s_tot AS DOUBLE) / CAST(n_tot AS DOUBLE) / 10.0)
           AS nbet_h,
         CAST(n_tot AS DOUBLE) AS n_tot_d
  FROM qst CROSS JOIN tots
),
folded AS (
  SELECT source, n_h, mean_h, grand,
         SUM(nvar_h) OVER wf / n_tot_d AS var_w,
         SUM(nbet_h) OVER wf / n_tot_d AS var_b
  FROM based
  WINDOW wf AS (ORDER BY source ROWS BETWEEN UNBOUNDED PRECEDING AND
                UNBOUNDED FOLLOWING)
)
SELECT source, n_h,
       round(mean_h, 6) AS raw_mean,
       round(CASE WHEN var_b > 0
                  THEN (CAST(n_h AS DOUBLE) * mean_h
                        + (var_w / var_b) * grand)
                       / (CAST(n_h AS DOUBLE) + var_w / var_b)
                  ELSE grand END, 6) AS shrunk_mean,
       round(CASE WHEN var_b > 0
                  THEN CAST(n_h AS DOUBLE)
                       / (CAST(n_h AS DOUBLE) + var_w / var_b)
                  ELSE 0.0 END, 6) AS own_weight,
       round(grand, 6) AS grand_mean
FROM folded
ORDER BY source
"""


def x207_stickiness(spark, sf_dir):
    """DAU/WAU/MAU stickiness ratios per day (funnel.stickiness):
    exact rolling distincts via the x153 cell fan-out."""
    return funnel.stickiness(_t(spark, sf_dir, "events"))


X207_SQL = """
WITH cells AS (
  SELECT user_id AS u, CAST(date_trunc('day', ts) AS DATE) AS day
  FROM events GROUP BY 1, 2
),
maxd AS (SELECT MAX(day) AS max_day FROM cells),
dau AS (
  SELECT day, CAST(count(DISTINCT u) AS BIGINT) AS dau
  FROM cells GROUP BY 1
),
wau AS (
  SELECT day2 AS day, CAST(count(DISTINCT u) AS BIGINT) AS wau
  FROM (
    SELECT u, CAST(unnest(generate_series(day, day + 6,
                                          INTERVAL 1 DAY)) AS DATE) AS day2
    FROM cells
  ) CROSS JOIN maxd WHERE day2 <= max_day GROUP BY 1
),
mau AS (
  SELECT day2 AS day, CAST(count(DISTINCT u) AS BIGINT) AS mau
  FROM (
    SELECT u, CAST(unnest(generate_series(day, day + 27,
                                          INTERVAL 1 DAY)) AS DATE) AS day2
    FROM cells
  ) CROSS JOIN maxd WHERE day2 <= max_day GROUP BY 1
)
SELECT d.day, d.dau, w.wau, m.mau,
       round(d.dau / CAST(m.mau AS DOUBLE), 6) AS dau_mau,
       round(w.wau / CAST(m.mau AS DOUBLE), 6) AS wau_mau
FROM dau d JOIN wau w USING (day) JOIN mau m USING (day)
ORDER BY d.day
"""


def x208_attribution_credit(spark, sf_dir):
    """First-touch vs last-touch conversion attribution
    (funnel.attribution_credit): every purchase credits its session's
    opening event type and its immediate predecessor; 'direct' when
    the conversion opens the session."""
    return funnel.attribution_credit(_t(spark, sf_dir, "events"))


X208_SQL = """
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         date_diff('second',
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                   ts) AS gap
  FROM events
),
sess AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(CASE WHEN gap > 1800 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_no
  FROM ordered
),
conv AS (
  SELECT event_type,
         CASE WHEN row_number() OVER w3 = 1 THEN 'direct'
              ELSE first_value(event_type) OVER w3 END AS first_touch,
         COALESCE(lag(event_type) OVER w3, 'direct') AS last_touch
  FROM sess
  WINDOW w3 AS (PARTITION BY user_id, session_no ORDER BY ts, event_id)
),
pconv AS (SELECT * FROM conv WHERE event_type = 'purchase'),
ft AS (
  SELECT first_touch AS channel,
         CAST(count(*) AS BIGINT) AS first_touch_credits
  FROM pconv GROUP BY 1
),
lt AS (
  SELECT last_touch AS channel,
         CAST(count(*) AS BIGINT) AS last_touch_credits
  FROM pconv GROUP BY 1
),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS n_conv FROM pconv)
SELECT COALESCE(f.channel, l.channel) AS channel,
       CAST(COALESCE(f.first_touch_credits, 0) AS BIGINT)
         AS first_touch_credits,
       CAST(COALESCE(l.last_touch_credits, 0) AS BIGINT)
         AS last_touch_credits,
       round(COALESCE(f.first_touch_credits, 0) / t.n_conv, 6)
         AS first_touch_share,
       round(COALESCE(l.last_touch_credits, 0) / t.n_conv, 6)
         AS last_touch_share
FROM ft f FULL JOIN lt l ON f.channel = l.channel CROSS JOIN tot t
ORDER BY channel
"""


def x209_ann_mrr(spark, sf_dir):
    """MRR certification of the x95 Hamming index (simsearch.ann_mrr):
    the reciprocal rank of each query's TRUE cosine nearest neighbor
    inside the index's top-10 (0 when missed). Complements x105's set
    recall with the position-weighted serving metric."""
    return simsearch.ann_mrr(_t(spark, sf_dir, "embeddings"), QUERY_IDS, k=10)


X209_SQL = f"""
WITH elem AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
norms AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM elem GROUP BY 1),
dots AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, SUM(q.v * c.v) AS dot
  FROM elem q JOIN elem c ON q.i = c.i AND q.vec_id <> c.vec_id
  WHERE q.vec_id IN (0, 1, 2, 3, 4)
  GROUP BY 1, 2
),
sims AS (
  SELECT d.query_id, d.neighbor_id,
         round(d.dot / (nq.nrm * nc.nrm), 6) AS cosine
  FROM dots d
  JOIN norms nq ON d.query_id = nq.vec_id
  JOIN norms nc ON d.neighbor_id = nc.vec_id
),
truth AS (
  SELECT query_id, neighbor_id AS true_nn FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, neighbor_id) AS rank
    FROM sims
  ) WHERE rank = 1
),
packed AS (
  SELECT vec_id,
         CAST({{w0}} AS BIGINT) AS w0,
         CAST({{w1}} AS BIGINT) AS w1
  FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, w0 AS q0, w1 AS q1
  FROM packed WHERE vec_id IN (0, 1, 2, 3, 4)
),
hscored AS (
  SELECT q.query_id, p.vec_id AS neighbor_id,
         bit_count(xor(p.w0, q.q0)) + bit_count(xor(p.w1, q.q1)) AS hamming
  FROM packed p CROSS JOIN q
  WHERE p.vec_id <> q.query_id
),
approx AS (
  SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS approx_rank FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY hamming, neighbor_id) AS rank
    FROM hscored
  ) WHERE rank <= 10
)
SELECT t.query_id, t.true_nn, a.approx_rank,
       round(CASE WHEN a.approx_rank IS NOT NULL
                  THEN 1.0 / a.approx_rank ELSE 0.0 END, 6) AS rr
FROM truth t LEFT JOIN approx a
  ON t.query_id = a.query_id AND t.true_nn = a.neighbor_id
ORDER BY t.query_id
""".replace("{w0}", _x95_word_sql(0)).replace("{w1}", _x95_word_sql(1))


def x210_langid_kappa(spark, sf_dir):
    """Cohen's kappa of the x10 langid heuristic vs declared labels
    (textstats.langid_kappa): chance-corrected agreement over x102's
    confusion cells — one number for 'is the router better than the
    label mix would produce by accident'."""
    return textstats.langid_kappa(_t(spark, sf_dir, "documents"))


X210_SQL = rf"""
WITH hits AS (
  SELECT doc_id, lang,
         {_hits_sql(textstats.STOPWORDS['en'])} AS h_en,
         {_hits_sql(textstats.STOPWORDS['es'])} AS h_es,
         {_hits_sql(textstats.STOPWORDS['fr'])} AS h_fr,
         {_hits_sql(textstats.STOPWORDS['de'])} AS h_de
  FROM documents
),
pred AS (SELECT lang AS declared, {_X102_PRED} AS predicted FROM hits),
cells AS (
  SELECT declared, predicted, CAST(count(*) AS BIGINT) AS n
  FROM pred GROUP BY 1, 2
),
d AS (SELECT declared AS lang, CAST(SUM(n) AS BIGINT) AS n_d
      FROM cells GROUP BY 1),
p AS (SELECT predicted AS lang, CAST(SUM(n) AS BIGINT) AS n_p
      FROM cells GROUP BY 1),
margins AS (
  SELECT COALESCE(d.lang, p.lang) AS lang,
         CAST(COALESCE(d.n_d, 0) AS BIGINT) AS n_d,
         CAST(COALESCE(p.n_p, 0) AS BIGINT) AS n_p
  FROM d FULL JOIN p ON d.lang = p.lang
),
crossm AS (
  SELECT CAST(SUM(n_d * n_p) AS BIGINT) AS cross_sum FROM margins
),
diag AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_total,
         CAST(SUM(CASE WHEN declared = predicted THEN n ELSE 0 END)
              AS BIGINT) AS n_agree
  FROM cells
)
SELECT n_total, n_agree,
       round(n_agree / CAST(n_total AS DOUBLE), 6) AS po,
       round(cross_sum / (CAST(n_total AS DOUBLE) * n_total), 6) AS pe,
       CASE WHEN cross_sum / (CAST(n_total AS DOUBLE) * n_total) < 1.0
            THEN round((n_agree / CAST(n_total AS DOUBLE)
                        - cross_sum / (CAST(n_total AS DOUBLE) * n_total))
                       / (1.0 - cross_sum
                          / (CAST(n_total AS DOUBLE) * n_total)), 6)
       END AS kappa
FROM diag CROSS JOIN crossm
"""


def x211_aa_calibration(spark, sf_dir):
    """A/A experiment-harness calibration (funnel.aa_calibration):
    md5-bucket users into two arms and two-sample z-test four
    integer-exact per-user metrics — every metric must come back
    balanced before any real A/B readout is trusted."""
    return funnel.aa_calibration(_t(spark, sf_dir, "events"))


X211_SQL = """
WITH pu AS (
  SELECT user_id,
         CAST(count(*) AS DOUBLE) AS m_events,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS DOUBLE) AS m_errors,
         CAST(count(DISTINCT date_trunc('day', ts)) AS DOUBLE) AS m_days,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) AS m_cents
  FROM events GROUP BY 1
),
armed AS (
  SELECT CASE WHEN (ascii(substring(md5(CAST(user_id AS VARCHAR)), 1, 1)) * 256
                    + ascii(substring(md5(CAST(user_id AS VARCHAR)), 2, 1)))
                   % 2 = 0
              THEN 'a' ELSE 'b' END AS arm,
         m_events, m_errors, m_days, m_cents
  FROM pu
),
melt AS (
  SELECT arm, 'events_per_user' AS metric, m_events AS v FROM armed
  UNION ALL SELECT arm, 'errors_per_user', m_errors FROM armed
  UNION ALL SELECT arm, 'active_days_per_user', m_days FROM armed
  UNION ALL SELECT arm, 'value_cents_per_user', m_cents FROM armed
),
folded AS (
  SELECT metric,
         CAST(SUM(CASE WHEN arm = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN arm = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         SUM(CASE WHEN arm = 'a' THEN v ELSE 0.0 END) AS s_a,
         SUM(CASE WHEN arm = 'b' THEN v ELSE 0.0 END) AS s_b,
         SUM(CASE WHEN arm = 'a' THEN v * v ELSE 0.0 END) AS ss_a,
         SUM(CASE WHEN arm = 'b' THEN v * v ELSE 0.0 END) AS ss_b
  FROM melt GROUP BY 1
),
m AS (
  SELECT metric, n_a, n_b,
         s_a / n_a AS mean_a, s_b / n_b AS mean_b,
         sqrt((ss_a - s_a * s_a / n_a) / (n_a - 1) / n_a
              + (ss_b - s_b * s_b / n_b) / (n_b - 1) / n_b) AS se
  FROM folded
)
SELECT metric, n_a, n_b,
       round(mean_a, 6) AS mean_a,
       round(mean_b, 6) AS mean_b,
       CASE WHEN se > 0 THEN round((mean_a - mean_b) / se, 6) END AS z,
       CASE WHEN se > 0 THEN abs((mean_a - mean_b) / se) < 1.96
            ELSE mean_a = mean_b END AS balanced
FROM m
ORDER BY metric
"""


def x212_spearman_quality(spark, sf_dir):
    """Length-vs-quality Spearman rho per source
    (textstats.spearman_quality): Pearson on doubled midranks, exact
    integer moment sums — 'are we selecting for long documents?'."""
    return textstats.spearman_quality(_t(spark, sf_dir, "documents"))


X212_SQL = rf"""
WITH qb AS (
  SELECT source, n_chars, text,
         list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '') AS toks
  FROM documents
),
qq AS (
  SELECT source, CAST(n_chars AS BIGINT) AS x,
         CAST(round((CASE WHEN len(toks) BETWEEN 10 AND 10000 THEN 0.4 ELSE 0.0 END
          + CASE WHEN CAST(list_aggregate(list_transform(toks, t -> length(t)), 'sum') AS DOUBLE)
                      / greatest(len(toks), 1) BETWEEN 3.0 AND 10.0 THEN 0.3 ELSE 0.0 END
          + CASE WHEN CAST(len(list_filter(list_transform(toks, t -> lower(t)),
                               t -> list_contains({_STOP_EN}, t))) AS DOUBLE)
                      / greatest(len(toks), 1) >= 0.01 THEN 0.2 ELSE 0.0 END
          + CASE WHEN CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
                      / greatest(length(text), 1) <= 0.2 THEN 0.1 ELSE 0.0 END) * 10)
          AS BIGINT) AS y
  FROM qb
),
ranked AS (
  SELECT source,
         CAST(2 * rank() OVER (PARTITION BY source ORDER BY x)
              + count(*) OVER (PARTITION BY source, x) - 1 AS DOUBLE) AS rx,
         CAST(2 * rank() OVER (PARTITION BY source ORDER BY y)
              + count(*) OVER (PARTITION BY source, y) - 1 AS DOUBLE) AS ry
  FROM qq
),
agg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         SUM(rx) AS sx, SUM(ry) AS sy,
         SUM(rx * rx) AS sxx, SUM(ry * ry) AS syy, SUM(rx * ry) AS sxy
  FROM ranked GROUP BY 1
)
SELECT source, n_docs,
       CASE WHEN n_docs * sxx - sx * sx > 0 AND n_docs * syy - sy * sy > 0
            THEN round((n_docs * sxy - sx * sy)
                       / sqrt((n_docs * sxx - sx * sx)
                              * (n_docs * syy - sy * sy)), 6)
       END AS spearman_rho
FROM agg
ORDER BY source
"""


def x213_markov_prediction(spark, sf_dir):
    """Next-event top-1 prediction accuracy (funnel.markov_prediction):
    the x128 transition argmax as a predictor, scored on the observed
    transitions — x201's entropy rate turned into a decision metric."""
    return funnel.markov_prediction(_t(spark, sf_dir, "events"))


X213_SQL = """
WITH pairs AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type,
         event_type AS next_type
  FROM events
),
cells AS (
  SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
  FROM pairs WHERE prev_type IS NOT NULL GROUP BY 1, 2
),
best AS (
  SELECT prev_type, next_type AS predicted, n AS n_correct FROM (
    SELECT prev_type, next_type, n,
           row_number() OVER (PARTITION BY prev_type
                              ORDER BY n DESC, next_type) AS rn
    FROM cells
  ) WHERE rn = 1
),
totals AS (
  SELECT prev_type, CAST(SUM(n) AS BIGINT) AS n_transitions
  FROM cells GROUP BY 1
)
SELECT t.prev_type, b.predicted, t.n_transitions, b.n_correct,
       round(b.n_correct / CAST(t.n_transitions AS DOUBLE), 6) AS accuracy
FROM totals t JOIN best b USING (prev_type)
ORDER BY t.prev_type
"""


def x214_bot_regularity(spark, sf_dir):
    """Bot/automation screen (funnel.bot_regularity): per user with
    >= 5 inter-event gaps, mean gap and coefficient of variation —
    clockwork traffic (CV <= 0.1, or all-zero-gap replays) is flagged
    before user events are trusted as training signal."""
    return funnel.bot_regularity(_t(spark, sf_dir, "events"))


X214_SQL = """
WITH ordered AS (
  SELECT user_id,
         date_diff('second',
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                   ts) AS g
  FROM events
),
gaps AS (
  SELECT user_id, CAST(g AS DOUBLE) AS g FROM ordered WHERE g IS NOT NULL
),
agg AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
         SUM(g) AS s, SUM(g * g) AS ss
  FROM gaps GROUP BY 1 HAVING count(*) >= 5
)
SELECT user_id, n_gaps,
       round(s / n_gaps, 6) AS mean_gap_s,
       CASE WHEN s > 0
            THEN round(sqrt((ss - s * s / n_gaps) / (n_gaps - 1))
                       / (s / n_gaps), 6)
       END AS cv,
       (s = 0) OR (s > 0
                   AND sqrt((ss - s * s / n_gaps) / (n_gaps - 1))
                       / (s / n_gaps) <= 0.1) AS bot_like
FROM agg
ORDER BY user_id
"""


def x215_ivf_probe_sweep(spark, sf_dir):
    """IVF n_probe tuning curve (simsearch.ivf_probe_sweep): per probe
    setting in {1,2,4,8} and per query, candidates scanned and
    recall@5 vs the x7 exact baseline — one scoring pass serves every
    setting via the first-admitting-cell rank."""
    return simsearch.ivf_probe_sweep(
        _t(spark, sf_dir, "embeddings"), QUERY_IDS, k=5
    )


X215_SQL = """
WITH elem AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
norms AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM elem GROUP BY 1),
cdots AS (
  SELECT a.vec_id, ce.vec_id AS cent_id, SUM(a.v * ce.v) AS dot
  FROM elem a JOIN elem ce ON a.i = ce.i
  WHERE ce.vec_id % 16 = 0
  GROUP BY 1, 2
),
csims AS (
  SELECT d.vec_id, d.cent_id, d.dot / (na.nrm * nc.nrm) AS sim
  FROM cdots d
  JOIN norms na ON d.vec_id = na.vec_id
  JOIN norms nc ON d.cent_id = nc.vec_id
),
corpus_cell AS (
  SELECT vec_id AS neighbor_id, cent_id
  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY sim DESC, cent_id) AS rn
        FROM csims)
  WHERE rn = 1
),
query_cells AS (
  SELECT vec_id AS query_id, cent_id, rn AS cell_rank
  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY sim DESC, cent_id) AS rn
        FROM csims WHERE vec_id IN (0, 1, 2, 3, 4))
  WHERE rn <= 8
),
cand AS (
  SELECT query_id, neighbor_id, MIN(cell_rank) AS first_probe
  FROM query_cells JOIN corpus_cell USING (cent_id)
  WHERE query_id <> neighbor_id
  GROUP BY 1, 2
),
pdots AS (
  SELECT p.query_id, p.neighbor_id, p.first_probe, SUM(q.v * c.v) AS dot
  FROM cand p
  JOIN elem q ON q.vec_id = p.query_id
  JOIN elem c ON c.vec_id = p.neighbor_id AND c.i = q.i
  GROUP BY 1, 2, 3
),
scored AS (
  SELECT d.query_id, d.neighbor_id, d.first_probe,
         round(d.dot / (nq.nrm * nc.nrm), 6) AS cosine
  FROM pdots d
  JOIN norms nq ON d.query_id = nq.vec_id
  JOIN norms nc ON d.neighbor_id = nc.vec_id
),
probes AS (SELECT unnest([1, 2, 4, 8]) AS n_probe),
sweep AS (
  SELECT * FROM scored CROSS JOIN probes WHERE first_probe <= n_probe
),
counts AS (
  SELECT n_probe, query_id, CAST(count(*) AS BIGINT) AS n_candidates
  FROM sweep GROUP BY 1, 2
),
approx AS (
  SELECT n_probe, query_id, neighbor_id FROM (
    SELECT n_probe, query_id, neighbor_id,
           row_number() OVER (PARTITION BY n_probe, query_id
                              ORDER BY cosine DESC, neighbor_id) AS rn
    FROM sweep
  ) WHERE rn <= 5
),
tdots AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, SUM(q.v * c.v) AS dot
  FROM elem q JOIN elem c ON q.i = c.i AND q.vec_id <> c.vec_id
  WHERE q.vec_id IN (0, 1, 2, 3, 4)
  GROUP BY 1, 2
),
tsims AS (
  SELECT d.query_id, d.neighbor_id,
         round(d.dot / (nq.nrm * nc.nrm), 6) AS cosine
  FROM tdots d
  JOIN norms nq ON d.query_id = nq.vec_id
  JOIN norms nc ON d.neighbor_id = nc.vec_id
),
truth AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, neighbor_id) AS rank
    FROM tsims
  ) WHERE rank <= 5
),
nexact AS (
  SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact FROM truth GROUP BY 1
),
hits AS (
  SELECT pr.n_probe, t.query_id,
         CAST(count(a.neighbor_id) AS BIGINT) AS n_hits
  FROM truth t
  CROSS JOIN probes pr
  LEFT JOIN approx a ON a.n_probe = pr.n_probe
                    AND a.query_id = t.query_id
                    AND a.neighbor_id = t.neighbor_id
  GROUP BY 1, 2
)
SELECT c.n_probe, c.query_id, c.n_candidates, e.n_exact, h.n_hits,
       round(h.n_hits / CAST(e.n_exact AS DOUBLE), 6) AS recall
FROM counts c
JOIN nexact e USING (query_id)
JOIN hits h ON h.n_probe = c.n_probe AND h.query_id = c.query_id
ORDER BY c.n_probe, c.query_id
"""


def x216_poisson_bootstrap(spark, sf_dir):
    """One-pass Poisson-bootstrap CI for mean order value
    (profile.poisson_bootstrap_mean): every row draws a deterministic
    md5-derived Poisson(1) weight per replica, so all 50 replica sums
    accumulate in ONE grouped aggregate — the bootstrap that works on
    sharded data (Chamandy et al., Google)."""
    return profile.poisson_bootstrap_mean(
        _t(spark, sf_dir, "orders"),
        value_col="o_totalprice",
        id_col="o_orderkey",
        metric="mean_order_value",
    )


X216_SQL = f"""
WITH base AS (
  SELECT CAST(o_orderkey AS VARCHAR) AS id,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
point AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         SUM(cents) / CAST(count(*) AS DOUBLE) / 100 AS pt
  FROM base
),
rep AS (
  SELECT id, cents, unnest(generate_series(1, 50)) AS b FROM base
),
uu AS (
  SELECT b, cents,
         ({_X73_U("md5(id || '-' || CAST(b AS VARCHAR))")}) / 16777216.0 AS u
  FROM rep
),
ww AS (
  SELECT b, cents,
         CASE WHEN u < 0.36787944117144233 THEN 0
              WHEN u < 0.7357588823428847 THEN 1
              WHEN u < 0.9196986029286058 THEN 2
              WHEN u < 0.9810118431238462 THEN 3
              WHEN u < 0.9963401531726563 THEN 4
              ELSE 5 END AS w
  FROM uu
),
means AS (
  SELECT b, SUM(w * cents) / CAST(SUM(w) AS DOUBLE) / 100 AS m
  FROM ww GROUP BY 1 HAVING SUM(w) > 0
),
ci AS (
  SELECT CAST(count(*) AS BIGINT) AS n_replicas,
         quantile_cont(m, 0.025) AS lo,
         quantile_cont(m, 0.975) AS hi
  FROM means
)
SELECT 'mean_order_value' AS metric, p.n_rows, c.n_replicas,
       round(p.pt, 6) AS point_estimate,
       round(c.lo, 6) AS ci_lo,
       round(c.hi, 6) AS ci_hi
FROM point p CROSS JOIN ci c
"""


def x217_dup_flow_matrix(spark, sf_dir):
    """Cross-source duplicate flow matrix (dedup.dup_flow_matrix):
    x67's confirmed near-dup pairs rolled up by unordered source pair
    — off-diagonal cells are syndication/mirroring between feeds."""
    return dedup.dup_flow_matrix(_t(spark, sf_dir, "documents"))


# X67's blocked-candidates + Jaccard-confirm prefix, rolled up by source
# pair instead of closed into components.
X217_SQL = rf"""
WITH norm AS MATERIALIZED (
  SELECT doc_id, {_X67_NORM} AS toks FROM documents
),
shn AS MATERIALIZED (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3
              THEN list_distinct([array_to_string(toks[i:i+2], ' ') for i in generate_series(1, len(toks) - 2)])
              WHEN len(toks) > 0
              THEN [array_to_string(toks, ' ')]
              ELSE CAST([] AS VARCHAR[])
         END AS sh
  FROM norm
),
flat AS MATERIALIZED (SELECT DISTINCT doc_id, unnest(sh) AS s FROM shn),
rare AS MATERIALIZED (SELECT s FROM flat GROUP BY s HAVING count(*) BETWEEN 2 AND 5),
cand AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
  FROM flat a JOIN rare USING (s) JOIN flat b USING (s)
  WHERE a.doc_id < b.doc_id
),
conf AS (
  SELECT ia, ib
  FROM cand JOIN shn x ON x.doc_id = ia JOIN shn y ON y.doc_id = ib
  WHERE round(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
        / len(list_distinct(list_concat(x.sh, y.sh))), 6) >= 0.3
),
flows AS (
  SELECT least(da.source, db.source) AS source_a,
         greatest(da.source, db.source) AS source_b,
         CAST(count(*) AS BIGINT) AS n_pairs
  FROM conf
  JOIN documents da ON da.doc_id = ia
  JOIN documents db ON db.doc_id = ib
  GROUP BY 1, 2
),
tot AS (SELECT CAST(SUM(n_pairs) AS DOUBLE) AS n_total FROM flows)
SELECT source_a, source_b, n_pairs,
       source_a <> source_b AS cross_source,
       round(n_pairs / n_total, 6) AS share
FROM flows CROSS JOIN tot
ORDER BY source_a, source_b
"""


def x218_ab_power_curve(spark, sf_dir):
    """A/B sizing curve (funnel.ab_power_curve): minimum detectable
    effect on mean per-user value at 80% power / 5% alpha for per-arm
    sizes {1k, 10k, 100k, 1M} — the planning artifact x211's A/A
    harness calibrates."""
    return funnel.ab_power_curve(_t(spark, sf_dir, "events"))


X218_SQL = """
WITH pu AS (
  SELECT user_id,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1
),
mom AS (
  SELECT CAST(count(*) AS BIGINT) AS n_users,
         CAST(SUM(cents) AS BIGINT) AS s,
         CAST(SUM(cents * cents) AS BIGINT) AS ss
  FROM pu
),
grid AS (
  SELECT n_users, s, ss,
         unnest([1000, 10000, 100000, 1000000]) AS n_per_arm
  FROM mom
),
m AS (
  SELECT n_per_arm, n_users,
         s / CAST(n_users AS DOUBLE) / 100.0 AS mean,
         (ss - s * CAST(s AS DOUBLE) / n_users)
           / (CAST(n_users AS DOUBLE) - 1) / 10000.0 AS var
  FROM grid
)
SELECT n_per_arm, n_users,
       round(mean, 6) AS metric_mean,
       round(sqrt(var), 6) AS metric_sd,
       round(2.8015852181129683 * sqrt(2.0 * var / n_per_arm), 6) AS mde_abs,
       CASE WHEN mean > 0
            THEN round(2.8015852181129683 * sqrt(2.0 * var / n_per_arm)
                       / mean, 6)
       END AS mde_rel
FROM m
ORDER BY n_per_arm
"""


def x219_greedy_coverage(spark, sf_dir):
    """Greedy max-coverage subset selection
    (curation.greedy_coverage_select): 10 picks, each maximizing
    newly-covered distinct 3-shingles — the facility-location coreset
    greedy (1-1/e-optimal), hash-verified against a 10-step chained
    CTE replay of the argmax recursion."""
    return curation.greedy_coverage_select(_t(spark, sf_dir, "documents"))


def _x219_step(i: int) -> str:
    # every step CTE is MATERIALIZED: each references the previous
    # level twice, so inlining would duplicate the tree ~2^k times
    return f""",
gain{i} AS MATERIALIZED (
  SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n
  FROM flat f
  LEFT JOIN cov{i - 1} c ON c.s = f.s
  WHERE c.s IS NULL
    AND f.doc_id NOT IN (SELECT doc_id FROM picks{i - 1})
  GROUP BY 1
),
pick{i} AS MATERIALIZED (
  SELECT {i} AS rank, doc_id, n FROM gain{i} ORDER BY n DESC, doc_id LIMIT 1
),
picks{i} AS MATERIALIZED (
  SELECT doc_id FROM picks{i - 1} UNION ALL SELECT doc_id FROM pick{i}
),
cov{i} AS MATERIALIZED (
  SELECT s FROM cov{i - 1}
  UNION
  SELECT f.s FROM flat f JOIN pick{i} USING (doc_id)
)"""


X219_SQL = (
    rf"""
WITH norm AS MATERIALIZED (
  SELECT doc_id, {_X67_NORM} AS toks FROM documents
),
shn AS MATERIALIZED (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3
              THEN list_distinct([array_to_string(toks[i:i+2], ' ') for i in generate_series(1, len(toks) - 2)])
              WHEN len(toks) > 0
              THEN [array_to_string(toks, ' ')]
              ELSE CAST([] AS VARCHAR[])
         END AS sh
  FROM norm
),
flat AS MATERIALIZED (SELECT DISTINCT doc_id, unnest(sh) AS s FROM shn),
total AS (SELECT CAST(count(*) AS BIGINT) AS t
          FROM (SELECT DISTINCT s FROM flat)),
picks0 AS (SELECT CAST(NULL AS BIGINT) AS doc_id WHERE false),
cov0 AS (SELECT CAST(NULL AS VARCHAR) AS s WHERE false)"""
    + "".join(_x219_step(i) for i in range(1, 11))
    + """,
all_picks AS (
"""
    + "\n  UNION ALL\n".join(f"  SELECT * FROM pick{i}" for i in range(1, 11))
    + """
)
SELECT rank, doc_id, n AS marginal_gain,
       CAST(SUM(n) OVER (ORDER BY rank) AS BIGINT) AS cumulative_coverage,
       round(CAST(SUM(n) OVER (ORDER BY rank) AS BIGINT)
             / CAST(t AS DOUBLE), 6) AS coverage_frac
FROM all_picks CROSS JOIN total
ORDER BY rank
"""
)


def x220_retrieval_exposure(spark, sf_dir):
    """Retrieval exposure fairness (profile.retrieval_exposure): per
    label, top-k appearance share vs corpus base rate and their lift,
    over the y6 vote edges — the class-starvation audit for a serving
    tier."""
    return profile.retrieval_exposure(_t(spark, sf_dir, "embeddings"))


X220_SQL = f"""
WITH bucketed AS (
  SELECT vec_id, embedding,
         ({_X73_U("md5(CAST(vec_id AS VARCHAR) || '-knb')")}) % 16 AS bkt
  FROM embeddings
),
elem AS (
  SELECT vec_id, bkt, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM bucketed
),
dots AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id, SUM(a.v * b.v) AS dot
  FROM elem a JOIN elem b
    ON a.bkt = b.bkt AND a.i = b.i AND a.vec_id <> b.vec_id
  GROUP BY 1, 2
),
norms AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM elem GROUP BY 1),
sims AS (
  SELECT d.vec_id, d.neighbor_id,
         round(d.dot / (na.nrm * nb.nrm), 6) AS cosine
  FROM dots d
  JOIN norms na ON d.vec_id = na.vec_id
  JOIN norms nb ON d.neighbor_id = nb.vec_id
),
votes AS (
  SELECT vec_id, neighbor_id FROM (
    SELECT vec_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY cosine DESC, neighbor_id) AS rn
    FROM sims
  ) WHERE rn <= 5
),
expo AS (
  SELECT lb.label, CAST(count(*) AS BIGINT) AS n_appearances
  FROM votes v JOIN embeddings lb ON v.neighbor_id = lb.vec_id
  GROUP BY 1
),
base AS (
  SELECT label, CAST(count(*) AS BIGINT) AS n_vectors
  FROM embeddings GROUP BY 1
),
tv AS (SELECT CAST(SUM(n_vectors) AS DOUBLE) AS nv FROM base),
ta AS (SELECT CAST(SUM(n_appearances) AS DOUBLE) AS na FROM expo)
SELECT b.label, b.n_vectors,
       CAST(COALESCE(e.n_appearances, 0) AS BIGINT) AS n_appearances,
       round(b.n_vectors / nv, 6) AS base_share,
       round(COALESCE(e.n_appearances, 0) / na, 6) AS exposure_share,
       CASE WHEN b.n_vectors / nv > 0
            THEN round((COALESCE(e.n_appearances, 0) / na)
                       / (b.n_vectors / nv), 6)
       END AS exposure_lift
FROM base b LEFT JOIN expo e USING (label)
CROSS JOIN tv CROSS JOIN ta
ORDER BY label
"""


def x221_mix_rate_decomposition(spark, sf_dir):
    """Two-period mix-vs-rate bridge (funnel.mix_rate_decomposition):
    the change in mean order value split into share-shift and
    repricing contributions per priority segment — the 'why did the
    metric move' artifact; the two columns telescope to mean2-mean1."""
    return funnel.mix_rate_decomposition(_t(spark, sf_dir, "orders"))


X221_SQL = """
WITH span AS (
  SELECT MIN(CAST(o_orderdate AS DATE)) AS d0,
         MAX(CAST(o_orderdate AS DATE)) AS d1
  FROM orders
),
mids AS (
  SELECT d0 + CAST(floor(date_diff('day', d0, d1) / 2) AS INTEGER) AS mid
  FROM span
),
seg AS (
  SELECT o_orderpriority AS segment,
         CASE WHEN CAST(o_orderdate AS DATE) <= mid THEN 1 ELSE 2 END
           AS period,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders CROSS JOIN mids
),
cells AS (
  SELECT segment,
         CAST(SUM(CASE WHEN period = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN period = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(SUM(CASE WHEN period = 1 THEN cents ELSE 0 END) AS BIGINT) AS s1,
         CAST(SUM(CASE WHEN period = 2 THEN cents ELSE 0 END) AS BIGINT) AS s2
  FROM seg GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(n1) AS DOUBLE) AS t1, CAST(SUM(n2) AS DOUBLE) AS t2
  FROM cells
),
m AS (
  SELECT segment, n1, n2,
         n1 / t1 AS sh1, n2 / t2 AS sh2,
         CASE WHEN n1 > 0 THEN s1 / CAST(n1 AS DOUBLE) / 100.0
              ELSE 0.0 END AS r1,
         CASE WHEN n2 > 0 THEN s2 / CAST(n2 AS DOUBLE) / 100.0
              ELSE 0.0 END AS r2
  FROM cells CROSS JOIN tot
)
SELECT segment, n1, n2,
       round(sh1, 6) AS share_1,
       round(sh2, 6) AS share_2,
       round(r1, 6) AS rate_1,
       round(r2, 6) AS rate_2,
       round((sh2 - sh1) * r1, 6) AS mix_contrib,
       round(sh2 * (r2 - r1), 6) AS rate_contrib
FROM m
ORDER BY segment
"""


def x222_quantile_normalize(spark, sf_dir):
    """Quantile normalization of per-source quality scores onto the
    pooled distribution (curation.quantile_normalize_quality) — the
    batch-effect correction that makes one keep-threshold mean the
    same thing for every source."""
    return curation.quantile_normalize_quality(_t(spark, sf_dir, "documents"))


X222_SQL = rf"""
WITH qb AS (
  SELECT source,
         list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '') AS toks,
         text
  FROM documents
),
qq AS (
  SELECT source,
         CAST(round((CASE WHEN len(toks) BETWEEN 10 AND 10000 THEN 0.4 ELSE 0.0 END
          + CASE WHEN CAST(list_aggregate(list_transform(toks, t -> length(t)), 'sum') AS DOUBLE)
                      / greatest(len(toks), 1) BETWEEN 3.0 AND 10.0 THEN 0.3 ELSE 0.0 END
          + CASE WHEN CAST(len(list_filter(list_transform(toks, t -> lower(t)),
                               t -> list_contains({_STOP_EN}, t))) AS DOUBLE)
                      / greatest(len(toks), 1) >= 0.01 THEN 0.2 ELSE 0.0 END
          + CASE WHEN CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
                      / greatest(length(text), 1) <= 0.2 THEN 0.1 ELSE 0.0 END) * 10)
          AS BIGINT) AS s10
  FROM qb
),
cells AS (
  SELECT source, s10, CAST(count(*) AS BIGINT) AS n
  FROM qq GROUP BY 1, 2
),
scored AS (
  SELECT source, s10, n,
         CAST(2 * SUM(n) OVER (PARTITION BY source ORDER BY s10
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) - n AS DOUBLE)
           / CAST(2 * SUM(n) OVER (PARTITION BY source) AS DOUBLE) AS p_mid
  FROM cells
),
pooled_cells AS (
  SELECT s10, CAST(SUM(n) AS BIGINT) AS pn FROM cells GROUP BY 1
),
pooled AS (
  SELECT s10 AS ps10,
         CAST(SUM(pn) OVER (ORDER BY s10
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS DOUBLE)
           / CAST(SUM(pn) OVER () AS DOUBLE) AS pooled_cdf
  FROM pooled_cells
),
mapped AS (
  SELECT s.source, s.s10, s.n, s.p_mid, MIN(p.ps10) AS mapped_s10
  FROM scored s JOIN pooled p ON p.pooled_cdf >= s.p_mid
  GROUP BY 1, 2, 3, 4
)
SELECT source, s10, n,
       round(p_mid, 6) AS p_mid,
       mapped_s10,
       round(mapped_s10 / 10.0, 6) AS mapped_quality
FROM mapped
ORDER BY source, s10
"""


def x223_source_originality(spark, sf_dir):
    """Per-source originality accounting (dedup.source_originality):
    non-canonical near-dup members are copies charged to their source;
    originality = 1 - copies/docs — the source-level rollup of x217's
    pair flows."""
    return dedup.source_originality(_t(spark, sf_dir, "documents"))


# X67's components chain + the X84 quality argmax, rolled up per source.
X223_SQL = X67_SQL.replace(
    "SELECT node AS doc, MIN(r) AS cluster_id FROM reach GROUP BY node",
    rf""", comp AS (
  SELECT node AS doc, MIN(r) AS cluster_id FROM reach GROUP BY node
),
qual AS (
  SELECT doc_id,
         CAST(round(CASE WHEN n_tokens BETWEEN 10 AND 10000 THEN 0.4 ELSE 0 END
             + CASE WHEN mtl BETWEEN 3.0 AND 10.0 THEN 0.3 ELSE 0 END
             + CASE WHEN swr >= 0.01 THEN 0.2 ELSE 0 END
             + CASE WHEN digr <= 0.2 THEN 0.1 ELSE 0 END, 4) AS DOUBLE) AS q
  FROM (
    SELECT doc_id,
           len(toks) AS n_tokens,
           CAST(list_aggregate(list_transform(toks, t -> length(t)), 'sum') AS DOUBLE)
             / greatest(len(toks), 1) AS mtl,
           CAST(len(list_filter(list_transform(toks, t -> lower(t)),
                    t -> list_contains({_STOP_EN}, t))) AS DOUBLE)
             / greatest(len(toks), 1) AS swr,
           CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
             / greatest(length(text), 1) AS digr
    FROM (
      SELECT doc_id, text,
             list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '') AS toks
      FROM documents
    )
  )
),
flags AS (
  SELECT d2.source,
         ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                            ORDER BY qual.q DESC, c.doc) AS rn
  FROM comp c
  JOIN qual ON qual.doc_id = c.doc
  JOIN documents d2 ON d2.doc_id = c.doc
),
agg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_in_clusters,
         CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_canonical
  FROM flags GROUP BY 1
),
src AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY 1
)
SELECT s.source, s.n_docs,
       CAST(COALESCE(a.n_in_clusters, 0) AS BIGINT) AS n_in_clusters,
       CAST(COALESCE(a.n_canonical, 0) AS BIGINT) AS n_canonical,
       CAST(COALESCE(a.n_in_clusters, 0) - COALESCE(a.n_canonical, 0)
            AS BIGINT) AS n_copies,
       round(1.0 - (COALESCE(a.n_in_clusters, 0)
                    - COALESCE(a.n_canonical, 0))
             / CAST(s.n_docs AS DOUBLE), 6) AS originality
FROM src s LEFT JOIN agg a USING (source)
ORDER BY s.source""",
)


def x224_absorption_conversion(spark, sf_dir):
    """Eventual-conversion probability by state
    (funnel.absorption_conversion): absorbing-Markov-chain solve
    (purchase = 1, session END = 0) by 25 Jacobi sweeps on the
    session transition matrix — 'a user currently at t: how likely do
    they convert before the session dies?'."""
    return funnel.absorption_conversion(_t(spark, sf_dir, "events"))


def _x224_step(i: int) -> str:
    return f""",
a{i} AS MATERIALIZED (
  SELECT t.a AS state,
         list_aggregate(list(t.p * av.val ORDER BY t.b), 'sum') AS val
  FROM trans t JOIN a{i - 1} av ON av.state = t.b
  GROUP BY 1
  UNION ALL SELECT 'purchase', 1.0
  UNION ALL SELECT '__END__', 0.0
)"""


X224_SQL = (
    """
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         date_diff('second',
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                   ts) AS gap
  FROM events
),
sess AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(CASE WHEN gap > 1800 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sn
  FROM ordered
),
pairs AS (
  SELECT event_type AS a,
         COALESCE(lead(event_type) OVER (PARTITION BY user_id, sn
                                         ORDER BY ts, event_id),
                  '__END__') AS b
  FROM sess
),
cells AS MATERIALIZED (
  SELECT a, b, CAST(count(*) AS BIGINT) AS n
  FROM pairs WHERE a <> 'purchase' GROUP BY 1, 2
),
trans AS MATERIALIZED (
  SELECT a, b,
         n / CAST(SUM(n) OVER (PARTITION BY a) AS DOUBLE) AS p,
         CAST(SUM(n) OVER (PARTITION BY a) AS BIGINT) AS out_tot
  FROM cells
),
a0 AS MATERIALIZED (
  SELECT DISTINCT a AS state, 0.0 AS val FROM trans
  UNION ALL SELECT 'purchase', 1.0
  UNION ALL SELECT '__END__', 0.0
)"""
    + "".join(_x224_step(i) for i in range(1, 26))
    + """
SELECT f.state, f.out_tot AS n_out_transitions, a25.val AS p_convert
FROM (SELECT DISTINCT a AS state, out_tot FROM trans) f
JOIN a25 ON a25.state = f.state
UNION ALL
SELECT 'purchase', CAST(0 AS BIGINT), 1.0
ORDER BY state
"""
)


def x225_lsh_parameter_plan(spark, sf_dir):
    """LSH band/row planner (dedup.lsh_parameter_plan): expected true
    pairs captured vs false candidates admitted for each (bands, rows)
    split of the 64-hash budget, weighting the banded S-curve by the
    observed candidate-pair Jaccard histogram — picks x3's
    configuration before the big run; x83 calibrates it after."""
    return dedup.lsh_parameter_plan(_t(spark, sf_dir, "documents"))


def _x225_lut_sql() -> str:
    rows = []
    for b, r in dedup.LSH_PARAM_GRID:
        for bn in range(20):
            mid = (bn + 0.5) / 20.0
            p = dedup.lsh_capture_prob(mid, b, r)
            rows.append(
                f"({b}, {r}, {bn}, {str(mid >= 0.3).upper()}, {p!r})"
            )
    return ",\n    ".join(rows)


X225_SQL = rf"""
WITH norm AS MATERIALIZED (
  SELECT doc_id, {_X67_NORM} AS toks FROM documents
),
shn AS MATERIALIZED (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3
              THEN list_distinct([array_to_string(toks[i:i+2], ' ') for i in generate_series(1, len(toks) - 2)])
              WHEN len(toks) > 0
              THEN [array_to_string(toks, ' ')]
              ELSE CAST([] AS VARCHAR[])
         END AS sh
  FROM norm
),
flat AS MATERIALIZED (SELECT DISTINCT doc_id, unnest(sh) AS s FROM shn),
rare AS MATERIALIZED (SELECT s FROM flat GROUP BY s HAVING count(*) BETWEEN 2 AND 5),
cand AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
  FROM flat a JOIN rare USING (s) JOIN flat b USING (s)
  WHERE a.doc_id < b.doc_id
),
sims AS (
  SELECT round(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
        / len(list_distinct(list_concat(x.sh, y.sh))), 6) AS jaccard
  FROM cand JOIN shn x ON x.doc_id = ia JOIN shn y ON y.doc_id = ib
),
bins AS (
  SELECT CAST(least(floor(jaccard * 20), 19) AS INTEGER) AS bin,
         CAST(count(*) AS BIGINT) AS n
  FROM sims GROUP BY 1
),
lut(bands, rows_per_band, bin, is_true, p) AS (
  VALUES
    {_x225_lut_sql()}
),
folded AS (
  SELECT bands, rows_per_band,
         row_number() OVER (PARTITION BY bands, rows_per_band
                            ORDER BY bin) AS rn,
         SUM(CASE WHEN is_true THEN n * p ELSE 0.0 END) OVER wf AS exp_tp,
         SUM(CASE WHEN NOT is_true THEN n * p ELSE 0.0 END) OVER wf AS exp_fp,
         CAST(SUM(CASE WHEN is_true THEN n ELSE 0 END) OVER wf AS BIGINT)
           AS n_true,
         CAST(SUM(CASE WHEN NOT is_true THEN n ELSE 0 END) OVER wf
              AS BIGINT) AS n_false
  FROM bins JOIN lut USING (bin)
  WINDOW wf AS (PARTITION BY bands, rows_per_band ORDER BY bin
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
)
SELECT bands, rows_per_band,
       n_true AS n_true_pairs,
       n_false AS n_false_pairs,
       round(exp_tp, 6) AS exp_true_captured,
       round(exp_fp, 6) AS exp_false_captured,
       CASE WHEN n_true > 0
            THEN round(exp_tp / CAST(n_true AS DOUBLE), 6) END
         AS recall_proxy,
       CASE WHEN n_false > 0
            THEN round(exp_fp / CAST(n_false AS DOUBLE), 6) END
         AS fp_capture_rate
FROM folded
WHERE rn = 1
ORDER BY bands
"""


def x226_grouped_kfold(spark, sf_dir):
    """Cluster-aware k-fold audit (curation.grouped_kfold_audit):
    folds hash the x67 GROUP key so near-dup twins never straddle a
    fold; the report shows the naive per-doc hashing would have split
    n_span_naive clusters (the leakage prevented)."""
    return curation.grouped_kfold_audit(_t(spark, sf_dir, "documents"))


def _x226_fold(col: str) -> str:
    h = f"md5(CAST({col} AS VARCHAR) || '-fold')"
    return (
        f"(ascii(substring({h}, 1, 1)) * 256"
        f" + ascii(substring({h}, 2, 1))) % 5"
    )


X226_SQL = X67_SQL.replace(
    "SELECT node AS doc, MIN(r) AS cluster_id FROM reach GROUP BY node",
    rf""", comp AS (
  SELECT node AS doc, MIN(r) AS cluster_id FROM reach GROUP BY node
),
base AS (
  SELECT d.doc_id AS doc,
         COALESCE(c.cluster_id, d.doc_id) AS group_key
  FROM documents d LEFT JOIN comp c ON c.doc = d.doc_id
),
assigned AS (
  SELECT doc, group_key,
         {_x226_fold("group_key")} AS fold,
         {_x226_fold("doc")} AS naive_fold
  FROM base
),
per_fold AS (
  SELECT fold, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(DISTINCT group_key) AS BIGINT) AS n_groups
  FROM assigned GROUP BY 1
),
tot AS (SELECT CAST(SUM(n_docs) AS DOUBLE) AS nt FROM per_fold),
span_naive AS (
  SELECT CAST(COALESCE(SUM(CASE WHEN nf > 1 THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS n_span_naive
  FROM (SELECT group_key, count(DISTINCT naive_fold) AS nf
        FROM assigned WHERE group_key <> doc GROUP BY 1)
),
span_grouped AS (
  SELECT CAST(COALESCE(SUM(CASE WHEN nf > 1 THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS n_span_grouped
  FROM (SELECT group_key, count(DISTINCT fold) AS nf
        FROM assigned WHERE group_key <> doc GROUP BY 1)
)
SELECT fold, n_docs, n_groups,
       round(n_docs / nt, 6) AS doc_share,
       n_span_naive, n_span_grouped
FROM per_fold CROSS JOIN tot
CROSS JOIN span_naive CROSS JOIN span_grouped
ORDER BY fold""",
)


def x227_loso_quality(spark, sf_dir):
    """Leave-one-source-out quality attribution
    (curation.loso_quality_attribution): corpus mean quality without
    each source; positive drop_gain = the corpus improves when the
    source is dropped (Shapley-lite data valuation)."""
    return curation.loso_quality_attribution(_t(spark, sf_dir, "documents"))


X227_SQL = rf"""
WITH qb AS (
  SELECT source, text,
         list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '') AS toks
  FROM documents
),
qq AS (
  SELECT source,
         CAST(round((CASE WHEN len(toks) BETWEEN 10 AND 10000 THEN 0.4 ELSE 0.0 END
          + CASE WHEN CAST(list_aggregate(list_transform(toks, t -> length(t)), 'sum') AS DOUBLE)
                      / greatest(len(toks), 1) BETWEEN 3.0 AND 10.0 THEN 0.3 ELSE 0.0 END
          + CASE WHEN CAST(len(list_filter(list_transform(toks, t -> lower(t)),
                               t -> list_contains({_STOP_EN}, t))) AS DOUBLE)
                      / greatest(len(toks), 1) >= 0.01 THEN 0.2 ELSE 0.0 END
          + CASE WHEN CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
                      / greatest(length(text), 1) <= 0.2 THEN 0.1 ELSE 0.0 END) * 10)
          AS BIGINT) AS s10
  FROM qb
),
per AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(SUM(s10) AS BIGINT) AS s_sum
  FROM qq GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(n_docs) AS BIGINT) AS nt,
         CAST(SUM(s_sum) AS BIGINT) AS st
  FROM per
)
SELECT source, n_docs,
       round(s_sum / CAST(n_docs AS DOUBLE) / 10.0, 6) AS mean_quality,
       round(st / CAST(nt AS DOUBLE) / 10.0, 6) AS corpus_mean,
       CASE WHEN nt > n_docs
            THEN round((st - s_sum) / CAST(nt - n_docs AS DOUBLE) / 10.0, 6)
       END AS loso_mean,
       CASE WHEN nt > n_docs
            THEN round((st - s_sum) / CAST(nt - n_docs AS DOUBLE) / 10.0
                       - st / CAST(nt AS DOUBLE) / 10.0, 6)
       END AS drop_gain
FROM per CROSS JOIN tot
ORDER BY source
"""


def y5_rrf_fusion(spark, sf_dir):
    """Hybrid retrieval (simsearch.rrf_fusion): reciprocal-rank fusion
    of the x7 exact-cosine dense top-10 with a lexical token-Jaccard
    top-10 — each list contributes 1/(60 + rank); a doc missing from
    one list contributes 0 from it. Both retrievers are the broadcast
    |Q|-query linear-scan contract; the fusion joins |Q| x k lists."""
    return simsearch.rrf_fusion(
        _t(spark, sf_dir, "documents"),
        _t(spark, sf_dir, "embeddings"),
        QUERY_IDS,
        k=10,
    )


Y5_SQL = rf"""
WITH elem AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
norms AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM elem GROUP BY 1),
dots AS (
  SELECT q.vec_id AS query_id, c.vec_id AS doc_id, SUM(q.v * c.v) AS dot
  FROM elem q JOIN elem c ON q.i = c.i AND q.vec_id <> c.vec_id
  WHERE q.vec_id IN (0, 1, 2, 3, 4)
  GROUP BY 1, 2
),
sims AS (
  SELECT d.query_id, d.doc_id,
         round(d.dot / (nq.nrm * nc.nrm), 6) AS cosine
  FROM dots d
  JOIN norms nq ON d.query_id = nq.vec_id
  JOIN norms nc ON d.doc_id = nc.vec_id
),
dense AS (
  SELECT query_id, doc_id, CAST(rank AS INT) AS dense_rank FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, doc_id) AS rank
    FROM sims
  ) WHERE rank <= 10
),
tok AS (SELECT doc_id, list_distinct({_X67_NORM}) AS tok FROM documents),
q AS (SELECT doc_id AS query_id, tok AS qtok
      FROM tok WHERE doc_id IN (0, 1, 2, 3, 4)),
jac AS (
  SELECT q.query_id, t.doc_id,
         CAST(len(list_intersect(t.tok, q.qtok)) AS DOUBLE)
           / len(list_distinct(list_concat(t.tok, q.qtok))) AS jac
  FROM tok t CROSS JOIN q WHERE t.doc_id <> q.query_id
),
lex AS (
  SELECT query_id, doc_id, CAST(rank AS INT) AS lex_rank FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY jac DESC, doc_id) AS rank
    FROM jac WHERE jac > 0
  ) WHERE rank <= 10
),
fused AS (
  SELECT COALESCE(d.query_id, l.query_id) AS query_id,
         COALESCE(d.doc_id, l.doc_id) AS doc_id,
         d.dense_rank, l.lex_rank,
         COALESCE(1.0 / (60 + d.dense_rank), 0.0)
           + COALESCE(1.0 / (60 + l.lex_rank), 0.0) AS score
  FROM dense d
  FULL JOIN lex l ON d.query_id = l.query_id AND d.doc_id = l.doc_id
)
SELECT query_id, doc_id, dense_rank, lex_rank,
       round(score, 6) AS rrf_score,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY score DESC, doc_id) AS INT)
         AS fused_rank
FROM fused
QUALIFY fused_rank <= 10
ORDER BY query_id, fused_rank
"""


def y6_knn_classifier(spark, sf_dir):
    """Leave-one-out 5-NN majority-vote label eval
    (profile.knn_classifier_report): per-label precision/recall/F1 and
    macro-F1 over the x185 label-blind md5 buckets — the
    embedding-separability report card."""
    return profile.knn_classifier_report(_t(spark, sf_dir, "embeddings"))


Y6_SQL = f"""
WITH bucketed AS (
  SELECT vec_id, embedding,
         ({_X73_U("md5(CAST(vec_id AS VARCHAR) || '-knb')")}) % 16 AS bkt
  FROM embeddings
),
elem AS (
  SELECT vec_id, bkt, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM bucketed
),
dots AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id, SUM(a.v * b.v) AS dot
  FROM elem a JOIN elem b
    ON a.bkt = b.bkt AND a.i = b.i AND a.vec_id <> b.vec_id
  GROUP BY 1, 2
),
norms AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM elem GROUP BY 1),
sims AS (
  SELECT d.vec_id, d.neighbor_id,
         round(d.dot / (na.nrm * nb.nrm), 6) AS cosine
  FROM dots d
  JOIN norms na ON d.vec_id = na.vec_id
  JOIN norms nb ON d.neighbor_id = nb.vec_id
),
votes AS (
  SELECT vec_id, neighbor_id FROM (
    SELECT vec_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY cosine DESC, neighbor_id) AS rn
    FROM sims
  ) WHERE rn <= 5
),
vc AS (
  SELECT v.vec_id, lb.label AS n_label, count(*) AS c
  FROM votes v JOIN embeddings lb ON v.neighbor_id = lb.vec_id
  GROUP BY 1, 2
),
pred AS (
  SELECT vec_id, n_label AS predicted FROM (
    SELECT vec_id, n_label,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY c DESC, n_label) AS rn
    FROM vc
  ) WHERE rn = 1
),
cells AS (
  SELECT la.label AS declared, p.predicted, CAST(count(*) AS BIGINT) AS n
  FROM pred p JOIN embeddings la ON p.vec_id = la.vec_id
  GROUP BY 1, 2
),
d AS (SELECT declared AS label, CAST(SUM(n) AS BIGINT) AS support
      FROM cells GROUP BY 1),
p AS (SELECT predicted AS label, CAST(SUM(n) AS BIGINT) AS predicted_count
      FROM cells GROUP BY 1),
c AS (SELECT declared AS label, CAST(SUM(n) AS BIGINT) AS n_correct
      FROM cells WHERE declared = predicted GROUP BY 1),
base AS (
  SELECT COALESCE(d.label, p.label) AS label,
         CAST(COALESCE(d.support, 0) AS BIGINT) AS support,
         CAST(COALESCE(p.predicted_count, 0) AS BIGINT) AS predicted_count,
         CAST(COALESCE(c.n_correct, 0) AS BIGINT) AS n_correct
  FROM d FULL JOIN p ON d.label = p.label
  LEFT JOIN c ON COALESCE(d.label, p.label) = c.label
),
m AS (
  SELECT label, support, predicted_count, n_correct,
         CASE WHEN predicted_count > 0
              THEN n_correct / CAST(predicted_count AS DOUBLE)
              ELSE 0.0 END AS pr,
         CASE WHEN support > 0
              THEN n_correct / CAST(support AS DOUBLE) ELSE 0.0 END AS rc
  FROM base
),
f AS (
  SELECT label, support, predicted_count, n_correct, pr, rc,
         CASE WHEN pr + rc > 0 THEN 2.0 * pr * rc / (pr + rc)
              ELSE 0.0 END AS f1_raw
  FROM m
),
macro AS (SELECT round(avg(f1_raw), 6) AS macro_f1 FROM f)
SELECT label, support, predicted_count, n_correct,
       round(pr, 6) AS "precision",
       round(rc, 6) AS recall,
       round(f1_raw, 6) AS f1,
       macro_f1
FROM f CROSS JOIN macro
ORDER BY label
"""


def y7_negative_collision(spark, sf_dir):
    """In-batch negative collision planner
    (curation.negative_collision_budget): expected same-label and
    near-duplicate false negatives per anchor at batch sizes
    {64, 256, 1024} — closed form off the label distribution and the
    x67 confirmed-pair count."""
    return curation.negative_collision_budget(
        _t(spark, sf_dir, "documents"), _t(spark, sf_dir, "embeddings")
    )


Y7_SQL = rf"""
WITH norm AS MATERIALIZED (
  SELECT doc_id, {_X67_NORM} AS toks FROM documents
),
shn AS MATERIALIZED (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3
              THEN list_distinct([array_to_string(toks[i:i+2], ' ') for i in generate_series(1, len(toks) - 2)])
              WHEN len(toks) > 0
              THEN [array_to_string(toks, ' ')]
              ELSE CAST([] AS VARCHAR[])
         END AS sh
  FROM norm
),
flat AS MATERIALIZED (SELECT DISTINCT doc_id, unnest(sh) AS s FROM shn),
rare AS MATERIALIZED (SELECT s FROM flat GROUP BY s HAVING count(*) BETWEEN 2 AND 5),
cand AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
  FROM flat a JOIN rare USING (s) JOIN flat b USING (s)
  WHERE a.doc_id < b.doc_id
),
conf AS (
  SELECT ia, ib
  FROM cand JOIN shn x ON x.doc_id = ia JOIN shn y ON y.doc_id = ib
  WHERE round(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
        / len(list_distinct(list_concat(x.sh, y.sh))), 6) >= 0.3
),
ndup AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs FROM conf),
lab AS (SELECT label, CAST(count(*) AS BIGINT) AS nl
        FROM embeddings GROUP BY 1),
p2 AS (
  SELECT CAST(SUM(nl) AS BIGINT) AS n,
         CAST(SUM(nl * nl) AS BIGINT) AS sum_nl2
  FROM lab
),
base AS (
  SELECT n,
         sum_nl2 / (CAST(n AS DOUBLE) * n) AS sum_p2,
         2.0 * n_pairs / (CAST(n AS DOUBLE) * (n - 1)) AS p_dup
  FROM p2 CROSS JOIN ndup
),
grid AS (
  SELECT n, sum_p2, p_dup, unnest([64, 256, 1024]) AS batch_size
  FROM base
)
SELECT batch_size, n AS n_corpus,
       round(sum_p2, 6) AS p_same_label,
       round(p_dup, 6) AS p_near_dup,
       round(CAST(batch_size - 1 AS DOUBLE) * sum_p2, 6)
         AS exp_label_collisions,
       round(CAST(batch_size - 1 AS DOUBLE) * p_dup, 6)
         AS exp_dup_collisions
FROM grid
ORDER BY batch_size
"""


EXTENSIONS = {
    "x1_dedup_exact": (x1_dedup_exact, X1_SQL),
    "x2_dedup_exact_normalized": (x2_dedup_exact_normalized, X2_SQL),
    "x3_dedup_minhash_lsh": (x3_dedup_minhash_lsh, X3_SQL),
    "x4_dedup_simhash": (x4_dedup_simhash, X4_SQL),
    "x5_ngram_jaccard": (x5_ngram_jaccard, X5_SQL),
    "x6_embedding_nn": (x6_embedding_nn, X6_SQL),
    "x7_sim_topk_bruteforce": (x7_sim_topk_bruteforce, X7_SQL),
    "x8_sim_topk_lsh": (x8_sim_topk_lsh, X8_SQL),
    "x9_text_stats": (x9_text_stats, X9_SQL),
    "x10_text_langid": (x10_text_langid, X10_SQL),
    "x11_text_fingerprint": (x11_text_fingerprint, X11_SQL),
    "x12_multimodal_features": (x12_multimodal_features, X12_SQL),
    "x13_sim_topk_ivf": (x13_sim_topk_ivf, X13_SQL),
    "x14_table_profile": (x14_table_profile, X14_SQL),
    "x15_approx_aggregates": (x15_approx_aggregates, None),
    "x16_pii_scrub": (x16_pii_scrub, X16_SQL),
    "x17_vocabulary": (x17_vocabulary, X17_SQL),
    "x18_quality_filter": (x18_quality_filter, X18_SQL),
    "x19_tf_idf": (x19_tf_idf, X19_SQL),
    "x20_frame_sample": (x20_frame_sample, X20_SQL),
    "x21_chunk_documents": (x21_chunk_documents, X21_SQL),
    "x22_pack_sequences": (x22_pack_sequences, X22_SQL),
    "x23_stratified_sample": (x23_stratified_sample, X23_SQL),
    "x24_dataset_split": (x24_dataset_split, X24_SQL),
    "x25_dedup_pipeline": (x25_dedup_pipeline, X25_SQL),
    "x26_resize_images": (x26_resize_images, X26_SQL),
    "x27_bloom_semi_join": (x27_bloom_semi_join, X27_SQL),
    "x28_repetition_stats": (x28_repetition_stats, X28_SQL),
    "x29_incremental_dedup": (x29_incremental_dedup, X29_SQL),
    "x30_kmeans_cells": (x30_kmeans_cells, X30_SQL),
    "x31_hll_mergeable_sketches": (x31_hll_mergeable_sketches, None),
    "x32_expectations": (x32_expectations, X32_SQL),
    "x33_theta_set_sketches": (x33_theta_set_sketches, None),
    "x34_domain_caps": (x34_domain_caps, X34_SQL),
    "x35_benchmark_contamination": (x35_benchmark_contamination, X35_SQL),
    "x36_semantic_dedup": (x36_semantic_dedup, X36_SQL),
    "x37_length_histogram": (x37_length_histogram, X37_SQL),
    "x38_collocation_pmi": (x38_collocation_pmi, X38_SQL),
    "x39_unigram_logprob": (x39_unigram_logprob, X39_SQL),
    "x40_weighted_sample": (x40_weighted_sample, X40_SQL),
    "x41_heavy_hitters": (x41_heavy_hitters, X41_SQL),
    "x42_label_centroid_similarity": (x42_label_centroid_similarity, X42_SQL),
    "x43_substring_dupes": (x43_substring_dupes, X43_SQL),
    "x44_pq_ann": (x44_pq_ann, X44_SQL),
    "x45_bm25_scores": (x45_bm25_scores, X45_SQL),
    "x46_split_drift": (x46_split_drift, X46_SQL),
    "x47_pagerank": (x47_pagerank, X47_SQL),
    "x48_ab_welch_ttest": (x48_ab_welch_ttest, X48_SQL),
    "x49_mmr_rerank": (x49_mmr_rerank, X49_SQL),
    "x50_mixture_allocation": (x50_mixture_allocation, X50_SQL),
    "x51_within_label_topk": (x51_within_label_topk, X51_SQL),
    "x52_bigram_entropy": (x52_bigram_entropy, X52_SQL),
    "x53_split_leakage": (x53_split_leakage, X53_SQL),
    "x54_int8_quantization_audit": (x54_int8_quantization_audit, X54_SQL),
    "x55_countmin_freq": (x55_countmin_freq, X55_SQL),
    "x56_compression_signal": (x56_compression_signal, None),
    "x57_triangle_count": (x57_triangle_count, X57_SQL),
    "x58_quantile_sketch": (x58_quantile_sketch, None),
    "x59_embedding_dim_stats": (x59_embedding_dim_stats, X59_SQL),
    "x60_fuzzy_entity_match": (x60_fuzzy_entity_match, X60_SQL),
    "x61_k_anonymity": (x61_k_anonymity, X61_SQL),
    "x62_incremental_rollup": (x62_incremental_rollup, X62_SQL),
    "x63_approx_groupby": (x63_approx_groupby, None),
    "x64_group_quantiles": (x64_group_quantiles, X64_SQL),
    "x65_event_trigrams": (x65_event_trigrams, X65_SQL),
    "x66_geo_radius_join": (x66_geo_radius_join, X66_SQL),
    "x67_dedup_components": (x67_dedup_components, X67_SQL),
    "x68_dup_ngram_coverage": (x68_dup_ngram_coverage, X68_SQL),
    "x69_inverted_index": (x69_inverted_index, X69_SQL),
    "x70_ndcg_eval": (x70_ndcg_eval, X70_SQL),
    "x71_materialize_mixture": (x71_materialize_mixture, X71_SQL),
    "x72_purged_temporal_split": (x72_purged_temporal_split, X72_SQL),
    "x73_negative_sampling": (x73_negative_sampling, X73_SQL),
    "x74_bpe_merges": (x74_bpe_merges, X74_SQL),
    "x75_bpe_encode": (x75_bpe_encode, X75_SQL),
    "x76_label_noise": (x76_label_noise, X76_SQL),
    "x77_quality_psi": (x77_quality_psi, X77_SQL),
    "y1_backoff_bigram_lm": (y1_backoff_bigram_lm, Y1_SQL),
    "y2_hard_negatives": (y2_hard_negatives, Y2_SQL),
    "y3_embedding_covariance": (y3_embedding_covariance, Y3_SQL),
    "y4_split_ngram_contamination": (y4_split_ngram_contamination, Y4_SQL),
    "y5_rrf_fusion": (y5_rrf_fusion, Y5_SQL),
    "y6_knn_classifier": (y6_knn_classifier, Y6_SQL),
    "y7_negative_collision": (y7_negative_collision, Y7_SQL),
    "x78_ks_drift": (x78_ks_drift, X78_SQL),
    "x79_containment_dupes": (x79_containment_dupes, X79_SQL),
    "x80_snapshot_diff": (x80_snapshot_diff, X80_SQL),
    "x81_table_checksum": (x81_table_checksum, X81_SQL),
    "x82_audio_energy": (x82_audio_energy, X82_SQL),
    "x83_minhash_calibration": (x83_minhash_calibration, X83_SQL),
    "x84_cluster_canonical": (x84_cluster_canonical, X84_SQL),
    "x85_duplicate_spans": (x85_duplicate_spans, X85_SQL),
    "x86_boilerplate_catalog": (x86_boilerplate_catalog, X86_SQL),
    "x87_scrub_accounting": (x87_scrub_accounting, X87_SQL),
    "x88_quality_calibration": (x88_quality_calibration, X88_SQL),
    "x89_pca_whiten": (x89_pca_whiten, None),
    "x90_budget_selection": (x90_budget_selection, X90_SQL),
    "x91_dsir_weights": (x91_dsir_weights, X91_SQL),
    "x92_padding_audit": (x92_padding_audit, X92_SQL),
    "x93_cross_source_dupes": (x93_cross_source_dupes, X93_SQL),
    "x94_zipf_fit": (x94_zipf_fit, X94_SQL),
    "x95_hamming_ann": (x95_hamming_ann, X95_SQL),
    "x96_char_entropy": (x96_char_entropy, X96_SQL),
    "x97_dataset_card": (x97_dataset_card, X97_SQL),
    "x98_shingle_novelty": (x98_shingle_novelty, X98_SQL),
    "x99_source_overlap": (x99_source_overlap, X99_SQL),
    "x100_lang_source_mi": (x100_lang_source_mi, X100_SQL),
    "x101_retention_sweep": (x101_retention_sweep, X101_SQL),
    "x102_langid_confusion": (x102_langid_confusion, X102_SQL),
    "x103_coverage_sample": (x103_coverage_sample, X103_SQL),
    "x104_label_separability": (x104_label_separability, X104_SQL),
    "x105_ann_recall": (x105_ann_recall, X105_SQL),
    "x106_dedup_savings": (x106_dedup_savings, X106_SQL),
    "x107_cohort_retention": (x107_cohort_retention, X107_SQL),
    "x108_funnel_conversion": (x108_funnel_conversion, X108_SQL),
    "x109_rfm_segments": (x109_rfm_segments, X109_SQL),
    "x110_type_cooccurrence": (x110_type_cooccurrence, X110_SQL),
    "x111_session_paths": (x111_session_paths, X111_SQL),
    "x112_interarrival_profile": (x112_interarrival_profile, X112_SQL),
    "x113_lf_agreement": (x113_lf_agreement, X113_SQL),
    "x114_readability": (x114_readability, X114_SQL),
    "x115_vocab_richness": (x115_vocab_richness, X115_SQL),
    "x116_hourly_bursts": (x116_hourly_bursts, X116_SQL),
    "x117_order_total_audit": (x117_order_total_audit, X117_SQL),
    "x118_scd2_intervals": (x118_scd2_intervals, X118_SQL),
    "x119_user_concentration": (x119_user_concentration, X119_SQL),
    "x120_brand_discount_corr": (x120_brand_discount_corr, X120_SQL),
    "x121_nn_hubness": (x121_nn_hubness, X121_SQL),
    "x122_acquisition_mix": (x122_acquisition_mix, X122_SQL),
    "x123_temperature_mixture": (x123_temperature_mixture, X123_SQL),
    "x124_label_compactness": (x124_label_compactness, X124_SQL),
    "x125_revenue_moving_avg": (x125_revenue_moving_avg, X125_SQL),
    "x126_ship_latency_sla": (x126_ship_latency_sla, X126_SQL),
    "x127_nation_clv": (x127_nation_clv, X127_SQL),
    "x128_transition_matrix": (x128_transition_matrix, X128_SQL),
    "x129_norm_profile": (x129_norm_profile, X129_SQL),
    "x130_repeated_sentences": (x130_repeated_sentences, X130_SQL),
    "x131_keyness_terms": (x131_keyness_terms, X131_SQL),
    "x132_chunking_audit": (x132_chunking_audit, X132_SQL),
    "x133_rate_anomalies": (x133_rate_anomalies, X133_SQL),
    "x134_order_aging": (x134_order_aging, X134_SQL),
    "x135_code_switch": (x135_code_switch, X135_SQL),
    "x136_weekday_seasonality": (x136_weekday_seasonality, X136_SQL),
    "x137_iqr_outliers": (x137_iqr_outliers, X137_SQL),
    "x138_value_streaks": (x138_value_streaks, X138_SQL),
    "x139_bpe_fertility": (x139_bpe_fertility, X139_SQL),
    "x140_isotropy_audit": (x140_isotropy_audit, X140_SQL),
    "x141_winsorization": (x141_winsorization, X141_SQL),
    "x142_deseasonalized_anomalies": (
        x142_deseasonalized_anomalies,
        X142_SQL,
    ),
    "x143_heavy_user_profile": (x143_heavy_user_profile, X143_SQL),
    "x145_fulfillment_latency": (x145_fulfillment_latency, X145_SQL),
    "x146_lm_score_deciles": (x146_lm_score_deciles, X146_SQL),
    "x147_benford_audit": (x147_benford_audit, X147_SQL),
    "x149_revenue_trend": (x149_revenue_trend, X149_SQL),
    "x150_l_diversity": (x150_l_diversity, X150_SQL),
    "x151_basket_lift": (x151_basket_lift, X151_SQL),
    "x152_truncation_loss": (x152_truncation_loss, X152_SQL),
    "x153_rolling_active_users": (
        x153_rolling_active_users,
        X153_SQL,
    ),
    "x155_conversion_latency": (x155_conversion_latency, X155_SQL),
    "x156_wilson_error_rates": (x156_wilson_error_rates, X156_SQL),
    "x157_heaps_law": (x157_heaps_law, X157_SQL),
    "x158_filter_agreement": (x158_filter_agreement, X158_SQL),
    "x159_vocab_coverage": (x159_vocab_coverage, X159_SQL),
    "x160_fk_coverage": (x160_fk_coverage, X160_SQL),
    "x161_churn_risk": (x161_churn_risk, X161_SQL),
    "x162_clean_eval": (x162_clean_eval, X162_SQL),
    "x163_vocab_budget": (x163_vocab_budget, X163_SQL),
    "x164_transition_dwell": (x164_transition_dwell, X164_SQL),
    "x165_revenue_gini": (x165_revenue_gini, X165_SQL),
    "x166_retention_halflife": (
        x166_retention_halflife,
        X166_SQL,
    ),
    "x167_brand_type_chi2": (
        x167_brand_type_chi2,
        X167_SQL,
    ),
    "x168_quality_outliers": (x168_quality_outliers, X168_SQL),
    "x169_linenumber_audit": (x169_linenumber_audit, X169_SQL),
    "x170_weighted_median": (x170_weighted_median, X170_SQL),
    "x171_pii_cooccurrence": (x171_pii_cooccurrence, X171_SQL),
    "x172_decile_mobility": (x172_decile_mobility, X172_SQL),
    "x173_quality_by_length": (x173_quality_by_length, X173_SQL),
    "x174_single_source_risk": (
        x174_single_source_risk,
        X174_SQL,
    ),
    "x175_new_vs_returning": (x175_new_vs_returning, X175_SQL),
    "x176_source_jsd": (x176_source_jsd, X176_SQL),
    "x177_sample_representativeness": (
        x177_sample_representativeness,
        X177_SQL,
    ),
    "x178_dedup_worklist": (x178_dedup_worklist, X178_SQL),
    "x179_activity_heatmap": (x179_activity_heatmap, X179_SQL),
    "x180_cusum_changepoint": (x180_cusum_changepoint, X180_SQL),
    "x181_revenue_autocorrelation": (x181_revenue_autocorrelation, X181_SQL),
    "x182_calendar_coverage": (x182_calendar_coverage, X182_SQL),
    "x183_price_dispersion": (x183_price_dispersion, X183_SQL),
    "x184_session_depth": (x184_session_depth, X184_SQL),
    "x185_knn_label_agreement": (x185_knn_label_agreement, X185_SQL),
    "x186_mannwhitney_quality": (x186_mannwhitney_quality, X186_SQL),
    "x187_editdist_confirm": (x187_editdist_confirm, X187_SQL),
    "x188_vocab_estimate": (x188_vocab_estimate, X188_SQL),
    "x189_activity_powerlaw": (x189_activity_powerlaw, X189_SQL),
    "x190_dup_cluster_histogram": (x190_dup_cluster_histogram, X190_SQL),
    "x191_theilsen_trend": (x191_theilsen_trend, X191_SQL),
    "x192_forecast_backtest": (x192_forecast_backtest, X192_SQL),
    "x193_weekly_mix_psi": (x193_weekly_mix_psi, X193_SQL),
    "x194_cohort_ltv": (x194_cohort_ltv, X194_SQL),
    "x195_abc_classification": (x195_abc_classification, X195_SQL),
    "x196_basket_diversity": (x196_basket_diversity, X196_SQL),
    "x197_dedup_threshold_roc": (x197_dedup_threshold_roc, X197_SQL),
    "x198_supplier_spc": (x198_supplier_spc, X198_SQL),
    "x199_novelty_position": (x199_novelty_position, X199_SQL),
    "x200_neyman_allocation": (x200_neyman_allocation, X200_SQL),
    "x201_markov_entropy_rate": (x201_markov_entropy_rate, X201_SQL),
    "x202_peak_concurrency": (x202_peak_concurrency, X202_SQL),
    "x203_stratified_estimate": (x203_stratified_estimate, X203_SQL),
    "x204_km_survival": (x204_km_survival, X204_SQL),
    "x205_path_trigrams": (x205_path_trigrams, X205_SQL),
    "x206_eb_shrinkage": (x206_eb_shrinkage, X206_SQL),
    "x207_stickiness": (x207_stickiness, X207_SQL),
    "x208_attribution_credit": (x208_attribution_credit, X208_SQL),
    "x209_ann_mrr": (x209_ann_mrr, X209_SQL),
    "x210_langid_kappa": (x210_langid_kappa, X210_SQL),
    "x211_aa_calibration": (x211_aa_calibration, X211_SQL),
    "x212_spearman_quality": (x212_spearman_quality, X212_SQL),
    "x213_markov_prediction": (x213_markov_prediction, X213_SQL),
    "x214_bot_regularity": (x214_bot_regularity, X214_SQL),
    "x215_ivf_probe_sweep": (x215_ivf_probe_sweep, X215_SQL),
    "x216_poisson_bootstrap": (x216_poisson_bootstrap, X216_SQL),
    "x217_dup_flow_matrix": (x217_dup_flow_matrix, X217_SQL),
    "x218_ab_power_curve": (x218_ab_power_curve, X218_SQL),
    "x219_greedy_coverage": (x219_greedy_coverage, X219_SQL),
    "x220_retrieval_exposure": (x220_retrieval_exposure, X220_SQL),
    "x221_mix_rate_decomposition": (
        x221_mix_rate_decomposition,
        X221_SQL,
    ),
    "x222_quantile_normalize": (x222_quantile_normalize, X222_SQL),
    "x223_source_originality": (x223_source_originality, X223_SQL),
    "x224_absorption_conversion": (
        x224_absorption_conversion,
        X224_SQL,
    ),
    "x225_lsh_parameter_plan": (x225_lsh_parameter_plan, X225_SQL),
    "x226_grouped_kfold": (x226_grouped_kfold, X226_SQL),
    "x227_loso_quality": (x227_loso_quality, X227_SQL),
    "x154_session_timeout_sweep": (
        x154_session_timeout_sweep,
        X154_SQL,
    ),
    "x148_neardup_contamination": (
        x148_neardup_contamination,
        X148_SQL,
    ),
    "x144_embedding_split_drift": (
        x144_embedding_split_drift,
        X144_SQL,
    ),
}
