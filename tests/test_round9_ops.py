"""Round-9 fixes: orphaned-cache discipline for registry-less LSH calls,
streaming neardup_kwargs validation, and the re-keyed scale-correct
defaults (x13 fixed-cell IVF, x6/x121 band-blocked NN, x36 banded
SemDeDup candidates, x242 sidecar-path certification).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from shifts_etl_spark.operators import curation, dedup, simsearch

SF = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# cache discipline (r8 ADVICE: registry-less calls leaked persists)
# --------------------------------------------------------------------------

def test_registry_less_lsh_calls_orphan_then_drain(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(100)
    dedup.release_orphaned_caches()
    out = dedup.embedding_nn_pairs_lsh(emb)
    out.count()
    first = len(dedup._ORPHANED_CACHES)
    assert first > 0  # registry-less call parks its handles as orphans
    # a second registry-less call drains the first call's orphans, so the
    # live set never grows across a catalog sweep
    dedup.embedding_nn_pairs_lsh(emb).count()
    assert len(dedup._ORPHANED_CACHES) == first
    released = dedup.release_orphaned_caches()
    assert released == first
    assert len(dedup._ORPHANED_CACHES) == 0


def test_registry_calls_never_orphan(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(80)
    dedup.release_orphaned_caches()
    reg: list = []
    dedup.minhash_lsh_pairs(docs, _cache_registry=reg).count()
    assert len(dedup._ORPHANED_CACHES) == 0
    assert len(reg) > 0
    for c in reg:
        c.unpersist()


def test_streaming_neardup_kwargs_validated(spark, tmp_path):
    from shifts_etl_spark.streaming.micro_batch import (
        streaming_curation_admit,
    )

    (tmp_path / "in").mkdir()
    with pytest.raises(ValueError, match="unsupported neardup_kwargs"):
        streaming_curation_admit(
            spark,
            tmp_path / "in",
            tmp_path / "ckpt",
            tmp_path / "out",
            neardup_threshold=0.5,
            neardup_kwargs={"threshold": 0.7},
        )
    with pytest.raises(ValueError, match="unsupported neardup_kwargs"):
        streaming_curation_admit(
            spark,
            tmp_path / "in",
            tmp_path / "ckpt",
            tmp_path / "out",
            neardup_threshold=0.5,
            neardup_kwargs={"text_col": "body"},
        )
