"""Python UDTF surface (Spark 4 table functions) — the last UDF quadrant
after scalar Pandas UDFs, GROUPED_AGG, cogrouped applyInPandas, and
applyInPandasWithState (docs/COVERAGE.md §2.11).

UDTFs are row-at-a-time Python and therefore the SLOW path: the
production chunker is the pure-expression form in
``operators/chunking.py`` (posexplode over sequence — whole-stage
codegen, zero Python). This module exists for the API surface a
reference user would expect (lateral table functions that can emit a
VARIABLE number of rows with per-call Python state), and the pytest
cross-validates it against the JVM chunker so the two can never drift.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

_RE_NON_ALNUM = re.compile(r"[^a-z0-9\s]")


@udtf(returnType="chunk_id: int, chunk_text: string, n_tokens: int")
class ChunkDocument:
    """Lateral chunker: split a token stream into windows of
    ``chunk_size`` tokens with ``overlap`` tokens of left context —
    eval(text, chunk_size, overlap) yields one row per chunk. The
    trailing chunk may be short; empty/NULL text yields no rows."""

    def eval(self, text: str, chunk_size: int, overlap: int):
        if not text:
            return
        # same normalization as operators/textstats.normalize_text (the
        # JVM chunker's tokenizer): lowercase, non-alnum → space — so the
        # SQL surface and chunk_documents can never drift on raw text
        toks = _RE_NON_ALNUM.sub(" ", text.lower()).split()
        if not toks:
            return
        step = max(chunk_size - overlap, 1)
        cid = 0
        for start in range(0, len(toks), step):
            window = toks[start : start + chunk_size]
            yield cid, " ".join(window), len(window)
            cid += 1
            if start + chunk_size >= len(toks):
                break


def register_udtfs(spark) -> None:
    """Register table functions for SQL use:
    SELECT d.doc_id, c.* FROM documents d,
    LATERAL chunk_document(d.text, 64, 8) c."""
    spark.udtf.register("chunk_document", ChunkDocument)
