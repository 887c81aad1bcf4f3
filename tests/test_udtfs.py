"""Python UDTF surface: lateral chunker registered for SQL use,
cross-validated row-for-row against the pure-expression JVM chunker
(operators/chunking.py) so the two implementations can never drift."""

from pyspark.sql import Row

from shifts_etl_spark.functions.udtfs import ChunkDocument, register_udtfs
from shifts_etl_spark.operators.chunking import chunk_documents


def _docs(spark):
    texts = [
        "a b c d e f g h i j k l m",   # 13 tokens -> multiple chunks
        "one two three",               # shorter than a chunk
        "x",                           # single token
        "",                            # empty -> no rows from the UDTF
    ]
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        "doc_id bigint, text string",
    )


def test_udtf_matches_jvm_chunker(spark):
    docs = _docs(spark).where("text <> ''")
    register_udtfs(spark)
    docs.createOrReplaceTempView("udtf_docs")
    got = {
        (r["doc_id"], r["chunk_id"], r["chunk_text"], r["n_tokens"])
        for r in spark.sql(
            "SELECT d.doc_id, c.* FROM udtf_docs d, "
            "LATERAL chunk_document(d.text, 5, 2) c"
        ).collect()
    }
    want = {
        (r["doc_id"], r["chunk_idx"], r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(docs, chunk_tokens=5, overlap=2).collect()
    }
    assert got == want and got


def test_udtf_overlap_and_tail(spark):
    rows = sorted(
        ChunkDocument.func().eval("a b c d e f g", 4, 1),
    )
    # stride 3: chunks [a b c d], [d e f g] — tail exactly consumed
    assert rows == [(0, "a b c d", 4), (1, "d e f g", 4)]


def test_udtf_empty_and_null(spark):
    register_udtfs(spark)
    out = spark.sql(
        "SELECT * FROM chunk_document(NULL, 5, 1) "
        "UNION ALL SELECT * FROM chunk_document('', 5, 1)"
    ).collect()
    assert out == []
