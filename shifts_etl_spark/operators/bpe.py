"""Distributed BPE merge training — the tokenizer-induction step of an
LLM data pipeline (Sennrich et al., "Neural Machine Translation of Rare
Words with Subword Units": iteratively merge the most frequent adjacent
symbol pair).

Scale design (100 TB):
  - **The working set is the VOCABULARY, not the corpus.** Pass 0
    aggregates the corpus once into (distinct word, count) — the only
    corpus-sized job. Every merge iteration then runs on the vocab frame
    (≤ a few million rows for any real corpus), weighted by word count:
    the classic trick that makes BPE training corpus-size-independent.
  - **Pair counting is one map-side-combinable aggregate** over
    posexploded symbol bigrams × word weight; the argmax collects ONE
    row per iteration (freq desc, pair asc tie-break → deterministic).
  - **Applying a merge is a JVM-side aggregate lambda** over the symbol
    array (left-to-right greedy, non-overlapping — the BPE convention):
    no Python touches a row, and the vocab frame is localCheckpointed
    per iteration so plans don't stack.

Determinism: ties break lexicographically on the pair, so the merge
sequence is a pure function of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .textstats import normalize_text, tokens

END = "▁"  # end-of-word sentinel appended as a final symbol


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, weight) — the corpus folded to distinct words. The single
    corpus-sized pass; everything after runs at vocabulary scale."""
    return (
        docs.select(F.explode(tokens(normalize_text(F.col(text_col)))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("weight"))
    )


def _initial_symbols(word_col) -> F.Column:
    """word → [c1, c2, ..., cn, END]"""
    return F.concat(F.split(word_col, ""), F.array(F.lit(END)))


def _apply_merge(sym_col, a: str, b: str) -> F.Column:
    """Left-to-right greedy non-overlapping merge of adjacent (a, b) →
    a+b, as a pure aggregate lambda (prev-carry accumulator)."""
    merged = F.lit(a + b)

    def step(acc, x):
        prev = acc.getField("prev")
        out = acc.getField("out")
        hit = prev.isNotNull() & (prev == F.lit(a)) & (x == F.lit(b))
        return F.struct(
            F.when(hit, F.concat(out, F.array(merged)))
            .otherwise(
                F.when(prev.isNotNull(), F.concat(out, F.array(prev))).otherwise(out)
            )
            .alias("out"),
            F.when(hit, F.lit(None).cast("string")).otherwise(x).alias("prev"),
        )

    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("prev"),
    )
    return F.aggregate(
        sym_col,
        init,
        step,
        lambda acc: F.when(
            acc.getField("prev").isNotNull(),
            F.concat(acc.getField("out"), F.array(acc.getField("prev"))),
        ).otherwise(acc.getField("out")),
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns [(a, b, weighted_freq)] in
    merge order. Stops early when no adjacent pair repeats."""
    vocab = word_vocab(docs, text_col).select(
        _initial_symbols(F.col("word")).alias("sym"), "weight"
    )
    vocab = vocab.localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs = vocab.select(
            F.posexplode(F.slice("sym", 1, F.greatest(F.size("sym") - 1, F.lit(0)))).alias(
                "i", "a"
            ),
            F.col("sym"),
            F.col("weight"),
        ).select(
            "a",
            F.element_at("sym", F.col("i") + 2).alias("b"),
            "weight",
        )
        top = (
            pairs.groupBy("a", "b")
            .agg(F.sum("weight").alias("freq"))
            .orderBy(F.desc("freq"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top or top[0]["freq"] < 2:
            break
        a, b, freq = top[0]["a"], top[0]["b"], int(top[0]["freq"])
        merges.append((a, b, freq))
        vocab = vocab.select(
            _apply_merge(F.col("sym"), a, b).alias("sym"), "weight"
        ).localCheckpoint(eager=True)
    return merges


def bpe_merges_df(docs: DataFrame, n_merges: int = 10, text_col: str = "text") -> DataFrame:
    """Catalog-facing form: one row per learned merge, in order."""
    merges = bpe_train(docs, n_merges, text_col)
    spark = docs.sparkSession
    return spark.createDataFrame(
        [(i + 1, a, b, f) for i, (a, b, f) in enumerate(merges)],
        "merge_rank long, left string, right string, freq long",
    )


def bpe_encode_counts(
    docs: DataFrame,
    merges: list[tuple[str, str, int]] | None = None,
    n_merges: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply learned merges and report per-doc subword statistics:
    (id, n_words, n_chars, n_pieces, pieces_per_word) — the
    tokenizer-aware length accounting a packing planner actually needs
    (whitespace token counts under-estimate sequence length for rare
    words; piece counts don't).

    Same vocabulary trick as training: merges apply to the DISTINCT-word
    frame (vocab-sized), then the per-word piece count joins back to the
    corpus word stream by word — the corpus is never re-tokenized per
    merge. The word→pieces map is a broadcast join (vocab ≪ corpus)."""
    if merges is None:
        merges = bpe_train(docs, n_merges, text_col)
    vocab = word_vocab(docs, text_col).select(
        "word", _initial_symbols(F.col("word")).alias("sym")
    )
    vocab = vocab.localCheckpoint(eager=True)
    for a, b, _ in merges:
        vocab = vocab.select(
            "word", _apply_merge(F.col("sym"), a, b).alias("sym")
        ).localCheckpoint(eager=True)
    pieces = vocab.select("word", F.size("sym").alias("wp"))
    words = docs.select(
        F.col(id_col),
        F.explode(tokens(normalize_text(F.col(text_col)))).alias("word"),
    )
    return (
        words.join(F.broadcast(pieces), "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.length("word")).alias("n_chars"),
            F.sum("wp").alias("n_pieces"),
        )
        .select(
            id_col,
            "n_words",
            "n_chars",
            "n_pieces",
            F.round(F.col("n_pieces") / F.col("n_words"), 6).alias("pieces_per_word"),
        )
    )


def bpe_fertility_by_lang(
    docs: DataFrame,
    merges: list[tuple[str, str, int]] | None = None,
    n_merges: int = 10,
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Tokenizer-fertility fairness audit: per language, how many BPE
    pieces the learned merges spend per word and per character —
    languages the merge table under-serves fragment into more pieces,
    so they pay more sequence length (and more compute) per character
    of content. One row per language: (lang, n_words, n_chars,
    n_pieces, pieces_per_word, chars_per_piece).

    Same scale shape as :func:`bpe_encode_counts`: merges apply to the
    DISTINCT-word frame (vocab-sized), and the broadcast word->pieces
    map joins back over the corpus word stream; the final aggregate is
    language-keyed (a handful of cells). Integer counts throughout; the
    two ratios round at 6 dp."""
    if merges is None:
        merges = bpe_train(docs, n_merges, text_col)
    vocab = word_vocab(docs, text_col).select(
        "word", _initial_symbols(F.col("word")).alias("sym")
    )
    vocab = vocab.localCheckpoint(eager=True)
    for a, b, _ in merges:
        vocab = vocab.select(
            "word", _apply_merge(F.col("sym"), a, b).alias("sym")
        ).localCheckpoint(eager=True)
    pieces = vocab.select("word", F.size("sym").alias("wp"))
    words = docs.select(
        F.col(lang_col).alias("lang"),
        F.explode(tokens(normalize_text(F.col(text_col)))).alias("word"),
    )
    return (
        words.join(F.broadcast(pieces), "word")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum(F.length("word")).cast("long").alias("n_chars"),
            F.sum("wp").cast("long").alias("n_pieces"),
        )
        .select(
            "lang",
            "n_words",
            "n_chars",
            "n_pieces",
            F.round(
                F.col("n_pieces").cast("double") / F.col("n_words"), 6
            ).alias("pieces_per_word"),
            F.round(
                F.col("n_chars").cast("double") / F.col("n_pieces"), 6
            ).alias("chars_per_piece"),
        )
    )
