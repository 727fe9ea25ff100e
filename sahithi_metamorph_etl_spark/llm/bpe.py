"""Distributed BPE tokenizer training (byte-pair-encoding merge
learning) — the canonical "train the tokenizer on the corpus" step of
an LLM data pipeline, re-expressed Spark-first.

SCALE SHAPE: the corpus is touched ONCE — a single explode + word-count
aggregation (one fact shuffle, map-side combined). Every merge
iteration then runs on the WORD-FREQUENCY VOCABULARY, whose size is
bounded by distinct words, not corpus tokens — the same reduction
classical BPE trainers use, here as a small cached DataFrame. Pair
counting and pair merging are pure JVM higher-order expressions
(arrays_zip / explode / aggregate fold) — zero Python in any per-row
path; the only driver action per iteration is collecting the single
winning pair (1 row, bounded by construction).

Determinism: ties on pair frequency break lexicographically, so the
learned merge table is bit-reproducible across engines and runs — the
property every other operator in this engine holds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END_TOKEN = "</w>"


def word_frequencies(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(word, count) over whitespace tokens — the one corpus-sized pass."""
    words = docs.select(
        F.explode(F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")).alias(
            "word"
        )
    ).filter(F.col("word") != "")
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("count"))


def learn_bpe(
    docs: DataFrame,
    n_merges: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    checkpoint_every: int = 8,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges over the corpus; returns the merge
    table (rank, left, right, merged, freq) — ``rank`` is the merge
    order, which IS the tokenizer (applying merges in rank order
    re-tokenizes any text).

    Each word starts as its characters plus the ``</w>`` end marker;
    each iteration counts adjacent token pairs weighted by word
    frequency, merges the most frequent pair (lexicographic tie-break)
    everywhere, and records it. The vocabulary frame is cached and
    lineage-truncated every ``checkpoint_every`` iterations so the
    per-iteration plan stays flat.
    """
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    spark = docs.sparkSession
    vocab = word_frequencies(docs, text_col, id_col)
    # word -> [c1, c2, ..., "</w>"] via an index-sequence transform
    tokens = F.concat(
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.col("word").substr(i, F.lit(1)),
        ),
        F.array(F.lit(END_TOKEN)),
    )
    state = vocab.select("count", tokens.alias("toks")).localCheckpoint()

    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        n = F.size("toks")
        pairs = state.filter(n >= 2).select(
            "count",
            F.explode(
                F.arrays_zip(
                    F.slice("toks", 1, n - 1).alias("a"),
                    F.slice("toks", 2, n - 1).alias("b"),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("count").alias("freq"))
            .orderBy(F.desc("freq"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, freq = top[0]["a"], top[0]["b"], int(top[0]["freq"])
        merged = a + b
        merges.append((rank, a, b, merged, freq))
        # left-to-right greedy merge of (a, b) inside every token array:
        # fold with a one-token carry — pure JVM, no UDF
        la, lb, lm = F.lit(a), F.lit(b), F.lit(merged)
        init = F.struct(
            F.array().cast("array<string>").alias("out"),
            F.lit(None).cast("string").alias("carry"),
        )
        step = lambda acc, x: F.when(  # noqa: E731
            acc["carry"].isNull(),
            F.struct(acc["out"].alias("out"), x.alias("carry")),
        ).otherwise(
            F.when(
                (acc["carry"] == la) & (x == lb),
                F.struct(
                    F.concat(acc["out"], F.array(lm)).alias("out"),
                    F.lit(None).cast("string").alias("carry"),
                ),
            ).otherwise(
                F.struct(
                    F.concat(acc["out"], F.array(acc["carry"])).alias("out"),
                    x.alias("carry"),
                )
            )
        )
        finish = lambda acc: F.when(  # noqa: E731
            acc["carry"].isNull(), acc["out"]
        ).otherwise(F.concat(acc["out"], F.array(acc["carry"])))
        state = state.select(
            "count", F.aggregate("toks", init, step, finish).alias("toks")
        )
        if rank % checkpoint_every == 0:
            # the vocab frame is small; truncating its lineage keeps the
            # per-iteration plan flat instead of n_merges folds deep
            state = state.localCheckpoint()

    return spark.createDataFrame(
        merges, "rank int, left string, right string, merged string, freq bigint"
    )
