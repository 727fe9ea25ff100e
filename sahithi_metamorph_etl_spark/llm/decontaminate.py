"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/blocklist set.

No reference equivalent (BASELINE.json north-star extension). This is
the standard pre-training hygiene pass: any document whose normalized
word n-grams collide with an eval benchmark is contaminated and must be
dropped or scrubbed before training.

Scale shape (the 100 TB path):
- grams are md5-hashed (fixed 32-char keys, not raw text) and deduped
  WITHIN each document via ``array_distinct`` in the row — no shuffled
  ``DISTINCT`` on the fact side;
- eval sets are benchmark-sized (thousands-to-millions of grams), so
  the probe join broadcasts by default; the whole check is then one
  corpus scan + one doc-keyed hash aggregation — a single shuffle whose
  payload is (doc_id, 1 bit) per distinct gram;
- set ``broadcast_eval=False`` when the blocklist is itself huge
  (e.g. decontaminating against another corpus) to fall back to a
  shuffled hash join on the gram key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.money import dround


def _gram_rows(df: DataFrame, n: int, text_col: str, id_col: str) -> DataFrame:
    """Distinct-within-document (id, md5-of-normalized-word-n-gram) rows.

    Within-doc dedup happens in the row via ``array_distinct`` (JVM-side,
    per document) — NOT via a shuffled ``.distinct()`` — so downstream
    consumers see already-unique (id, gram) pairs for free. Documents
    with fewer than ``n`` words produce no rows."""
    text = F.lower(F.col(text_col))
    toks = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), F.split(F.trim(text), r"\s+").alias("w")
    )
    grams_arr: Column = F.when(
        F.size("w") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("w") - (n - 1)),
            lambda i: F.md5(F.concat_ws(" ", F.slice("w", i, n))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return toks.select(id_col, F.explode(F.array_distinct(grams_arr)).alias("g"))


def ngram_overlap(
    corpus: DataFrame,
    eval_df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_hits: int = 1,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per corpus document: how many of its distinct word ``n``-grams
    appear anywhere in ``eval_df``; ``contaminated`` is true when at
    least ``min_hits`` grams match.

    Output: ``(doc_id, n_grams, n_matched, contamination_frac,
    contaminated)`` — one row per corpus document with >= ``n`` words.
    """
    if min_hits < 1:
        raise ValueError(f"min_hits must be >= 1, got {min_hits}")
    corpus_grams = _gram_rows(corpus, n, text_col, id_col)
    eval_grams = (
        _gram_rows(eval_df, n, text_col, id_col)
        .select("g")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    if broadcast_eval:
        eval_grams = F.broadcast(eval_grams)
    # single corpus pass: mark each gram against the (broadcast) eval set,
    # then ONE doc-level aggregation — no totals/hits branch recompute
    marked = corpus_grams.join(eval_grams, "g", "left")
    per_doc = marked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.coalesce(F.sum("_hit"), F.lit(0)).cast("bigint").alias("n_matched"),
    )
    return per_doc.select(
        id_col,
        "n_grams",
        "n_matched",
        dround(F.col("n_matched") / F.col("n_grams"), 6).alias("contamination_frac"),
        (F.col("n_matched") >= min_hits).alias("contaminated"),
    )
