"""Corpus vocabulary building and frequency-based document scoring.

Tokenizer training and quality filtering both start from corpus-level
token statistics: the vocabulary builder is the input to a BPE/WordPiece
trainer; the frequency scorer is the cheap stand-in for LM-perplexity
filtering (CCNet-style) — documents made of rare tokens score low, and
at 100 TB the KenLM pass is usually seeded from exactly this table.

Scale shape: one explode → hash aggregate with map-side combine (the
shuffle carries one row per distinct token per map partition, not one per
occurrence), a TakeOrdered top-k for the vocabulary, and a BROADCAST of
the (bounded, ``max_vocab``-sized) frequency table back onto the corpus
for scoring — the corpus itself never shuffles during scoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def build_vocab(
    df: DataFrame,
    text_col: str,
    max_vocab: int = 30000,
    min_count: int = 1,
) -> DataFrame:
    """Top-``max_vocab`` tokens by corpus frequency.

    Output: (token, tf, df, rank) — total occurrences, number of distinct
    documents containing the token, and dense frequency rank (1 = most
    frequent; ties broken by token for determinism).
    """
    # the synthetic doc id must exist BEFORE the explode (assigned after,
    # it would be per-token and df would silently equal tf)
    src = df.select(F.col(text_col)).withColumn(
        "__doc", F.monotonically_increasing_id()
    )
    tok = src.select(
        F.explode(
            F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
        ).alias("token"),
        "__doc",
    )
    # tf via plain count; df via count_distinct over the doc id. Both ride
    # ONE shuffle keyed on token (partial aggs map-side; a doc's tokens
    # stay partition-local through the explode).
    stats = tok.groupBy("token").agg(
        F.count("*").alias("tf"),
        F.count_distinct("__doc").alias("df"),
    )
    if min_count > 1:
        stats = stats.filter(F.col("tf") >= min_count)
    # two-stage exact top-k: (tf desc, token asc) is a TOTAL order (token
    # is unique after the aggregate), so orderBy+limit — a distributed
    # TakeOrdered: per-partition top-k heaps, merged — selects exactly
    # the rows the global rank would keep, ties included. The
    # single-partition rank window then runs over ≤ max_vocab survivors
    # (model-sized by construction), never the full distinct-token table
    # (corpus-like at web scale: 10^8+ rows).
    top = stats.orderBy(F.desc("tf"), F.asc("token")).limit(max_vocab)
    return top.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("tf"), F.asc("token"))),
    )


def frequency_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab: DataFrame,
    out_col: str = "freq_score",
) -> DataFrame:
    """Mean log10 corpus-frequency of a document's tokens — the
    perplexity-proxy quality signal (higher = more ordinary language;
    garbage/boilerplate full of out-of-vocabulary tokens scores lowest).

    Out-of-vocabulary tokens count as frequency 1 (log 0). The vocabulary
    frame is broadcast, so per-token scoring is map-side; the partial avg
    then collapses each document to one (sum, count) row per partition
    before the doc-keyed shuffle — the wire carries O(docs), never
    O(tokens).

    Output: input columns + ``out_col`` (rounded to 4 decimals; null for
    empty documents).
    """
    tok = df.select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
        ).alias("token"),
    )
    scored = (
        tok.join(F.broadcast(vocab.select("token", "tf")), "token", "left")
        .groupBy(id_col)
        .agg(
            F.round(
                F.avg(F.log10(F.coalesce(F.col("tf"), F.lit(1)).cast("double"))),
                4,
            ).alias(out_col)
        )
    )
    return df.join(scored, id_col, "left")
