"""Corpus token-frequency tables (vocabulary statistics).

Tokenizer training, coverage audits, and UNK-rate estimation all start
from the same artifact: per-token occurrence and document frequencies
over the corpus, usually cut to the top-k.  Operates on the engine's
target shape (``tokens array<int>`` — BASELINE.json input_hint).

Scale shape: both aggregates explode the token stream but their
exchanges carry at most |vocab| rows PER TASK, because hash-aggregate
partials run map-side before the shuffle (the token stream itself is
never shuffled).  Document frequency dedups per-document FIRST via
``array_distinct`` inside the projection — the (doc, token) pair
stream never materializes.  The top-k cut is ``orderBy().limit(k)``,
which Spark executes as TakeOrderedAndProject: each task keeps a
k-sized heap and the driver merges — no global sort.  The ordering
(count desc, token asc) is total, so the cut is deterministic and
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scylla_cdc_rust_spark.functions.generate_util import explode_nonnull


def token_frequencies(
    df: DataFrame, tokens_col: str = "tokens"
) -> DataFrame:
    """Per-token corpus stats: (token, n_occurrences, n_docs)."""
    ts = F.col(tokens_col)
    occ = (
        explode_nonnull(df, ts, "token")
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("n_occurrences"))
    )
    docs = (
        explode_nonnull(df, F.array_distinct(ts), "token")
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )
    # both sides are vocab-sized after their aggregates; the join is a
    # tiny same-key exchange (AQE will usually plan it broadcast)
    return occ.join(docs, "token")


def vocab_topk(
    df: DataFrame, k: int, tokens_col: str = "tokens"
) -> DataFrame:
    """Top-k tokens by occurrence count (ties broken by token asc).

    Returns (rank, token, n_occurrences, n_docs) with rank 1-based in
    the same total order the cut uses.
    """
    freq = token_frequencies(df, tokens_col)
    top = freq.orderBy(F.desc("n_occurrences"), F.asc("token")).limit(k)
    # rank over k rows only — the window runs on the already-cut result
    from pyspark.sql.window import Window

    w = Window.orderBy(F.desc("n_occurrences"), F.asc("token"))
    return top.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "token",
        "n_occurrences",
        "n_docs",
    )
