"""Sequence packing — chunk a corpus's token stream into fixed-length
training sequences (the standard LLM pretraining layout: documents
concatenated in a deterministic order, then cut every ``seq_len``
tokens; a document may straddle a pack boundary).

Scale shape: a single global running offset would serialize on one
partition, so the corpus is hash-sharded first (``n_shards`` parallel
token streams — exactly how production packers shard by file/worker)
and the running offset is a windowed cumulative sum *within* a shard:
one shuffle by shard, then a sorted window per shard.  At 100 TB pick
n_shards ≈ executors so every shard's window fits one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_offsets(
    df: DataFrame,
    seq_len: int,
    n_shards: int = 1,
    id_col: str = "doc_id",
    tok_count=None,
    shard_col=None,
) -> DataFrame:
    """Per-document pack assignment.

    Returns (id, shard, n_tok, start_off, first_pack, last_pack):
    ``start_off`` is the document's first-token offset within its
    shard's stream (docs ordered by id — deterministic), packs are the
    seq_len-sized chunks the document's tokens land in.

    ``tok_count``: Column of the document's token count (default:
    whitespace tokens of ``text``).  ``shard_col``: Column for the
    shard id (default: a portable hash of the id mod n_shards).
    """
    if tok_count is None:
        tok_count = F.size(F.split(F.col("text"), " "))
    if shard_col is None:
        from scylla_cdc_rust_spark.functions.text import M31

        h = F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
        ).cast("long") % F.lit(M31)
        shard_col = F.pmod(h, F.lit(n_shards))
    base = df.select(
        F.col(id_col),
        shard_col.cast("int").alias("shard"),
        tok_count.cast("long").alias("n_tok"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tok").over(w), F.lit(0))
    return base.select(
        id_col,
        "shard",
        "n_tok",
        start.alias("start_off"),
        F.floor(start / seq_len).cast("long").alias("first_pack"),
        F.floor((start + F.col("n_tok") - 1) / seq_len).cast("long").alias("last_pack"),
    )


def pack_stats(offsets: DataFrame, seq_len: int) -> DataFrame:
    """Per-shard packing accounting: packs produced, boundary-straddling
    docs, tail waste of the final (possibly short) pack."""
    return offsets.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        (F.max("last_pack") + 1).alias("n_packs"),
        F.sum(
            F.when(F.col("last_pack") > F.col("first_pack"), 1).otherwise(0)
        ).alias("n_straddling"),
        ((F.max("last_pack") + 1) * seq_len - F.sum("n_tok")).alias("tail_waste"),
    )
