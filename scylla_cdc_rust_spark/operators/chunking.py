"""Context-window chunking of pre-tokenized sequences.

The standard step between curation and packing: a document whose token
sequence exceeds the model's context length is split into sliding
windows of at most ``max_len`` tokens advancing by ``stride`` (equal
stride/max_len = disjoint chunks; stride < max_len = overlapping
chunks, the usual recipe so no span is ever cut without context).
Operates directly on the engine's target shape (``doc_id``,
``tokens array<int>`` — BASELINE.json input_hint), no detokenization.

Scale shape: the chunk plan is a single narrow projection — a
``sequence``/``transform``/``slice`` build of the per-document chunk
array followed by one generate (explode) — so it rides the scan with
no shuffle at all; the output is streamed chunk rows, never a
collected corpus.  The explode goes through ``explode_nonnull``: the
inferred ``size > 0`` filter Catalyst adds for a plain ``explode``
would re-evaluate the full chunk build a second time below the fan-out
(the round-5 InferFiltersFromGenerate trap, functions/generate_util).

Reference analog: none — scylla-cdc-rust stops at replication; this is
part of the training-data surface the engine adds on top of the
replicated token table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scylla_cdc_rust_spark.functions.generate_util import explode_nonnull
from scylla_cdc_rust_spark.functions.text import M31


def chunk_counts(tokens: Column, max_len: int, stride: int) -> Column:
    """Number of chunks a token array yields: 1 if it fits, else a
    final floor-division form of ceil((n - max_len) / stride) + 1 —
    integer arithmetic only, so DuckDB oracles reproduce it exactly."""
    n = F.size(tokens).cast("long")
    extra = F.floor((n - F.lit(max_len) + F.lit(stride - 1)) / F.lit(stride))
    return (
        F.when(n <= F.lit(0), F.lit(0))
        .when(n <= F.lit(max_len), F.lit(1))
        .otherwise(extra + F.lit(1))
        .cast("long")
    )


def chunk_tokens(
    df: DataFrame,
    max_len: int,
    stride: int | None = None,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Split each document's token array into context windows.

    Returns one row per chunk: (``id_col``, ``chunk_idx``,
    ``start_off``, ``chunk_tokens``, ``n_chunk_tok``).  Chunk *i*
    covers tokens ``[i·stride, i·stride + max_len)``; the final chunk
    may be short (it always reaches the end of the document); empty
    documents yield no chunks.  ``stride`` defaults to ``max_len``
    (disjoint windows) and must satisfy ``0 < stride <= max_len`` so
    no token is ever skipped between windows.
    """
    if stride is None:
        stride = max_len
    if not 0 < stride <= max_len:
        raise ValueError(
            f"stride must be in (0, max_len]: stride={stride} max_len={max_len}"
        )
    ts = F.col(tokens_col)
    n_chunks = chunk_counts(ts, max_len, stride)
    chunks = F.transform(
        F.sequence(F.lit(0).cast("long"), n_chunks - F.lit(1)),
        lambda i: F.struct(
            i.cast("long").alias("chunk_idx"),
            (i * F.lit(stride)).cast("long").alias("start_off"),
            F.slice(ts, (i * F.lit(stride) + F.lit(1)).cast("int"), max_len).alias(
                "chunk_tokens"
            ),
        ),
    )
    # sequence(0, -1) DESCENDS — guard the empty-document case
    chunks = F.when(n_chunks >= F.lit(1), chunks).otherwise(
        F.array().cast(
            "array<struct<chunk_idx:bigint,start_off:bigint,"
            f"chunk_tokens:{df.schema[tokens_col].dataType.simpleString()}>>"
        )
    )
    out = explode_nonnull(df, chunks, "c", id_col)
    return out.select(
        id_col,
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.col("c.start_off").alias("start_off"),
        F.col("c.chunk_tokens").alias("chunk_tokens"),
        F.size("c.chunk_tokens").cast("long").alias("n_chunk_tok"),
    )


def chunk_digest(chunk_tokens: Column | str, mod: int = M31) -> Column:
    """Order-sensitive digest of a chunk: fold ``a = (a·31 + t) % mod``
    from 0 — for token ids < mod this equals DuckDB's
    ``list_reduce(l, (a,b) -> (a*31+b) % mod)`` (whose seed is the
    first element), making chunk CONTENT oracle-checkable without
    returning raw arrays (the driver canon cannot hash array cells)."""
    c = F.col(chunk_tokens) if isinstance(chunk_tokens, str) else chunk_tokens
    return F.aggregate(
        c,
        F.lit(0).cast("long"),
        lambda a, x: (a * 31 + x) % F.lit(mod).cast("long"),
    )
