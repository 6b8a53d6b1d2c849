"""Vectorized CDC row decode — zero per-row Python.

The reference decodes each row one at a time in CDCRow::from_row
(/root/reference/scylla-cdc/src/consumer.rs:176-221): timeuuid → time,
operation tinyint → enum + is_expiration (consumer.rs:200-202).  Here
the same derivations are Catalyst column expressions evaluated inside
whole-stage codegen over entire batches:

- op normalization F6 (SURVEY.md §2.2): negative tinyints are the
  TTL-expiration alternatives of ROW_DELETE/PARTITION_DELETE
  (consumer.rs:43-46) → ``op = abs(raw)``, ``is_expiration = raw < 0``.
- total-order key O4: the timeuuid's (ms, 100ns-seq) surrogate columns
  are packed into a single bigint so per-stream clustering order
  (stream_reader.rs:200-213) becomes a plain integer comparison usable
  by max_by/argmax in any engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scylla_cdc_rust_spark.model import (
    BATCH_SEQ,
    IS_EXPIRATION,
    OP_NORM,
    OPERATION,
    ORD,
    STREAM_ID,
    TIME_MS,
    TIME_SEQ,
)


def pack_ord_col(
    time_ms: Column | str = TIME_MS,
    time_seq: Column | str = TIME_SEQ,
    batch_seq: Column | str = BATCH_SEQ,
) -> Column:
    """(time_ms << 22) | (time_seq << 8) | batch_seq — see model.pack_ord_py."""
    from scylla_cdc_rust_spark.model import ORD_BASE_MS

    c = lambda x: F.col(x) if isinstance(x, str) else x  # noqa: E731
    return (
        F.shiftleft(c(time_ms).cast("long") - F.lit(ORD_BASE_MS), 22)
        + F.shiftleft(c(time_seq).cast("long"), 8)
        + c(batch_seq).cast("long")
    ).alias(ORD)


def decode(df: DataFrame, num_stream_buckets: int | None = None) -> DataFrame:
    """Add op / is_expiration / ord (and optionally stream_bucket) columns."""
    raw = F.col(OPERATION).cast("int")
    out = (
        df.withColumn(OP_NORM, F.abs(raw))
        .withColumn(IS_EXPIRATION, raw < F.lit(0))
        .withColumn(ORD, pack_ord_col())
    )
    if num_stream_buckets:
        out = out.withColumn(
            "stream_bucket", F.pmod(F.xxhash64(F.col(STREAM_ID)), F.lit(num_stream_buckets))
        )
    return out
