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
    """(time_ms << 22) | (time_seq << 8) | batch_seq — see model.pack_ord_py.

    Timestamps below ORD_BASE_MS fail LOUDLY: they would pack to a
    negative ord, silently breaking the fold's NEG_INF tombstone
    sentinel (ord values are assumed non-negative throughout)."""
    from scylla_cdc_rust_spark.model import ORD_BASE_MS

    c = lambda x: F.col(x) if isinstance(x, str) else x  # noqa: E731
    ms = c(time_ms).cast("long")
    rel = F.when(ms >= F.lit(ORD_BASE_MS), ms - F.lit(ORD_BASE_MS)).otherwise(
        F.raise_error(
            F.format_string(
                "cdc_time_ms %s predates ORD_BASE_MS "
                f"({ORD_BASE_MS}) — packed ord would go negative",
                ms.cast("string"),
            )
        )
    )
    return (
        F.shiftleft(rel, 22)
        + F.shiftleft(c(time_seq).cast("long"), 8)
        + c(batch_seq).cast("long")
    ).alias(ORD)


def decode(
    df: DataFrame,
    num_stream_buckets: int | None = None,
    strict_timeuuid: bool | None = None,
) -> DataFrame:
    """Add op / is_expiration / ord / end_of_batch (and optionally
    stream_bucket) columns.

    Logs carrying only the raw ``cdc$time`` timeuuid (a real Scylla CDC
    log, consumer.rs:193-194) are normalized first: the Arrow-batched
    ``with_decoded_timeuuid`` derives cdc_time_ms / cdc_time_seq /
    cdc_clock_seq / cdc_node.  Same-tick/different-uuid collisions are
    resolved by default via the full-uuid seq re-rank
    (``resolve_clockseq_collisions`` — the reference's complete
    timeuuid order realized inside the packed ord);
    ``strict_timeuuid=True`` fails loudly on collision instead, and
    ``strict_timeuuid=False`` skips the probe.  Synthetic logs that
    already carry the surrogate columns skip this step.

    ``end_of_batch`` is the consumer-facing copy of ``cdc$end_of_batch``
    (delivered by the reference per row, consumer.rs:164,197-198),
    coalesced to true for logs of single-row changes.  Batch atomicity
    is structural in this engine: every row of a write batch shares
    ``cdc$time`` (same (ms, seq)), and windows filter half-open on
    ``cdc_time_ms`` — so a window can never split a batch (asserted by
    tests/test_pipeline.py::test_batch_never_splits_across_windows and
    checkable on real logs with ``batch_integrity_violations``)."""
    from scylla_cdc_rust_spark.model import END_OF_BATCH, TIME_UUID

    if TIME_MS not in df.columns:
        if TIME_UUID not in df.columns:
            raise ValueError(
                f"log has neither {TIME_MS} surrogates nor a raw "
                f"{TIME_UUID} timeuuid column — not a CDC log"
            )
        from scylla_cdc_rust_spark.functions.timeuuid import with_decoded_timeuuid

        df = with_decoded_timeuuid(df, TIME_UUID, strict=strict_timeuuid)

    raw = F.col(OPERATION).cast("int")

    eob = (
        F.coalesce(F.col(f"`{END_OF_BATCH}`"), F.lit(True))
        if END_OF_BATCH in df.columns
        else F.lit(True)
    )
    out = (
        df.withColumn(OP_NORM, F.abs(raw))
        .withColumn(IS_EXPIRATION, raw < F.lit(0))
        .withColumn(ORD, pack_ord_col())
        .withColumn("end_of_batch", eob)
    )
    if num_stream_buckets:
        out = out.withColumn(
            "stream_bucket", F.pmod(F.xxhash64(F.col(STREAM_ID)), F.lit(num_stream_buckets))
        )
    return out


def batch_integrity_violations(df: DataFrame) -> DataFrame:
    """Write batches that violate the reference's delivery contract.

    A batch = all rows sharing (stream, cdc$time) i.e. (ms, seq) here;
    the contract (consumer.rs:163-164,197-198): batch_seq_no runs
    contiguously from 0 and exactly the LAST row carries end_of_batch.
    Returns the offending (stream, ms, seq) groups with diagnostics —
    empty means the log (or a window of it) is batch-atomic.  All
    aggregates are map-side combinable (min/max/count/sum), so the
    check shuffles one row per batch, never the payload.
    """
    n = F.count(F.lit(1))
    return (
        df.groupBy(
            F.col(STREAM_ID).alias("stream"),
            F.col(TIME_MS).alias("ms"),
            F.col(TIME_SEQ).alias("seq"),
        )
        .agg(
            n.alias("n_rows"),
            F.min(BATCH_SEQ).alias("min_seq"),
            F.max(BATCH_SEQ).alias("max_seq"),
            F.sum(F.col(BATCH_SEQ).cast("long")).alias("sum_seq"),
            F.sum(F.col("end_of_batch").cast("int")).alias("n_flags"),
            F.max(F.when(F.col("end_of_batch"), F.col(BATCH_SEQ))).alias("flag_at"),
        )
        .where(
            ~(
                (F.col("min_seq") == 0)
                & (F.col("max_seq") == F.col("n_rows") - 1)
                & (F.col("sum_seq")
                   == F.col("n_rows") * (F.col("n_rows") - 1) / 2)
                & (F.col("n_flags") == 1)
                & (F.col("flag_at") == F.col("max_seq"))
            )
        )
    )
