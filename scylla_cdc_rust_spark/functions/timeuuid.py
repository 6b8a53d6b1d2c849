"""Vectorized timeuuid (UUID v1) decoding — O4 (SURVEY §2.3).

The reference extracts the write timestamp from the cdc$time timeuuid
row-by-row (replicator_consumer.rs:384-390: 100ns ticks since the
Gregorian reform → µs) and orders rows by the timeuuid clustering key.
Here the same decode is an Arrow-batched pandas UDF over the 16-byte
uuid (zero per-row Python): extract the 60-bit v1 timestamp and the
14-bit clock sequence, convert to (ms, seq) — the engine's timeuuid
surrogate columns (FIXTURES.md §2) — plus µs for USING TIMESTAMP
propagation (A10).

Synthetic logs carry (cdc_time_ms, cdc_time_seq) directly; this module
is the ingest shim for logs that carry real timeuuid bytes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: 100ns ticks between 1582-10-15 (UUID epoch) and 1970-01-01 (Unix epoch)
GREGORIAN_OFFSET_100NS = 122_192_928_000_000_000


def _ticks_from_bytes(b: pd.Series) -> np.ndarray:
    """v1 layout: time_low (4B) | time_mid (2B) | time_hi_and_version (2B)."""
    arr = np.frombuffer(b"".join(b.to_numpy()), dtype=np.uint8).reshape(-1, 16)
    time_low = (
        (arr[:, 0].astype(np.uint64) << 24)
        | (arr[:, 1].astype(np.uint64) << 16)
        | (arr[:, 2].astype(np.uint64) << 8)
        | arr[:, 3].astype(np.uint64)
    )
    time_mid = (arr[:, 4].astype(np.uint64) << 8) | arr[:, 5].astype(np.uint64)
    time_hi = ((arr[:, 6].astype(np.uint64) & 0x0F) << 8) | arr[:, 7].astype(np.uint64)
    return (time_hi << 48) | (time_mid << 32) | time_low


@F.pandas_udf(T.LongType())
def timeuuid_to_us(b: pd.Series) -> pd.Series:
    """timeuuid bytes → µs since Unix epoch (write-timestamp propagation)."""
    ticks = _ticks_from_bytes(b)
    return pd.Series((ticks - GREGORIAN_OFFSET_100NS) // 10, dtype="int64")


@F.pandas_udf(T.StructType([
    T.StructField("ms", T.LongType()),
    T.StructField("seq", T.LongType()),
    T.StructField("clock_seq", T.LongType()),
]))
def timeuuid_to_ms_seq(b: pd.Series) -> pd.DataFrame:
    """timeuuid bytes → (ms since epoch, tie-break seq, clock sequence).

    seq = sub-millisecond 100ns ticks (0..9999 < 2^14) — together with
    ms this reconstructs the full 60-bit v1 timestamp, the leading
    component of the reference's timeuuid clustering order
    (consumer.rs:193-194).  clock_seq is the 14-bit field from bytes
    8-9 (variant bits masked): the reference compares it AFTER the
    timestamp, so it only matters when two changes in one stream share
    the exact 100ns tick.  ord (decode.pack_ord_col) cannot carry it —
    40ms+14seq+14clock+8batch = 76 bits > one signed long — so the
    ingest shim surfaces it as a column and ``with_decoded_timeuuid``'s
    strict mode FAILS LOUDLY if any (stream, tick) carries two distinct
    clock sequences, instead of silently mis-ordering (or assuming
    per-node monotonic generators, which real multi-coordinator logs
    need not satisfy).
    """
    arr = np.frombuffer(b"".join(b.to_numpy()), dtype=np.uint8).reshape(-1, 16)
    ticks = _ticks_from_bytes(b)
    unix_ticks = ticks - GREGORIAN_OFFSET_100NS
    ms = unix_ticks // 10_000
    rem = (unix_ticks % 10_000).astype(np.int64)
    clock_seq = (
        ((arr[:, 8].astype(np.int64) & 0x3F) << 8) | arr[:, 9].astype(np.int64)
    )
    return pd.DataFrame(
        {"ms": ms.astype("int64"), "seq": rem, "clock_seq": clock_seq}
    )


class TimeuuidOrderError(RuntimeError):
    """Two changes in one stream share the 100ns tick but differ in
    clock sequence — the packed ord cannot represent the reference's
    full-timeuuid order (consumer.rs:193-194) for them."""


def assert_no_clockseq_collisions(df, stream_col: str | None = None) -> None:
    """Fail fast if the full-timeuuid order is not representable.

    One aggregation over the ingest window: group by (stream, ms, seq)
    and compare min/max clock_seq — map-side combinable min/max, so the
    check shuffles only one row per distinct tick, never the payload.
    Raises ``TimeuuidOrderError`` naming the first offending tick.
    """
    from scylla_cdc_rust_spark.model import STREAM_ID, TIME_MS, TIME_SEQ

    stream_col = stream_col or STREAM_ID
    if stream_col not in df.columns:
        # no stream column ⇒ the window is a single stream's read
        # (stream_reader.rs reads one stream at a time) — compare ticks
        # globally, which is exactly the per-stream rule then
        stream = F.lit("<single-stream>")
    else:
        stream = F.col(f"`{stream_col}`")
    bad = (
        df.groupBy(stream.alias("__stream"), F.col(TIME_MS), F.col(TIME_SEQ))
        .agg(
            F.min("cdc_clock_seq").alias("lo"),
            F.max("cdc_clock_seq").alias("hi"),
        )
        .where(F.col("lo") != F.col("hi"))
        .first()
    )
    if bad is not None:
        raise TimeuuidOrderError(
            f"stream {bad[0]!r} tick (ms={bad[1]}, seq={bad[2]}) carries "
            f"clock sequences {bad['lo']} and {bad['hi']}; packed ord would "
            "collapse their order — ingest aborted (reference order is the "
            "full timeuuid, consumer.rs:193-194)"
        )


def with_decoded_timeuuid(df, uuid_col: str = "cdc$time", strict: bool = True):
    """Attach cdc_time_ms / cdc_time_seq / cdc_clock_seq decoded from a
    timeuuid column.  ``strict`` (default) runs the clock-seq collision
    guard eagerly: logs where the tick alone is not a total order per
    stream are rejected rather than silently reordered."""
    from scylla_cdc_rust_spark.model import TIME_MS, TIME_SEQ

    dec = timeuuid_to_ms_seq(F.col(f"`{uuid_col}`"))
    out = (
        df.withColumn("__tu", dec)
        .withColumns(
            {
                TIME_MS: F.col("__tu.ms"),
                TIME_SEQ: F.col("__tu.seq"),
                "cdc_clock_seq": F.col("__tu.clock_seq"),
            }
        )
        .drop("__tu")
    )
    if strict:
        assert_no_clockseq_collisions(out)
    return out
