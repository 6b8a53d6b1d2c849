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
]))
def timeuuid_to_ms_seq(b: pd.Series) -> pd.DataFrame:
    """timeuuid bytes → (ms since epoch, tie-break seq).

    seq = sub-millisecond 100ns ticks (0..9999) concatenated with the
    14-bit clock sequence — preserves the timeuuid total order within a
    stream when packed under cdc_time_seq (< 2^14 after masking to the
    clock-seq alone is NOT order-preserving; the tick remainder is the
    significant part, so it leads).
    """
    arr = np.frombuffer(b"".join(b.to_numpy()), dtype=np.uint8).reshape(-1, 16)
    ticks = _ticks_from_bytes(b)
    unix_ticks = ticks - GREGORIAN_OFFSET_100NS
    ms = unix_ticks // 10_000
    rem = (unix_ticks % 10_000).astype(np.int64)  # 0..9999 → fits 14 bits? no: 13.3
    # (rem < 2^14 = 16384 ✓) — clock seq used only as a final tie-break is
    # dropped here because two uuids with equal 100ns tick from one stream
    # cannot occur (the generator is per-node monotonic)
    return pd.DataFrame({"ms": ms.astype("int64"), "seq": rem})


def with_decoded_timeuuid(df, uuid_col: str = "cdc$time"):
    """Attach cdc_time_ms / cdc_time_seq decoded from a timeuuid column."""
    from scylla_cdc_rust_spark.model import TIME_MS, TIME_SEQ

    dec = timeuuid_to_ms_seq(F.col(uuid_col))
    return df.withColumn("__tu", dec).withColumns(
        {TIME_MS: F.col("__tu.ms"), TIME_SEQ: F.col("__tu.seq")}
    ).drop("__tu")
