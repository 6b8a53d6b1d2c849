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
    T.StructField("node", T.LongType()),
]))
def timeuuid_to_ms_seq(b: pd.Series) -> pd.DataFrame:
    """timeuuid bytes → (ms since epoch, tie-break seq, clock sequence,
    node id).

    seq = sub-millisecond 100ns ticks (0..9999 < 2^14) — together with
    ms this reconstructs the full 60-bit v1 timestamp, the leading
    component of the reference's timeuuid clustering order
    (consumer.rs:193-194).  clock_seq (14-bit field from bytes 8-9,
    variant bits masked) and node (48-bit, bytes 10-15) are the
    remaining uuid bytes the reference compares AFTER the timestamp —
    they only matter when two changes in one stream share the exact
    100ns tick.  ord (decode.pack_ord_col) cannot carry them —
    40ms+14seq+14clock+8batch = 76 bits > one signed long — so
    ``with_decoded_timeuuid`` resolves collisions by densely re-ranking
    seq by (seq, clock_seq, node) within each (stream, ms) group
    (``resolve_clockseq_collisions``), preserving the full-uuid order
    inside the single packed long; strict mode instead FAILS LOUDLY.
    """
    arr = np.frombuffer(b"".join(b.to_numpy()), dtype=np.uint8).reshape(-1, 16)
    ticks = _ticks_from_bytes(b)
    unix_ticks = ticks - GREGORIAN_OFFSET_100NS
    ms = unix_ticks // 10_000
    rem = (unix_ticks % 10_000).astype(np.int64)
    clock_seq = (
        ((arr[:, 8].astype(np.int64) & 0x3F) << 8) | arr[:, 9].astype(np.int64)
    )
    node = (
        (arr[:, 10].astype(np.int64) << 40)
        | (arr[:, 11].astype(np.int64) << 32)
        | (arr[:, 12].astype(np.int64) << 24)
        | (arr[:, 13].astype(np.int64) << 16)
        | (arr[:, 14].astype(np.int64) << 8)
        | arr[:, 15].astype(np.int64)
    )
    return pd.DataFrame(
        {"ms": ms.astype("int64"), "seq": rem, "clock_seq": clock_seq,
         "node": node}
    )


class TimeuuidOrderError(RuntimeError):
    """Two changes in one stream share the 100ns tick but differ in the
    uuid's clock sequence / node — the packed ord cannot represent the
    reference's full-timeuuid order (consumer.rs:193-194) for them
    without the seq re-rank (``resolve_clockseq_collisions``)."""


#: seq is packed into 14 bits of ord (decode.pack_ord_col) — the dense
#: re-rank may not exceed it
_SEQ_CAP = (1 << 14) - 1


def _uuid_lo(clock_col: str = "cdc_clock_seq", node_col: str = "cdc_node"):
    """The uuid bytes after the timestamp as one orderable long:
    clock_seq (14 bits) above node (48 bits) — matches the unsigned
    byte-lexicographic order of uuid bytes 8..15 at fixed variant."""
    return F.shiftleft(F.col(clock_col), 48) + F.col(node_col)


def _stream_expr(df, stream_col: str | None):
    from scylla_cdc_rust_spark.model import STREAM_ID

    stream_col = stream_col or STREAM_ID
    if stream_col not in df.columns:
        # no stream column ⇒ the window is a single stream's read
        # (stream_reader.rs reads one stream at a time) — compare ticks
        # globally, which is exactly the per-stream rule then
        return F.lit("<single-stream>")
    return F.col(f"`{stream_col}`")


def _clockseq_collisions(df, stream_col: str | None = None):
    """Ticks whose full-uuid order the tick alone cannot represent.

    One aggregation over the ingest window: group by (stream, ms, seq)
    and compare min/max of the post-timestamp uuid bytes — map-side
    combinable min/max, so the check shuffles only one row per distinct
    tick, never the payload."""
    from scylla_cdc_rust_spark.model import TIME_MS, TIME_SEQ

    stream = _stream_expr(df, stream_col)
    return (
        df.groupBy(stream.alias("__stream"), F.col(TIME_MS), F.col(TIME_SEQ))
        .agg(
            F.min(_uuid_lo()).alias("lo"),
            F.max(_uuid_lo()).alias("hi"),
        )
        .where(F.col("lo") != F.col("hi"))
    )


def assert_no_clockseq_collisions(df, stream_col: str | None = None) -> None:
    """Fail fast if the full-timeuuid order is not representable by the
    tick alone.  Raises ``TimeuuidOrderError`` naming the first
    offending tick."""
    bad = _clockseq_collisions(df, stream_col).first()
    if bad is not None:
        raise TimeuuidOrderError(
            f"stream {bad[0]!r} tick (ms={bad[1]}, seq={bad[2]}) carries "
            f"distinct post-timestamp uuid bytes (clock_seq<<48|node "
            f"{bad['lo']} and {bad['hi']}); packed ord would collapse "
            "their order (reference order is the full timeuuid, "
            "consumer.rs:193-194)"
        )


def resolve_clockseq_collisions(df, stream_col: str | None = None):
    """Rewrite cdc_time_seq so the packed ord realizes the reference's
    FULL timeuuid order (consumer.rs:193-194) even when two writers
    share a 100ns tick.

    Within each COLLIDING (stream, ms) group, seq becomes the dense
    rank of (seq, clock_seq, node) — i.e. of (60-bit timestamp,
    remaining uuid bytes), the exact timeuuid comparison the
    reference's clustering key uses.  Rows of one write batch share the
    uuid, keep one seq, and stay ordered by cdc$batch_seq_no in ord's
    low bits.  Collision-free groups keep their raw seq — both forms
    are monotone in full-uuid order and ord compares ms first, so
    cross-group order is unaffected.  The remap is stable across
    micro-batches because windows bound on cdc_time_ms half-open — one
    (stream, ms) group is never split.  The raw 100ns remainder is
    always available as ``cdc_time_seq_raw`` (stable schema); µs
    write-timestamp propagation (``timeuuid_to_us``) reads the uuid
    directly and is unaffected.

    Fully LAZY, and the log itself never shuffles: colliding ticks come
    from a map-side-combinable aggregate (one row per distinct tick);
    the (tick, uuid-tail) → dense-rank remap is built from only the
    colliding groups' rows and broadcast back as an equi-join.  A
    collision-free log (the overwhelmingly common case) broadcasts two
    empty sets — with AQE, the remap-side scan collapses to an empty
    relation at runtime — and no plan-build Spark job runs at all
    (the old eager ``.first()`` probe ran the upstream scan once per
    ``decode()`` call; ADVICE r4).  A pathological log where most ticks
    collide makes the broadcast remap large — that is what
    ``strict=True`` quarantine is for.
    """
    from scylla_cdc_rust_spark.model import TIME_MS, TIME_SEQ

    stream = _stream_expr(df, stream_col)
    bad = (
        _clockseq_collisions(df, stream_col)
        .select(F.col("__stream").alias("__bs"), F.col(TIME_MS).alias("__bms"))
        .distinct()
    )
    hit = df.join(
        F.broadcast(bad),
        (stream == F.col("__bs")) & (F.col(TIME_MS) == F.col("__bms")),
    )
    remap = (
        hit.select(
            F.col("__bs").alias("__s"),
            F.col("__bms").alias("__ms"),
            F.col(TIME_SEQ).alias("__seq"),
            _uuid_lo().alias("__lo"),
        )
        .distinct()
        .groupBy("__s", "__ms")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("__seq"), F.col("__lo")))
            ).alias("ks")
        )
        .select("__s", "__ms", F.posexplode("ks").alias("__new_seq", "__k"))
        .select(
            "__s",
            "__ms",
            F.col("__k.__seq").alias("__seq"),
            F.col("__k.__lo").alias("__lo"),
            F.col("__new_seq").cast("long").alias("__new_seq"),
        )
    )
    out = df.join(
        F.broadcast(remap),
        (stream == F.col("__s"))
        & (F.col(TIME_MS) == F.col("__ms"))
        & (F.col(TIME_SEQ) == F.col("__seq"))
        & (_uuid_lo() == F.col("__lo")),
        "left",
    )
    seq2 = F.coalesce(F.col("__new_seq"), F.col(TIME_SEQ))
    return (
        out.withColumn("cdc_time_seq_raw", F.col(TIME_SEQ))
        .withColumn(
            TIME_SEQ,
            F.when(seq2 <= F.lit(_SEQ_CAP), seq2).otherwise(
                F.raise_error(
                    F.format_string(
                        "over %d distinct timeuuids inside one (stream, ms) "
                        "group — seq re-rank does not fit ord's 14-bit field",
                        F.lit(_SEQ_CAP + 1),
                    )
                )
            ),
        )
        .drop("__s", "__ms", "__seq", "__lo", "__new_seq")
    )


def with_decoded_timeuuid(
    df, uuid_col: str = "cdc$time", strict: bool | None = None
):
    """Attach cdc_time_ms / cdc_time_seq / cdc_clock_seq / cdc_node
    decoded from a timeuuid column.

    Collision handling — what happens when two changes in one stream
    share the exact 100ns tick with different uuids (a node restart
    bumping clock_seq, or two coordinators on one tick):

    - ``strict=None`` (default): resolve by re-ranking seq in full-uuid
      order (``resolve_clockseq_collisions``) — the reference's
      ordering, kept inside the packed ord.
    - ``strict=True``: fail loudly (``TimeuuidOrderError``) instead of
      reordering — for operators who want such logs quarantined.
    - ``strict=False``: assume collision-free, skip the probe entirely.
    """
    from scylla_cdc_rust_spark.model import TIME_MS, TIME_SEQ

    dec = timeuuid_to_ms_seq(F.col(f"`{uuid_col}`"))
    out = (
        df.withColumn("__tu", dec)
        .withColumns(
            {
                TIME_MS: F.col("__tu.ms"),
                TIME_SEQ: F.col("__tu.seq"),
                "cdc_clock_seq": F.col("__tu.clock_seq"),
                "cdc_node": F.col("__tu.node"),
            }
        )
        .drop("__tu")
    )
    if strict is True:
        assert_no_clockseq_collisions(out)
    elif strict is None:
        out = resolve_clockseq_collisions(out)
    return out
