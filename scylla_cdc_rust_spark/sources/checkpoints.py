"""Per-stream watermark / checkpoint store with lineage counters.

Reference parity (/root/reference/scylla-cdc/src/checkpoints.rs):
- one row per stream: last fully-applied window end + generation
  (Checkpoint struct, checkpoints.rs:19-25; upsert write
  checkpoints.rs:89-96,162-173)
- a sentinel row (stream_id = 0x00) records the last generation
  (checkpoints.rs:146-148,175-187)
- resume rule: window_begin = max(lower, min over streams of saved ts)
  (stream_reader.rs:226-244); generation resume log_reader.rs:513-528.

Differences by design: the reference saves on a timer
(pause_between_saves, checkpoints.rs:32-60); we commit at every
micro-batch boundary — strictly stronger.  Lineage counters
(batch_id, n_applied per stream) ride along per the north rule.

The store is tiny (one row per stream), so each commit writes a fresh
snapshot version dir + atomic `_VERSION` flip — same pattern as
ParquetMergeTable.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

GENERATION_SENTINEL = bytes([0])  # checkpoints.rs:146-148

WM_SCHEMA = T.StructType(
    [
        T.StructField("stream_id", T.BinaryType(), False),
        T.StructField("generation", T.LongType(), True),  # epoch number
        T.StructField("time_ms", T.LongType(), True),  # window end (exclusive)
        T.StructField("batch_id", T.LongType(), True),  # lineage
        T.StructField("n_applied", T.LongType(), True),  # lineage
    ]
)


class WatermarkStore:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(path, exist_ok=True)

    def version(self) -> int | None:
        vf = os.path.join(self.path, "_VERSION")
        if not os.path.exists(vf):
            return None
        with open(vf) as f:
            return int(f.read().strip())

    def load(self) -> DataFrame | None:
        v = self.version()
        if v is None:
            return None
        return self.spark.read.parquet(os.path.join(self.path, f"v{v}"))

    # ---------- resume math ----------

    def last_generation(self) -> int | None:
        """log_reader.rs:513-528: resume from the saved generation."""
        df = self.load()
        if df is None:
            return None
        row = df.where(F.col("stream_id") == F.lit(GENERATION_SENTINEL)).collect()
        return int(row[0]["generation"]) if row else None

    def resume_begin_ms(self, lower_ms: int) -> int:
        """stream_reader.rs:226-244: max(lower, min of saved stream times)."""
        df = self.load()
        if df is None:
            return lower_ms
        row = (
            df.where(F.col("stream_id") != F.lit(GENERATION_SENTINEL))
            .agg(F.min("time_ms").alias("m"))
            .collect()
        )
        saved = row[0]["m"]
        return max(lower_ms, int(saved)) if saved is not None else lower_ms

    # ---------- exactly-once filter ----------

    def filter_new(self, decoded: DataFrame) -> DataFrame:
        """Drop events already covered by a stream's watermark (the
        event-level exactly-once guard; reference analog: dedup vs
        already-applied, replication_tests.rs:93-98)."""
        wm = self.load()
        if wm is None:
            return decoded
        wm = wm.where(F.col("stream_id") != F.lit(GENERATION_SENTINEL)).select(
            F.col("stream_id").alias("__wm_sid"), F.col("time_ms").alias("__wm_t")
        )
        from scylla_cdc_rust_spark.model import STREAM_ID, TIME_MS

        out = decoded.join(
            F.broadcast(wm), decoded[STREAM_ID] == wm["__wm_sid"], "left"
        )
        return out.where(
            F.col("__wm_t").isNull() | (F.col(TIME_MS) >= F.col("__wm_t"))
        ).drop("__wm_sid", "__wm_t")

    # ---------- commit ----------

    def commit(
        self,
        per_stream: list[tuple[bytes, int]] | DataFrame,
        window_end_ms: int,
        generation: int,
        batch_id: int,
    ) -> int:
        """Advance watermarks to window_end for the given streams.

        ``per_stream``: [(stream_id, n_events_applied)] for this batch
        (or a DataFrame with stream_id / n columns, collected here — it
        is ≤ #streams rows).
        """
        if isinstance(per_stream, DataFrame):
            per_stream = [(r[0], r[1]) for r in per_stream.collect()]
        old = self.load()
        prev: dict[bytes, tuple] = {}
        if old is not None:
            for r in old.collect():
                prev[bytes(r["stream_id"])] = (
                    r["generation"],
                    r["time_ms"],
                    r["batch_id"],
                    r["n_applied"],
                )
        for sid, n in per_stream:
            sid = bytes(sid)
            p = prev.get(sid)
            prev[sid] = (
                generation,
                max(window_end_ms, p[1] if p else 0),
                batch_id,
                (p[3] if p else 0) + int(n),
            )
        # generation sentinel (checkpoints.rs:175-187)
        g = prev.get(GENERATION_SENTINEL)
        prev[GENERATION_SENTINEL] = (
            generation,
            None,
            batch_id,
            (g[3] if g else 0),
        )
        rows = [
            (sid, int(v[0]), None if v[1] is None else int(v[1]), int(v[2]), int(v[3]))
            for sid, v in prev.items()
        ]
        new_v = (self.version() or 0) + 1
        df = self.spark.createDataFrame(rows, WM_SCHEMA).coalesce(1)
        df.write.mode("overwrite").parquet(os.path.join(self.path, f"v{new_v}"))
        fd, tmp = tempfile.mkstemp(dir=self.path, prefix="_VERSION.")
        with os.fdopen(fd, "w") as f:
            f.write(str(new_v))
        os.replace(tmp, os.path.join(self.path, "_VERSION"))
        return new_v
