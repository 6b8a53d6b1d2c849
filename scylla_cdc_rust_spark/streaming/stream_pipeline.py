"""Structured Streaming micro-batch pipeline over the change log.

Maps the reference's continuous reader onto Spark Structured Streaming:

- the parquet file source (``readStream`` + ``maxFilesPerTrigger``)
  plays the role of the generation poller discovering new log segments
  (fetch_generations_continuously, stream_generations.rs:67-110);
- each ``foreachBatch`` callback advances a driver-side *frontier* =
  max event time seen so far, then applies every complete half-open
  window [floor, frontier − safety_interval) — the exact windowing +
  safety-interval semantics of StreamReader::fetch_cdc
  (stream_reader.rs:256-345: ``window_end = min(begin + window,
  now − safety)``); late files within the safety interval are absorbed,
  same contract as the reference's clock-drift guard;
- windows read from the log with predicate pushdown rather than
  buffering batch rows — the streaming source is pure discovery, so
  nothing is double-written;
- each window commits: decode → watermark filter → fold_delta →
  bucket-pruned MERGE → watermark write (C1 is per-commit, strictly
  stronger than the reference's timer-based saver, checkpoints.rs:32-60);
- Spark's ``checkpointLocation`` makes file discovery resumable; the
  engine's own watermark table makes the *apply* resumable even if the
  streaming checkpoint is lost (C4 resume math + idempotent merge).

``Trigger.AvailableNow`` gives the bounded-replay mode used by tests
(the reference's stop_at, log_reader.rs:60-69).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from scylla_cdc_rust_spark.config import CDCPipelineConfig
from scylla_cdc_rust_spark.model import TIME_MS, EPOCH
from scylla_cdc_rust_spark.operators.merge import ParquetMergeTable
from scylla_cdc_rust_spark.plans.pipeline import apply_window
from scylla_cdc_rust_spark.sources.checkpoints import WatermarkStore


class StreamingReplay:
    def __init__(
        self,
        spark: SparkSession,
        cfg: CDCPipelineConfig,
        collection_modes: dict[str, str] | None = None,
        key: str = "doc_id",
        generation: int = 0,
    ):
        from scylla_cdc_rust_spark.plans.pipeline import (
            _require_no_pending_repair,
        )

        _require_no_pending_repair(cfg)
        self.spark = spark
        self.cfg = cfg
        self.modes = collection_modes or dict(cfg.collection_modes)
        self.key = key
        self.generation = generation
        self.table = ParquetMergeTable(
            spark, cfg.target_path, num_buckets=cfg.target_num_buckets, key=key
        )
        self.wm = WatermarkStore(
            spark, cfg.watermark_path,
            save=cfg.save_progress, load=cfg.load_progress,
        )
        self.frontier_ms: int | None = None  # max event time seen
        self.floor_ms: int | None = None  # next window begin
        #: checkpoint-derived lower bound (None when starting fresh).
        #: Pre-loaded from the saved floors so the very first resume
        #: batch already counts absorbed below-floor rows (the store's
        #: state is a lazy driver-side dict — no Spark job here)
        floors0 = self.wm.stream_floors() if cfg.load_progress else {}
        self.resume_floor_ms: int | None = (
            min(floors0.values()) if floors0 else None
        )
        #: highest window end actually APPLIED in this run — the only
        #: boundary whose violation is a genuine contract break
        self.applied_end_ms: int | None = None
        #: end of the skewed-resume catch-up span (max per-stream floor);
        #: windows below it are coalesced into one (see _apply_upto)
        self.catchup_end_ms: int | None = None
        self._impl: str | None = None  # resolved set_impl ('auto' → concrete)
        self.batch_id = 0
        self.n_applied = 0
        #: case-(3) visibility counters (ADVICE r5): events absorbed as
        #: presumed-already-applied because they sat below their own
        #: stream's saved floor on a resume, and the smallest such time —
        #: the candidate repair_span lower bound if the operator decides
        #: the producer violated the safety contract
        self.n_absorbed_below_floor = 0
        self.min_absorbed_ms: int | None = None

    # ---------- window application ----------

    def _apply_upto(self, safe_end_ms: int) -> None:
        """Apply all complete windows in [floor, safe_end)."""
        if self.floor_ms is None or safe_end_ms <= self.floor_ms:
            return
        log = self.spark.read.parquet(self.cfg.log_path)
        if EPOCH in log.columns:
            log = log.where(F.col(EPOCH) == self.generation)
        if self._impl is None:  # resolve 'auto' once per run
            from scylla_cdc_rust_spark.operators.fold import resolve_set_impl

            self._impl = resolve_set_impl(
                log, self.modes, self.key, self.cfg.set_impl
            )
        w = self.cfg.window_size_ms
        begin = self.floor_ms
        while begin < safe_end_ms:
            if self.catchup_end_ms is not None and begin < self.catchup_end_ms:
                # skewed-resume catch-up: one coalesced window over
                # [min floor, max floor) — the per-stream watermark
                # filter drops already-applied rows of advanced streams,
                # so only each lagging stream's own tail is folded, and
                # the fixed per-window cost is paid once instead of once
                # per intermediate window (C4 at scale)
                end = min(self.catchup_end_ms, safe_end_ms)
            else:
                end = min(begin + w, safe_end_ms)
            batch = log.where((F.col(TIME_MS) >= begin) & (F.col(TIME_MS) < end))
            self.n_applied += apply_window(
                batch,
                self.table,
                self.wm,
                window_end_ms=end,
                window_begin_ms=begin,
                generation=self.generation,
                batch_id=self.batch_id,
                collection_modes=self.modes,
                key=self.key,
                set_impl=self._impl,
            )
            self.batch_id += 1
            begin = end
            if (
                self.cfg.vacuum_every_batches
                and self.batch_id % self.cfg.vacuum_every_batches == 0
            ):
                self.table.vacuum()  # drop superseded bucket dirs
        self.floor_ms = safe_end_ms
        self.applied_end_ms = safe_end_ms

    def _on_batch(self, batch_df, _sid: int) -> None:
        aggs = [F.max(TIME_MS).alias("mx"), F.min(TIME_MS).alias("mn")]
        src = batch_df
        track_late = self.applied_end_ms is not None
        # case (3) visibility (ADVICE r5): rows below their own stream's
        # saved floor are absorbed as presumed-already-applied — correct
        # for redelivery, silent data loss for a producer that violated
        # the safety contract across run boundaries.  The two are
        # indistinguishable here without consulting the target, so the
        # absorbed rows are COUNTED (and the span surfaced) instead of
        # guessed at: the operator can decide whether to run
        # plans.pipeline.repair_span over [min_absorbed_ms,
        # resume_floor_ms).  Only resume runs pay the extra column.
        track_absorb = self.resume_floor_ms is not None
        if track_late or track_absorb:
            # genuinely-late rows: below a window end APPLIED THIS RUN
            # but not below THEIR OWN STREAM's saved floor (those are
            # presumed already applied — filter_new would drop them; see
            # case (3) below).  Counted per batch rather than inferred
            # from the batch min, so one old redelivered row cannot
            # shield late rows from detection.  The floor is per stream,
            # not the single min over streams: after a lost checkpoint
            # with skewed streams, a rediscovered segment legitimately
            # redelivers an advanced stream's rows that sit above the
            # MIN floor but below that stream's own floor — flagging
            # those was a spurious hard failure on a valid resume
            # (ADVICE r5; observed as a flaky late-guard trip in the
            # continuous-tailing test's drain run).
            lo_bound = (
                self.resume_floor_ms
                if self.resume_floor_ms is not None
                else -(1 << 62)
            )
            from scylla_cdc_rust_spark.model import STREAM_ID

            own_floor = F.lit(lo_bound)
            floors = self.wm.stream_floors()
            # narrow frames without the stream column (diagnostic use)
            # keep the coarser single-bound check
            if floors and STREAM_ID in batch_df.columns:
                fdf = self.spark.createDataFrame(
                    [(sid, int(t)) for sid, t in floors.items()],
                    "__sid binary, __floor long",
                )
                src = batch_df.join(
                    F.broadcast(fdf),
                    batch_df[STREAM_ID] == fdf["__sid"],
                    "left",
                )
                # a stream with no saved floor was never applied: its
                # rows below the applied end are genuinely late (bounded
                # below by the global resume floor, as before)
                own_floor = F.coalesce(F.col("__floor"), F.lit(lo_bound))
            if track_late:
                aggs.append(
                    F.sum(
                        F.when(
                            (F.col(TIME_MS) < F.lit(self.applied_end_ms))
                            & (F.col(TIME_MS) >= own_floor),
                            1,
                        ).otherwise(0)
                    ).alias("n_late")
                )
            if track_absorb:
                # rows the apply path will never fold: below their own
                # stream's floor (filter_new drops them) or below the
                # resume floor (windows never rescan there)
                below = F.col(TIME_MS) < own_floor
                aggs.append(
                    F.sum(F.when(below, 1).otherwise(0)).alias("n_absorbed")
                )
                aggs.append(
                    F.min(F.when(below, F.col(TIME_MS))).alias("mn_absorbed")
                )
        r = src.agg(*aggs).collect()[0]
        if track_absorb and (r["n_absorbed"] or 0) > 0:
            self.n_absorbed_below_floor += int(r["n_absorbed"])
            mn_abs = int(r["mn_absorbed"])
            if self.min_absorbed_ms is None or mn_abs < self.min_absorbed_ms:
                self.min_absorbed_ms = mn_abs
            import logging

            logging.getLogger(__name__).warning(
                "streaming replay absorbed %d event(s) below the saved "
                "per-stream floors (min time %d, resume floor %d) as "
                "presumed already applied; if the producer violated the "
                "safety contract instead of redelivering, run "
                "plans.pipeline.repair_span over the suspect span",
                int(r["n_absorbed"]), mn_abs, self.resume_floor_ms,
            )
        if r["mx"] is None:
            return
        if self.frontier_ms is None or r["mx"] > self.frontier_ms:
            self.frontier_ms = int(r["mx"])
        if self.floor_ms is None:
            # resume: max(user lower, saved per-stream minimum) — C4
            # (stream_reader.rs:226-244).  The batch's min is only the
            # floor when no checkpoint exists; otherwise the saved
            # watermark wins — unapplied rows may sit below this batch.
            floors = self.wm.stream_floors()
            if floors:
                self.floor_ms = self.resume_floor_ms = min(floors.values())
                hi = max(floors.values())
                if hi > self.floor_ms:
                    self.catchup_end_ms = hi
            else:
                self.floor_ms = int(r["mn"])
        else:
            if self.applied_end_ms is not None and (r["n_late"] or 0) > 0:
                # (1) rows below a window end APPLIED IN THIS RUN (and
                # not below the checkpoint floor): the fold committed
                # without them — the contract violation the reference's
                # clock-drift guard protects against
                # (stream_reader.rs:256-345); fail loudly
                raise RuntimeError(
                    f"{r['n_late']} late event(s) below applied window "
                    f"end {self.applied_end_ms}; increase "
                    "safety_interval_ms or repair via plans.pipeline."
                    "repair_span over the late interval"
                )
            if r["mn"] < self.floor_ms:
                if self.applied_end_ms is None and self.resume_floor_ms is None:
                    # (2) micro-batch DISCOVERY order is not time order
                    # and nothing has been applied yet — lower the
                    # provisional floor (it was only the first batch's
                    # min)
                    self.floor_ms = int(r["mn"])
                # (3) else: rows below the checkpoint floor — presumed
                # already applied (a rediscovered segment after a lost
                # streaming checkpoint); windows never rescan below the
                # resume floor, the same assumption the reference makes
                # when resuming from its saved progress row.  A producer
                # that violates the safety contract below the SAVED
                # watermark is indistinguishable from redelivery without
                # consulting the target table — the repair path for that
                # is plans.pipeline.repair_span over the suspect span
                # (the idempotent merge makes it safe to over-apply).
        safe_end = self.frontier_ms - self.cfg.safety_interval_ms
        if self.cfg.end_timestamp_ms is not None:
            safe_end = min(safe_end, self.cfg.end_timestamp_ms)
        self._apply_upto(safe_end)

    # ---------- runs ----------

    def _source(self):
        schema = self.spark.read.parquet(self.cfg.log_path).schema
        return (
            self.spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", self.cfg.max_files_per_trigger)
            .parquet(self.cfg.log_path)
        )

    def run_continuous(self, poll_interval_s: float | None = None):
        """Unbounded tailing mode — the reference's primary loop
        (CDCLogReader polling every sleep_interval for new windows,
        log_reader.rs:116-236; default interval log_reader.rs:40-44).
        New log files are discovered each trigger; complete windows
        behind the safety interval are applied as they close.  Returns
        the StreamingQuery — call ``.stop()`` (graceful stop, R4) or
        rely on ``cfg.end_timestamp_ms`` (stop_at) which freezes applies
        past the bound while the query keeps polling."""
        if poll_interval_s is None:
            # builder's sleep_interval (log_reader.rs:40-44 default)
            poll_interval_s = self.cfg.sleep_interval_ms / 1000.0
        return (
            self._source()
            .writeStream.foreachBatch(self._on_batch)
            .option("checkpointLocation", self.cfg.checkpoint_location)
            .trigger(processingTime=f"{poll_interval_s} seconds")
            .start()
        )

    def run_available_now(self, drain: bool = True) -> int:
        """Bounded replay of everything currently in the log dir."""
        q = (
            self._source()
            .writeStream.foreachBatch(self._on_batch)
            .option("checkpointLocation", self.cfg.checkpoint_location)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        if drain and self.frontier_ms is not None:
            # end of bounded run: no more data can arrive — flush the
            # safety tail (stop_at semantics, stream_reader.rs:336-340)
            end = self.frontier_ms + 1
            if self.cfg.end_timestamp_ms is not None:
                end = min(end, self.cfg.end_timestamp_ms)
            self._apply_upto(end)
        return self.n_applied


def run_streaming_epochs(
    spark: SparkSession,
    cfg: CDCPipelineConfig,
    collection_modes: dict[str, str] | None = None,
    key: str = "doc_id",
) -> int:
    """Generation barrier over streaming runs: one bounded streaming
    replay per epoch, strictly sequential (O3, log_reader.rs:171-236)."""
    from scylla_cdc_rust_spark.sources.log_source import epochs_present

    epochs = epochs_present(cfg.log_path) or [0]
    wm = WatermarkStore(
        spark, cfg.watermark_path,
        save=cfg.save_progress, load=cfg.load_progress,
    )
    start_gen = wm.last_generation()
    total = 0
    for ep in epochs:
        if start_gen is not None and ep < start_gen:
            continue
        import os

        ecfg = CDCPipelineConfig(**{**cfg.__dict__})
        ecfg.checkpoint_location = f"{cfg.checkpoint_location}/epoch={ep}"
        ep_dir = os.path.join(cfg.log_path, f"epoch={ep}")
        if os.path.isdir(ep_dir):
            ecfg.log_path = ep_dir  # scope source + frontier to this generation
        sr = StreamingReplay(
            spark, ecfg, collection_modes=collection_modes, key=key, generation=ep
        )
        total += sr.run_available_now(drain=True)
    return total
