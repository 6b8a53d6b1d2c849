"""End-to-end batch replay: log dir → windowed merge → target table.

Covers resume-from-checkpoint (e2e_tests.rs:488-520 — 5 sequential
bounded runs), replay idempotency, and generation sequencing."""

import os

import pytest

from scylla_cdc_rust_spark.config import CDCPipelineConfig
from scylla_cdc_rust_spark.datagen.gen_log import LogSpec, generate_log, write_log
from scylla_cdc_rust_spark.datagen.oracle import oracle_replay
from scylla_cdc_rust_spark.operators.merge import ParquetMergeTable
from scylla_cdc_rust_spark.plans.pipeline import replay
from tests.util import assert_state_equal, normalize_engine

MODES = {"tokens": "set"}


def make_cfg(tmp, log_tbl, window_ms=400_000):
    cfg = CDCPipelineConfig(
        log_path=os.path.join(tmp, "log"),
        target_path=os.path.join(tmp, "target"),
        watermark_path=os.path.join(tmp, "wm"),
        window_size_ms=window_ms,
        target_num_buckets=8,
    )
    write_log(log_tbl, cfg.log_path)
    return cfg


def visible_state(spark, cfg):
    table = ParquetMergeTable(spark, cfg.target_path, num_buckets=8)
    return normalize_engine(table.read_visible().collect())


def test_full_replay_matches_oracle(spark, tmp_path):
    tbl = generate_log(LogSpec(n_events=12_000, n_docs=500, seed=31, n_epochs=3))
    cfg = make_cfg(str(tmp_path), tbl)
    stats = replay(spark, cfg, MODES)
    assert stats.n_events == tbl.num_rows
    assert stats.epochs == [0, 1, 2]
    assert stats.n_batches >= 3  # multiple windows exercised
    assert_state_equal(visible_state(spark, cfg), oracle_replay(tbl, collection_modes=MODES))


def test_replay_is_idempotent(spark, tmp_path):
    tbl = generate_log(LogSpec(n_events=4_000, n_docs=200, seed=8))
    cfg = make_cfg(str(tmp_path), tbl)
    replay(spark, cfg, MODES)
    s1 = visible_state(spark, cfg)
    # full second replay: watermark filter drops everything; state unchanged
    stats2 = replay(spark, cfg, MODES)
    assert stats2.n_events == 0
    assert_state_equal(visible_state(spark, cfg), s1)


def test_resume_from_checkpoint_five_restarts(spark, tmp_path):
    # growing-log resume: 5 sequential bounded runs over an expanding log,
    # each resuming from watermarks (e2e_test_saving_progress_complex)
    tbl = generate_log(LogSpec(n_events=10_000, n_docs=300, seed=77, n_epochs=2))
    import numpy as np

    from scylla_cdc_rust_spark.model import TIME_MS

    times = tbl.column(TIME_MS).to_numpy()
    cuts = np.quantile(times, [0.2, 0.4, 0.6, 0.8, 1.0])
    cuts[-1] += 1
    cfg = make_cfg(str(tmp_path), tbl)
    total = 0
    for i, cut in enumerate(cuts):
        cfg.end_timestamp_ms = int(cut)
        stats = replay(spark, cfg, MODES)
        total += stats.n_events
    assert total == tbl.num_rows  # every event applied exactly once
    assert_state_equal(visible_state(spark, cfg), oracle_replay(tbl, collection_modes=MODES))


def test_merge_rewrites_only_affected_buckets(spark, tmp_path):
    # scale property: a window touching few docs must not rewrite the
    # whole table (bucket-level copy-on-write = Iceberg partition pruning)
    from tests.scenarios import LogBuilder

    from scylla_cdc_rust_spark.functions.decode import decode
    from scylla_cdc_rust_spark.operators.fold import fold_delta
    from tests.util import spark_df_from_arrow

    tbl = generate_log(LogSpec(n_events=5_000, n_docs=400, seed=4))
    cfg = make_cfg(str(tmp_path), tbl)
    replay(spark, cfg, MODES)
    table = ParquetMergeTable(spark, cfg.target_path, num_buckets=8)
    v_before = table.version()

    b = LogBuilder().insert("doc_00000001", [1, 2, 3])
    b.rows[0]["cdc_time_ms"] = 1_900_000_000_000  # after everything
    delta = fold_delta(
        decode(spark_df_from_arrow(spark, b.build())), collection_modes=MODES
    )
    st = table.merge(delta, payload=["tokens", "n_tok", "source"], collection_modes=MODES)
    assert st["buckets_rewritten"] == 1
    assert table.version() == v_before + 1
    row = [
        r
        for r in table.read_visible().collect()
        if r["doc_id"] == "doc_00000001"
    ][0]
    assert list(row["tokens"]) == [1, 2, 3]


def test_vacuum_drops_orphans_and_old_tombstones(spark, tmp_path):
    tbl = generate_log(LogSpec(n_events=3_000, n_docs=150, seed=13))
    cfg = make_cfg(str(tmp_path), tbl)
    replay(spark, cfg, MODES)
    table = ParquetMergeTable(spark, cfg.target_path, num_buckets=8)
    before = normalize_engine(table.read_visible().collect())
    table.vacuum(tombstone_horizon_ord=(1 << 63) - 1)  # purge all tombstones
    internal = table.read()
    assert internal.where("is_deleted").count() == 0
    assert_state_equal(normalize_engine(table.read_visible().collect()), before)
    data_dirs = os.listdir(os.path.join(cfg.target_path, "data"))
    assert len(data_dirs) == 1  # old versions gone


def test_vacuum_reclaims_superseded_buckets(spark, tmp_path):
    """A long windowed replay must not leak superseded COW bucket dirs:
    auto-vacuum (cfg.vacuum_every_batches) keeps on-disk bucket dirs
    bounded by the live manifest, and the visible state is unchanged."""
    import os

    from scylla_cdc_rust_spark.operators.merge import ParquetMergeTable

    tmp = str(tmp_path)
    tbl = generate_log(LogSpec(n_events=6_000, n_docs=200, seed=53))
    cfg = CDCPipelineConfig(
        log_path=os.path.join(tmp, "log"),
        target_path=os.path.join(tmp, "t"),
        watermark_path=os.path.join(tmp, "wm"),
        window_size_ms=30_000,  # many windows
        target_num_buckets=4,
        vacuum_every_batches=4,
    )
    write_log(tbl, cfg.log_path)
    stats = replay(spark, cfg, MODES)
    assert stats.n_batches > 8

    t = ParquetMergeTable(spark, cfg.target_path, num_buckets=4)
    t.vacuum()  # final sweep
    data_root = os.path.join(cfg.target_path, "data")
    on_disk = {
        os.path.join(v, b)
        for v in os.listdir(data_root)
        for b in os.listdir(os.path.join(data_root, v))
        if b.startswith("__bucket=")
    }
    # everything on disk is referenced by the live manifest — no leaks
    m = t._manifest()
    referenced = {p.split("data/")[1] for p in m["buckets"].values()}
    assert on_disk == referenced
    assert_state_equal(
        normalize_engine(t.read_visible().collect()),
        oracle_replay(tbl, collection_modes=MODES),
    )


def test_builder_facade(spark, tmp_path):
    """CDCLogReaderBuilder: the reference builder's method names
    (log_reader.rs:318-561) configure and run the same replay."""
    import os

    from scylla_cdc_rust_spark.config import CDCLogReaderBuilder
    from scylla_cdc_rust_spark.operators.merge import ParquetMergeTable

    tmp = str(tmp_path)
    tbl = generate_log(LogSpec(n_events=2_000, n_docs=100, seed=59))
    write_log(tbl, os.path.join(tmp, "log"))
    cfg = (
        CDCLogReaderBuilder()
        .log_path(os.path.join(tmp, "log"))
        .target_path(os.path.join(tmp, "t"))
        .watermark_path(os.path.join(tmp, "wm"))
        .window_size(1 << 60)
        .safety_interval(0)
        .should_save_progress(True)
        .collection_modes(MODES)
        .build()
    )
    stats = replay(spark, cfg, MODES)
    assert stats.n_events == tbl.num_rows
    t = ParquetMergeTable(spark, cfg.target_path, num_buckets=cfg.target_num_buckets)
    assert_state_equal(
        normalize_engine(t.read_visible().collect()),
        oracle_replay(tbl, collection_modes=MODES),
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="log_path"):
        CDCLogReaderBuilder().build()

    # sleep_interval is carried into the config (feeds run_continuous)
    cfg2 = (
        CDCLogReaderBuilder()
        .log_path(os.path.join(tmp, "log"))
        .sleep_interval(2_500)
        .should_save_progress(False)
        .should_load_progress(True)
        .build()
    )
    assert cfg2.sleep_interval_ms == 2_500
    # save/load are independent flags (log_reader.rs:438-459) — setting
    # load must NOT silently re-enable save
    assert cfg2.save_progress is False and cfg2.load_progress is True


def test_progress_flags_save_and_load_semantics(spark, tmp_path):
    """should_save_progress(False): replay applies but persists no
    watermarks, so a rerun re-applies (idempotent merge keeps state
    right).  should_load_progress(False): saved watermarks are ignored
    — the rerun replays from scratch."""
    import os

    tmp = str(tmp_path)
    tbl = generate_log(LogSpec(n_events=2_000, n_docs=100, seed=61))
    cfg = make_cfg(tmp, tbl)

    # save disabled → no _VERSION written, rerun sees no progress
    cfg.save_progress = False
    replay(spark, cfg, MODES)
    assert not os.path.exists(os.path.join(cfg.watermark_path, "_VERSION"))
    s1 = visible_state(spark, cfg)
    assert_state_equal(s1, oracle_replay(tbl, collection_modes=MODES))

    # save enabled → progress persists; a third run applies 0 events
    cfg.save_progress = True
    stats2 = replay(spark, cfg, MODES)
    assert stats2.n_events == tbl.num_rows  # nothing was saved before
    stats3 = replay(spark, cfg, MODES)
    assert stats3.n_events == 0

    # load disabled → saved progress ignored, full re-replay (idempotent)
    cfg.load_progress = False
    stats4 = replay(spark, cfg, MODES)
    assert stats4.n_events == tbl.num_rows
    assert_state_equal(visible_state(spark, cfg), s1)


def test_batch_never_splits_across_windows(spark, tmp_path):
    """cdc$end_of_batch contract (consumer.rs:164,197-198): a multi-row
    write batch (shared cdc$time, increasing batch_seq_no, end_of_batch
    on the last row) must never be split by a window boundary.  In this
    engine that is structural — windows filter half-open on cdc_time_ms
    and every batch row shares it — asserted here with window
    boundaries landing exactly ON batch timestamps, plus a negative
    check that the integrity checker does catch a split."""
    from pyspark.sql import functions as F

    from scylla_cdc_rust_spark.datagen.gen_log import T0_MS
    from scylla_cdc_rust_spark.functions.decode import (
        batch_integrity_violations,
        decode,
    )
    from tests.util import spark_df_via_parquet

    tbl = generate_log(LogSpec(n_events=1_000, n_docs=50, seed=19))
    df = decode(spark_df_via_parquet(spark, tbl, tmp_path / "log"))
    assert "end_of_batch" in df.columns
    # the generator emits multi-row batches: whole log is batch-atomic
    assert batch_integrity_violations(df).count() == 0
    n_multi = (
        df.groupBy("`cdc$stream_id`", "cdc_time_ms", "cdc_time_seq")
        .count().where(F.col("count") > 1).count()
    )
    assert n_multi > 0, "generator produced no multi-row batches"

    # adversarially-aligned windows (width 777 ms, boundaries falling
    # between/on batch ticks): no batch may span two window ids — one
    # aggregate over the whole log, not a per-window loop
    wid = F.floor((F.col("cdc_time_ms") - F.lit(T0_MS)) / F.lit(777))
    spans = (
        df.select("`cdc$stream_id`", "cdc_time_ms", "cdc_time_seq", wid.alias("w"))
        .groupBy("`cdc$stream_id`", "cdc_time_ms", "cdc_time_seq")
        .agg(F.countDistinct("w").alias("nw"))
        .where(F.col("nw") > 1)
        .count()
    )
    assert spans == 0

    # negative: a cut that DOES split batches (drops each batch's last
    # row) must be flagged — proves the checker detects real splits
    split = df.where(~F.col("end_of_batch"))
    assert batch_integrity_violations(split).count() > 0

    # end-to-end: small windows with boundaries on batch ticks still
    # reproduce the oracle state
    cfg = make_cfg(str(tmp_path), tbl, window_ms=5_000)
    stats = replay(spark, cfg, MODES)
    assert stats.n_batches >= 5
    assert_state_equal(visible_state(spark, cfg), oracle_replay(tbl, collection_modes=MODES))


def test_watermark_snapshot_pruning(spark, tmp_path):
    """A long replay (one commit per window) must not accumulate
    unbounded watermark snapshot dirs: only the trailing keep_versions
    survive, and resume from the pruned store still works."""
    from scylla_cdc_rust_spark.sources.checkpoints import WatermarkStore

    tbl = generate_log(LogSpec(n_events=6_000, n_docs=200, seed=71))
    cfg = make_cfg(str(tmp_path), tbl, window_ms=5_000)  # many windows
    replay(spark, cfg, MODES)

    ws = WatermarkStore(spark, cfg.watermark_path)
    v = ws.version()
    assert v >= 4  # multiple commits happened
    vdirs = [d for d in os.listdir(cfg.watermark_path)
             if d.startswith("v") and d[1:].isdigit()]
    assert len(vdirs) <= WatermarkStore.keep_versions
    assert f"v{v}" in vdirs

    # resume from the pruned store: nothing re-applied, state intact
    stats2 = replay(spark, cfg, MODES)
    assert stats2.n_events == 0
    assert_state_equal(
        visible_state(spark, cfg), oracle_replay(tbl, collection_modes=MODES)
    )


def test_repair_span_heals_late_gap(spark, tmp_path):
    """Late-arrival repair (plans.pipeline.repair_span): a time slice of
    the log surfaces only AFTER replay advanced the watermarks past it
    (a producer violating the safety interval).  repair_span re-applies
    the slice idempotently through the same fold→merge path — the final
    state equals the full-log oracle, already-applied spans can be
    over-repaired safely, and the saved watermark floors do not
    regress."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from scylla_cdc_rust_spark.model import TIME_MS
    from scylla_cdc_rust_spark.plans.pipeline import repair_span
    from scylla_cdc_rust_spark.sources.checkpoints import WatermarkStore

    tbl = generate_log(LogSpec(n_events=6_000, n_docs=200, seed=41))
    cfg = make_cfg(str(tmp_path), tbl)
    ep_dir = os.path.join(cfg.log_path, "epoch=0")

    # carve a mid-log time slice out of the on-disk log
    full = pq.read_table(ep_dir)
    times = full.column(TIME_MS)
    a = int(pc.quantile(times, q=0.4).to_pylist()[0])
    b = int(pc.quantile(times, q=0.6).to_pylist()[0])
    in_slice = pc.and_(pc.greater_equal(times, a), pc.less(times, b))
    slice_tbl = full.filter(in_slice)
    assert slice_tbl.num_rows > 0
    rest = full.filter(pc.invert(in_slice))
    import shutil

    shutil.rmtree(ep_dir)
    os.makedirs(ep_dir)
    pq.write_table(rest, os.path.join(ep_dir, "part-rest.parquet"))

    # replay advances past the gap without the slice
    replay(spark, cfg, MODES)
    floors_before = WatermarkStore(spark, cfg.watermark_path).stream_floors()

    # the slice arrives late; repair re-applies exactly [a, b)
    pq.write_table(slice_tbl, os.path.join(ep_dir, "part-late.parquet"))
    n = repair_span(spark, cfg, a, b, MODES)
    # n = the affected keys' COMPLETE histories (reset + re-fold), a
    # superset of the slice itself
    assert n >= slice_tbl.num_rows

    assert_state_equal(visible_state(spark, cfg), oracle_replay(tbl, collection_modes=MODES))
    # floors untouched — repair must not advance OR regress watermarks
    floors_after = WatermarkStore(spark, cfg.watermark_path).stream_floors()
    assert floors_after == floors_before

    # over-repair: a wider span (covering already-applied history) is a
    # no-op on the state — the merge is a join-semilattice
    lo_all = int(pc.min(times).as_py())
    hi_all = int(pc.max(times).as_py()) + 1
    repair_span(spark, cfg, lo_all, hi_all, MODES)
    assert_state_equal(visible_state(spark, cfg), oracle_replay(tbl, collection_modes=MODES))


def test_repair_span_refolds_keys_with_later_activity(spark, tmp_path):
    """The adversarial late-data shape a slice-MERGE cannot heal: the
    late span holds the NEWEST write of one cell (n_tok) and a
    set-element add, while the key has LATER applied activity (a source
    write and an element removal) — so the target's last_ord already
    exceeds every late ord and the wholesale staleness gate would drop
    a merged slice delta, and the late-added-then-removed element could
    not be adjudicated without the discarded element ord.  repair_span
    (reset + complete-history re-fold) must land the late cell write,
    keep the removed element dead, and leave untouched keys alone."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from scylla_cdc_rust_spark.model import EPOCH, TIME_MS
    from scylla_cdc_rust_spark.plans.pipeline import repair_span
    from tests.scenarios import T0, LogBuilder

    b = (
        LogBuilder()
        .insert("x", [1, 2])                # T0+1000 applied
        .update("x", tokens=[3], n_tok=7)   # T0+2000 LATE: newest n_tok write
        .add_tokens("x", [8])               # T0+3000 LATE: add, removed later
        .update("x", source="s2")           # T0+4000 applied: later activity
        .remove_tokens("x", [8])            # T0+5000 applied
        .insert("y", [9])                   # T0+6000 untouched control key
    )
    full = b.build()
    a, z = T0 + 2000, T0 + 3001
    times = full.column(TIME_MS)
    late_mask = pc.and_(pc.greater_equal(times, a), pc.less(times, z))

    cfg = make_cfg(str(tmp_path), full.filter(pc.invert(late_mask)))
    replay(spark, cfg, MODES)
    before = visible_state(spark, cfg)
    assert before["x"]["n_tok"] == 2  # late n_tok=7 not yet visible
    assert 3 not in (before["x"]["tokens"] or [])

    late = full.filter(late_mask).drop_columns([EPOCH])
    pq.write_table(
        late, os.path.join(cfg.log_path, f"{EPOCH}=0", "part-late.parquet")
    )
    n = repair_span(spark, cfg, a, z, MODES)
    assert n == 5  # doc x's complete history; y never re-folded
    healed = visible_state(spark, cfg)
    assert healed["x"]["n_tok"] == 7          # late newest cell write landed
    assert healed["x"]["tokens"] == [1, 2, 3]  # 3 added, 8 stays removed
    assert_state_equal(healed, oracle_replay(full, collection_modes=MODES))


def test_repair_crash_journal_blocks_and_recovers(spark, tmp_path):
    """A crash between the key reset and the re-fold leaves the
    _REPAIR_INPROGRESS journal: replay (and streaming) refuse to start,
    pending_repair surfaces the recorded span, and re-running
    repair_span heals the table and clears the journal."""
    import json

    import pyarrow.compute as pc

    from scylla_cdc_rust_spark.model import TIME_MS
    from scylla_cdc_rust_spark.plans.pipeline import (
        REPAIR_JOURNAL,
        pending_repair,
        repair_span,
    )
    from scylla_cdc_rust_spark.streaming.stream_pipeline import StreamingReplay

    tbl = generate_log(LogSpec(n_events=4_000, n_docs=150, seed=13))
    cfg = make_cfg(str(tmp_path), tbl)
    replay(spark, cfg, MODES)

    times = tbl.column(TIME_MS)
    lo, hi = int(pc.min(times).as_py()), int(pc.max(times).as_py())
    a, b = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
    # simulate the crash: keys reset + journal present, no re-fold
    log_df = spark.read.parquet(cfg.log_path)
    span_keys = (
        log_df.where((log_df[TIME_MS] >= a) & (log_df[TIME_MS] < b))
        .select("doc_id")
        .distinct()
    )
    table = ParquetMergeTable(spark, cfg.target_path, num_buckets=8)
    table.delete_keys(span_keys)
    with open(os.path.join(cfg.target_path, REPAIR_JOURNAL), "w") as f:
        json.dump({"begin_ms": a, "end_ms": b, "started_at_ms": 0}, f)

    with pytest.raises(RuntimeError, match="repair_span"):
        replay(spark, cfg, MODES)
    with pytest.raises(RuntimeError, match="repair_span"):
        StreamingReplay(spark, cfg, MODES)

    j = pending_repair(cfg)
    repair_span(spark, cfg, j["begin_ms"], j["end_ms"], MODES)
    assert pending_repair(cfg) is None
    assert_state_equal(visible_state(spark, cfg), oracle_replay(tbl, collection_modes=MODES))


def test_repair_span_respects_stop_at(spark, tmp_path):
    """cfg.end_timestamp_ms (stop_at) freezes every key at the bound;
    a repair must not resurrect post-stop history for the keys it
    re-folds."""
    import pyarrow.compute as pc

    from scylla_cdc_rust_spark.model import TIME_MS
    from scylla_cdc_rust_spark.plans.pipeline import repair_span

    tbl = generate_log(LogSpec(n_events=4_000, n_docs=150, seed=17))
    times = tbl.column(TIME_MS)
    lo, hi = int(pc.min(times).as_py()), int(pc.max(times).as_py())
    stop = lo + 3 * (hi - lo) // 4
    cfg = make_cfg(str(tmp_path), tbl)
    cfg.end_timestamp_ms = stop
    replay(spark, cfg, MODES)

    # repair a mid-span BELOW the stop; the re-fold must clamp at stop
    a, b = lo + (hi - lo) // 3, lo + (hi - lo) // 2
    repair_span(spark, cfg, a, b, MODES)
    frozen = oracle_replay(
        tbl.filter(pc.less(times, stop)), collection_modes=MODES
    )
    assert_state_equal(visible_state(spark, cfg), frozen)


def test_delete_keys_preserves_manifest_schema(spark, tmp_path):
    """delete_keys is schema-preserving at TABLE level: the committed
    manifest must carry the previous manifest's schema, not one rebuilt
    from the affected buckets' files (which may predate an evolved
    column that only other buckets carry)."""
    from pyspark.sql import functions as F

    tbl = generate_log(LogSpec(n_events=3_000, n_docs=120, seed=3))
    cfg = make_cfg(str(tmp_path), tbl)
    replay(spark, cfg, MODES)
    table = ParquetMergeTable(spark, cfg.target_path, num_buckets=8)
    before = table._manifest()["schema"]
    some = table.read_visible().select("doc_id").limit(5)
    table.delete_keys(some)
    assert table._manifest()["schema"] == before
