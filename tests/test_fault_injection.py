"""Fault injection: a micro-batch that crashes after partial work must
converge on rerun (fault_retry fixture; reference analog: TimeoutSession
retry with no data loss, stream_reader.rs:587-627,783-824)."""

import os

import pytest

from scylla_cdc_rust_spark.config import CDCPipelineConfig
from scylla_cdc_rust_spark.datagen.gen_log import LogSpec, generate_log, write_log
from scylla_cdc_rust_spark.datagen.oracle import oracle_replay
from scylla_cdc_rust_spark.operators.merge import ParquetMergeTable
from scylla_cdc_rust_spark.plans.pipeline import replay
from tests.util import assert_state_equal, normalize_engine

MODES = {"tokens": "set"}


def test_transient_error_retries_then_succeeds():
    """R2 (stream_reader.rs:156-186): transient failures retry with
    backoff and eventually succeed."""
    from scylla_cdc_rust_spark.operators.faults import retry_with_backoff

    calls = {"n": 0}
    sleeps = []

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise OSError(110, "Connection timed out")  # ETIMEDOUT
        return "ok"

    assert retry_with_backoff(flaky, sleep=sleeps.append) == "ok"
    assert calls["n"] == 3
    assert len(sleeps) == 2 and sleeps[1] > sleeps[0]  # exponential


def test_fatal_error_fails_fast_no_retry():
    """R1 (stream_reader.rs:97-154): a fatal class (corrupt/unparseable
    data) propagates immediately — exactly one attempt, no retry storm."""
    import pytest as _pytest

    from scylla_cdc_rust_spark.operators.faults import (
        is_transient_error,
        retry_with_backoff,
    )

    calls = {"n": 0}

    def corrupt():
        calls["n"] += 1
        raise ValueError("malformed cell payload")

    with _pytest.raises(ValueError):
        retry_with_backoff(corrupt, sleep=lambda s: None)
    assert calls["n"] == 1

    # classifier spot checks against the reference's table
    assert is_transient_error(TimeoutError())
    assert is_transient_error(OSError(110, "timed out"))
    assert not is_transient_error(ValueError("syntax"))
    assert not is_transient_error(KeyError("schema"))


def test_corrupt_log_file_aborts_replay(spark, tmp_path):
    """Fatal end-to-end: a corrupt parquet file in the change log must
    abort the replay loudly (the reference propagates parse errors,
    stream_reader.rs:113-139) — never silently skip or retry forever."""
    import time

    tmp = str(tmp_path)
    tbl = generate_log(LogSpec(n_events=2_000, n_docs=100, seed=47))
    cfg = CDCPipelineConfig(
        log_path=os.path.join(tmp, "log"),
        target_path=os.path.join(tmp, "t"),
        watermark_path=os.path.join(tmp, "wm"),
        window_size_ms=1 << 60,
        target_num_buckets=4,
    )
    write_log(tbl, cfg.log_path)
    ep_dir = os.path.join(cfg.log_path, "epoch=0")
    with open(os.path.join(ep_dir, "part-corrupt.parquet"), "wb") as f:
        f.write(b"PAR1 this is not parquet")

    t0 = time.time()
    with pytest.raises(Exception):
        replay(spark, cfg, MODES)
    assert time.time() - t0 < 60, "fatal input must fail fast, not retry-storm"


def test_crash_between_merge_and_checkpoint_converges(spark, tmp_path):
    """Simulate the worst crash point: target committed, watermark not.
    The rerun re-reads the window; the LWW staleness gate and watermark
    filter make re-application a no-op."""
    tmp = str(tmp_path)
    tbl = generate_log(LogSpec(n_events=6_000, n_docs=250, seed=41, n_epochs=2))
    cfg = CDCPipelineConfig(
        log_path=os.path.join(tmp, "log"),
        target_path=os.path.join(tmp, "t"),
        watermark_path=os.path.join(tmp, "wm"),
        window_size_ms=300_000,
        target_num_buckets=8,
    )
    write_log(tbl, cfg.log_path)
    replay(spark, cfg, MODES)

    # crash simulation: roll the watermark store back 2 versions — the
    # target now contains work the checkpoint doesn't know about
    versions = sorted(
        int(d[1:]) for d in os.listdir(cfg.watermark_path) if d.startswith("v")
    )
    # snapshot pruning keeps exactly keep_versions (3) trailing dirs —
    # enough for this 2-version rollback, which is why 3 is the default
    assert len(versions) == 3
    with open(os.path.join(cfg.watermark_path, "_VERSION"), "w") as f:
        f.write(str(versions[-3]))

    before = normalize_engine(
        ParquetMergeTable(spark, cfg.target_path, num_buckets=8).read_visible().collect()
    )
    stats = replay(spark, cfg, MODES)  # rerun resumes from stale checkpoint
    assert stats.n_events > 0  # some windows re-applied
    after = normalize_engine(
        ParquetMergeTable(spark, cfg.target_path, num_buckets=8).read_visible().collect()
    )
    assert_state_equal(after, before)
    assert_state_equal(after, oracle_replay(tbl, collection_modes=MODES))


def test_torn_merge_commit_is_invisible(spark, tmp_path):
    """A merge that wrote data files but never flipped _VERSION leaves the
    table at the old snapshot (atomic commit property)."""
    tmp = str(tmp_path)
    tbl = generate_log(LogSpec(n_events=2_000, n_docs=100, seed=43))
    cfg = CDCPipelineConfig(
        log_path=os.path.join(tmp, "log"),
        target_path=os.path.join(tmp, "t"),
        watermark_path=os.path.join(tmp, "wm"),
        window_size_ms=1 << 60,
        target_num_buckets=4,
    )
    write_log(tbl, cfg.log_path)
    replay(spark, cfg, MODES)
    table = ParquetMergeTable(spark, cfg.target_path, num_buckets=4)
    v = table.version()
    before = normalize_engine(table.read_visible().collect())

    # orphan data from a "crashed" merge: data dir exists, no manifest flip
    os.makedirs(os.path.join(cfg.target_path, "data", f"v{v + 1}", "__bucket=0"))
    with open(
        os.path.join(cfg.target_path, "data", f"v{v + 1}", "__bucket=0", "junk.parquet"),
        "wb",
    ) as f:
        f.write(b"not a real commit")

    t2 = ParquetMergeTable(spark, cfg.target_path, num_buckets=4)
    assert t2.version() == v
    assert_state_equal(normalize_engine(t2.read_visible().collect()), before)
    # vacuum clears the orphan
    t2.vacuum()
    assert not os.path.exists(os.path.join(cfg.target_path, "data", f"v{v + 1}"))
