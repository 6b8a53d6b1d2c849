"""Pipeline configuration — the analog of CDCLogReaderBuilder.

Reference: /root/reference/scylla-cdc/src/log_reader.rs:318-561 (builder
with window_size/safety_interval/sleep_interval/start/end/progress
options; defaults at log_reader.rs:40-44).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class CDCPipelineConfig:
    # paths
    log_path: str = ""  # change-log table (parquet dir)
    target_path: str = ""  # destination tokenized-sequences table
    watermark_path: str = ""  # per-stream watermark/checkpoint table
    checkpoint_location: str = ""  # Structured Streaming checkpoint dir

    # windowing (reference defaults: log_reader.rs:40-44; seconds → ms)
    window_size_ms: int = 60_000
    safety_interval_ms: int = 30_000
    start_timestamp_ms: int = 0
    end_timestamp_ms: int | None = None  # stop_at (log_reader.rs:60-69)

    # layout / scale knobs
    num_shuffle_partitions: int = 32
    target_num_buckets: int = 32  # target-table hash buckets (4096 at 100 TB)
    salt_factor: int = 8  # hot-stream salting fan-out (north rule)
    hot_key_threshold: int = 100_000  # events per key per batch → salt

    # payload column collection modes (model.COLLECTION_MODES)
    collection_modes: dict[str, str] = field(
        default_factory=lambda: {"tokens": "set"}
    )
    # physical strategy for 'set'-mode columns (operators.fold.fold_delta):
    # 'elements' | 'arrays' | 'auto' (sample element fan-out, pick arrays
    # for wide deltas — fewer shuffled bytes — else elements)
    set_impl: str = "auto"

    # streaming
    max_files_per_trigger: int = 64

    # exactly-once / lineage
    keep_tombstones: bool = True  # retain delete tombstones for stale-replay safety

    # maintenance: drop superseded COW bucket dirs every N applied
    # windows (directory-scan only, no data rewrite; 0 = never)
    vacuum_every_batches: int = 16
