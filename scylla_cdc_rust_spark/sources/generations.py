"""Stream-generation metadata (S2–S7, SURVEY §2.1).

The reference discovers generations and their stream sets from system
tables — vnodes: ``system_distributed.cdc_generation_timestamps`` /
``cdc_streams_descriptions_v2`` (stream_generations.rs:123-124); tablets:
``system.cdc_timestamps`` / ``cdc_streams`` filtered to Current
(stream_generations.rs:279-290) — and polls for new generations
(fetch_generations_continuously, stream_generations.rs:67-110).

Here the same metadata lives in two tiny parquet tables next to the
log (FIXTURES.md §2): ``generations (epoch, start_ms)`` and
``streams (epoch, stream_id, bucket)``.  Lookups are driver-side
(pyarrow) because the tables are O(generations) and O(streams) rows —
the analog of the reference's paged single-partition reads.  The
"continuous watcher" is a poll helper the epoch driver calls between
bounded runs.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.parquet as pq


@dataclass(frozen=True)
class Generation:
    """GenerationTimestamp analog (cdc_types.rs:174-177)."""

    epoch: int
    start_ms: int


class GenerationFetcher:
    """vnode/tablets-agnostic fetcher (stream_generations.rs:472-487)."""

    def __init__(self, meta_dir: str):
        self.gen_path = os.path.join(meta_dir, "generations.parquet")
        self.streams_path = os.path.join(meta_dir, "streams.parquet")

    def _gens(self) -> list[Generation]:
        if not os.path.exists(self.gen_path):
            return []
        t = pq.read_table(self.gen_path)
        out = [
            Generation(int(e), int(s))
            for e, s in zip(t.column("epoch").to_pylist(), t.column("start_ms").to_pylist())
        ]
        return sorted(out, key=lambda g: g.start_ms)

    # S2: all generation timestamps
    def fetch_all_generations(self) -> list[Generation]:
        return self._gens()

    # S3: greatest generation with start <= ts (stream_generations.rs:146-157)
    def fetch_generation_by_timestamp(self, ts_ms: int) -> Generation | None:
        cand = [g for g in self._gens() if g.start_ms <= ts_ms]
        return cand[-1] if cand else None

    # S4: least generation with start > ts (stream_generations.rs:159-170)
    def fetch_next_generation(self, ts_ms: int) -> Generation | None:
        cand = [g for g in self._gens() if g.start_ms > ts_ms]
        return cand[0] if cand else None

    # S5: stream ids of a generation, grouped per vnode bucket
    # (returns Vec<Vec<StreamID>> like stream_generations.rs:243-266)
    def fetch_stream_ids(self, gen: Generation) -> list[list[bytes]]:
        if not os.path.exists(self.streams_path):
            return []
        t = pq.read_table(self.streams_path)
        groups: dict[int, list[bytes]] = {}
        for e, sid, b in zip(
            t.column("epoch").to_pylist(),
            t.column("stream_id").to_pylist(),
            t.column("bucket").to_pylist(),
        ):
            if int(e) == gen.epoch:
                groups.setdefault(int(b), []).append(bytes(sid))
        return [groups[b] for b in sorted(groups)]

    # S7: continuous watcher — poll until a generation newer than `after`
    # appears or the deadline passes (fetch_generations_continuously)
    def wait_for_next_generation(
        self, after_ms: int, sleep_s: float = 0.2, timeout_s: float = 5.0
    ) -> Generation | None:
        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            g = self.fetch_next_generation(after_ms)
            if g is not None:
                return g
            time.sleep(sleep_s)
        return None


def write_generation_metadata(
    meta_dir: str, generations: list[Generation], streams: list[tuple[int, bytes, int]]
) -> None:
    """Persist the metadata sidecar tables (test/generator helper)."""
    os.makedirs(meta_dir, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "epoch": pa.array([g.epoch for g in generations], pa.int32()),
                "start_ms": pa.array([g.start_ms for g in generations], pa.int64()),
            }
        ),
        os.path.join(meta_dir, "generations.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "epoch": pa.array([e for e, _, _ in streams], pa.int32()),
                "stream_id": pa.array([s for _, s, _ in streams], pa.binary()),
                "bucket": pa.array([b for _, _, b in streams], pa.int32()),
            }
        ),
        os.path.join(meta_dir, "streams.parquet"),
    )
