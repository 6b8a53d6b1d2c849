#!/usr/bin/env python
"""scylla-cdc-replicator analog: replay a CDC log into a target table.

Reference: /root/reference/scylla-cdc-replicator/src/main.rs (builder →
ReplicatorConsumer per stream → destination writes).  Here the same
semantics run as the declarative pipeline: generation barrier → safe
time windows → LWW fold → bucketed MERGE → per-stream checkpoints.
Re-running the command resumes from the watermark store (C4) and is
exactly-once idempotent.

    python examples/replicator.py --log-path LOG --target-path T \
        --watermark-path WM [--tokens-mode set|list] [--follow]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--log-path", required=True)
    ap.add_argument("--target-path", required=True)
    ap.add_argument("--watermark-path", required=True)
    ap.add_argument("--checkpoint-location", default="")
    ap.add_argument("--window-ms", type=int, default=60_000)
    ap.add_argument("--safety-ms", type=int, default=30_000)
    ap.add_argument("--end-timestamp-ms", type=int, default=None,
                    help="stop_at bound (log_reader.rs:60-69)")
    ap.add_argument("--tokens-mode", default="set",
                    choices=["set", "list", "map", "list_delta", "udt", "atomic"])
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--follow", action="store_true",
                    help="continuous tailing via Structured Streaming "
                         "(requires --checkpoint-location)")
    args = ap.parse_args()

    from scylla_cdc_rust_spark.config import CDCPipelineConfig
    from scylla_cdc_rust_spark.session import get_spark

    cfg = CDCPipelineConfig(
        log_path=args.log_path,
        target_path=args.target_path,
        watermark_path=args.watermark_path,
        checkpoint_location=args.checkpoint_location,
        window_size_ms=args.window_ms,
        safety_interval_ms=args.safety_ms,
        end_timestamp_ms=args.end_timestamp_ms,
    )
    modes = {"tokens": args.tokens_mode}
    spark = get_spark(app_name="cdc-replicator", cores=args.cores)

    if args.follow:
        if not cfg.checkpoint_location:
            ap.error("--follow requires --checkpoint-location")
        from scylla_cdc_rust_spark.streaming.stream_pipeline import StreamingReplay

        sr = StreamingReplay(spark, cfg, modes)
        q = sr.run_continuous(poll_interval_s=10.0)
        print("tailing; Ctrl-C for graceful stop", file=sys.stderr)
        try:
            q.awaitTermination()
        except KeyboardInterrupt:
            q.stop()
        print(f"applied {sr.n_applied} events", file=sys.stderr)
    else:
        from scylla_cdc_rust_spark.plans.pipeline import replay

        stats = replay(spark, cfg, collection_modes=modes)
        print(
            f"applied {stats.n_events} events in {stats.n_batches} windows "
            f"over epochs {stats.epochs} ({stats.events_per_sec:,.0f} ev/s)",
            file=sys.stderr,
        )
    spark.stop()


if __name__ == "__main__":
    main()
