#!/usr/bin/env python
"""CDC log → replayed lake table → packed training sequences.

The end-to-end shape the north rule describes: tail a ScyllaDB CDC log
of tokenized-sequence changes, apply it exactly-once into the bucketed
lake table, then lay the *current* corpus out as fixed-length training
packs (operators/packing.py — hash-sharded, no global serial offset).
Re-running resumes from watermarks; the pack layout is deterministic,
so unchanged documents land in the same shard order every run.

    python examples/train_pipeline.py --log-path LOG --target-path T \
        --watermark-path WM --packs-out PACKS [--seq-len 2048] \
        [--n-shards 8] [--tokens-mode set|list]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--log-path", required=True)
    ap.add_argument("--target-path", required=True)
    ap.add_argument("--watermark-path", required=True)
    ap.add_argument("--packs-out", required=True,
                    help="output dir: pack assignments parquet + manifest")
    ap.add_argument("--seq-len", type=int, default=2048)
    ap.add_argument("--n-shards", type=int, default=8)
    ap.add_argument("--tokens-mode", default="set",
                    choices=["set", "list", "map", "list_delta", "udt", "atomic"])
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from scylla_cdc_rust_spark.config import CDCPipelineConfig
    from scylla_cdc_rust_spark.operators.merge import ParquetMergeTable
    from scylla_cdc_rust_spark.operators.packing import pack_offsets
    from scylla_cdc_rust_spark.plans.pipeline import replay
    from scylla_cdc_rust_spark.session import get_spark

    cfg = CDCPipelineConfig(
        log_path=args.log_path,
        target_path=args.target_path,
        watermark_path=args.watermark_path,
    )
    spark = get_spark(app_name="cdc-train-pipeline", cores=args.cores)

    stats = replay(spark, cfg, collection_modes={"tokens": args.tokens_mode})
    print(f"replayed {stats.n_events} events in {stats.n_batches} windows",
          file=sys.stderr)

    table = ParquetMergeTable(
        spark, cfg.target_path, num_buckets=cfg.target_num_buckets
    )
    docs = table.read_visible()
    # the replayed table is already tokenized: pack on n_tok directly
    # (fall back to the token array's length, then 0, for rows whose
    # change history never set n_tok)
    offs = pack_offsets(
        docs, seq_len=args.seq_len, n_shards=args.n_shards,
        tok_count=F.coalesce(
            F.col("n_tok").cast("long"),
            F.size("tokens").cast("long"),
            F.lit(0),
        ),
    )
    os.makedirs(args.packs_out, exist_ok=True)
    offs.write.mode("overwrite").parquet(
        os.path.join(args.packs_out, "assignments")
    )
    acct = (
        offs.groupBy("shard")
        .agg(F.sum("n_tok").alias("toks"), (F.max("last_pack") + 1).alias("packs"))
        .agg(
            F.count(F.lit(1)).alias("n_shards"),
            F.sum("toks").cast("long").alias("n_tokens"),
            F.sum("packs").cast("long").alias("n_packs"),
        )
        .first()
    )
    manifest = {
        "table_version": table.version(),
        "seq_len": args.seq_len,
        "n_shards": int(acct["n_shards"]),
        "n_tokens": int(acct["n_tokens"]),
        "n_packs": int(acct["n_packs"]),
    }
    with open(os.path.join(args.packs_out, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    print(json.dumps(manifest), file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
