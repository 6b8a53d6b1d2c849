#!/usr/bin/env python
"""CDC log → lake table → INCREMENTAL curation of changed documents.

The composition the engine exists for: each run tails the change log
(resuming from watermarks), commits a new snapshot of the tokenized
table, then re-curates ONLY the documents the snapshot changelog says
changed — token-level repetition signals (operators/repetition.py,
Gopher boilerplate rules on the token arrays) plus a keep flag —
and upserts them into a versioned curated-signals table.  Unchanged
documents are never re-read: the changelog is pruned to changed
buckets by the manifest diff (operators/merge.read_changes), so the
per-run cost is O(changed docs), independent of corpus size.

    python examples/incremental_curation.py --log-path LOG \
        --target-path T --watermark-path WM --curated-out CUR \
        [--stop-at-ms MS] [--max-dup2 0.5] [--cores 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _signals(df):
    from pyspark.sql import functions as F

    from scylla_cdc_rust_spark.operators.repetition import (
        array_repetition_signals,
    )

    toks = F.coalesce(F.col("tokens"), F.array().cast("array<int>"))
    top2, dup2, top3, dup3 = array_repetition_signals(toks, (2, 3))
    return df.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tok"),
        top2, dup2, top3, dup3,
    )


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--log-path", required=True)
    ap.add_argument("--target-path", required=True)
    ap.add_argument("--watermark-path", required=True)
    ap.add_argument("--curated-out", required=True)
    ap.add_argument("--stop-at-ms", type=int, default=None)
    ap.add_argument("--max-dup2", type=float, default=0.5,
                    help="drop docs whose duplicate-2gram fraction exceeds this")
    ap.add_argument("--tokens-mode", default="list",
                    choices=["set", "list", "map", "list_delta", "atomic"])
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from scylla_cdc_rust_spark.config import CDCPipelineConfig
    from scylla_cdc_rust_spark.operators.merge import ParquetMergeTable
    from scylla_cdc_rust_spark.plans.pipeline import replay
    from scylla_cdc_rust_spark.session import get_spark

    cfg = CDCPipelineConfig(
        log_path=args.log_path,
        target_path=args.target_path,
        watermark_path=args.watermark_path,
        end_timestamp_ms=args.stop_at_ms,
    )
    spark = get_spark(app_name="cdc-incremental-curation", cores=args.cores)
    stats = replay(spark, cfg, collection_modes={"tokens": args.tokens_mode})
    print(f"replayed {stats.n_events} events", file=sys.stderr)

    table = ParquetMergeTable(
        spark, cfg.target_path, num_buckets=cfg.target_num_buckets
    )
    v_now = table.version()
    os.makedirs(args.curated_out, exist_ok=True)
    state_file = os.path.join(args.curated_out, "state.json")
    state = (json.load(open(state_file))
             if os.path.exists(state_file) else {"curated_version": None})
    v_prev = state["curated_version"]

    keep = F.col("dup2_frac") <= F.lit(args.max_dup2)
    if v_prev is None:
        # first run: curate the full visible corpus
        curated = _signals(table.read_visible()).withColumn("keep", keep)
        n_changed, n_deleted = curated.count(), 0
    elif v_prev == v_now:
        print(json.dumps({"curated_version": v_now, "n_changed": 0,
                          "n_deleted": 0, "noop": True}), file=sys.stderr)
        spark.stop()
        return
    else:
        ch = table.read_changes(v_prev, v_now)
        old = spark.read.parquet(
            os.path.join(args.curated_out, f"data-v{v_prev}")
        )
        if ch is None:
            changed_ids = old.limit(0).select("doc_id")
            fresh = _signals(table.read_visible().limit(0))
        else:
            changed_ids = ch.select("doc_id")
            fresh = _signals(ch.where(F.col("change_type") != "DELETE"))
        n_deleted = 0 if ch is None else (
            ch.where(F.col("change_type") == "DELETE").count()
        )
        fresh = fresh.withColumn("keep", keep)
        n_changed = fresh.count()
        # upsert: drop every changed key from the previous curated set,
        # then append the re-curated survivors (DELETEs simply drop out)
        curated = old.join(changed_ids, "doc_id", "left_anti").unionByName(fresh)

    out_dir = os.path.join(args.curated_out, f"data-v{v_now}")
    curated.write.mode("overwrite").parquet(out_dir)
    with open(state_file + ".tmp", "w") as f:
        json.dump({"curated_version": v_now}, f)
    os.replace(state_file + ".tmp", state_file)  # atomic pointer flip
    n_total = spark.read.parquet(out_dir).count()
    print(json.dumps({"curated_version": v_now, "n_changed": n_changed,
                      "n_deleted": n_deleted, "n_total": n_total}),
          file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
