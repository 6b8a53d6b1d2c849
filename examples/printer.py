#!/usr/bin/env python
"""scylla-cdc-printer analog: pretty-print every change in a CDC log.

Reference: /root/reference/scylla-cdc-printer/src/printer.rs (main at
main.rs — builder → PrinterConsumerFactory → start).  Same shape here:
config → consumer factory → per-stream ordered delivery.

    python examples/printer.py --log-path /path/to/cdc_log [--limit 50]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--log-path", required=True, help="CDC log parquet dir")
    ap.add_argument("--cores", type=int, default=4)
    ap.add_argument("--limit", type=int, default=100, help="max lines printed")
    args = ap.parse_args()

    from scylla_cdc_rust_spark.functions.decode import decode
    from scylla_cdc_rust_spark.model import CDCSchema
    from scylla_cdc_rust_spark.operators.consumer_api import printer
    from scylla_cdc_rust_spark.session import get_spark

    spark = get_spark(app_name="cdc-printer", cores=args.cores)
    log = decode(spark.read.parquet(args.log_path))
    payload = list(CDCSchema.from_df_schema(log.schema).payload)
    for row in printer(log, payload).limit(args.limit).collect():
        print(row["line"])
    spark.stop()


if __name__ == "__main__":
    main()
