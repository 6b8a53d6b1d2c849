#!/usr/bin/env python
"""Per-query isolation probe (guide §1): times individual registered
queries with the same .count() methodology as bench.py, plus an optional
noop-sink run and .explain("formatted") capture.

Usage:
    python bench_extra.py <query> [<query> ...] [--reps N] [--noop]
        [--explain OUT.txt] [--sf DIR]

Never used by the driver; bench.py stays the frozen measurement harness.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    noop = False
    explain_out = None
    sf_dir = SF_DIR
    names = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--reps":
            reps = int(args[i + 1]); i += 2
        elif a == "--noop":
            noop = True; i += 1
        elif a == "--explain":
            explain_out = args[i + 1]; i += 2
        elif a == "--sf":
            sf_dir = args[i + 1]; i += 2
        else:
            names.append(a); i += 1

    from scylla_cdc_rust_spark.queries import QUERIES
    from scylla_cdc_rust_spark.session import get_spark

    spark = get_spark(app_name="bench-extra", cores=CPUS)
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        if explain_out:
            df = QUERIES[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = explain_out if len(names) == 1 else f"{explain_out}.{name}"
            with open(path, "w") as f:
                f.write(txt)
            print(f"{name}: wrote plan to {path}", flush=True)
        samples = []
        for r in range(reps):
            t0 = time.time()
            df = QUERIES[name](spark, sf_dir)
            if noop:
                df.write.format("noop").mode("overwrite").save()
                n = "-"
            else:
                n = df.count()
            dt = time.time() - t0
            samples.append(dt)
            print(f"{name} rep{r}: {dt:.3f}s ({n} rows)", flush=True)
        s = sorted(samples)
        print(f"{name}: median {s[len(s) // 2]:.3f}s of "
              f"{[round(x, 3) for x in samples]}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
