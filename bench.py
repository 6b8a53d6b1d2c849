#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

Headline workload: end-to-end CDC replay (generate → decode → watermark
filter → LWW fold → bucketed MERGE → checkpoint) of a deterministic
synthetic change log, plus the oracle-checked operator queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).

Scaling evidence (BASELINE.json north rule: ≥0.8 efficiency N→4N):
``python bench.py --scaling`` runs the identical replay at local[8] and
local[32] and reports both throughputs + efficiency (also appended to
BENCH/BASELINE.md by hand — see that file).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_EVENTS = int(os.environ.get("BENCH_CDC_EVENTS", "2000000"))
N_DOCS = int(os.environ.get("BENCH_CDC_DOCS", "200000"))

# every driver-gate query is timed (VERDICT r3 #3: an untimed query is
# an invisible regression); populated from the registry at runtime so a
# new queries.py entry can never be silently missing here
BENCH_QUERIES: list[str] = []  # filled in main() from queries.QUERIES

#: per-query repetitions inside the ONE warm JVM; the median is
#: reported.  The sandbox host drifts ±40% across runs (BENCH.md), so
#: cross-run comparisons need medians of same-session samples.
QUERY_REPS = int(os.environ.get("BENCH_QUERY_REPS", "3"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_log_dir(tmp: str) -> tuple[str, int]:
    from scylla_cdc_rust_spark.datagen.gen_log import LogSpec, generate_log, write_log

    spec = LogSpec(
        n_events=N_EVENTS,
        n_docs=N_DOCS,
        n_streams=256,
        n_epochs=2,
        hot_doc_frac=0.02,  # mild skew, exercised by partial aggregation
        seed=42,
    )
    t0 = time.time()
    tbl = generate_log(spec)
    path = write_log(tbl, os.path.join(tmp, "cdc_log"), files_per_epoch=CPUS)
    log(f"generated {tbl.num_rows} events in {time.time() - t0:.1f}s")
    return path, tbl.num_rows


def run_replay(
    spark, log_path: str, tmp: str, tag: str, mode: str = "list"
) -> tuple[float, float, int]:
    """mode='list': whole-array overwrite — the tokenized-training-sequences
    fast path fixed by BASELINE.json input_hint (SURVEY.md §2.4 A8).
    mode='set': element-level delta semantics (the general path)."""
    from scylla_cdc_rust_spark.config import CDCPipelineConfig
    from scylla_cdc_rust_spark.plans.pipeline import replay

    cfg = CDCPipelineConfig(
        log_path=log_path,
        target_path=os.path.join(tmp, f"target_{tag}"),
        watermark_path=os.path.join(tmp, f"wm_{tag}"),
        window_size_ms=1 << 60,  # one window per epoch: throughput mode
        target_num_buckets=max(32, CPUS),
        set_impl=os.environ.get("BENCH_SET_IMPL", "auto"),
    )
    stats = replay(spark, cfg, collection_modes={"tokens": mode})
    return stats.seconds, stats.events_per_sec, stats.n_events


def session(cores: int):
    from scylla_cdc_rust_spark.session import get_spark

    return get_spark(app_name=f"bench-{cores}", cores=cores)


def replay_only(cores: int, log_path: str) -> None:
    """Subprocess mode: cold JVM, JIT warmup on a small log, then one
    measured replay.  Prints one JSON line with events_per_sec."""
    from scylla_cdc_rust_spark.datagen.gen_log import LogSpec, generate_log, write_log

    tmp = tempfile.mkdtemp(prefix=f"cdc_replay_{cores}_")
    try:
        spark = session(cores)
        warm = generate_log(LogSpec(n_events=150_000, n_docs=20_000, seed=1))
        write_log(warm, os.path.join(tmp, "warm"), files_per_epoch=cores)
        run_replay(spark, os.path.join(tmp, "warm"), tmp, "warm")
        # optional start barrier: concurrent multi-JVM A/B runs line up
        # their measured phases here (benchmarks/multi_jvm_ab.py)
        bdir = os.environ.get("BENCH_BARRIER_DIR")
        if bdir:
            need = int(os.environ.get("BENCH_BARRIER_N", "2"))
            open(os.path.join(bdir, f"ready.{os.getpid()}"), "w").close()
            while sum(f.startswith("ready.") for f in os.listdir(bdir)) < need:
                time.sleep(0.5)
        # best-of-N: the sandbox host has high run-to-run variance
        reps = int(os.environ.get("BENCH_REPLAY_REPS", "2"))
        mode = os.environ.get("BENCH_TOKENS_MODE", "list")
        best = None
        for i in range(reps):
            sec, eps, applied = run_replay(spark, log_path, tmp, f"measured{i}", mode)
            log(f"local[{cores}] rep{i}: {sec:.1f}s {eps:,.0f} ev/s")
            if best is None or sec < best[0]:
                best = (sec, eps, applied)
        sec, eps, applied = best
        print(json.dumps({"cores": cores, "seconds": round(sec, 3),
                          "events_per_sec": round(eps), "n_events": applied}))
        spark.stop()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _subprocess_replay(cores: int, log_path: str, reps: int = 1) -> dict:
    import subprocess

    env = dict(os.environ)
    env["BENCH_REPLAY_REPS"] = str(reps)
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--replay-only",
         str(cores), log_path],
        capture_output=True, text=True, env=env, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    scaling = "--scaling" in sys.argv
    if "--replay-only" in sys.argv:
        i = sys.argv.index("--replay-only")
        replay_only(int(sys.argv[i + 1]), sys.argv[i + 2])
        return
    tmp = tempfile.mkdtemp(prefix="cdc_bench_")
    results: dict[str, float] = {}
    extras: dict = {}
    try:
        log_path, n_events = make_log_dir(tmp)

        spark = session(CPUS)
        # headline: end-to-end replay (after JIT warmup, as a steady-state
        # throughput measurement — cold-start cost reported separately).
        # 'list' = the tokenized-sequences fast path (input_hint shape);
        # 'set' = element-delta generality path.
        warm_sec, _, _ = run_replay(spark, log_path, tmp, "warmup", "list")
        sec, eps, applied = run_replay(spark, log_path, tmp, f"c{CPUS}", "list")
        results[f"cdc_replay_{n_events // 1000}k_events"] = round(sec, 3)
        extras["replay_events_per_sec"] = round(eps)
        extras["replay_cold_start_sec"] = round(warm_sec, 3)
        extras["replay_n_events"] = applied
        log(f"replay[list] local[{CPUS}]: {sec:.1f}s  {eps:,.0f} events/s (cold {warm_sec:.1f}s)")
        sec_s, eps_s, _ = run_replay(spark, log_path, tmp, "setmode", "set")
        results[f"cdc_replay_setmode_{n_events // 1000}k_events"] = round(sec_s, 3)
        extras["replay_setmode_events_per_sec"] = round(eps_s)
        log(f"replay[set] local[{CPUS}]: {sec_s:.1f}s  {eps_s:,.0f} events/s")

        # operator queries on driver testdata: ALL registered queries,
        # median of QUERY_REPS runs each, one warm JVM (build + exec
        # timed together — plan-build cost is part of query latency)
        from scylla_cdc_rust_spark.queries import QUERIES

        names = BENCH_QUERIES or list(QUERIES)
        for name in names:
            samples = []
            n = None
            for _ in range(QUERY_REPS):
                t0 = time.time()
                n = QUERIES[name](spark, SF_DIR).count()
                samples.append(time.time() - t0)
            samples.sort()
            dt = samples[len(samples) // 2]
            results[name] = round(dt, 3)
            log(f"{name}: median {dt:.2f}s of {[round(s, 2) for s in samples]}"
                f" ({n} rows)")

        # production-hash decontamination (hash_impl='xxhash64'): no
        # DuckDB oracle (JVM-only hash) — correctness is pinned by the
        # portable-vs-xxhash64 parity pytest; timed here so the fast
        # path has regression visibility (VERDICT r3 #5)
        from pyspark.sql import functions as SF

        from scylla_cdc_rust_spark.operators.decontam import ngram_contamination
        from scylla_cdc_rust_spark.operators.sampling import sample_hash

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        bench_flag = sample_hash("doc_id", 16) == SF.lit(0)
        samples = []
        for _ in range(QUERY_REPS):
            t0 = time.time()
            ngram_contamination(
                docs.where(~bench_flag), docs.where(bench_flag),
                n=3, hash_impl="xxhash64",
            ).count()
            samples.append(time.time() - t0)
        samples.sort()
        results["doc_ngram_contamination_xxh"] = round(
            samples[len(samples) // 2], 3
        )
        log(f"doc_ngram_contamination_xxh: median "
            f"{results['doc_ngram_contamination_xxh']:.2f}s")
        spark.stop()

        if scaling:
            # N vs 4N in SEPARATE processes (cold JVMs + in-process JIT
            # warmup each) — the sandbox evidence for the two-cluster-size
            # criterion (BASELINE.md).  The host's absolute throughput
            # drifts over tens of minutes, so the two levels are measured
            # in adjacent PAIRS and the median per-pair efficiency is
            # reported.
            lo_cores = max(2, CPUS // 4)
            pairs = []
            n_pairs = int(os.environ.get("BENCH_SCALING_PAIRS", "3"))
            for i in range(n_pairs):
                lo = _subprocess_replay(lo_cores, log_path)
                hi = _subprocess_replay(CPUS, log_path)
                eff = (hi["events_per_sec"] / lo["events_per_sec"]) / (CPUS / lo_cores)
                pairs.append((lo["events_per_sec"], hi["events_per_sec"], round(eff, 3)))
                log(f"pair {i}: local[{lo_cores}] {lo['events_per_sec']:,} → "
                    f"local[{CPUS}] {hi['events_per_sec']:,} ev/s, eff {eff:.2f}")
            effs = sorted(p[2] for p in pairs)
            med = effs[len(effs) // 2]
            extras["scaling"] = {
                "pairs": [
                    {f"local[{lo_cores}]": p[0], f"local[{CPUS}]": p[1], "efficiency": p[2]}
                    for p in pairs
                ],
                "median_efficiency": med,
            }
            log(f"scaling median efficiency over {n_pairs} pairs: {med:.2f}")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    out = {
        "metric": "end-to-end CDC replay + operator suite wall time",
        "value": round(sum(results.values()), 3),
        "unit": "sec",
        "queries": results,
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        **extras,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
