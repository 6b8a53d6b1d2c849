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


def _bench_decontam_modes(spark, tmp: str, results: dict, extras: dict) -> None:
    """Portable (md5, oracle-checkable) vs xxhash64 (production)
    contamination on a MULTI-FILE corpus layout, interleaved.

    The sf testdata is one parquet file per table, so both modes used to
    drown in single-scan scheduling overhead and the driver artifact
    could never see the production-hash win (VERDICT r4 #1).  The corpus
    is rewritten once into ≥CPUS files — the layout any real corpus has
    — and the two modes alternate inside the same warm JVM so host
    drift cancels."""
    from pyspark.sql import functions as SF

    from scylla_cdc_rust_spark.operators.decontam import ngram_contamination
    from scylla_cdc_rust_spark.operators.sampling import sample_hash

    mf = os.path.join(tmp, "docs_mf")
    spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(
        CPUS
    ).write.mode("overwrite").parquet(mf)
    docs = spark.read.parquet(mf)
    bench_flag = sample_hash("doc_id", 16) == SF.lit(0)
    corpus, benchmark = docs.where(~bench_flag), docs.where(bench_flag)
    legs: dict[str, list] = {"portable": [], "xxhash64": []}
    for _ in range(QUERY_REPS):
        for impl in ("portable", "xxhash64"):
            t0 = time.time()
            ngram_contamination(corpus, benchmark, n=3, hash_impl=impl).count()
            legs[impl].append(round(time.time() - t0, 3))
    for impl, key in (("portable", "doc_ngram_contamination_mf"),
                      ("xxhash64", "doc_ngram_contamination_xxh")):
        s = sorted(legs[impl])
        results[key] = s[len(s) // 2]
        log(f"{key}: median {results[key]:.2f}s of {legs[impl]} (multi-file)")
    extras["decontam_legs"] = legs


def _bench_changelog_split(spark, tmp: str, results: dict) -> None:
    """engine_changelog cost attribution (VERDICT r4 #7): the driver
    query builds TWO COW snapshots and then diffs them; one timing hid
    which half regressed.  Reproduce the same scenario and time the
    halves separately."""
    from pyspark.sql import functions as SF

    from scylla_cdc_rust_spark import model as M
    from scylla_cdc_rust_spark.functions.decode import decode
    from scylla_cdc_rust_spark.operators.fold import fold_delta
    from scylla_cdc_rust_spark.operators.merge import ParquetMergeTable
    from scylla_cdc_rust_spark.queries import _cdc_shaped_log

    setup_s, diff_s = [], []
    for i in range(QUERY_REPS):
        t0 = time.time()
        log_df = _cdc_shaped_log(spark, SF_DIR)
        cut = log_df.agg(
            ((SF.min(M.TIME_MS) + SF.max(M.TIME_MS)) / 2).cast("long")
        ).first()[0]
        table = ParquetMergeTable(
            spark, os.path.join(tmp, f"chsplit_{i}"), num_buckets=8
        )
        for half in (
            log_df.where(SF.col(M.TIME_MS) <= cut),
            log_df.where(SF.col(M.TIME_MS) > cut),
        ):
            delta = fold_delta(decode(half), collection_modes={"tokens": "set"})
            table.merge(
                delta,
                payload=["tokens", "n_tok", "source"],
                collection_modes={"tokens": "set"},
                assume_all_buckets=True,
            )
        setup_s.append(time.time() - t0)
        t0 = time.time()
        table.read_changes(1, 2).count()
        diff_s.append(time.time() - t0)
    for key, ss in (("engine_changelog_setup", setup_s),
                    ("engine_changelog_diff", diff_s)):
        ss.sort()
        results[key] = round(ss[len(ss) // 2], 3)
        log(f"{key}: median {results[key]:.2f}s")


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
        # headline: end-to-end replay after JIT warmup.  'list' = the
        # tokenized-sequences fast path (input_hint shape); 'set' =
        # element-delta generality path.  The two modes run as
        # INTERLEAVED legs (list, set, list, set, ...) and the medians
        # are reported with the raw legs alongside — the sandbox host
        # drifts enough that a single sample once published a phantom
        # 1.8× regression (VERDICT r4 #2); interleaving cancels drift
        # the same way the scaling sandwich does.
        warm_sec, _, _ = run_replay(spark, log_path, tmp, "warmup", "list")
        legs: dict[str, list] = {"list": [], "set": []}
        applied = n_events
        n_pairs = int(os.environ.get("BENCH_REPLAY_PAIRS", "3"))
        for i in range(n_pairs):
            for mode in ("list", "set"):
                sec_i, eps_i, applied = run_replay(
                    spark, log_path, tmp, f"{mode}{i}", mode
                )
                legs[mode].append((round(sec_i, 3), round(eps_i)))
                log(f"replay[{mode}] leg {i}: {sec_i:.1f}s {eps_i:,.0f} ev/s")

        def med(mode):
            s = sorted(x[0] for x in legs[mode])
            return s[len(s) // 2]

        sec, sec_s = med("list"), med("set")
        results[f"cdc_replay_{n_events // 1000}k_events"] = sec
        results[f"cdc_replay_setmode_{n_events // 1000}k_events"] = sec_s
        extras["replay_events_per_sec"] = round(applied / sec)
        extras["replay_setmode_events_per_sec"] = round(applied / sec_s)
        extras["replay_cold_start_sec"] = round(warm_sec, 3)
        extras["replay_n_events"] = applied
        extras["replay_legs"] = legs
        log(f"replay medians over {n_pairs} interleaved pairs: "
            f"list {sec:.1f}s ({applied / sec:,.0f} ev/s), "
            f"set {sec_s:.1f}s ({applied / sec_s:,.0f} ev/s)")

        # operator queries on driver testdata: ALL registered queries
        # (the registry-driven sweep — a new queries.py entry can never
        # be silently missing here), median of QUERY_REPS runs each,
        # one warm JVM (build + exec timed together — plan-build cost
        # is part of query latency)
        from scylla_cdc_rust_spark.operators import dedup_docs
        from scylla_cdc_rust_spark.queries import QUERIES

        for name in list(QUERIES):
            samples = []
            n = None
            for _ in range(QUERY_REPS):
                t0 = time.time()
                n = QUERIES[name](spark, SF_DIR).count()
                samples.append(time.time() - t0)
            samples.sort()
            dt = samples[len(samples) // 2]
            results[name] = round(dt, 3)
            note = ""
            if name.startswith("doc_dedup_clusters") and (
                dedup_docs.LAST_CONVERGENCE_ROUNDS is not None
            ):
                extras[f"{name}_cc_rounds"] = dedup_docs.LAST_CONVERGENCE_ROUNDS
                note = f", {dedup_docs.LAST_CONVERGENCE_ROUNDS} cc rounds"
            log(f"{name}: median {dt:.2f}s of {[round(s, 2) for s in samples]}"
                f" ({n} rows{note})")

        _bench_decontam_modes(spark, tmp, results, extras)
        _bench_changelog_split(spark, tmp, results)
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
