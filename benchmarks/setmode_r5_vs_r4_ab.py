"""Interleaved cold-JVM A/B: round-5 HEAD vs round-4 (f042879) set-mode
replay on ONE shared log — proves the explode_nonnull fold fix's effect
on the headline path free of host drift (legs alternate r5/r4/r4/r5).
Run: python benchmarks/setmode_r5_vs_r4_ab.py [n_events]
"""
import json
import os
import subprocess
import sys
import tempfile
import shutil
import time

sys.path.insert(0, "/root/repo")
from scylla_cdc_rust_spark.datagen.gen_log import LogSpec, generate_log, write_log

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
R4 = "/tmp/repo_r4"
tmp = tempfile.mkdtemp(prefix="ab_r5r4_")
t0 = time.time()
tbl = generate_log(LogSpec(n_events=N, n_docs=N // 10, n_streams=256,
                           n_epochs=2, hot_doc_frac=0.02, seed=42))
path = write_log(tbl, os.path.join(tmp, "log"), files_per_epoch=32)
print(f"gen {time.time()-t0:.0f}s", flush=True)
del tbl


def leg(repo: str, mode: str) -> dict:
    env = dict(os.environ)
    env["BENCH_REPLAY_REPS"] = "2"
    env["BENCH_TOKENS_MODE"] = mode
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py"), "--replay-only",
         "32", path],
        capture_output=True, text=True, env=env, check=True, cwd=repo,
    )
    r = json.loads(out.stdout.strip().splitlines()[-1])
    print(json.dumps({"repo": repo, "mode": mode, **r}), flush=True)
    return r


try:
    for mode in ("set", "list"):
        legs = [leg(r, mode) for r in ("/root/repo", R4, R4, "/root/repo")]
        r5 = (legs[0]["events_per_sec"] + legs[3]["events_per_sec"]) / 2
        r4 = (legs[1]["events_per_sec"] + legs[2]["events_per_sec"]) / 2
        print(json.dumps({"mode": mode, "r5_mean": round(r5),
                          "r4_mean": round(r4),
                          "r5_over_r4": round(r5 / r4, 3)}), flush=True)
finally:
    shutil.rmtree(tmp, ignore_errors=True)
