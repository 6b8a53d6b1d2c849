"""Round-5 refresh of the N->4N scaling evidence (north rule >= 0.8).

Drift-cancelling sandwich (BENCH.md round-3 methodology): the host's
absolute throughput drifts tens of percent between adjacent legs, so
run lo, hi, hi, lo back-to-back and report mean(hi)/mean(lo) — linear
drift cancels to first order.  Each leg is a cold JVM with an
in-process JIT warmup (bench.py --replay-only).  Also one adjacent
8->32 pair to re-document the shared-host bandwidth ceiling.
"""
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
from scylla_cdc_rust_spark.datagen.gen_log import LogSpec, generate_log, write_log

N_EVENTS = int(os.environ.get("SANDWICH_EVENTS", "64000000"))

tmp = tempfile.mkdtemp(prefix="scale_r5_")
t0 = time.time()
tbl = generate_log(LogSpec(n_events=N_EVENTS, n_docs=N_EVENTS // 10,
                           n_streams=1024, n_epochs=2, hot_doc_frac=0.02,
                           seed=42))
path = write_log(tbl, os.path.join(tmp, "log"), files_per_epoch=64)
print(f"gen {time.time()-t0:.0f}s", flush=True)
del tbl


def run(cores: int) -> dict:
    env = dict(os.environ)
    env["BENCH_REPLAY_REPS"] = "2"
    out = subprocess.run(
        [sys.executable, "/root/repo/bench.py", "--replay-only",
         str(cores), path],
        capture_output=True, text=True, env=env, check=True,
    )
    r = json.loads(out.stdout.strip().splitlines()[-1])
    print(json.dumps({"leg": cores, **r}), flush=True)
    return r


try:
    legs = [run(c) for c in (2, 8, 8, 2)]
    lo = (legs[0]["events_per_sec"] + legs[3]["events_per_sec"]) / 2
    hi = (legs[1]["events_per_sec"] + legs[2]["events_per_sec"]) / 2
    print(json.dumps({"sandwich": "2->8", "lo_mean": round(lo),
                      "hi_mean": round(hi),
                      "efficiency": round(hi / lo / 4, 3)}), flush=True)
    legs2 = [run(c) for c in (8, 32, 32, 8)]
    lo2 = (legs2[0]["events_per_sec"] + legs2[3]["events_per_sec"]) / 2
    hi2 = (legs2[1]["events_per_sec"] + legs2[2]["events_per_sec"]) / 2
    print(json.dumps({"sandwich": "8->32", "lo_mean": round(lo2),
                      "hi_mean": round(hi2),
                      "efficiency": round(hi2 / lo2 / 4, 3)}), flush=True)
finally:
    shutil.rmtree(tmp, ignore_errors=True)
