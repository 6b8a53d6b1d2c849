"""Memory-bandwidth-domain A/B: 2 JVMs x 16 cores vs 1 JVM x 32 cores.

The round-2 probe triptych showed the 8->32 wall sits on the parquet
scan ceiling (~0.55), i.e. the single box's decode/memory bandwidth,
not the engine's shuffle structure.  This probe closes the remaining
question: if throughput follows bandwidth DOMAINS rather than core
count, splitting the same 64M-event replay across two concurrent
16-core JVMs on this one box should land at ~the same combined
throughput as one 32-core JVM (both configurations share one memory
subsystem), while on a real cluster each node contributes its own
bandwidth — so per-node throughput multiplies by node count.

Split: by generation (epoch=0 vs epoch=1 subdirs symlinked into two
half-log dirs — stream sets are generation-scoped, so each half is a
self-contained valid log of ~32M events; the 1x32 baseline replays
both epochs sequentially, identical total work).

Measured phases of the two JVMs are aligned with a file barrier
(bench.py BENCH_BARRIER_DIR) after each JVM's JIT warmup.

Run: python benchmarks/multi_jvm_ab.py [n_events]
"""
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
from scylla_cdc_rust_spark.datagen.gen_log import LogSpec, generate_log, write_log  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 64_000_000
tmp = tempfile.mkdtemp(prefix="mjvm_ab_")
t0 = time.time()
tbl = generate_log(LogSpec(n_events=N, n_docs=N // 10, n_streams=1024,
                           n_epochs=2, hot_doc_frac=0.02, seed=42))
full = write_log(tbl, os.path.join(tmp, "log"), files_per_epoch=64)
print(f"gen {time.time() - t0:.0f}s", flush=True)
del tbl

# half-logs: symlink one epoch dir each (zero copy)
halves = []
for i, ep in enumerate(sorted(d for d in os.listdir(full) if d.startswith("epoch="))):
    h = os.path.join(tmp, f"half{i}")
    os.makedirs(h)
    os.symlink(os.path.join(full, ep), os.path.join(h, ep))
    halves.append(h)
assert len(halves) == 2


def launch(cores, path, env_extra=None):
    env = dict(os.environ)
    env["BENCH_REPLAY_REPS"] = "2"
    env.update(env_extra or {})
    return subprocess.Popen(
        [sys.executable, "/root/repo/bench.py", "--replay-only", str(cores), path],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True, env=env,
    )


def collect(proc):
    out, _ = proc.communicate()
    assert proc.returncode == 0, out
    return json.loads(out.strip().splitlines()[-1])


# --- A: one 32-core JVM over the full log (both epochs) ---
a = collect(launch(32, full))
print(json.dumps({"config": "1x32", **a}), flush=True)

# --- B: two concurrent 16-core JVMs, one epoch each, barrier-aligned ---
bdir = os.path.join(tmp, "barrier")
os.makedirs(bdir)
benv = {"BENCH_BARRIER_DIR": bdir, "BENCH_BARRIER_N": "2"}
procs = [launch(16, h, benv) for h in halves]
bs = [collect(p) for p in procs]
for b in bs:
    print(json.dumps({"config": "2x16-half", **b}), flush=True)

total_events = sum(b["n_events"] for b in bs)
wall = max(b["seconds"] for b in bs)  # concurrent: slower JVM bounds wall
combined = {
    "config": "2x16-combined",
    "n_events": total_events,
    "seconds": wall,
    "events_per_sec": round(total_events / wall),
    "vs_1x32": round((total_events / wall) / a["events_per_sec"], 3),
}
print(json.dumps(combined), flush=True)
shutil.rmtree(tmp, ignore_errors=True)
