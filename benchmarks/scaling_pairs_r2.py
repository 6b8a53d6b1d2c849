"""Round-2 refresh of the paired N->4N scaling evidence at 64M events."""
import os, sys, tempfile, shutil, json, subprocess, time
sys.path.insert(0, "/root/repo")
from scylla_cdc_rust_spark.datagen.gen_log import LogSpec, generate_log, write_log

tmp = tempfile.mkdtemp(prefix="scale_r2_")
t0 = time.time()
tbl = generate_log(LogSpec(n_events=64_000_000, n_docs=6_400_000, n_streams=1024,
                           n_epochs=2, hot_doc_frac=0.02, seed=42))
path = write_log(tbl, os.path.join(tmp, "log"), files_per_epoch=64)
print(f"gen {time.time()-t0:.0f}s", flush=True)
del tbl

def run(cores):
    env = dict(os.environ); env["BENCH_REPLAY_REPS"] = "2"
    out = subprocess.run([sys.executable, "/root/repo/bench.py", "--replay-only",
                          str(cores), path], capture_output=True, text=True, env=env, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])

for pair in ((2, 8), (8, 32)):
    lo, hi = (run(c) for c in pair)
    eff = (hi["events_per_sec"] / lo["events_per_sec"]) / (pair[1] / pair[0])
    print(json.dumps({"pair": pair, "lo": lo, "hi": hi, "efficiency": round(eff, 3)}), flush=True)
shutil.rmtree(tmp, ignore_errors=True)
