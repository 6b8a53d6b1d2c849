"""Interleaved cold-JVM A/B: HEAD vs pre-repair-rework (7ee1baf~1) list-mode
replay on ONE shared 2M log — adjudicates whether the slow replay legs in
the clean bench run are host drift or the merge.py refactor."""
import json, os, subprocess, sys, tempfile, shutil, time
sys.path.insert(0, "/root/repo")
from scylla_cdc_rust_spark.datagen.gen_log import LogSpec, generate_log, write_log

PRE = "/tmp/repo_prerepair"
tmp = tempfile.mkdtemp(prefix="ab_repair_")
t0 = time.time()
tbl = generate_log(LogSpec(n_events=2_000_000, n_docs=200_000, n_streams=256,
                           n_epochs=2, hot_doc_frac=0.02, seed=42))
path = write_log(tbl, os.path.join(tmp, "log"), files_per_epoch=32)
print(f"gen {time.time()-t0:.0f}s", flush=True)
del tbl

def leg(repo, mode):
    env = dict(os.environ)
    env["BENCH_REPLAY_REPS"] = "2"
    env["BENCH_TOKENS_MODE"] = mode
    out = subprocess.run([sys.executable, os.path.join(repo, "bench.py"),
                          "--replay-only", "32", path],
                         capture_output=True, text=True, env=env, check=True, cwd=repo)
    r = json.loads(out.stdout.strip().splitlines()[-1])
    print(json.dumps({"repo": repo, "mode": mode, **r}), flush=True)
    return r

try:
    for mode in ("list",):
        legs = [leg(r, mode) for r in ("/root/repo", PRE, PRE, "/root/repo")]
        head = (legs[0]["events_per_sec"] + legs[3]["events_per_sec"]) / 2
        pre = (legs[1]["events_per_sec"] + legs[2]["events_per_sec"]) / 2
        print(json.dumps({"mode": mode, "head_mean": round(head),
                          "pre_mean": round(pre),
                          "head_over_pre": round(head / pre, 3)}), flush=True)
finally:
    shutil.rmtree(tmp, ignore_errors=True)
