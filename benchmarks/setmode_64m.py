"""64M-event set-mode replay at local[32] with the auto(arrays) strategy."""
import os, sys, tempfile, shutil, time, json
sys.path.insert(0, "/root/repo")
from scylla_cdc_rust_spark.datagen.gen_log import LogSpec, generate_log, write_log
from scylla_cdc_rust_spark.session import get_spark
from scylla_cdc_rust_spark.config import CDCPipelineConfig
from scylla_cdc_rust_spark.plans.pipeline import replay

tmp = tempfile.mkdtemp(prefix="set64m_")
t0 = time.time()
tbl = generate_log(LogSpec(n_events=64_000_000, n_docs=6_400_000, n_streams=1024,
                           n_epochs=2, hot_doc_frac=0.02, seed=42))
path = write_log(tbl, os.path.join(tmp, "log"), files_per_epoch=64)
print(f"gen+write {tbl.num_rows} events in {time.time()-t0:.0f}s", flush=True)
del tbl
spark = get_spark(app_name="set64m", cores=32)

def run(tag, impl, mode="set"):
    cfg = CDCPipelineConfig(log_path=path, target_path=os.path.join(tmp, f"t_{tag}"),
                            watermark_path=os.path.join(tmp, f"w_{tag}"),
                            window_size_ms=1<<60, target_num_buckets=64, set_impl=impl)
    st = replay(spark, cfg, collection_modes={"tokens": mode})
    print(json.dumps({"tag": tag, "impl": impl, "mode": mode,
                      "sec": round(st.seconds,1), "ev_s": round(st.events_per_sec)}), flush=True)
    shutil.rmtree(os.path.join(tmp, f"t_{tag}"), ignore_errors=True)
    shutil.rmtree(os.path.join(tmp, f"w_{tag}"), ignore_errors=True)

run("warm", "arrays")       # warmup + measurement 1
run("a1", "arrays")
run("e1", "elements")
run("a2", "arrays")
run("l1", "auto", "list")   # list-mode reference point same session
spark.stop(); shutil.rmtree(tmp, ignore_errors=True)
