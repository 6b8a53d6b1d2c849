import os, sys, tempfile, time, shutil
sys.path.insert(0, "/root/repo")
from scylla_cdc_rust_spark.datagen.gen_log import LogSpec, generate_log, write_log
from scylla_cdc_rust_spark.session import get_spark
from scylla_cdc_rust_spark.config import CDCPipelineConfig
from scylla_cdc_rust_spark.plans.pipeline import replay

tmp = tempfile.mkdtemp(prefix="setimpl_")
tbl = generate_log(LogSpec(n_events=2_000_000, n_docs=200_000, n_streams=256, n_epochs=2, hot_doc_frac=0.02, seed=42))
path = write_log(tbl, os.path.join(tmp, "log"), files_per_epoch=32)
spark = get_spark(app_name="setimpl", cores=32)

def run(impl, tag):
    cfg = CDCPipelineConfig(log_path=path, target_path=os.path.join(tmp, f"t_{tag}"),
                            watermark_path=os.path.join(tmp, f"w_{tag}"),
                            window_size_ms=1<<60, target_num_buckets=32, set_impl=impl)
    st = replay(spark, cfg, collection_modes={"tokens": "set"})
    print(f"RESULT {impl:9s}: {st.seconds:6.1f}s  {st.events_per_sec:,.0f} ev/s", flush=True)
    return st.events_per_sec

run("elements", "warm")
for i, impl in enumerate(("elements", "arrays", "auto", "elements", "arrays")):
    run(impl, f"{impl}_{i}")
spark.stop(); shutil.rmtree(tmp, ignore_errors=True)
