"""A/B: apply_window's decoded.persist() on vs off (monkeypatched)."""
import os, sys, tempfile, shutil, time
sys.path.insert(0, "/root/repo")
from scylla_cdc_rust_spark.datagen.gen_log import LogSpec, generate_log, write_log
from scylla_cdc_rust_spark.session import get_spark
from scylla_cdc_rust_spark.config import CDCPipelineConfig
from scylla_cdc_rust_spark.plans.pipeline import replay
import pyspark.sql.dataframe as D

tmp = tempfile.mkdtemp(prefix="persist_ab_")
tbl = generate_log(LogSpec(n_events=2_000_000, n_docs=200_000, n_streams=256, n_epochs=2, hot_doc_frac=0.02, seed=42))
path = write_log(tbl, os.path.join(tmp, "log"), files_per_epoch=32)
spark = get_spark(app_name="persist_ab", cores=32)

orig_persist, orig_unpersist = D.DataFrame.persist, D.DataFrame.unpersist

def run(tag, use_persist):
    D.DataFrame.persist = orig_persist if use_persist else (lambda self, *a: self)
    D.DataFrame.unpersist = orig_unpersist if use_persist else (lambda self, *a: self)
    cfg = CDCPipelineConfig(log_path=path, target_path=os.path.join(tmp, f"t_{tag}"),
                            watermark_path=os.path.join(tmp, f"w_{tag}"),
                            window_size_ms=1<<60, target_num_buckets=32)
    st = replay(spark, cfg, collection_modes={"tokens": "list"})
    print(f"RESULT persist={use_persist}: {st.seconds:5.1f}s {st.events_per_sec:,.0f} ev/s", flush=True)

run("warm", True)
for i, p in enumerate([True, False, True, False]):
    run(f"{i}", p)
spark.stop(); shutil.rmtree(tmp, ignore_errors=True)
