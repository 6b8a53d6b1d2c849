import os, sys, time, tempfile, shutil
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F
from scylla_cdc_rust_spark.session import get_spark, ensure_min_parallelism
from scylla_cdc_rust_spark.operators.sampling import sample_hash
from scylla_cdc_rust_spark.functions.text import words

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
extra = {}
if os.environ.get("NO_AQE"):
    extra["spark.sql.adaptive.enabled"] = "false"
if os.environ.get("NO_COALESCE"):
    extra["spark.sql.adaptive.coalescePartitions.enabled"] = "false"
spark = get_spark("profile-decontam-g", cores=32, extra_conf=extra)
tmp = tempfile.mkdtemp(prefix="decontam_multi_")
docs0 = spark.read.parquet(f"{SF}/documents.parquet")
docs0.repartition(32).write.mode("overwrite").parquet(f"{tmp}/docs32")
docs = spark.read.parquet(f"{tmp}/docs32")
corpus = docs.where(~(sample_hash("doc_id", 16) == F.lit(0)))
n=3
def t(label, fn, reps=3):
    ss=[]
    for _ in range(reps):
        t0=time.time(); fn(); ss.append(time.time()-t0)
    ss.sort(); print(f"{label}: median {ss[len(ss)//2]:.2f}s of {[round(x,2) for x in ss]}", file=sys.stderr)

def mk(base):
    ws = F.col("ws")
    return F.when(F.size(ws) >= n, F.transform(F.sequence(F.lit(1), F.size(ws)-F.lit(n-1)),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(ws, i, n))))).otherwise(F.array().cast("array<long>"))
# multi-file scan: no repartition needed
base_mf = corpus.select(F.col("doc_id"), words("text").alias("ws"))
gr = mk(base_mf)
t("M1 multifile grams+explode count", lambda: base_mf.select("doc_id", gr.alias("gs")).select("doc_id", F.explode("gs").alias("h")).count())
t("M2 multifile distinct+explode count", lambda: base_mf.select("doc_id", F.array_distinct(gr).alias("gs")).select("doc_id", F.explode("gs").alias("h")).count())
# original single file + repartition path for comparison under this conf
docs1 = spark.read.parquet(f"{SF}/documents.parquet")
corpus1 = docs1.where(~(sample_hash("doc_id", 16) == F.lit(0)))
base_sf = ensure_min_parallelism(corpus1).select(F.col("doc_id"), words("text").alias("ws"))
gr1 = mk(base_sf)
t("S1 singlefile repart grams+explode count", lambda: base_sf.select("doc_id", gr1.alias("gs")).select("doc_id", F.explode("gs").alias("h")).count())
spark.stop()
shutil.rmtree(tmp, ignore_errors=True)
