"""Scaling probes: isolate what limits 8->32 core scaling on this host.

probe cpu   : spark.range arithmetic (cache-resident, zero memory traffic)
probe scan  : parquet scan + token-array aggregate, NO shuffle (1-row agg)
probe replay: the full CDC replay (decode -> fold -> merge)
Run: python scaling_probe.py <probe> <cores> <log_path>
"""
import os, sys, tempfile, time, json, shutil
sys.path.insert(0, "/root/repo")
from scylla_cdc_rust_spark.session import get_spark

probe, cores, log_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
spark = get_spark(app_name=f"probe-{probe}-{cores}", cores=cores)

def timed(fn, reps=3):
    fn()  # warmup
    best = 1e9
    for _ in range(reps):
        t0 = time.time(); fn(); best = min(best, time.time() - t0)
    return best

if probe == "cpu":
    N = 40_000_000_000
    from pyspark.sql import functions as F
    def job():
        spark.range(N, numPartitions=cores * 4).selectExpr("sum(id % 7)").collect()
    sec = timed(job)
    unit = N
elif probe == "scan":
    from pyspark.sql import functions as F
    df = spark.read.parquet(log_path)
    for _ in range(5):
        df = df.unionAll(df)  # 32x the scan work
    def job():
        df.select(F.sum(F.aggregate(F.coalesce(F.col("tokens"), F.array()),
                  F.lit(0).cast("long"), lambda a, x: a + x)).alias("s"),
                  F.count("*").alias("n")).collect()
    sec = timed(job)
    unit = 2_000_000
elif probe == "replay":
    from scylla_cdc_rust_spark.config import CDCPipelineConfig
    from scylla_cdc_rust_spark.plans.pipeline import replay
    tmp = tempfile.mkdtemp(prefix=f"probe_replay_{cores}_")
    def job():
        tag = f"{time.time_ns()%100000}"
        cfg = CDCPipelineConfig(log_path=log_path,
            target_path=os.path.join(tmp, f"t_{tag}"),
            watermark_path=os.path.join(tmp, f"w_{tag}"),
            window_size_ms=1 << 60, target_num_buckets=32)
        replay(spark, cfg, collection_modes={"tokens": "list"})
    sec = timed(job, reps=2)
    unit = 2_000_000
    shutil.rmtree(tmp, ignore_errors=True)
print(json.dumps({"probe": probe, "cores": cores, "sec": round(sec, 3),
                  "per_sec": round(unit / sec)}))
