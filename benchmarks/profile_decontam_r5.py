"""Profile xxh-vs-portable decontamination at sf0.1 inside ONE warm JVM.

Phases timed separately: bench-side gram agg, corpus-side gram stream,
full query. Also A/Bs a variadic-xxhash64 gram hash (no pre-hash, no
per-gram aggregate fold) as a candidate production mode.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F
from scylla_cdc_rust_spark.session import get_spark, ensure_min_parallelism
from scylla_cdc_rust_spark.operators.decontam import ngram_contamination, ngram_hashes
from scylla_cdc_rust_spark.operators.sampling import sample_hash
from scylla_cdc_rust_spark.functions.text import words

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("profile-decontam", cores=32)
docs = spark.read.parquet(f"{SF}/documents.parquet")
bench_flag = sample_hash("doc_id", 16) == F.lit(0)
corpus, bench = docs.where(~bench_flag), docs.where(bench_flag)
print("corpus", corpus.count(), "bench", bench.count(), file=sys.stderr)

def t(label, fn, reps=3):
    ss = []
    for _ in range(reps):
        t0 = time.time(); fn(); ss.append(time.time()-t0)
    ss.sort()
    print(f"{label}: median {ss[len(ss)//2]:.2f}s of {[round(x,2) for x in ss]}", file=sys.stderr)

def ngram_hashes_variadic(text, n):
    ws = words(text)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(ws) - F.lit(n - 1)),
        lambda i: F.xxhash64(*[F.element_at(ws, i + F.lit(k)) for k in range(n)]),
    )
    return F.when(F.size(ws) >= n, grams).otherwise(F.array().cast("array<long>"))

def ngram_hashes_concat_xxh(text, n):
    ws = words(text)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(ws) - F.lit(n - 1)),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(ws, i, n))),
    )
    return F.when(F.size(ws) >= n, grams).otherwise(F.array().cast("array<long>"))

# phase: bench side alone (distinct grams), each impl
for impl in ("portable", "xxhash64"):
    t(f"bench-side {impl}", lambda impl=impl: bench.select(F.explode(ngram_hashes("text", 3, impl)).alias("h")).distinct().count())
t("bench-side variadic", lambda: bench.select(F.explode(ngram_hashes_variadic("text", 3)).alias("h")).distinct().count())

# phase: corpus side alone (fanned, distinct grams per doc, exploded)
for impl in ("portable", "xxhash64"):
    def cp(impl=impl):
        c = ensure_min_parallelism(corpus)
        c.select(F.col("doc_id"), F.array_distinct(ngram_hashes("text", 3, impl)).alias("gs")) \
         .select("doc_id", F.size("gs").alias("n"), "gs") \
         .select("doc_id", "n", F.explode("gs").alias("h")).count()
    t(f"corpus-side {impl}", cp)
def cpv():
    c = ensure_min_parallelism(corpus)
    c.select(F.col("doc_id"), F.array_distinct(ngram_hashes_variadic("text", 3)).alias("gs")) \
     .select("doc_id", F.size("gs").alias("n"), "gs") \
     .select("doc_id", "n", F.explode("gs").alias("h")).count()
t("corpus-side variadic", cpv)

# full query, each impl
for impl in ("portable", "xxhash64"):
    t(f"full {impl}", lambda impl=impl: ngram_contamination(corpus, bench, n=3, hash_impl=impl).count())
spark.stop()
