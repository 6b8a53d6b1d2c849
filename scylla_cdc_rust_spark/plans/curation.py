"""End-to-end training-corpus curation: the standard LLM data funnel
composed from this repo's operators, applied in sequence —

    quality filter → exact dedup → benchmark decontamination →
    stratified sampling → sequence packing

Each stage filters the previous stage's survivors (the order real
pipelines use: cheap row-local filters first, join-shaped stages on the
already-shrunk set).  Scale shape per stage:

- quality: row-local expression, pure map-side filter;
- dedup: digest groupBy + semi-join on (digest → min id) — shuffles
  digests, never text (operators/dedup_docs.exact_dedup form);
- decontamination: benchmark n-gram hashes BROADCAST into the corpus
  probe (operators/decontam) — corpus n-grams never shuffled;
- sampling: row-local portable-hash threshold, zero shuffle;
- packing: hash-sharded windowed cumsum (operators/packing) — no
  global serial offset.

``curation_stages`` exposes every intermediate survivor set (lazily —
nothing executes until acted on); ``curate`` returns the final docs and
their pack assignments; ``curation_funnel`` is the one-row stage-count
record a production run logs per snapshot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from scylla_cdc_rust_spark.functions.generate_util import explode_nonnull
from scylla_cdc_rust_spark.functions.text import quality_score, token_count, word_hash
from scylla_cdc_rust_spark.operators.decontam import ngram_contamination, ngram_hashes
from scylla_cdc_rust_spark.operators.packing import pack_offsets
from scylla_cdc_rust_spark.operators.sampling import (
    sample_hash,
    sample_threshold,
    stratified_sample,
)


def _resolve_n_shards(docs: DataFrame, n_shards: int | None) -> int:
    """Default pack-accounting shards = the session's parallelism.

    The pack cumsum is a per-shard sort window: a FIXED small default
    (the old 4) would sort the whole corpus in 4 tasks at 100 TB.
    Deterministic output still needs a pinned value — oracles pass
    n_shards explicitly; only the unspecified case scales."""
    if n_shards is not None:
        return n_shards
    return max(4, docs.sparkSession.sparkContext.defaultParallelism)


def curation_stages(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    quality_min: float = 0.3,
    contamination_max: float = 0.2,
    ngram_n: int = 3,
    sample_rates: dict[str, float] | None = None,
    strata_col: str = "lang",
    default_rate: float = 1.0,
    seq_len: int = 2048,
    n_shards: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict[str, DataFrame]:
    """Build the funnel; return every stage's survivor set plus the
    final pack assignments, all as lazy DataFrames.

    ``benchmark=None`` makes decontamination a no-op;
    ``sample_rates=None`` with ``default_rate=1.0`` makes sampling a
    no-op (the stage keys are always present either way).
    ``n_shards=None`` scales with the session (_resolve_n_shards).
    """
    n_shards = _resolve_n_shards(docs, n_shards)
    quality = docs.where(quality_score(F.col(text_col)) >= F.lit(quality_min))

    survivors = quality.groupBy(F.md5(F.col(text_col)).alias("__h")).agg(
        F.min(id_col).alias(id_col)
    )
    deduped = quality.join(survivors.select(id_col), on=id_col, how="left_semi")

    if benchmark is not None:
        flagged = (
            ngram_contamination(
                deduped, benchmark, n=ngram_n, id_col=id_col, text_col=text_col
            )
            .where(F.col("contamination") > contamination_max)
            .select(id_col)
        )
        clean = deduped.join(flagged, on=id_col, how="left_anti")
    else:
        clean = deduped

    if sample_rates or default_rate < 1.0:
        sampled = stratified_sample(
            clean, sample_rates or {}, strata_col=strata_col,
            id_col=id_col, default_rate=default_rate,
        )
    else:
        sampled = clean

    offsets = pack_offsets(
        sampled, seq_len=seq_len, n_shards=n_shards, id_col=id_col
    )
    return {
        "quality": quality,
        "deduped": deduped,
        "clean": clean,
        "sampled": sampled,
        "offsets": offsets,
    }


def curate(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    **kwargs,
) -> tuple[DataFrame, DataFrame]:
    """Run the funnel; return (curated_docs, pack_offsets)."""
    st = curation_stages(docs, benchmark=benchmark, **kwargs)
    return st["sampled"], st["offsets"]


def curation_funnel(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    quality_min: float = 0.3,
    contamination_max: float = 0.2,
    ngram_n: int = 3,
    sample_rates: dict[str, float] | None = None,
    strata_col: str = "lang",
    default_rate: float = 1.0,
    seq_len: int = 2048,
    n_shards: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One-row funnel: documents surviving each stage, plus the packed
    accounting of the final set.  Columns: n_total, n_quality,
    n_after_dedup, n_clean, n_sampled, n_tokens, n_packs.

    Single-pass accounting: every stage flag is a per-document property
    (quality is row-local; dedup survivorship is ``id == min(id) over
    digest`` among quality docs; contamination is intrinsic given the
    broadcast benchmark; sampling is a hash threshold), so the whole
    funnel compiles to ONE tagged projection of the corpus followed by
    narrow flag shuffles and one aggregate — the corpus parquet is
    scanned exactly once, versus one scan per ``.count()`` in the naive
    stage-at-a-time form.  Pack accounting rides the same plan: the
    per-shard cumulative sum is taken over all docs with non-sampled
    rows contributing zero, which equals the sampled-only stream.
    """
    from scylla_cdc_rust_spark.session import ensure_min_parallelism

    # the tagged projection stacks quality scoring + digest + n-gram
    # hashing on the scan — fan small inputs out first (no-op at scale)
    docs = ensure_min_parallelism(docs, by=id_col)
    n_shards = _resolve_n_shards(docs, n_shards)
    sampling_active = bool(sample_rates) or default_rate < 1.0
    idc = F.col(id_col)
    cols = [
        idc.alias("id"),
        (quality_score(F.col(text_col)) >= F.lit(quality_min)).alias("q"),
        F.md5(F.col(text_col)).alias("digest"),
        token_count(text_col).cast("long").alias("n_tok"),
        F.pmod(word_hash(idc.cast("string")), F.lit(n_shards)).cast("int").alias(
            "shard"
        ),
    ]
    if sampling_active:
        thresh = sample_threshold(sample_rates or {}, strata_col, default_rate)
        cols.append((sample_hash(id_col) < thresh).alias("keep"))
    else:
        cols.append(F.lit(True).alias("keep"))
    if benchmark is not None:
        # contamination needs the doc's distinct n-gram hashes; only
        # quality docs can reach the decontamination stage, so skip the
        # n-gram work for the rest
        cols.append(
            F.when(
                quality_score(F.col(text_col)) >= F.lit(quality_min),
                F.array_distinct(ngram_hashes(text_col, ngram_n)),
            )
            .otherwise(F.array().cast("array<long>"))
            .alias("grams")
        )
        base = docs.select(*cols)
        # explode_nonnull: plain explode makes Catalyst infer a size>0
        # filter that re-evaluates the gram hash in the scan stage
        # (functions/generate_util.py)
        bench = explode_nonnull(
            benchmark, ngram_hashes(text_col, ngram_n), "bh"
        ).distinct()
        per_doc = (
            base.select("*", F.explode_outer("grams").alias("h"))
            .join(F.broadcast(bench), F.col("h") == F.col("bh"), "left")
            .groupBy("id")
            .agg(
                F.first("q").alias("q"),
                F.first("digest").alias("digest"),
                F.first("n_tok").alias("n_tok"),
                F.first("shard").alias("shard"),
                F.first("keep").alias("keep"),
                F.count("h").alias("n_ngrams"),
                F.count("bh").alias("n_hit"),
            )
        )
        contaminated = (F.col("n_ngrams") > 0) & (
            F.round(
                F.col("n_hit").cast("double") / F.col("n_ngrams").cast("double"), 6
            )
            > F.lit(contamination_max)
        )
    else:
        per_doc = docs.select(*cols)
        contaminated = F.lit(False)

    min_quality_id = F.min(F.when(F.col("q"), F.col("id"))).over(
        Window.partitionBy("digest")
    )
    flags = per_doc.select(
        "*",
        (F.col("q") & (F.col("id") == min_quality_id)).alias("is_dedup"),
    ).withColumn("is_clean", F.col("is_dedup") & ~contaminated).withColumn(
        "is_sampled", F.col("is_clean") & F.col("keep")
    )

    pack_win = (
        Window.partitionBy("shard")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(
        F.sum(F.when(F.col("is_sampled"), F.col("n_tok"))).over(pack_win), F.lit(0)
    )
    flags = flags.withColumn(
        "last_pack",
        F.when(
            F.col("is_sampled"),
            F.floor((start + F.col("n_tok") - 1) / seq_len),
        ).cast("long"),
    )

    def _n(c):
        return F.coalesce(F.sum(c), F.lit(0)).cast("long")

    per_shard = flags.groupBy("shard").agg(
        F.count("*").alias("c_total"),
        F.sum(F.col("q").cast("long")).alias("c_quality"),
        F.sum(F.col("is_dedup").cast("long")).alias("c_dedup"),
        F.sum(F.col("is_clean").cast("long")).alias("c_clean"),
        F.sum(F.col("is_sampled").cast("long")).alias("c_sampled"),
        F.sum(F.when(F.col("is_sampled"), F.col("n_tok"))).alias("toks"),
        F.max("last_pack").alias("max_pack"),
    )
    return per_shard.agg(
        _n("c_total").alias("n_total"),
        _n("c_quality").alias("n_quality"),
        _n("c_dedup").alias("n_after_dedup"),
        _n("c_clean").alias("n_clean"),
        _n("c_sampled").alias("n_sampled"),
        _n("toks").alias("n_tokens"),
        _n(F.when(F.col("max_pack").isNotNull(), F.col("max_pack") + 1)).alias(
            "n_packs"
        ),
    )
