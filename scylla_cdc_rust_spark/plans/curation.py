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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scylla_cdc_rust_spark.functions.text import quality_score
from scylla_cdc_rust_spark.operators.decontam import ngram_contamination
from scylla_cdc_rust_spark.operators.packing import pack_offsets
from scylla_cdc_rust_spark.operators.sampling import stratified_sample


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
    n_shards: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict[str, DataFrame]:
    """Build the funnel; return every stage's survivor set plus the
    final pack assignments, all as lazy DataFrames.

    ``benchmark=None`` makes decontamination a no-op;
    ``sample_rates=None`` with ``default_rate=1.0`` makes sampling a
    no-op (the stage keys are always present either way).
    """
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
    **kwargs,
) -> DataFrame:
    """One-row funnel: documents surviving each stage, plus the packed
    accounting of the final set.  Columns: n_total, n_quality,
    n_after_dedup, n_clean, n_sampled, n_tokens, n_packs."""
    st = curation_stages(docs, benchmark=benchmark, **kwargs)
    acct = st["offsets"].groupBy("shard").agg(
        F.sum("n_tok").alias("toks"), (F.max("last_pack") + 1).alias("packs")
    ).agg(
        F.coalesce(F.sum("toks"), F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce(F.sum("packs"), F.lit(0)).cast("long").alias("n_packs"),
    ).first()
    counts = [
        docs.count(),
        st["quality"].count(),
        st["deduped"].count(),
        st["clean"].count(),
        st["sampled"].count(),
    ]
    return docs.sparkSession.createDataFrame(
        [(*counts, acct["n_tokens"], acct["n_packs"])],
        "n_total long, n_quality long, n_after_dedup long, n_clean long,"
        " n_sampled long, n_tokens long, n_packs long",
    )
