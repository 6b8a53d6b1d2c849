"""Document deduplication operators for training-data pipelines.

Five dedup families, each shaped for 100 TB inputs:

- exact: hash-groupBy on a content digest (one shuffle of digests, not
  documents);
- MinHash + LSH: shingle → k minhashes → b bands → bucket join — the
  candidate join is on (band, band_hash), never all-pairs;
- SimHash: 16/64-bit sign sketch, near-dups = same sketch bucket (or
  small Hamming radius via rotations);
- n-gram Jaccard: exact verification on candidate pairs only;
- embedding cosine near-dup: delegate to operators/ann.py buckets.

All hashes are the portable md5-prefix family (functions/text.py), so
every operator is DuckDB-oracle-checkable (queries.py exercises them
through the driver gate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from scylla_cdc_rust_spark.functions.generate_util import explode_nonnull
from scylla_cdc_rust_spark.functions.text import M31, word_hash

#: persisted (bucket, member) projections registered by cap_buckets —
#: released on the next cap_buckets call and via release_guard_caches()
_GUARD_CACHES: list[DataFrame] = []


def release_guard_caches() -> int:
    """Unpersist every hot-bucket-guard cache registered by
    ``cap_buckets``; returns how many were released.  Call after the
    candidate join of a dedup/ANN query has materialized (bench loops,
    long sessions).  Safe at any time: unpersisting a frame another
    in-flight query still reads only forfeits the cache reuse — Spark
    recomputes evicted blocks — never correctness."""
    n = len(_GUARD_CACHES)
    while _GUARD_CACHES:
        _GUARD_CACHES.pop().unpersist()
    return n


def cap_buckets(
    buckets: DataFrame,
    bucket_cols: list[str],
    member_col: str,
    max_bucket_size: int,
) -> DataFrame:
    """Hot-bucket guard: salt members of buckets larger than
    ``max_bucket_size`` into sub-buckets of ≤ that size (adds a
    ``__sub`` column to include in the join key).

    Bounds the candidate self-join: a bucket of size m contributes
    ≤ ceil(m/cap)·C(cap,2) pairs instead of C(m,2), so one degenerate
    bucket (e.g. a constant-boilerplate corpus) stays linear in m
    rather than quadratic.  Documented recall tradeoff: pairs straddling
    two sub-buckets of one mega-bucket are not candidates — acceptable
    because a mega-bucket at 100 TB is (a) boilerplate whose members are
    mutual near-dups anyway (any survivor set is equivalent), or (b) a
    hash-collision pathology that exact verification would reject.

    The guard itself is skew-free: bucket sizes come from a map-side
    combinable groupBy count, and only the OVER-CAP buckets (a tiny
    set by construction) are broadcast back — a mega-bucket's members
    never funnel through one window/sort task just to be counted.

    The input is persisted (memory, spilling to disk) before the count:
    the guard reads it twice (count + probe) and every LSH caller
    self-joins the capped output, so without the cache the expensive
    upstream (signature aggregates, explodes) re-evaluates up to 4×.
    At 100 TB the cached set is one slim (bucket, member) projection —
    spilling it locally is far cheaper than recomputing signatures.

    Cache lifecycle: the persisted handle is registered module-wide;
    the NEXT cap_buckets call releases it (by then the previous query's
    action has run in a sequential session), and
    ``release_guard_caches()`` releases all of them explicitly — so a
    session-long loop of dedup queries holds at most one guard cache at
    a time instead of accumulating one per query.
    """
    from pyspark import StorageLevel

    release_guard_caches()
    buckets = buckets.persist(StorageLevel.MEMORY_AND_DISK)
    _GUARD_CACHES.append(buckets)
    hot = (
        buckets.groupBy(*bucket_cols)
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > max_bucket_size)
    )
    nsub = F.ceil(F.col("__n") / F.lit(max_bucket_size))
    return (
        buckets.join(F.broadcast(hot), bucket_cols, "left")
        .withColumn(
            "__sub",
            F.when(
                F.col("__n").isNotNull(), F.pmod(F.xxhash64(member_col), nsub)
            )
            .otherwise(F.lit(0))
            .cast("int"),
        )
        .drop("__n")
    )

#: (a, b) parameters for the minhash permutation family
MINHASH_PARAMS = [(1, 0), (31, 7), (131, 3), (997, 11), (8191, 19), (131071, 23),
                  (524287, 29), (2147483647 % M31, 31)]

#: star-contraction rounds the most recent dedup_clusters call took to
#: converge — bench telemetry (round count explains run-to-run timing
#: spread: cost ≈ rounds × localCheckpoint)
LAST_CONVERGENCE_ROUNDS: int | None = None


def exact_dedup(df: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    """Keep one survivor (min key) per exact content digest."""
    g = df.groupBy(F.md5(F.col(text)).alias("__h")).agg(
        F.min(key).alias("survivor"), F.count("*").alias("copies")
    )
    return (
        df.join(
            g.select(F.col("survivor").alias(key)),
            on=key,
            how="left_semi",
        )
    )


def shingles(text_col, n: int = 2):
    """Distinct word n-gram shingles of a text column.

    Documents with fewer than ``n`` words contribute NO shingles (the
    ``F.when`` guard): without it the window index would run past the
    word array, which raises under ANSI mode, and the DuckDB oracles'
    ``generate_series(1, len-1)`` yields none for such docs."""
    ws = F.split(text_col, " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(ws) - F.lit(n)),
        lambda i: F.concat_ws("_", *[F.element_at(ws, i + j + 1) for j in range(n)]),
    )
    return F.array_distinct(
        F.when(F.size(ws) >= n, grams).otherwise(F.array().cast("array<string>"))
    )


def minhash_signatures(
    df: DataFrame, key: str = "doc_id", text: str = "text", num_hashes: int = 8
) -> DataFrame:
    """k-minhash signature per document (shingle → hash → min per fn)."""
    params = MINHASH_PARAMS[:num_hashes]
    # explode_nonnull: plain explode's inferred size>0 filter would
    # re-evaluate the shingle build in the scan stage (generate_util)
    sh = explode_nonnull(df, shingles(F.col(text)), "sh", key)
    h = sh.select(key, word_hash(F.col("sh")).alias("h"))
    aggs = [
        F.min((F.col("h") * a + b) % M31).alias(f"m{i}")
        for i, (a, b) in enumerate(params)
    ]
    return h.groupBy(key).agg(*aggs)


def _band_buckets(
    sigs: DataFrame, key: str, num_hashes: int, bands: int
) -> DataFrame:
    """(key, band, bh) LSH banding rows shared by the candidate-pair and
    star-edge generators."""
    rows_per_band = num_hashes // bands
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"m{b * rows_per_band + r}") for r in range(rows_per_band)]
        h = F.lit(0).cast("long")
        for c in cols:
            h = (h * 31 + c) % M31
        band_cols.append(F.struct(F.lit(b).alias("band"), h.alias("bh")))
    return explode_nonnull(sigs, F.array(*band_cols), "bb", key).select(
        key, F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh")
    )


def minhash_lsh_candidates(
    sigs: DataFrame,
    key: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """LSH banding: docs sharing any band bucket become candidate pairs.

    Scale shape: explode signatures into (band, band_hash) rows and
    self-join on the bucket — cost is Σ bucket_size², never n²; buckets
    above ``max_bucket_size`` are salted into sub-buckets (cap_buckets)
    so one degenerate bucket cannot go quadratic."""
    buckets = _band_buckets(sigs, key, num_hashes, bands)
    join_cols = ["band", "bh"]
    if max_bucket_size:
        buckets = cap_buckets(buckets, join_cols, key, max_bucket_size)
        join_cols.append("__sub")
    a, b_ = buckets.alias("a"), buckets.alias("b")
    cond = F.col(f"a.{key}") < F.col(f"b.{key}")
    for c in join_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    return (
        a.join(b_, cond)
        .select(F.col(f"a.{key}").alias("d1"), F.col(f"b.{key}").alias("d2"))
        .distinct()
    )


def minhash_lsh_star_edges(
    sigs: DataFrame,
    key: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Connectivity-equivalent edge set for clustering LSH candidates.

    Every LSH bucket is a CLIQUE in the candidate-pair graph, and a
    clique's connectivity is exactly captured by the star
    member → min(bucket member).  When the candidates feed connected
    components (``dedup_clusters``) — not a pairwise verifier — the
    m·(m−1)/2 within-bucket pairs can therefore be replaced by m−1 star
    edges per bucket with an IDENTICAL component result: O(Σ m) edges
    instead of O(Σ m²) (4.84M pairs → ~150k edges on the bench corpus;
    guide §1.2 step 1, fix the distributed algorithm first).

    Same bucketing and hot-bucket salting as ``minhash_lsh_candidates``
    (sub-bucket straddling behaves identically: neither path links
    across sub-buckets of one capped mega-bucket).  Emitted as
    (d1 = bucket min, d2 = member), d1 < d2; duplicates across bands are
    left in — ``dedup_clusters`` canonicalizes once anyway, so a
    distinct here would only add a shuffle.

    The per-bucket min is a map-side-combinable groupBy, and the probe
    join reuses the groupBy's hash partitioning — one exchange of the
    slim (key, band, bh) stream, no broadcast of the bucket table (at
    100 TB there are O(n·bands) buckets; broadcasting them would not
    scale)."""
    buckets = _band_buckets(sigs, key, num_hashes, bands)
    join_cols = ["band", "bh"]
    if max_bucket_size:
        buckets = cap_buckets(buckets, join_cols, key, max_bucket_size)
        join_cols.append("__sub")
    mins = buckets.groupBy(*join_cols).agg(F.min(key).alias("__root"))
    return (
        buckets.join(mins, join_cols)
        .where(F.col(key) != F.col("__root"))
        .select(F.col("__root").alias("d1"), F.col(key).alias("d2"))
    )


def ngram_jaccard(
    df: DataFrame, pairs: DataFrame, key: str = "doc_id", text: str = "text", n: int = 2
) -> DataFrame:
    """Exact Jaccard verification on candidate pairs (d1, d2)."""
    sh = explode_nonnull(df, shingles(F.col(text), n), "sh", key)
    sizes = sh.groupBy(key).agg(F.count("*").alias("sz"))
    x, y = sh.alias("x"), sh.alias("y")
    inter = (
        pairs.join(x, pairs["d1"] == F.col(f"x.{key}"))
        .join(y, (pairs["d2"] == F.col(f"y.{key}")) & (F.col("x.sh") == F.col("y.sh")))
        .groupBy("d1", "d2")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed(key, "d1").withColumnRenamed("sz", "sz1"), "d1")
        .join(sizes.withColumnRenamed(key, "d2").withColumnRenamed("sz", "sz2"), "d2")
        .select(
            "d1",
            "d2",
            F.round(
                F.col("inter").cast("double")
                / (F.col("sz1") + F.col("sz2") - F.col("inter")).cast("double"),
                4,
            ).alias("jaccard"),
        )
    )


def simhash(df: DataFrame, key: str = "doc_id", text: str = "text", bits: int = 16) -> DataFrame:
    """Per-document SimHash sketch (majority vote per bit over word hashes).

    Single pass over the word hashes: one ``aggregate`` accumulates all
    per-bit set counts (array of counters via zip_with), then one fold
    packs the majority bits — instead of ``bits`` separate array scans
    per document (measured ~3× faster at 16 bits on the bench corpus)."""
    hs = df.select(
        key,
        F.transform(F.array_distinct(F.split(F.col(text), " ")), word_hash).alias("hs"),
    )
    counts = F.expr(
        f"aggregate(hs, array_repeat(0L, {bits}), "
        f"(acc, h) -> zip_with(acc, transform(sequence(0, {bits - 1}), "
        f"b -> (h >> b) & 1L), (a, x) -> a + x))"
    )
    staged = hs.select(key, counts.alias("c"), F.size("hs").alias("n"))
    sketch = F.expr(
        f"aggregate(transform(sequence(0, {bits - 1}), "
        f"b -> IF(element_at(c, b + 1) * 2 > n, CAST(1 AS BIGINT) << b, 0L)), "
        f"0L, (a, x) -> a + x)"
    )
    return staged.select(key, sketch.alias("simhash"))


def simhash_near_dups(
    df: DataFrame,
    key: str = "doc_id",
    text: str = "text",
    bits: int = 16,
    radius: int = 2,
    n_blocks: int = 4,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Near-dup pairs within a SimHash Hamming radius.

    Scale shape (the classic block-pigeonhole trick): split the sketch
    into ``n_blocks`` blocks — two sketches within Hamming distance
    ``radius`` (< n_blocks·1) must agree exactly on ≥ n_blocks − radius
    blocks, so candidates are an equi-join on every
    (block-combination id, block values) key with n_blocks − radius
    blocks, then an exact ``bit_count(xor)`` filter.  No all-pairs
    anywhere; hot buckets are salted via cap_buckets.
    """
    from itertools import combinations

    if radius >= n_blocks:
        raise ValueError("radius must be < n_blocks for the pigeonhole join")
    sh = simhash(df, key, text, bits)
    block_bits = bits // n_blocks
    mask = (1 << block_bits) - 1
    blocks = [
        (F.shiftright(F.col("simhash"), i * block_bits).bitwiseAND(F.lit(mask)))
        for i in range(n_blocks)
    ]
    combos = list(combinations(range(n_blocks), n_blocks - radius))
    keyed = explode_nonnull(
        sh,
        F.array(
            *[
                F.struct(
                    F.lit(ci).alias("combo"),
                    F.concat_ws(
                        "_", *[blocks[b].cast("string") for b in combo]
                    ).alias("bk"),
                )
                for ci, combo in enumerate(combos)
            ]
        ),
        "c",
        key,
        "simhash",
    ).select(key, "simhash", F.col("c.combo").alias("combo"), F.col("c.bk").alias("bk"))
    join_cols = ["combo", "bk"]
    if max_bucket_size:
        keyed = cap_buckets(keyed, join_cols, key, max_bucket_size)
        join_cols.append("__sub")
    a, b_ = keyed.alias("a"), keyed.alias("b")
    cond = F.col(f"a.{key}") < F.col(f"b.{key}")
    for c in join_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    pairs = (
        a.join(b_, cond)
        .select(
            F.col(f"a.{key}").alias("d1"),
            F.col(f"b.{key}").alias("d2"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= radius)
        .distinct()
    )
    return pairs


def dedup_clusters(
    pairs: DataFrame,
    d1: str = "d1",
    d2: str = "d2",
    max_iter: int = 25,
) -> DataFrame:
    """Resolve candidate near-dup PAIRS into connected-component
    CLUSTERS: (doc_id, cluster_id) with cluster_id = the component's
    minimum member — the stage real corpus dedup needs beyond pairwise
    survivors (A copies B copies C must collapse to ONE cluster even if
    (A, C) was never a candidate pair).

    Alternating large-star / small-star contraction (Kiveris et al.,
    "Connected Components in MapReduce and Beyond"): every step is a
    groupBy-min plus an equi-join — no driver-side graph, no RDDs —
    and the edge set converges to per-component stars in O(log n)
    rounds.  Each round materializes the edge frame via a lazy
    ``localCheckpoint`` driven by the convergence-signature aggregate —
    one Spark action per round (iterative DataFrames MUST truncate
    lineage: re-planning the compounded plan grows super-linearly per
    round — measured 3s → 30s by round 3 without it) — and compares a
    (count, checksum) pair for convergence; at 100 TB the shuffled edge
    lists carry two longs per edge, never documents.  Pair inputs are
    deduped and self-loops dropped; nodes appearing in no pair are
    absent from the output (they are their own trivial clusters).
    """

    def _canon(edges: DataFrame) -> DataFrame:
        return edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).distinct()

    # canonicalize + dedup the INPUT pairs in one pass: the former
    # distinct-then-canon shape paid two consecutive shuffles of the
    # full edge set before the first contraction round (the canonical
    # distinct subsumes the raw one — 4.8M candidate edges at bench
    # sf1.0 made that a measurable double scan)
    e = _canon(
        pairs.select(F.col(d1).alias("u"), F.col(d2).alias("v")).where(
            F.col("u") != F.col("v")
        )
    )

    def _checkpoint_and_sign(edges: DataFrame) -> tuple[DataFrame, tuple[int, int]]:
        """Lineage-truncate + convergence signature in ONE action: a
        LAZY localCheckpoint whose materialization is driven by the
        signature aggregate.  The former eager-checkpoint-then-agg
        shape ran two jobs per round — on converged-small edge sets the
        rounds are pure scheduling latency, so halving the job count
        halves the contraction tail.  bit_xor: order-independent,
        overflow-free (edges are distinct, so xor-cancellation of
        duplicates cannot occur)."""
        ck = edges.localCheckpoint(eager=False)
        r = ck.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("s"),
        ).first()
        return ck, (r["n"], r["s"])

    global LAST_CONVERGENCE_ROUNDS
    e, sig = _checkpoint_and_sign(e)
    for _round in range(max_iter):
        # large-star: for every node, link its LARGER neighbors to the
        # minimum of the closed neighborhood
        bidir = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = bidir.groupBy("u").agg(
            F.least(F.first("u"), F.min("v")).alias("m")
        )
        large = (
            bidir.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        # small-star: orient (big → small); link the smaller-or-equal
        # neighborhood (and the center) to its minimum.  No distinct
        # here — the algorithm tolerates duplicate edges and the round's
        # closing canon dedups once, saving a shuffle per round
        o = large.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        mins2 = o.groupBy("u").agg(F.least(F.first("u"), F.min("v")).alias("m"))
        joined = o.join(mins2, "u")
        small = (
            joined.select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(joined.select("u", F.col("m").alias("v")))
        )
        nxt, nsig = _checkpoint_and_sign(
            _canon(small).where(F.col("u") != F.col("v"))
        )
        e = nxt
        if nsig == sig:
            LAST_CONVERGENCE_ROUNDS = _round + 1
            break
        sig = nsig
    else:
        raise RuntimeError(
            f"dedup_clusters did not converge in {max_iter} star rounds"
        )
    roots = e.select(F.col("v").alias("node")).distinct()
    labels = e.select(F.col("u").alias("node"), F.col("v").alias("cluster_id")).union(
        roots.select("node", F.col("node").alias("cluster_id"))
    ).distinct()
    return labels.select(F.col("node").alias(d1), "cluster_id")


def minhash_lsh_dedup(
    df: DataFrame,
    key: str = "doc_id",
    text: str = "text",
    num_hashes: int = 8,
    bands: int = 4,
    jaccard_threshold: float = 0.7,
) -> DataFrame:
    """Full near-dup pipeline: signatures → LSH candidates → Jaccard
    verify → drop the higher-key member of each confirmed pair."""
    sigs = minhash_signatures(df, key, text, num_hashes)
    cands = minhash_lsh_candidates(sigs, key, num_hashes, bands)
    verified = ngram_jaccard(df, cands, key, text).where(
        F.col("jaccard") >= jaccard_threshold
    )
    losers = verified.select(F.col("d2").alias(key)).distinct()
    return df.join(losers, on=key, how="left_anti")
