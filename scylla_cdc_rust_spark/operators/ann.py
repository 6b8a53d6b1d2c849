"""Approximate nearest neighbours over embedding columns.

Three tiers, all pure DataFrame ops:

- ``brute_force_topk``: exact cosine top-k via crossJoin — the
  correctness baseline; scale cost is |Q|×|C|, so only for small query
  sets or verification samples.
- ``lsh_topk``: random-hyperplane LSH — candidates share a sign-bucket
  (one equi-join on the bucket id), cosine computed only inside
  buckets; multiple hash tables (rotations) trade recall for cost.
  This is the 100 TB path: bucket id is a plain int column, so the join
  shuffles hash-partitioned by bucket and prunes everything else.
- ``ivf_topk``: inverted-file index — a deterministic k-means coarse
  quantizer (``train_ivf_centroids``) partitions candidates into
  cells; each query probes its ``nprobe`` nearest cells.  Centroids
  live in the plan as literals (k·dim doubles), assignment is pure
  codegen, the probe is one equi-join on the cell id.  nprobe = k_cells
  degenerates to exact search (the property the tests pin).

Dot products use ``zip_with``/``aggregate`` (JVM, codegen) — no Python
in the hot path.  Hyperplanes are deterministic integer grids so runs
are reproducible and oracle-checkable (queries.py emb_* entries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from scylla_cdc_rust_spark.functions.generate_util import explode_nonnull


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    q = queries.select(
        F.col(id_col).alias("qid"), _as_double(F.col(vec_col)).alias("qv")
    )
    c = candidates.select(
        F.col(id_col).alias("cid"), _as_double(F.col(vec_col)).alias("cv")
    )
    scored = q.crossJoin(c).select(
        "qid", "cid", F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos")
    )
    w = W.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _hyperplane(j: int, dim: int, stride: int = 1):
    """Deterministic pseudo-random integer hyperplane (reproducible)."""
    return [((j * 131 + d * 197) % 17) - 8 for d in range(0, dim, stride)]


def lsh_bucket(vec_col: str, dim: int, n_planes: int = 8, stride: int = 1):
    """Sign-bucket id from n deterministic hyperplanes.

    ``vec_col`` is the array column's NAME: the whole bucket id is
    assembled as one parsed SQL expression instead of n_planes·dim
    Column operators (each a py4j round trip + a Catalyst node — the
    unrolled form cost ~1 s of fixed per-query overhead at 8×64).
    Left-associative `+` in the parsed string reproduces the unrolled
    fold's float order exactly (0.0 + t1 ≡ t1 in IEEE)."""
    terms = []
    for j in range(n_planes):
        g = _hyperplane(j, dim, stride)
        dot = " + ".join(
            f"CAST(element_at(`{vec_col}`, {i * stride + 1}) AS DOUBLE) * {w}"
            for i, w in enumerate(g)
        )
        terms.append(f"(CASE WHEN ({dot}) > 0.0D THEN {1 << j} ELSE 0 END)")
    return F.expr("CAST(" + " + ".join(terms) + " AS INT)")


def lsh_topk(
    queries: DataFrame,
    candidates: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_candidates_per_bucket: int | None = None,
) -> DataFrame:
    """Bucketed ANN: join queries to candidates sharing the sign bucket.

    ``max_candidates_per_bucket``: optional hot-bucket guard — keep a
    deterministic hash-ordered sample of at most that many candidates
    per bucket, bounding the join at |Q|·cap when one bucket degenerates
    (recall tradeoff documented; exact top-k within the sampled set)."""
    q = queries.select(
        F.col(id_col).alias("qid"),
        _as_double(F.col(vec_col)).alias("qv"),
        lsh_bucket(vec_col, dim, n_planes).alias("bucket"),
    )
    c = candidates.select(
        F.col(id_col).alias("cid"),
        _as_double(F.col(vec_col)).alias("cv"),
        lsh_bucket(vec_col, dim, n_planes).alias("bucket"),
    )
    if max_candidates_per_bucket:
        # Skew-free two-stage cap: (1) broadcast the over-cap bucket
        # counts (groupBy count — map-side combinable) and hash-mod thin
        # each such bucket to ~2×cap expected survivors; (2) exact
        # row_number within the thinned set.  The window/sort task then
        # touches O(cap) rows per bucket no matter how degenerate the
        # bucket — a mega-bucket never funnels through one sort task.
        # Persist the bucketed candidates: the count pass and the probe
        # pass both read them, and the bucket projection (sign-plane
        # aggregate per vector) is the expensive part of this plan.
        from pyspark import StorageLevel

        c = c.persist(StorageLevel.MEMORY_AND_DISK)
        cap = max_candidates_per_bucket
        hot = (
            c.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") > cap)
        )
        thin_mod = F.greatest(
            F.lit(1), F.floor(F.col("__n") / F.lit(2 * cap)).cast("long")
        )
        c = (
            c.join(F.broadcast(hot), "bucket", "left")
            .where(
                F.col("__n").isNull()
                | (F.pmod(F.xxhash64("cid"), thin_mod) == 0)
            )
            .drop("__n")
        )
        wcap = W.partitionBy("bucket").orderBy(F.xxhash64("cid"), F.asc("cid"))
        c = (
            c.withColumn("__rn", F.row_number().over(wcap))
            .where(F.col("__rn") <= cap)
            .drop("__rn")
        )
    scored = q.join(c, "bucket").select(
        "qid", "cid", F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos")
    )
    w = W.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _nearest_cells(vec_col, centroids: list[list[float]], n: int):
    """Indices of the n nearest centroids, as an array column (sorted by
    distance; ties by index — fully deterministic).

    The centroids enter the plan as ONE literal array<array<double>>
    folded with a single transform lambda, not per-centroid unrolled
    expressions: the unrolled form is O(k·dim) expression NODES — k·dim
    py4j round trips to build and a matching Catalyst analysis/codegen
    bill (seconds of fixed per-query cost for 8×64).  The literal is
    assembled as one parsed SQL expression (``repr`` round-trips doubles
    exactly), so building it is a single driver call.  Arithmetic order
    per centroid is unchanged (zip_with then a 0.0-seeded left fold),
    so results are bit-identical to the unrolled form and to the DuckDB
    oracle."""
    lit_cs = F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(repr(float(x)) + "D" for x in c) + ")"
            for c in centroids
        )
        + ")"
    )
    packed = F.transform(
        lit_cs,
        lambda c, j: F.struct(
            F.aggregate(
                F.zip_with(vec_col, c, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("d"),
            j.alias("j"),
        ),
    )
    return F.slice(
        F.transform(F.array_sort(packed), lambda s: s["j"]), 1, n
    )


def train_ivf_centroids(
    df: DataFrame,
    dim: int,
    n_centroids: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_mod: int | None = None,
) -> list[list[float]]:
    """Deterministic k-means coarse quantizer.

    Init = the ``n_centroids`` vectors with the smallest xxhash64(id)
    (a reproducible sample); then ``iters`` Lloyd steps, each one
    assign-and-average pass over the data (groupBy cell → per-dimension
    avg).  Everything is DataFrame ops; only the k·dim centroid floats
    ever reach the driver.
    """
    v = df.select(F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v"))
    if sample_mod:
        # deterministic 1/sample_mod training subsample — standard IVF
        # practice: the quantizer needs the density shape, not every row
        v = v.where(F.pmod(F.xxhash64("id"), F.lit(sample_mod)) == 0)
    seed_rows = (
        v.orderBy(F.xxhash64("id"), "id").limit(n_centroids).select("v").collect()
    )
    centroids = [list(r["v"]) for r in seed_rows]
    for _ in range(iters):
        cell = _nearest_cells(F.col("v"), centroids, 1)[0]
        means = (
            v.select(cell.alias("cell"), "v")
            .groupBy("cell")
            .agg(*[
                F.avg(F.element_at("v", i + 1)).alias(f"m{i}") for i in range(dim)
            ])
            .collect()
        )
        new = {int(r["cell"]): [float(r[f"m{i}"]) for i in range(dim)] for r in means}
        # empty cells keep their previous centroid (standard k-means fix)
        centroids = [new.get(j, centroids[j]) for j in range(len(centroids))]
    return centroids


def grid_centroids(dim: int, n_centroids: int, scale: float = 40.0) -> list[list[float]]:
    """Deterministic, data-independent coarse-quantizer centroids — the
    same integer-grid idiom as ``_hyperplane``, scaled to typical
    unit-ish embedding magnitude.  Used when the quantizer must be
    reproducible without seeing the data (oracle-checkable literals);
    for data-adapted cells use ``train_ivf_centroids`` +
    ``IVFQuantizer.save`` once, offline."""
    return [
        [(((j * 131 + d * 197) % 17) - 8) / scale for d in range(dim)]
        for j in range(n_centroids)
    ]


class IVFQuantizer:
    """Persistable IVF coarse quantizer: train once (offline), save the
    k·dim centroids next to the index data, reuse across every query /
    micro-batch.  At 10^10 rows the quantizer is index metadata — it
    must never be retrained inside a query (train = iters+1 Spark jobs
    + a driver collect); this class is the train-once/probe-many API
    the per-call ``ivf_topk(centroids=None)`` path lacks."""

    MANIFEST = "ivf_centroids.json"

    def __init__(self, centroids: list[list[float]]):
        if not centroids:
            raise ValueError("empty centroid set")
        self.centroids = [list(map(float, c)) for c in centroids]
        self.n_centroids = len(centroids)
        self.dim = len(centroids[0])

    # -- constructors -----------------------------------------------------
    @classmethod
    def train(cls, df: DataFrame, dim: int, n_centroids: int = 16,
              iters: int = 2, sample_mod: int | None = None,
              id_col: str = "vec_id", vec_col: str = "embedding") -> "IVFQuantizer":
        return cls(train_ivf_centroids(
            df, dim, n_centroids, iters, id_col=id_col, vec_col=vec_col,
            sample_mod=sample_mod))

    @classmethod
    def grid(cls, dim: int, n_centroids: int, scale: float = 40.0) -> "IVFQuantizer":
        return cls(grid_centroids(dim, n_centroids, scale))

    # -- persistence (manifest-file pattern, cf. ParquetMergeTable) --------
    def save(self, path: str) -> None:
        import json
        import os

        os.makedirs(path, exist_ok=True)
        tmp = os.path.join(path, self.MANIFEST + ".tmp")
        with open(tmp, "w") as f:
            json.dump({"dim": self.dim, "n_centroids": self.n_centroids,
                       "centroids": self.centroids}, f)
        os.replace(tmp, os.path.join(path, self.MANIFEST))

    @classmethod
    def load(cls, path: str) -> "IVFQuantizer":
        import json
        import os

        with open(os.path.join(path, cls.MANIFEST)) as f:
            return cls(json.load(f)["centroids"])

    # -- query-time ops (pure codegen over literal centroids) --------------
    def assign(self, df: DataFrame, vec_col: str = "embedding",
               out_col: str = "cell") -> DataFrame:
        return df.withColumn(
            out_col,
            _nearest_cells(_as_double(F.col(vec_col)), self.centroids, 1)[0])

    def topk(self, queries: DataFrame, candidates: DataFrame, k: int = 5,
             nprobe: int = 2, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
        return ivf_topk(queries, candidates, dim=self.dim, k=k,
                        n_centroids=self.n_centroids, nprobe=nprobe,
                        id_col=id_col, vec_col=vec_col,
                        centroids=self.centroids)


def assign_cells_np(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "cv",
    out_col: str = "cell",
) -> DataFrame:
    """Vectorized nearest-cell assignment, bit-identical to
    ``_nearest_cells(vec, centroids, 1)[0]``.

    The expression form evaluates k·dim interpreted lambda ops PER ROW
    (the dominant cost of ``ivf_topk`` — 20k candidates × 8 cells × 64
    dims at bench sf1.0); here each Arrow batch computes all distances
    in numpy (guide §4.2).  Bit-exactness: the squared distance is
    accumulated dimension-by-dimension in the SAME left-fold order as
    Catalyst's 0.0-seeded ``aggregate`` (acc = (acc + mᵢ·mᵢ) with one
    subtract, one multiply, one add per step — identical IEEE
    roundings), and ties pick the lower cell index exactly like the
    (distance, index) ``array_sort``.  So the assignment — and every
    downstream result — is the same float-for-float."""
    import numpy as np

    from pyspark.sql import types as T

    C = [[float(x) for x in c] for c in centroids]
    dim = len(C[0])

    def gen(it):
        for pdf in it:
            n = len(pdf)
            if n == 0:
                continue
            V = np.stack(pdf[vec_col].to_numpy())
            best_d = None
            best_j = None
            for j, c in enumerate(C):
                acc = np.zeros(n)
                for i in range(dim):
                    m = V[:, i] - c[i]
                    acc = acc + m * m  # left fold: ((0+t1)+t2)+...
                if best_d is None:
                    best_d = acc
                    best_j = np.zeros(n, dtype="int32")
                else:
                    better = acc < best_d  # strict: ties keep lower j
                    best_d = np.where(better, acc, best_d)
                    best_j = np.where(better, j, best_j).astype("int32")
            pdf = pdf.copy()
            pdf[out_col] = best_j
            yield pdf

    schema = T.StructType(df.schema.fields + [T.StructField(out_col, T.IntegerType())])
    return df.mapInPandas(gen, schema)


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    dim: int,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF ANN: assign candidates to their nearest cell, probe each
    query's ``nprobe`` nearest cells, exact cosine inside the probed
    cells.  ``nprobe == n_centroids`` ⇒ identical to brute force."""
    if centroids is None:
        centroids = train_ivf_centroids(
            candidates, dim, n_centroids, id_col=id_col, vec_col=vec_col
        )
    from scylla_cdc_rust_spark.session import ensure_min_parallelism

    # fan the candidate scan out below the Python assignment so the
    # mapInPandas runs on every core, not the input's 1-2 splits
    # (structural no-op on a wide index)
    c = assign_cells_np(
        ensure_min_parallelism(
            candidates.select(
                F.col(id_col).alias("cid"),
                _as_double(F.col(vec_col)).alias("cv"),
            ),
            by="cid",
        ),
        centroids,
    )
    # explode_nonnull: plain explode's inferred filter would score every
    # centroid twice per query row (functions/generate_util.py)
    q = explode_nonnull(
        queries.select(
            F.col(id_col).alias("qid"),
            _as_double(F.col(vec_col)).alias("qv"),
        ),
        _nearest_cells(F.col("qv"), centroids, nprobe),
        "cell",
        "qid",
        "qv",
    )
    scored = q.join(c, "cell").select(
        "qid", "cid", F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos")
    )
    w = W.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cid"))
    return (
        scored.dropDuplicates(["qid", "cid"])
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def gram_cosine_pairs(
    buckets: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "v",
    norm_col: str = "norm",
    bucket_cols: tuple[str, ...] = ("bucket",),
    round_digits: int = 4,
    block_rows: int = 4096,
) -> DataFrame:
    """All within-bucket pairs (d1 < d2) with
    ``round(cos, round_digits) >= threshold`` — the dense verification
    stage of embedding near-dup dedup, computed as a per-bucket gram
    matrix in BLAS instead of a per-pair expression join.

    A bucket of m vectors needs all m·(m−1)/2 cosines; the self-join
    form evaluates an interpreted d-element ``zip_with``/``aggregate``
    lambda per pair (Σ m²·d interpreted ops — 229 s for 13.8M pairs at
    bench sf1.0).  Per optimization-guide §4.2 the bucket's vectors are
    handed to native code instead: one ``applyInPandas`` per bucket
    computes V·Vᵀ in ``block_rows`` row-blocks (temporaries bounded at
    block_rows×m doubles) and emits only the qualifying id pairs.  Only
    the n·d vector doubles cross the Python boundary — never the m²
    pairs.

    Float caveat (why this may substitute for the expression join): BLAS
    sums in a different order than the sequential fold, so a cosine
    within ~1e-12 of the rounding boundary could flip.  Use where the
    corpus has a real margin around the threshold (near-dup dedup always
    does: dups ≈ 1.0, non-dups well below) and pin parity in tests.

    Scale shape: the per-bucket memory is O(m·d); callers must bound m
    (cap_buckets-style sub-bucketing or more planes) exactly as they
    already must to bound the m² candidate count itself.
    """
    import numpy as np
    import pandas as pd

    def _bucket_pairs(pdf: "pd.DataFrame") -> "pd.DataFrame":
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        V = np.stack(pdf[vec_col].to_numpy()[order]) if len(ids) else None
        nrm = pdf[norm_col].to_numpy()[order]
        d1s, d2s = [], []
        for s in range(0, len(ids), block_rows):
            G = V[s : s + block_rows] @ V.T
            C = np.round(G / np.outer(nrm[s : s + block_rows], nrm), round_digits)
            ii, jj = np.nonzero(C >= threshold)
            keep = (s + ii) < jj  # ids sorted → index order == id order
            d1s.append(ids[s + ii[keep]])
            d2s.append(ids[jj[keep]])
        empty = np.array([], dtype="int64")
        return pd.DataFrame(
            {
                "d1": np.concatenate(d1s) if d1s else empty,
                "d2": np.concatenate(d2s) if d2s else empty,
            }
        )

    return buckets.groupBy(*bucket_cols).applyInPandas(
        _bucket_pairs, "d1 long, d2 long"
    )


def embedding_near_dups(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Near-duplicate vector pairs via LSH buckets + cosine threshold.
    Buckets above ``max_bucket_size`` are salted into sub-buckets
    (dedup_docs.cap_buckets) so a degenerate bucket — e.g. a corpus of
    near-identical embeddings — cannot go quadratic."""
    from scylla_cdc_rust_spark.operators.dedup_docs import cap_buckets

    b = df.select(
        F.col(id_col).alias("id"),
        _as_double(F.col(vec_col)).alias("v"),
        lsh_bucket(vec_col, dim, n_planes).alias("bucket"),
    )
    join_cols = ["bucket"]
    if max_bucket_size:
        b = cap_buckets(b, join_cols, "id", max_bucket_size)
        join_cols.append("__sub")
    x, y = b.alias("x"), b.alias("y")
    cond = F.col("x.id") < F.col("y.id")
    for c in join_cols:
        cond = cond & (F.col(f"x.{c}") == F.col(f"y.{c}"))
    pairs = x.join(y, cond).select(
        F.col("x.id").alias("d1"),
        F.col("y.id").alias("d2"),
        F.round(cosine(F.col("x.v"), F.col("y.v")), 6).alias("cos"),
    )
    return pairs.where(F.col("cos") >= threshold)
