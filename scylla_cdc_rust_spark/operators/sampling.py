"""Deterministic stratified sampling for training-data pipelines.

At 100 TB, sampling must be (a) a pure map-side filter — no shuffle, no
state, no reservoir — and (b) reproducible across reruns and engines so
downstream dedup/checkpointing stays stable.  Both follow from hashing
a stable row id: keep a row iff ``H(id) mod M < rate·M``.  The hash is
the engine-portable md5-prefix bigint used across this repo (same
values in DuckDB — queries.py), so sampled sets are oracle-checkable.

The per-stratum rate table enters the plan as a literal map (strata
counts are catalog-sized, never data-sized); the whole operator
compiles to one whole-stage-codegen filter over the scan — filters and
column pruning still reach parquet untouched.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: hash-space modulus: rates are resolved to integer thresholds out of M
SAMPLE_MOD = 1_000_000


def sample_hash(
    id_col: Column | str, mod: int = SAMPLE_MOD, hash_impl: str = "portable"
) -> Column:
    """Uniform hash of a row id into [0, mod).

    ``"portable"`` (default): the repo-wide md5-prefix word hash
    (functions.text.word_hash, mod-M31-reduced so Spark and DuckDB
    agree) applied to the id's string form — the oracle-checkable mode.
    ``"xxhash64"``: production mode, one cheap JVM hash; selects a
    different but statistically-equivalent sample (same rates, same
    determinism/reproducibility guarantees)."""
    from scylla_cdc_rust_spark.functions.text import word_hash

    c = F.col(id_col) if isinstance(id_col, str) else id_col
    if hash_impl == "portable":
        return word_hash(c.cast("string")) % F.lit(mod)
    if hash_impl == "xxhash64":
        return F.pmod(F.xxhash64(c.cast("string")), F.lit(mod))
    raise ValueError(f"unknown hash_impl: {hash_impl!r}")


def sample_threshold(
    rates: dict[str, float],
    strata_col: str = "lang",
    default_rate: float = 0.0,
) -> Column:
    """Integer keep-threshold (out of SAMPLE_MOD) for a row's stratum:
    the literal rate map resolved against ``strata_col``, falling back
    to ``default_rate`` for unlisted strata."""
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for stratum {s!r} out of [0,1]: {r}")
    pairs: list[Column] = []
    for s, r in sorted(rates.items()):
        pairs.append(F.lit(s))
        pairs.append(F.lit(int(round(r * SAMPLE_MOD))))
    return F.coalesce(
        F.element_at(F.create_map(*pairs), F.col(strata_col)) if pairs else F.lit(None),
        F.lit(int(round(default_rate * SAMPLE_MOD))),
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    hash_impl: str = "portable",
) -> DataFrame:
    """Keep each stratum at its configured rate, deterministically.

    ``rates``: stratum value → keep rate in [0, 1].  Unlisted strata
    keep ``default_rate``.  Rerunning (or running on another engine)
    selects the SAME rows — the property that makes sampled corpora
    diffable and resumable.  rate=1.0 keeps every row of the stratum.
    ``hash_impl="xxhash64"`` swaps in the production hash (see
    ``sample_hash``) — still deterministic, different selection.
    """
    thresh = sample_threshold(rates, strata_col, default_rate)
    return df.where(sample_hash(id_col, hash_impl=hash_impl) < thresh)


def mixture_thresholds(
    counts: dict[str, int], weights: dict[str, int], mod: int = SAMPLE_MOD
) -> dict[str, int]:
    """Per-stratum integer keep-thresholds (out of ``mod``) realizing a
    target mixture with maximum data retention.

    ``weights``: stratum → integer mixture part (e.g. {"web": 6,
    "books": 1} targets 6:1).  The largest total T whose mixture is
    exact has every stratum feasible: T = min_s(c_s·W // w_s) with
    W = Σw; stratum s then keeps t_s = T·w_s // W of its c_s docs, via
    hash threshold mod·t_s // c_s.  INTEGER arithmetic throughout —
    floor division only — so a SQL oracle reproduces the thresholds
    bit-exactly (no float rounding to disagree on).  Strata present in
    the corpus but absent from ``weights`` keep nothing (rate 0).
    """
    missing = [s for s in weights if weights[s] > 0 and counts.get(s, 0) == 0]
    if missing:
        raise ValueError(f"weighted strata absent from corpus: {missing}")
    if any(w < 0 for w in weights.values()):
        raise ValueError("mixture weights must be >= 0")
    W = sum(weights.values())
    if W <= 0:
        raise ValueError("mixture weights must sum to > 0")
    T = min(counts[s] * W // w for s, w in weights.items() if w > 0)
    out = {}
    for s, w in weights.items():
        if w <= 0:
            continue
        t_s = T * w // W
        out[s] = mod * t_s // counts[s]
    return out


def mixture_sample(
    df: DataFrame,
    weights: dict[str, int],
    strata_col: str = "source",
    id_col: str = "doc_id",
    hash_impl: str = "portable",
) -> DataFrame:
    """Resample the corpus to a target domain mixture, deterministically.

    The per-stratum counts feeding the threshold computation come from
    one aggregate whose result is catalog-sized (one row per domain) —
    the only driver-side data this operator ever collects.  The filter
    itself is the same pure map-side hash threshold as
    ``stratified_sample``: no shuffle, reproducible across engines,
    and the Parquet scan keeps its pushed filters/pruning.
    """
    counts = {
        r[0]: r[1]
        for r in df.groupBy(strata_col).count().collect()
        if r[0] is not None
    }
    thresholds = mixture_thresholds(counts, weights)
    # sample_threshold re-quantizes rate·MOD with round(); build the
    # literal map from the exact integer thresholds instead so the
    # floor-division arithmetic survives into the plan bit-exactly
    pairs: list[Column] = []
    for s, t in sorted(thresholds.items()):
        pairs.append(F.lit(s))
        pairs.append(F.lit(t))
    thresh = F.coalesce(
        F.element_at(F.create_map(*pairs), F.col(strata_col))
        if pairs
        else F.lit(None),
        F.lit(0),
    )
    return df.where(sample_hash(id_col, hash_impl=hash_impl) < thresh)
