"""Explode helper that sidesteps Catalyst's InferFiltersFromGenerate trap.

``explode(expensive_expr)`` makes Catalyst infer
``size(expensive_expr) > 0 AND isnotnull(expensive_expr)`` and push that
filter through every Project/Exchange down to the file scan — with the
alias RE-EXPANDED to the full expression.  For a computed array (n-gram
hashing, minhash shingles, struct-event builds) the entire array is then
built twice per row, and worse, the pushed copy lands in the scan stage,
which for a single-file input is ONE task: the whole corpus is hashed
serially before the fanned-out stage hashes it again (measured 3.7 s vs
0.5 s on sf0.1 decontamination; see BENCH.md round 5).

``explode_outer`` infers no such filter (an outer generate cannot prune
its input).  Empty/null arrays produce a single all-null row, which the
cheap post-filter below removes — semantically identical to ``explode``
PROVIDED the array's elements are never null, which every call site in
this package guarantees by construction (hashes, packed longs, structs
built with non-null fields).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def explode_nonnull(df: DataFrame, arr: Column, alias: str, *keep) -> DataFrame:
    """``df.select(*keep, explode(arr))`` without the inferred-filter
    re-evaluation.  ``arr`` must not contain null ELEMENTS (empty or
    null arrays are fine — they contribute no rows, as with explode)."""
    return df.select(*keep, F.explode_outer(arr).alias(alias)).where(
        F.col(alias).isNotNull()
    )
