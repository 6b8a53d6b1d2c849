"""Row-range deletes (A6, SURVEY §2.4) — the general clustering-key form.

Reference: a left-bound log row (ops 5/6) is buffered until the next
right-bound row (ops 7/8) arrives on the same stream, then a composite
clustering-tuple range DELETE is issued; bounds may be *prefixes* of
the clustering key with NULLs trimmed
(replicator_consumer.rs:587-659 pairing + query synthesis;
:661-701 condition generation).

Spark mapping: bound rows are paired declaratively with ``lead()`` over
per-stream clustering order (no buffering state), and the delete is an
anti-join of the keyed table against the paired ranges with a
lexicographic tuple comparison that honours prefix bounds and
inclusivity.  On the engine's single-column-key target this whole
operator degenerates to a no-op (no clustering key to range over) —
kept general and tested on a composite-key table, mirroring the
reference's 5×5×5 clustering-cube scenario (replication_tests.rs:960-986).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from scylla_cdc_rust_spark.model import OP_NORM, ORD, STREAM_ID, OperationType

LEFT_OPS = (
    int(OperationType.ROW_RANGE_DEL_INCL_LEFT),
    int(OperationType.ROW_RANGE_DEL_EXCL_LEFT),
)
RIGHT_OPS = (
    int(OperationType.ROW_RANGE_DEL_INCL_RIGHT),
    int(OperationType.ROW_RANGE_DEL_EXCL_RIGHT),
)


def pair_range_deletes(
    decoded: DataFrame, pk_cols: list[str], ck_cols: list[str]
) -> DataFrame:
    """Pair left/right bound rows per stream in clustering order.

    Returns one row per range: pk..., l_<ck>/r_<ck> bound values,
    l_incl/r_incl flags, ord (of the right bound — the delete's write
    timestamp)."""
    bounds = decoded.where(F.col(OP_NORM).isin(*LEFT_OPS, *RIGHT_OPS)).select(
        STREAM_ID,
        ORD,
        F.col(OP_NORM).alias("__bop"),
        *pk_cols,
        *ck_cols,
    )
    w = W.partitionBy(STREAM_ID, *pk_cols).orderBy(ORD)
    nxt = {c: F.lead(c).over(w) for c in [*ck_cols, "__bop", ORD]}
    paired = bounds.select(
        *pk_cols,
        F.col("__bop").alias("l_op"),
        nxt["__bop"].alias("r_op"),
        *[F.col(c).alias(f"l_{c}") for c in ck_cols],
        *[nxt[c].alias(f"r_{c}") for c in ck_cols],
        nxt[ORD].alias(ORD),
    )
    return paired.where(
        F.col("l_op").isin(*LEFT_OPS) & F.col("r_op").isin(*RIGHT_OPS)
    ).select(
        *pk_cols,
        *[f"l_{c}" for c in ck_cols],
        *[f"r_{c}" for c in ck_cols],
        (F.col("l_op") == LEFT_OPS[0]).alias("l_incl"),
        (F.col("r_op") == RIGHT_OPS[0]).alias("r_incl"),
        F.col(ORD),
    )


def _tuple_cmp(
    row_cols: list[Column],
    bound_cols: list[Column],
    or_equal: Column,
    greater: bool,
) -> Column:
    """Lexicographic (row >/< bound) over the bound's non-null prefix;
    ``or_equal`` controls whether full-prefix equality passes (the
    reference's NULL-trimmed prefix semantics,
    replicator_consumer.rs:661-701)."""
    hit = F.lit(False)
    prefix_eq = F.lit(True)
    for rc, b in zip(row_cols, bound_cols):
        step = (rc > b) if greater else (rc < b)
        hit = hit | (prefix_eq & b.isNotNull() & step)
        prefix_eq = prefix_eq & (b.isNull() | (rc == b))
    return hit | (prefix_eq & or_equal)


def apply_range_deletes(
    target: DataFrame,
    ranges: DataFrame,
    pk_cols: list[str],
    ck_cols: list[str],
    target_ord_col: str | None = None,
) -> DataFrame:
    """Delete target rows falling inside any paired range (anti-join).

    If ``target_ord_col`` is given, only rows written before the range
    delete are removed (USING TIMESTAMP semantics, A10)."""
    r = ranges.select(
        *[F.col(c).alias(f"__pk_{c}") for c in pk_cols],
        *[F.col(f"l_{c}") for c in ck_cols],
        *[F.col(f"r_{c}") for c in ck_cols],
        "l_incl",
        "r_incl",
        F.col(ORD).alias("__del_ord"),
    )
    row_ck = [target[c] for c in ck_cols]
    above_left = _tuple_cmp(
        row_ck, [r[f"l_{c}"] for c in ck_cols], r["l_incl"], greater=True
    )
    below_right = _tuple_cmp(
        row_ck, [r[f"r_{c}"] for c in ck_cols], r["r_incl"], greater=False
    )
    cond = above_left & below_right
    for c in pk_cols:
        cond = cond & (target[c] == r[f"__pk_{c}"])
    if target_ord_col:
        cond = cond & (target[target_ord_col] < r["__del_ord"])
    return target.join(r, on=cond, how="left_anti")
