"""Range-delete pairing + apply on a composite clustering key — mirrors
the reference's 5×5×5 clustering-cube scenario with prefix/tuple bounds
(replication_tests.rs:960-986)."""

import itertools

from pyspark.sql import functions as F

from scylla_cdc_rust_spark.model import OP_NORM, ORD, STREAM_ID, OperationType
from scylla_cdc_rust_spark.operators.range_delete import (
    apply_range_deletes,
    pair_range_deletes,
)

L_IN = int(OperationType.ROW_RANGE_DEL_INCL_LEFT)
L_EX = int(OperationType.ROW_RANGE_DEL_EXCL_LEFT)
R_IN = int(OperationType.ROW_RANGE_DEL_INCL_RIGHT)
R_EX = int(OperationType.ROW_RANGE_DEL_EXCL_RIGHT)

CK = ["ck1", "ck2", "ck3"]


def oracle_in_range(ck, l, r, l_incl, r_incl):
    def cmp_prefix(row, bound):
        for rv, bv in zip(row, bound):
            if bv is None:
                return 0
            if rv != bv:
                return 1 if rv > bv else -1
        return 0

    cl = cmp_prefix(ck, l)
    cr = cmp_prefix(ck, r)
    above = cl > 0 or (cl == 0 and l_incl)
    below = cr < 0 or (cr == 0 and r_incl)
    return above and below


def test_range_delete_cube(spark):
    # 5×5×5 cube under pk='p'
    rows = [("p", a, b, c, 0) for a, b, c in itertools.product(range(5), repeat=3)]
    target = spark.createDataFrame(rows, "pk string, ck1 int, ck2 int, ck3 int, wrote long")

    # bound rows in one stream: (full-tuple bounds) and (prefix bounds)
    deletes = [
        # (1,1,1) <= ck <= (2,2,2)
        (L_IN, (1, 1, 1), 10),
        (R_IN, (2, 2, 2), 11),
        # (3) < ck < (4,2)  — prefix bounds with trimmed NULLs
        (L_EX, (3, None, None), 20),
        (R_EX, (4, 2, None), 21),
    ]
    log_rows = [
        (b"s1", op, ck[0], ck[1], ck[2], "p", ordv) for op, ck, ordv in deletes
    ]
    decoded = spark.createDataFrame(
        log_rows,
        f"`{STREAM_ID}` binary, {OP_NORM} int, ck1 int, ck2 int, ck3 int, pk string, {ORD} long",
    )

    pairs = pair_range_deletes(decoded, ["pk"], CK)
    got_pairs = sorted([tuple(r) for r in pairs.collect()])
    assert len(got_pairs) == 2

    result = apply_range_deletes(target, pairs, ["pk"], CK, target_ord_col="wrote")
    kept = {(r["ck1"], r["ck2"], r["ck3"]) for r in result.collect()}

    expected = set()
    bounds = [
        ((1, 1, 1), (2, 2, 2), True, True),
        ((3, None, None), (4, 2, None), False, False),
    ]
    for ck in itertools.product(range(5), repeat=3):
        if not any(oracle_in_range(ck, l, r, li, ri) for l, r, li, ri in bounds):
            expected.add(ck)
    assert kept == expected


def test_range_delete_respects_write_timestamp(spark):
    # rows written AFTER the range delete survive (A10)
    target = spark.createDataFrame(
        [("p", 1, 1, 1, 5), ("p", 1, 1, 2, 50)],
        "pk string, ck1 int, ck2 int, ck3 int, wrote long",
    )
    decoded = spark.createDataFrame(
        [(b"s1", L_IN, 1, None, None, "p", 9), (b"s1", R_IN, 1, None, None, "p", 10)],
        f"`{STREAM_ID}` binary, {OP_NORM} int, ck1 int, ck2 int, ck3 int, pk string, {ORD} long",
    )
    pairs = pair_range_deletes(decoded, ["pk"], CK)
    out = apply_range_deletes(target, pairs, ["pk"], CK, target_ord_col="wrote")
    assert [(r["ck3"], r["wrote"]) for r in out.collect()] == [(2, 50)]


def test_unpaired_bounds_ignored(spark):
    decoded = spark.createDataFrame(
        [(b"s1", L_IN, 1, None, None, "p", 9), (b"s1", L_EX, 2, None, None, "p", 10),
         (b"s1", R_IN, 3, None, None, "p", 11)],
        f"`{STREAM_ID}` binary, {OP_NORM} int, ck1 int, ck2 int, ck3 int, pk string, {ORD} long",
    )
    pairs = pair_range_deletes(decoded, ["pk"], CK).collect()
    # only the adjacent (L_EX@10 → R_IN@11) pair forms
    assert len(pairs) == 1 and pairs[0]["l_incl"] is False and pairs[0]["r_incl"] is True
