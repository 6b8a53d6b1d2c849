"""Golden fold tests: engine (cell-level LWW SQL fold) vs sequential oracle.

Mirrors the reference's end-to-end comparison strategy
(replication_tests.rs compare_changes — destination equals source) on
deterministic seeded logs.
"""

import pytest

from scylla_cdc_rust_spark.datagen.gen_log import LogSpec, generate_log
from tests.util import check_fold_matches_oracle


@pytest.mark.parametrize("set_impl", ["elements", "arrays"])
@pytest.mark.parametrize("seed", [42, 7, 99])
def test_fold_random_small(spark, seed, set_impl):
    tbl = generate_log(LogSpec(n_events=2_000, n_docs=120, seed=seed))
    check_fold_matches_oracle(spark, tbl, set_impl=set_impl)


def test_fold_random_medium(spark):
    tbl = generate_log(LogSpec(n_events=20_000, n_docs=800, seed=1234, n_epochs=3))
    check_fold_matches_oracle(spark, tbl)


def test_fold_hot_key_skew(spark):
    # ≥50% of events on one doc (hot_stream_skew fixture, FIXTURES.md §3)
    tbl = generate_log(LogSpec(n_events=10_000, n_docs=50, seed=5, hot_doc_frac=0.6))
    check_fold_matches_oracle(spark, tbl)


def test_fold_list_mode(spark):
    # 'list' collection mode: whole-array overwrite fast path (A8)
    tbl = generate_log(LogSpec(n_events=5_000, n_docs=200, seed=11))
    check_fold_matches_oracle(spark, tbl, modes={"tokens": "list"})


def test_fold_arrays_impl_medium(spark):
    tbl = generate_log(LogSpec(n_events=15_000, n_docs=600, seed=88, n_epochs=2))
    check_fold_matches_oracle(spark, tbl, set_impl="arrays")


def test_fold_arrays_impl_hot_key(spark):
    tbl = generate_log(LogSpec(n_events=8_000, n_docs=60, seed=6, hot_doc_frac=0.6))
    check_fold_matches_oracle(spark, tbl, set_impl="arrays")


@pytest.mark.parametrize("set_impl", ["elements", "arrays"])
def test_overwrite_with_same_change_delete(spark, set_impl):
    """A change that overwrites the collection AND lists an element in
    deleted_elements: removal wins the equal-timestamp tie — the element
    must NOT survive even though the overwrite value contains it.
    (Round-2 regression: the arrays fold ignored rem on overwrite.)"""
    from tests.scenarios import LogBuilder
    from tests.util import check_fold_matches_oracle as check

    b = (
        LogBuilder()
        .insert("a", [1, 2])
        .update("a", tokens=[5, 6, 7], del_tokens=True, del_elems=[6], n_tok=3)
    )
    st = check(spark, b.build(), set_impl=set_impl)
    assert st["a"]["tokens"] == [5, 7]


@pytest.mark.skipif(
    not __import__("os").environ.get("RUN_SLOW_GOLDEN"),
    reason="1M-event golden diff: run with RUN_SLOW_GOLDEN=1 (~3 min)",
)
def test_fold_golden_1m_events(spark):
    """Largest oracle-diffable scale: 1M events / 60k docs / 2 epochs,
    engine fold vs the sequential python oracle, every column."""
    tbl = generate_log(
        LogSpec(n_events=1_000_000, n_docs=60_000, seed=4242, n_epochs=2,
                hot_doc_frac=0.05)
    )
    check_fold_matches_oracle(spark, tbl, set_impl="auto")


def test_auto_picks_elements_for_hot_key(spark):
    """The 'auto' strategy must fall back to the elements path when one
    key dominates the batch (the arrays fold would collect that key's
    whole change sequence into a single task)."""
    from scylla_cdc_rust_spark.functions.decode import decode
    from scylla_cdc_rust_spark.operators.fold import resolve_set_impl
    from tests.util import spark_df_from_arrow
    from tests.scenarios import LogBuilder

    hot = LogBuilder()
    for i in range(300):  # one key holds ~97% of events
        hot.add_tokens("whale", [i % 9, (i + 1) % 9, (i + 2) % 9, (i + 3) % 9])
    for i in range(10):
        hot.insert(f"d{i}", [1, 2, 3, 4])
    df = decode(spark_df_from_arrow(spark, hot.build()))
    assert resolve_set_impl(df, {"tokens": "set"}) == "elements"

    even = LogBuilder()
    for i in range(300):
        even.add_tokens(f"d{i % 100}", [1, 2, 3, 4])
    df2 = decode(spark_df_from_arrow(spark, even.build()))
    assert resolve_set_impl(df2, {"tokens": "set"}) == "arrays"  # wide, no hot key
