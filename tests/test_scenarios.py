"""Scenario matrix from FIXTURES.md §3, mirroring the reference's
replication golden tests (replication_tests.rs:461-986) and e2e ordered
delivery tests (e2e_tests.rs:339-438)."""

import pytest

from scylla_cdc_rust_spark.model import OperationType
from tests.scenarios import LogBuilder
from tests.util import check_fold_matches_oracle, normalize_engine, run_fold


def check(spark, b: LogBuilder, modes=None):
    return check_fold_matches_oracle(spark, b.build(), modes=modes)


def test_simple_insert(spark):
    b = LogBuilder().insert("a", [1, 2, 3]).insert("b", [4, 5], source="book")
    st = check(spark, b)
    assert st["a"]["tokens"] == [1, 2, 3]
    assert st["b"]["source"] == "book"


def test_simple_update_and_column_delete(spark):
    b = (
        LogBuilder()
        .insert("a", [1, 2, 3], source="web")
        .update("a", n_tok=99)
        .delete_col("a", "source")
    )
    st = check(spark, b)
    assert st["a"] == {
        "tokens": [1, 2, 3],
        "n_tok": 99,
        "source": None,
        "ttl": None,
        "last_ord": st["a"]["last_ord"],
    }


def test_row_delete_and_reinsert(spark):
    # 3 inserts → delete existing → delete nonexistent → re-insert same key
    # (replication_tests.rs:597-619)
    b = (
        LogBuilder()
        .insert("a", [1])
        .insert("b", [2])
        .insert("c", [3])
        .delete_row("b")
        .delete_row("zzz")
        .insert("b", [9, 10])
    )
    st = check(spark, b)
    assert set(st) == {"a", "b", "c"}
    assert st["b"]["tokens"] == [9, 10]


def test_partition_delete(spark):
    b = LogBuilder().insert("a", [1]).insert("b", [2]).delete_partition("a")
    st = check(spark, b)
    assert set(st) == {"b"}


def test_ttl_expiration_ops(spark):
    # negative op codes = TTL-expiration deletes (consumer.rs:43-46)
    b = (
        LogBuilder()
        .insert("a", [1], ttl=3600)
        .insert("b", [2], ttl=60)
        .delete_row("b", expired=True)
        .delete_partition("a", expired=True)
    )
    st = check(spark, b)
    assert st == {}


def test_array_overwrite(spark):
    b = (
        LogBuilder()
        .insert("a", [5, 6, 7])
        .overwrite_tokens("a", [1, 2])
        .overwrite_tokens("a", None, del_tokens=True)  # set to null
        .insert("b", [1])
        .overwrite_tokens("b", [42])
    )
    st = check(spark, b)
    assert st["a"]["tokens"] is None
    assert st["b"]["tokens"] == [42]


def test_array_delta_chain(spark):
    # element add/remove incl. chained ops (replication_tests.rs:575-595,682-702)
    b = (
        LogBuilder()
        .insert("a", [10, 20, 30])
        .add_tokens("a", [40, 20])
        .remove_tokens("a", [10, 999])
        .add_tokens("a", [10])
        .remove_tokens("a", [20, 30, 40])
        .remove_tokens("a", [10])  # now empty → null
        .insert("b", [1, 2])
        .add_tokens("b", [3])
    )
    st = check(spark, b)
    assert st["a"]["tokens"] is None  # empty set ⇒ null (Cassandra)
    assert st["b"]["tokens"] == [1, 2, 3]
    # row 'a' still exists: n_tok/source cells are live
    assert st["a"]["n_tok"] == 3


def test_delta_add_creates_row(spark):
    # UPDATE creating cells on a nonexistent row makes it visible
    b = LogBuilder().add_tokens("ghost", [7])
    st = check(spark, b)
    assert st["ghost"]["tokens"] == [7]


def test_column_delete_only_on_nonexistent_row(spark):
    # an update that only writes tombstones creates no live row
    b = LogBuilder().delete_col("ghost", "source").remove_tokens("ghost2", [1])
    st = check(spark, b)
    assert st == {}


def test_insert_then_delete_all_columns_row_survives(spark):
    # row marker keeps the row alive with all-null payload
    b = (
        LogBuilder()
        .insert("a", [1], source="web")
        .delete_col("a", "tokens")
        .delete_col("a", "n_tok")
        .delete_col("a", "source")
    )
    st = check(spark, b)
    assert st["a"]["tokens"] is None
    assert st["a"]["n_tok"] is None
    assert st["a"]["source"] is None


def test_update_then_delete_all_columns_row_vanishes(spark):
    # no row marker (never inserted) + all cells tombstoned ⇒ row gone
    b = (
        LogBuilder()
        .update("a", n_tok=5)
        .delete_col("a", "n_tok")
    )
    st = check(spark, b)
    assert st == {}


def test_batch_writes_share_time(spark):
    # multi-row batch: shared cdc$time, increasing batch_seq_no, eob on last
    b = LogBuilder().batch(
        [
            ("a", "insert", {"tokens": [1]}),
            ("a", "overwrite_tokens", {"tokens": [2]}),
            ("b", "insert", {"tokens": [3]}),
        ]
    )
    st = check(spark, b)
    assert st["a"]["tokens"] == [2]  # later batch_seq wins
    assert st["b"]["tokens"] == [3]


def test_images_ignored(spark):
    # PreImage/PostImage are skipped with a warning (replicator_consumer.rs:878)
    b = (
        LogBuilder()
        .image("a", pre=True, tokens=[111])
        .insert("a", [1])
        .image("a", pre=False, tokens=[222])
    )
    st = check(spark, b)
    assert st["a"]["tokens"] == [1]


def test_ttl_propagation(spark):
    # A11: latest write's TTL is kept; absent TTL clears it
    b = LogBuilder().insert("a", [1], ttl=500).update("a", n_tok=2)
    st = check(spark, b)
    assert st["a"]["ttl"] is None
    b2 = LogBuilder().insert("b", [1]).update("b", n_tok=2, ttl=900)
    st2 = check(spark, b2)
    assert st2["b"]["ttl"] == 900


def test_ordered_interleave_small(spark):
    # 10 keys × 3 inserts then 3 updates each, both directions
    # (e2e_tests.rs:339-365)
    b = LogBuilder()
    docs = [f"d{i}" for i in range(10)]
    for r in range(3):
        for d in docs:
            b.insert(d, [r, r + 1])
    for r in range(3):
        for d in reversed(docs):
            b.update(d, n_tok=100 + r)
    st = check(spark, b)
    for d in docs:
        assert st[d]["tokens"] == [2, 3]
        assert st[d]["n_tok"] == 102


@pytest.mark.slow
def test_ordered_interleave_large(spark):
    # 100 keys × 100 ops (e2e_tests.rs:367-392)
    b = LogBuilder()
    docs = [f"d{i}" for i in range(100)]
    for r in range(50):
        for d in docs if r % 2 == 0 else reversed(docs):
            if r % 10 == 4:
                b.delete_row(d)
            elif r % 3 == 0:
                b.insert(d, [r, r * 2])
            elif r % 3 == 1:
                b.add_tokens(d, [r])
            else:
                b.update(d, source=f"s{r}")
    st = check(spark, b)
    assert len(st) == 100


def test_range_delete_ops_are_noop_on_keyless_table(spark):
    # ops 5–8 need clustering keys; our table has none — decoded but inert
    # (general pairing operator lives in operators/range_delete.py)
    b = LogBuilder().insert("a", [1])
    b._emit("a", OperationType.ROW_RANGE_DEL_INCL_LEFT)
    b._emit("a", OperationType.ROW_RANGE_DEL_EXCL_RIGHT)
    st = check(spark, b)
    assert st["a"]["tokens"] == [1]


def test_image_pairing(spark):
    """PRE_IMAGE/POST_IMAGE rows share the change's (stream, time) and
    re-attach as struct columns (operators/images.py); changes without
    images get nulls (consumer.rs:37-52; ignored by the replicator)."""
    from scylla_cdc_rust_spark.functions.decode import decode
    from scylla_cdc_rust_spark.operators.images import attach_images
    from tests.util import spark_df_from_arrow

    b = LogBuilder().insert("a", [1, 2])
    b.batch(
        [
            ("a", "image", {"pre": True, "n_tok": 5}),
            ("a", "update", {"n_tok": 6}),
            ("a", "image", {"pre": False, "n_tok": 6}),
        ]
    )
    b.update("a", n_tok=9)
    out = attach_images(
        decode(spark_df_from_arrow(spark, b.build())), ["n_tok"], "doc_id"
    )
    got = {
        r["n_tok"]: (
            None if r["pre_image"] is None else r["pre_image"]["n_tok"],
            None if r["post_image"] is None else r["post_image"]["n_tok"],
        )
        for r in out.collect()
    }
    assert got[6] == (5, 6)      # the batched change carries both images
    assert got[2] == (None, None)
    assert got[9] == (None, None)
    assert out.count() == 3      # image rows themselves are not emitted
