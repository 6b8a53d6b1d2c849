"""Snapshot time travel + incremental changelog on the merge table.

Iceberg analogs (the north rule's production sink): ``VERSION AS OF``
reads, the snapshot log, ``create_changelog_view`` between snapshots,
and ``expire_snapshots`` retention.  Every commit already writes an
immutable manifest, so these are manifest-resolution features — no new
write-path cost.
"""

from scylla_cdc_rust_spark.functions.decode import decode
from scylla_cdc_rust_spark.operators.fold import fold_delta
from scylla_cdc_rust_spark.operators.merge import ParquetMergeTable
from tests.scenarios import LogBuilder
from tests.util import spark_df_from_arrow

MODES: dict = {"tokens": "set"}
PAYLOAD = ["tokens", "n_tok", "source"]


def _merge(spark, table, builder, t_base):
    for i, r in enumerate(builder.rows):
        r["cdc_time_ms"] = t_base + i * 1000
    delta = fold_delta(
        decode(spark_df_from_arrow(spark, builder.build())), collection_modes=MODES
    )
    return table.merge(delta, payload=PAYLOAD, collection_modes=MODES)


def _mk_versions(spark, tmp_path):
    """v1: insert a,b,c.  v2: update a, delete b, insert d."""
    table = ParquetMergeTable(spark, str(tmp_path / "t"), num_buckets=8)
    _merge(
        spark,
        table,
        LogBuilder()
        .insert("a", [1], source="web")
        .insert("b", [2], source="web")
        .insert("c", [3], source="book"),
        1_600_000_000_000,
    )
    _merge(
        spark,
        table,
        LogBuilder()
        .update("a", tokens=[1, 9])
        .delete_row("b")
        .insert("d", [4], source="wiki"),
        1_700_000_000_000,
    )
    return table


def _vis(table, v=None):
    return {
        r["doc_id"]: sorted(r["tokens"])
        for r in table.read_visible(at_version=v).collect()
    }


def test_version_as_of_read(spark, tmp_path):
    table = _mk_versions(spark, tmp_path)
    assert table.version() == 2
    assert _vis(table, v=1) == {"a": [1], "b": [2], "c": [3]}
    assert _vis(table) == {"a": [1, 9], "c": [3], "d": [4]}
    snaps = table.snapshots()
    assert [s["version"] for s in snaps] == [1, 2]
    assert all(s["committed_at_ms"] for s in snaps)
    assert snaps[0]["committed_at_ms"] <= snaps[1]["committed_at_ms"]


def test_changelog_between_snapshots(spark, tmp_path):
    table = _mk_versions(spark, tmp_path)
    # manifest diff prunes: only buckets of a/b/d changed (c untouched)
    changed = table.changed_buckets(1, 2)
    assert 0 < len(changed) < 8

    ch = {
        r["doc_id"]: (r["change_type"], r["tokens"] and sorted(r["tokens"]))
        for r in table.read_changes(1, 2).collect()
    }
    assert ch == {
        "a": ("UPDATE", [1, 9]),
        "b": ("DELETE", None),
        "d": ("INSERT", [4]),
    }
    assert "c" not in ch  # unchanged key in an unchanged bucket


def test_vacuum_retains_snapshots(spark, tmp_path):
    table = _mk_versions(spark, tmp_path)
    _merge(spark, table, LogBuilder().insert("e", [5]), 1_800_000_000_000)
    assert table.version() == 3

    # retain last 2: v2 stays time-travelable, v1 expires
    table.vacuum(retain_versions=2)
    assert [s["version"] for s in table.snapshots()] == [2, 3]
    assert _vis(table, v=2) == {"a": [1, 9], "c": [3], "d": [4]}
    assert table.read_changes(2, 3) is not None
    assert _vis(table) == {"a": [1, 9], "c": [3], "d": [4], "e": [5]}

    # default retention: current only (round-2 behavior unchanged)
    table.vacuum()
    assert [s["version"] for s in table.snapshots()] == [3]
    assert _vis(table) == {"a": [1, 9], "c": [3], "d": [4], "e": [5]}


def test_changelog_across_schema_evolution(spark, tmp_path):
    """read_changes spanning a column add + int->long widening: rows the
    evolution alone touched (rewritten buckets, padded nulls, widened
    casts) must NOT be flagged; real updates must."""
    import os

    from scylla_cdc_rust_spark.config import CDCPipelineConfig
    from scylla_cdc_rust_spark.plans.pipeline import replay
    from tests.test_schema_evolution import LogBuilder, evolve_epoch1, write_epoch

    tmp = str(tmp_path)
    b0 = (
        LogBuilder()
        .insert("a", [1, 2], source="web")
        .insert("b", [3], source="book")
    )
    b1 = LogBuilder().update("a", n_tok=42).insert("c", [9], source="wiki")
    for r in b1.rows:
        r["cdc_time_ms"] += 10_000_000
        r["epoch"] = 1
    cfg = CDCPipelineConfig(
        log_path=os.path.join(tmp, "log"),
        target_path=os.path.join(tmp, "t"),
        watermark_path=os.path.join(tmp, "wm"),
        window_size_ms=1 << 60,
        target_num_buckets=4,
    )
    os.makedirs(cfg.log_path)
    write_epoch(b0.build(), cfg.log_path, 0)
    write_epoch(evolve_epoch1(b1.build()), cfg.log_path, 1)
    replay(spark, cfg, MODES)

    table = ParquetMergeTable(spark, cfg.target_path, num_buckets=4)
    assert table.version() == 2  # one commit per epoch window
    ch = {
        r["doc_id"]: r["change_type"]
        for r in table.read_changes(1, 2).collect()
    }
    assert ch.get("a") == "UPDATE"  # n_tok really changed
    assert ch.get("c") == "INSERT"  # created in epoch 1
    # 'b' sits in a bucket the widening rewrote, but its values did not
    # change — padded lang null + widened n_tok must compare equal
    assert "b" not in ch
