"""Jar-gated Iceberg sink contract test (VERDICT r3 #7).

This sandbox ships no Iceberg runtime, so the integration test skips
cleanly here; on any machine with ``iceberg-spark-runtime`` on the
classpath it runs for real.  What IS asserted everywhere: the
environment probe refuses construction loudly (naming the missing
catalog conf) instead of failing later mid-merge.
"""

import glob
import os

import pytest


def _iceberg_jar_present() -> bool:
    import pyspark

    jar_dirs = [os.path.join(os.path.dirname(pyspark.__file__), "jars")]
    if os.environ.get("SPARK_HOME"):
        jar_dirs.append(os.path.join(os.environ["SPARK_HOME"], "jars"))
    return any(
        glob.glob(os.path.join(d, "*iceberg-spark-runtime*.jar"))
        for d in jar_dirs
    )


def test_probe_refuses_without_iceberg_catalog(spark):
    from scylla_cdc_rust_spark.operators.merge import IcebergMergeTable

    with pytest.raises(NotImplementedError, match="Iceberg catalog"):
        IcebergMergeTable(spark, "ice.db.target")


@pytest.mark.skipif(
    not _iceberg_jar_present(),
    reason="iceberg-spark-runtime jar not on the classpath",
)
def test_iceberg_merge_contract(tmp_path):
    """Insert → LWW update (stale delta ignored) → tombstone delete,
    the same contract ParquetMergeTable implements jar-free."""
    from pyspark.sql import SparkSession

    from scylla_cdc_rust_spark.operators.merge import IcebergMergeTable

    spark = (
        SparkSession.builder.master("local[2]")
        .appName("iceberg-contract")
        .config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        )
        .config("spark.sql.catalog.ice", "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.ice.type", "hadoop")
        .config("spark.sql.catalog.ice.warehouse", str(tmp_path / "wh"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    try:
        spark.sql(
            "CREATE TABLE ice.db.t (doc_id STRING, tokens ARRAY<INT>, "
            "n_tok INT, source STRING, ttl BIGINT, last_ord BIGINT) "
            "USING iceberg"
        )
        sink = IcebergMergeTable(spark, "ice.db.t")
        schema = (
            "doc_id string, tokens array<int>, n_tok int, source string,"
            " ttl long, last_ord long, is_deleted boolean"
        )
        sink.merge(spark.createDataFrame(
            [("a", [1, 2], 2, "web", None, 100, False),
             ("b", [3], 1, "web", None, 100, False)], schema))
        sink.merge(spark.createDataFrame(
            [("a", [9], 1, "book", None, 200, False),   # fresh update
             ("b", [7], 1, "book", None, 50, False)],   # stale: ignored
            schema))
        sink.merge(spark.createDataFrame(
            [("b", None, None, None, None, 300, True)], schema))  # delete
        rows = {r["doc_id"]: r for r in spark.table("ice.db.t").collect()}
        assert set(rows) == {"a"}
        assert rows["a"]["tokens"] == [9] and rows["a"]["last_ord"] == 200
    finally:
        spark.stop()
