"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship — the real CDC engine (vectorized decode +
  cell-level LWW fold) replaying a CDC-shaped change log derived from
  the sf0.001 `events` table.
- ``queries()`` / ``oracle_sql()``: one entry per operator family from
  SURVEY.md §2 plus the training-data-pipeline operators (dedup
  sketches, similarity search, text analysis); every entry has a DuckDB
  oracle (see scylla_cdc_rust_spark/queries.py for portability notes).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scylla_cdc_rust_spark.queries import (  # noqa: E402
    ORACLE_SQL,
    QUERIES,
    QUERY_TIERS,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["engine_cdc_replay"](spark, "/root/testdata/sf0.001")


def query_tiers() -> dict[str, str]:
    """'production' (the 10^10-event declarative path) vs 'verification'
    (reference-shaped or brute-force cross-checks kept to prove the
    production path equivalent — see queries.QUERY_TIERS)."""
    return dict(QUERY_TIERS)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every query (full coverage)."""
    return dict(ORACLE_SQL)
