"""pyspark-cdc-ingest: a from-scratch PySpark-native CDC ingest engine.

Re-expresses the consumer semantics of scylladb/scylla-cdc-rust
(reference at /root/reference, studied — not ported) as idiomatic
Spark: the reference's row-at-a-time, per-stream serial replay
(scylla-cdc/src/stream_reader.rs:392-396) is equivalent to cell-level
last-writer-wins resolution ordered by (cdc$time, batch_seq_no), which
this engine computes as declarative DataFrame aggregations (max_by per
cell + tombstone precedence) so Catalyst/Tungsten execute it with
partial map-side aggregation, whole-stage codegen, and no per-row
Python.
"""

__version__ = "0.1.0"

from scylla_cdc_rust_spark.config import CDCPipelineConfig  # noqa: F401
from scylla_cdc_rust_spark.model import OperationType  # noqa: F401
