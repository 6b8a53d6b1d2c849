"""Pre-/post-image pairing — the op family the replicator skips but the
Consumer surface delivers.

Reference: PRE_IMAGE (op 0) and POST_IMAGE (op 9) rows share the change's
(stream_id, cdc$time) and are ordered around it by cdc$batch_seq_no
(consumer.rs:37-52 op codes; the replicator ignores them,
replicator_consumer.rs:878, but a Consumer sees every CDCRow —
stream_reader.rs:392-396).  ``attach_images`` re-associates each change
row with its images declaratively: one groupBy over the image rows plus
one co-keyed left join — no window function, no per-row Python, both
sides hash-partitioned by the same key tuple.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scylla_cdc_rust_spark.model import (
    OP_NORM,
    STREAM_ID,
    TIME_MS,
    TIME_SEQ,
    OperationType,
)

_PRE = int(OperationType.PRE_IMAGE)
_POST = int(OperationType.POST_IMAGE)


def attach_images(
    decoded: DataFrame,
    payload_cols: list[str],
    key: str = "doc_id",
) -> DataFrame:
    """Return the non-image change rows with ``pre_image`` /
    ``post_image`` struct columns (null when the change has none).

    Grouping key is (stream, time-ms, time-seq, row key): Scylla writes
    at most one pre- and one post-image per changed row per change
    (cdc$batch_seq_no orders them within the batch; within a group they
    are unique, so plain conditional max aggregates suffice — cheaper
    than max_by, stays in a hash aggregate).
    """
    grp = [STREAM_ID, TIME_MS, TIME_SEQ, key]
    op = F.col(OP_NORM)
    img = F.struct(*[F.col(c) for c in payload_cols])
    images = (
        decoded.where(op.isin(_PRE, _POST))
        .groupBy(*grp)
        .agg(
            F.max(F.when(op == _PRE, img)).alias("pre_image"),
            F.max(F.when(op == _POST, img)).alias("post_image"),
        )
    )
    changes = decoded.where(~op.isin(_PRE, _POST))
    return changes.join(images, on=grp, how="left")
