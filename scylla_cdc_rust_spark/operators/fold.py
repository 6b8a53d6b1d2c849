"""Per-key LWW fold — the relational re-expression of the replicator.

The reference applies changes row-at-a-time, serially per stream, in
clustering order (/root/reference/scylla-cdc/src/stream_reader.rs:392-396
→ replicator dispatch replicator_consumer.rs:866-883).  Because
Cassandra/Scylla write semantics are last-writer-wins *per cell* with
tombstone precedence, that sequential replay is exactly equivalent to a
cell-level argmax over the total order (ms, seq, batch_seq) — which is
how this engine computes it: one declarative groupBy per key with
``max_by`` per cell plus tombstone thresholds, fully inside
whole-stage codegen with map-side partial aggregation.  No per-row
Python, no per-group Python; a hot key costs one partial-aggregate
buffer per task instead of serializing one consumer (the reference has
no skew handling — log_reader.rs:223-236).

Semantics per SURVEY.md §2.4 (A1–A11):

- row tombstone = max ord of ROW_DELETE/PARTITION_DELETE (single-column
  key ⇒ the two coincide; delete_row/delete_partition,
  replicator_consumer.rs:719-724,392-402); cells live iff written
  strictly after it.
- row marker = max ord of ROW_INSERT (update_or_insert(.., true),
  replicator_consumer.rs:408-410); row exists iff marker outlives the
  tombstone or any cell is live (Cassandra row-liveness rule).
- atomic cell (scalar / frozen / whole-array 'list' mode): LWW among ops
  that mention the cell — value present → value, cdc$deleted_<col> →
  null (overwrite_column, replicator_consumer.rs:727-748).
- 'set' mode collection (non-frozen set/map,
  replicator_consumer.rs:439-469): element-level LWW.  An overwrite
  (cdc$deleted_<col> = true) is a collection tombstone killing elements
  written strictly before it, with same-change elements surviving
  (Scylla writes the overwrite tombstone at ts-1); delta adds come from
  the value column, delta removes from cdc$deleted_elements_<col>.
  Final set = sorted alive elements; empty ⇒ null.
- ttl / last_ord bookkeeping: taken from the max-ord write op (USING
  TIMESTAMP/TTL propagation, replicator_consumer.rs:311-333,703-716).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scylla_cdc_rust_spark.model import (
    DELETED_ELEMS_PREFIX,
    DELETED_PREFIX,
    OP_NORM,
    ORD,
    TTL,
    CDCSchema,
    OperationType,
)

_W = [int(OperationType.ROW_UPDATE), int(OperationType.ROW_INSERT)]
_D = [int(OperationType.ROW_DELETE), int(OperationType.PARTITION_DELETE)]

NEG_INF = -1  # ord values are non-negative


def _dcol(df: DataFrame, name: str) -> F.Column:
    """deleted-flag column or false if the log lacks it (schema drift)."""
    return F.coalesce(F.col(name), F.lit(False)) if name in df.columns else F.lit(False)


def fold(
    df: DataFrame,
    key: str = "doc_id",
    collection_modes: dict[str, str] | None = None,
    schema: CDCSchema | None = None,
) -> DataFrame:
    """Fold a decoded CDC log into final per-key state.

    Input must carry decode outputs (``op``, ``ord``).  Output columns:
    key, payload columns, ``ttl``, ``last_ord``.
    """
    collection_modes = collection_modes or {"tokens": "set"}
    schema = schema or CDCSchema.from_df_schema(df.schema)
    payload = [c for c in schema.payload if c != key]
    set_cols = [c for c in payload if collection_modes.get(c) == "set"]
    cell_cols = [c for c in payload if collection_modes.get(c, "atomic") != "set"]

    is_w = F.col(OP_NORM).isin(_W)
    is_d = F.col(OP_NORM).isin(_D)
    ordc = F.col(ORD)

    aggs = [
        F.coalesce(F.max(F.when(is_d, ordc)), F.lit(NEG_INF)).alias("__row_tomb"),
        F.coalesce(
            F.max(F.when(F.col(OP_NORM) == int(OperationType.ROW_INSERT), ordc)),
            F.lit(NEG_INF),
        ).alias("__marker"),
        F.max(F.when(is_w, ordc)).alias("last_ord"),
        # ttl of the max-ord write op; struct-wrapped so a null ttl at the
        # max ord is returned as-is rather than skipped by the aggregate
        F.max_by(F.when(is_w, F.struct(F.col(TTL).alias("v"))), F.when(is_w, ordc)).alias(
            "__ttl_cell"
        ),
    ]
    for c in cell_cols:
        dflag = _dcol(df, DELETED_PREFIX + c)
        mentioned = is_w & (F.col(c).isNotNull() | dflag)
        # value wins over the deleted flag within one change: a non-frozen
        # overwrite arrives as tombstone+value and the value survives
        # (overwrite_column, replicator_consumer.rs:727-748)
        aggs.append(
            F.max_by(
                F.when(mentioned, F.struct(F.col(c).alias("v"))),
                F.when(mentioned, ordc),
            ).alias(f"__cell_{c}")
        )
        aggs.append(F.max(F.when(mentioned, ordc)).alias(f"__cord_{c}"))
    for c in set_cols:
        dflag = _dcol(df, DELETED_PREFIX + c)
        aggs.append(
            F.coalesce(F.max(F.when(is_w & dflag, ordc)), F.lit(NEG_INF)).alias(
                f"__ctomb_{c}"
            )
        )

    scalars = df.groupBy(key).agg(*aggs)

    # ---- element-level LWW for 'set' columns (explode → argmax → collect) ----
    for c in set_cols:
        dflag = _dcol(df, DELETED_PREFIX + c)
        del_elems = (
            F.col(DELETED_ELEMS_PREFIX + c)
            if DELETED_ELEMS_PREFIX + c in df.columns
            else F.lit(None).cast("array<int>")
        )
        events = (
            df.where(is_w & (F.col(c).isNotNull() | del_elems.isNotNull()))
            .select(
                F.col(key),
                ordc.alias("__ord"),
                F.explode(
                    F.concat(
                        F.transform(
                            F.coalesce(F.col(c), F.array()),
                            lambda e: F.struct(e.alias("e"), F.lit(1).alias("a")),
                        ),
                        F.transform(
                            F.coalesce(del_elems, F.array()),
                            lambda e: F.struct(e.alias("e"), F.lit(0).alias("a")),
                        ),
                    )
                ).alias("ev"),
            )
            .select(key, "__ord", F.col("ev.e").alias("elem"), F.col("ev.a").alias("act"))
        )
        # last event per (key, element); removal beats addition at equal ord
        # (tombstones win ties — within one change del_elements dominates)
        per_elem = events.groupBy(key, "elem").agg(
            F.max_by(
                "act", F.struct(F.col("__ord"), (1 - F.col("act")).alias("tb"))
            ).alias("last_act"),
            F.max("__ord").alias("last_ord_e"),
        )
        alive = (
            per_elem.where(F.col("last_act") == 1)
            .groupBy(key)
            .agg(F.collect_list(F.struct("last_ord_e", "elem")).alias(f"__evs_{c}"))
        )
        scalars = scalars.join(alive, on=key, how="left")

    # ---- final projection ----
    row_tomb = F.col("__row_tomb")
    live_flags = []
    proj = [F.col(key)]
    for c in schema.payload:
        if c == key:
            continue
        if c in set_cols:
            # alive elements must outlive both the row tombstone (strictly)
            # and the collection overwrite tombstone (>=: same-change adds
            # survive their own overwrite, Scylla ts-1 rule)
            thr_row, thr_coll = row_tomb, F.col(f"__ctomb_{c}")
            vals = F.array_sort(
                F.transform(
                    F.filter(
                        F.coalesce(F.col(f"__evs_{c}"), F.array()),
                        lambda s: (s["last_ord_e"] > thr_row) & (s["last_ord_e"] >= thr_coll),
                    ),
                    lambda s: s["elem"],
                )
            )
            val = F.when(F.size(vals) > 0, vals)
            proj.append(val.alias(c))
            live_flags.append(val.isNotNull())
        else:
            cell, cord = F.col(f"__cell_{c}"), F.col(f"__cord_{c}")
            live = (cord > row_tomb) & cell["v"].isNotNull()
            proj.append(F.when(live, cell["v"]).alias(c))
            live_flags.append(live)
    proj.append(F.col("__ttl_cell")["v"].alias("ttl"))
    proj.append(F.col("last_ord"))

    exists = F.col("__marker") > row_tomb
    for lf in live_flags:
        exists = exists | lf
    return scalars.where(exists).select(*proj)
