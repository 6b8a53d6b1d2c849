"""Hot-key salting — the north rule's explicit skew handling.

The reference serializes each stream onto one consumer with no skew
mitigation (log_reader.rs:223-236: one task per vnode group; a hot
stream simply saturates its task).  This engine's declarative fold is
already skew-resistant — Catalyst's partial (map-side) aggregation is
itself a salt-by-input-partition — but two paths still concentrate a
hot key on one reducer: the final merge of per-key aggregate buffers,
and any per-key pandas consumer.  ``fold_delta_salted`` makes the
two-stage shape explicit and controllable:

  stage 1: fold_delta grouped by (key, salt) with salt = ord % k —
           k bounded partial deltas per hot key;
  stage 2: per-key combine of the partial deltas.

The combine is sound because the scalar delta record is a
*commutative monoid* under cell-level LWW: row_tomb/marker/last_ord
combine by max, ttl and each cell by argmax over their ords, with a
final re-mask of mentions at/below the combined row tombstone
(equivalent to "tombstoned and unmentioned", see fold_delta).  The
salt therefore does NOT need prefix-disjoint op ranges (SURVEY §7.4
flagged that requirement for the *sequential* fold only — sequential
consumers cannot be salted, which is exactly why they are the slow
path).

'set'-mode columns are intentionally not supported here: their element
path already aggregates at (key, element) grain, which distributes a
hot key across the cluster by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scylla_cdc_rust_spark.model import ORD, CDCSchema
from scylla_cdc_rust_spark.operators.fold import NEG_INF, fold_delta, split_modes_full


def hot_keys(decoded: DataFrame, key: str = "doc_id", threshold: int = 100_000) -> list:
    """Keys whose event count in this batch exceeds the threshold."""
    return [
        r[0]
        for r in decoded.groupBy(key)
        .count()
        .where(F.col("count") > threshold)
        .select(key)
        .collect()
    ]


def fold_delta_salted(
    df: DataFrame,
    key: str = "doc_id",
    salt_factor: int = 8,
    collection_modes: dict[str, str] | None = None,
    schema: CDCSchema | None = None,
) -> DataFrame:
    """Two-stage salted fold for atomic/'list' payload columns."""
    collection_modes = collection_modes or {}
    schema = schema or CDCSchema.from_df_schema(df.schema)
    payload = [c for c in schema.payload if c != key]
    cell_cols, set_cols, map_cols, udt_cols = split_modes_full(payload, collection_modes)
    if set_cols or map_cols:
        raise NotImplementedError(
            "salted fold applies to atomic/'list'/udt columns; set/map/"
            "list_delta element deltas are already (key, element)-grained "
            "and need no salt"
        )
    if udt_cols:
        raise NotImplementedError(
            "salted fold does not support 'udt' columns yet; per-field "
            "argmax is already map-side combinable without salting"
        )

    salted = df.withColumn("__salt", F.pmod(F.col(ORD), F.lit(salt_factor)))
    part = fold_delta(
        salted, key=[key, "__salt"], collection_modes=collection_modes
    )

    ln = F.col("last_ord")
    aggs = [
        F.max("row_tomb").alias("row_tomb"),
        F.max("marker").alias("marker"),
        F.max(ln).alias("last_ord"),
        F.max_by(F.when(ln.isNotNull(), F.col("ttl_v")), ln).alias("ttl_v"),
    ]
    for c in cell_cols:
        cord = F.col(f"{c}__ord")
        aggs.append(
            F.max_by(F.when(cord.isNotNull(), F.col(f"{c}__v")), cord).alias(
                f"{c}__v"
            )
        )
        aggs.append(F.max(cord).alias(f"{c}__ord"))
    comb = part.groupBy(key).agg(*aggs)

    # re-mask mentions killed by the combined row tombstone
    out = [F.col(key), F.col("row_tomb"), F.col("marker"), F.col("last_ord"), F.col("ttl_v")]
    for c in cell_cols:
        alive = F.col(f"{c}__ord") > F.greatest(F.col("row_tomb"), F.lit(NEG_INF))
        out += [
            F.when(alive, F.col(f"{c}__v")).alias(f"{c}__v"),
            F.when(alive, F.col(f"{c}__ord")).alias(f"{c}__ord"),
        ]
    return comb.select(*out)
