"""Driver-facing query registry: Spark DataFrame queries + ANSI oracle SQL.

Each entry demonstrates one operator family from SURVEY.md §2 (or a
training-data-pipeline operator) over the driver's testdata tables.
The CDC-family queries run over a *derived change log* built
deterministically from the `events` table with engine-portable
expressions, so DuckDB can replay the identical oracle.

Portability rules used throughout (verified against duckdb in-repo):
- value casts from double go through floor() (Spark truncates, DuckDB
  rounds on CAST);
- word hash H(w) = first 15 hex chars of md5 → bigint
  (Spark conv(...,16,10), DuckDB ('0x'||...)::BIGINT), reduced mod
  1e9+7 before arithmetic to avoid 64-bit overflow;
- sums over ints are cast to BIGINT (DuckDB sums to HUGEINT);
- doubles compared through round(x, 4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from scylla_cdc_rust_spark.model import ORD_BASE_MS

M31 = 1_000_000_007

# ---------------------------------------------------------------------------
# Derived CDC log (shared by the q_cdc_* family)
# ---------------------------------------------------------------------------
# op mapping over events: event_id%10 ∈ [0,5) → ROW_INSERT(2), [5,8) →
# ROW_UPDATE(1), 8 → ROW_DELETE(3), 9 → PARTITION_DELETE(4); deletes with
# event_id%3=0 carry the negative TTL-expiration code (consumer.rs:43-46).
# ord (total order per doc) = event_id — unique, monotone surrogate of the
# (cdc$time, batch_seq) clustering order.

_LOG_SQL = """
SELECT
  user_id % 32                                   AS sid,
  CAST(user_id AS VARCHAR)                       AS doc_id,
  event_id                                       AS ord,
  CAST(event_id % 10 AS INTEGER)                 AS opsel,
  CASE WHEN event_id % 10 < 5 THEN 2
       WHEN event_id % 10 < 8 THEN 1
       WHEN event_id % 10 < 9 THEN 3
       ELSE 4 END                                AS base_op,
  CAST(floor(value) AS INTEGER)                  AS n_tok,
  event_type                                     AS source,
  ts                                             AS ts
FROM events
"""

_RAW_OP_SQL = (
    "CASE WHEN base_op IN (3,4) AND ord % 3 = 0 THEN -base_op ELSE base_op END"
)

# tokens for write ops: deterministic small int arrays
_TOKENS_SQL = (
    "CASE WHEN base_op IN (1,2) THEN "
    "list_transform(generate_series(0, CAST(ord % 6 + 1 AS INTEGER)), "
    "x -> CAST((doc_id::BIGINT * 7 + x * 13) % 1000 AS INTEGER)) END"
)
_TOKENS_SPARK = (
    "CASE WHEN base_op IN (1,2) THEN "
    "transform(sequence(0, CAST(ord % 6 + 1 AS INT)), "
    "x -> CAST((CAST(doc_id AS BIGINT) * 7 + x * 13) % 1000 AS INT)) END"
)
# delta removes on some updates
_DELS_SQL = (
    "CASE WHEN base_op = 1 AND ord % 4 = 0 THEN "
    "list_transform(generate_series(0, CAST(ord % 3 AS INTEGER)), "
    "x -> CAST((doc_id::BIGINT * 7 + x * 26) % 1000 AS INTEGER)) END"
)
_DELS_SPARK = (
    "CASE WHEN base_op = 1 AND ord % 4 = 0 THEN "
    "transform(sequence(0, CAST(ord % 3 AS INT)), "
    "x -> CAST((CAST(doc_id AS BIGINT) * 7 + x * 26) % 1000 AS INT)) END"
)
# an update with ord%7=0 overwrites the collection (tombstone+value),
# as does every insert — the Scylla non-frozen overwrite encoding
_OVW_COND = "(base_op = 2 OR (base_op = 1 AND ord % 7 = 0))"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _derived_log(
    spark: SparkSession, sf_dir: str, fan_out: bool = False
) -> DataFrame:
    # fan_out: the testdata events table is ONE parquet file under the
    # session's 16 MB split size, so a derived-log consumer bottlenecks
    # on a 1-2-task scan doing its heavy map-side work (token-array
    # builds, sha2, fold explodes) serially (guide §2.5 input skew:
    # "repartition immediately after the read").  Heavy consumers (fold
    # family, engine gates) opt in: the exchange moves only the raw
    # event columns (~16 MB at sf1.0), hash-partitioned on the unique
    # event_id so no sort-before-repartition is paid, and on a
    # production-wide log it is a structural no-op.  Light consumers
    # (decode stats, window scans) keep the shuffle-free plan — for them
    # the exchange costs more than the serial map work.  Results are
    # unaffected either way: every consumer aggregates by key/ord,
    # never by input order.
    e = _events(spark, sf_dir)
    if fan_out:
        from scylla_cdc_rust_spark.session import ensure_min_parallelism

        e = ensure_min_parallelism(e, by="event_id")
    log = e.select(
        (F.col("user_id") % 32).alias("sid"),
        F.col("user_id").cast("string").alias("doc_id"),
        F.col("event_id").alias("ord"),
        (F.col("event_id") % 10).cast("int").alias("opsel"),
        F.when(F.col("event_id") % 10 < 5, 2)
        .when(F.col("event_id") % 10 < 8, 1)
        .when(F.col("event_id") % 10 < 9, 3)
        .otherwise(4)
        .alias("base_op"),
        F.floor(F.col("value")).cast("int").alias("n_tok"),
        F.col("event_type").alias("source"),
        F.col("ts"),
    )
    return log.withColumns(
        {
            "raw_op": F.expr(_RAW_OP_SQL),
            "tokens": F.expr(_TOKENS_SPARK),
            "del_elems": F.expr(_DELS_SPARK),
            "is_ovw": F.expr(_OVW_COND),
        }
    )


def _log_cte() -> str:
    return f"""
WITH log0 AS ({_LOG_SQL}),
log AS (
  SELECT *,
    {_RAW_OP_SQL} AS raw_op,
    {_TOKENS_SQL} AS tokens,
    {_DELS_SQL} AS del_elems,
    {_OVW_COND} AS is_ovw
  FROM log0
)
"""


# portable word hash: md5-hex prefix → bigint, reduced mod 1e9+7
def _h_spark(col: str) -> str:
    return f"CAST(conv(substring(md5({col}), 1, 15), 16, 10) AS BIGINT) % {M31}"


def _h_duck(col: str) -> str:
    return f"(('0x' || substr(md5({col}), 1, 15))::BIGINT) % {M31}"


# ===========================================================================
# CDC operator family
# ===========================================================================


def q_cdc_decode(spark, sf_dir):
    """F6/O4 (SURVEY §2.2): op-sign normalization + expiration flag +
    total-order stats, per normalized op (consumer.rs:200-202)."""
    log = _derived_log(spark, sf_dir)
    return (
        log.select(
            F.abs(F.col("raw_op")).cast("int").alias("op"),
            (F.col("raw_op") < 0).alias("is_expiration"),
            F.col("ord"),
        )
        .groupBy("op", "is_expiration")
        .agg(
            F.count("*").alias("n"),
            F.min("ord").alias("min_ord"),
            F.max("ord").alias("max_ord"),
        )
    )


SQL_CDC_DECODE = (
    _log_cte()
    + """
SELECT CAST(abs(raw_op) AS INTEGER) AS op, raw_op < 0 AS is_expiration,
       count(*) AS n, min(ord) AS min_ord, max(ord) AS max_ord
FROM log GROUP BY 1, 2
"""
)


def q_cdc_fold_scalar(spark, sf_dir):
    """A1–A5/O1 (SURVEY §2.4): per-key LWW fold of scalar cells with
    row-tombstone precedence — the replicator's apply as one groupBy
    (replicator_consumer.rs:750-848)."""
    log = _derived_log(spark, sf_dir)
    is_w = F.col("base_op").isin(1, 2)
    is_d = F.col("base_op").isin(3, 4)
    g = log.groupBy("doc_id").agg(
        F.coalesce(F.max(F.when(is_d, F.col("ord"))), F.lit(-1)).alias("tomb"),
        F.max(F.when(is_w, F.col("ord"))).alias("last_ord"),
        F.max_by(F.when(is_w, F.col("n_tok")), F.when(is_w, F.col("ord"))).alias(
            "n_tok"
        ),
        F.max_by(F.when(is_w, F.col("source")), F.when(is_w, F.col("ord"))).alias(
            "source"
        ),
    )
    return g.where(F.col("last_ord") > F.col("tomb")).select(
        "doc_id", "n_tok", "source", "last_ord"
    )


SQL_CDC_FOLD_SCALAR = (
    _log_cte()
    + """
SELECT doc_id,
       arg_max(n_tok,  CASE WHEN base_op IN (1,2) THEN ord END) AS n_tok,
       arg_max(source, CASE WHEN base_op IN (1,2) THEN ord END) AS source,
       max(CASE WHEN base_op IN (1,2) THEN ord END)             AS last_ord
FROM log
GROUP BY doc_id
HAVING max(CASE WHEN base_op IN (1,2) THEN ord END)
     > coalesce(max(CASE WHEN base_op IN (3,4) THEN ord END), -1)
"""
)


def q_cdc_fold_set(spark, sf_dir):
    """A7 (SURVEY §2.4): element-level set delta fold — adds from the
    value column, removes from cdc$deleted_elements, overwrite
    tombstones, element LWW (replicator_consumer.rs:415-469)."""
    log = _derived_log(spark, sf_dir, fan_out=True)
    per_doc = log.groupBy("doc_id").agg(
        F.coalesce(F.max(F.when(F.col("base_op").isin(3, 4), F.col("ord"))), F.lit(-1)).alias("tomb"),
        F.coalesce(F.max(F.when(F.col("is_ovw"), F.col("ord"))), F.lit(-1)).alias("ctomb"),
    )
    adds = log.where(F.col("tokens").isNotNull()).select(
        "doc_id", "ord", F.explode("tokens").alias("elem"), F.lit(1).alias("act")
    )
    rems = log.where(F.col("del_elems").isNotNull()).select(
        "doc_id", "ord", F.explode("del_elems").alias("elem"), F.lit(0).alias("act")
    )
    ev = adds.unionAll(rems)
    per_elem = ev.groupBy("doc_id", "elem").agg(
        F.max_by(F.col("act"), F.col("ord") * 2 + (1 - F.col("act"))).alias("last_act"),
        F.max("ord").alias("last_ord_e"),
    )
    alive = (
        per_elem.join(per_doc, "doc_id")
        .where(
            (F.col("last_act") == 1)
            & (F.col("last_ord_e") > F.col("tomb"))
            & (F.col("last_ord_e") >= F.col("ctomb"))
        )
        .groupBy("doc_id")
        .agg(
            # Canonicalizer-safe: the driver's oracle compare sorts rows via
            # pandas, which cannot hash raw arrays — emit the (sorted) set as
            # a CSV string instead of array<int>.
            F.concat_ws(
                ",", F.array_sort(F.collect_list("elem")).cast("array<string>")
            ).alias("tokens"),
            F.count("*").cast("long").alias("n_alive"),
        )
    )
    return alive


SQL_CDC_FOLD_SET = (
    _log_cte()
    + f"""
, per_doc AS (
  SELECT doc_id,
         coalesce(max(CASE WHEN base_op IN (3,4) THEN ord END), -1) AS tomb,
         coalesce(max(CASE WHEN is_ovw THEN ord END), -1)           AS ctomb
  FROM log GROUP BY doc_id
),
ev AS (
  SELECT doc_id, ord, unnest(tokens) AS elem, 1 AS act
  FROM log WHERE tokens IS NOT NULL
  UNION ALL
  SELECT doc_id, ord, unnest(del_elems) AS elem, 0 AS act
  FROM log WHERE del_elems IS NOT NULL
),
per_elem AS (
  SELECT doc_id, elem,
         arg_max(act, ord * 2 + (1 - act)) AS last_act,
         max(ord)                          AS last_ord_e
  FROM ev GROUP BY doc_id, elem
)
SELECT p.doc_id,
       array_to_string(list_sort(list(p.elem)), ',') AS tokens,
       CAST(count(*) AS BIGINT)     AS n_alive
FROM per_elem p JOIN per_doc d ON p.doc_id = d.doc_id
WHERE p.last_act = 1 AND p.last_ord_e > d.tomb AND p.last_ord_e >= d.ctomb
GROUP BY p.doc_id
"""
)


def q_cdc_fold_udt(spark, sf_dir):
    """A9 (SURVEY §2.4): non-frozen UDT per-field LWW — overwrite via
    cdc$deleted_<col>, field deletes via smallint indices in
    cdc$deleted_elements_<col>, value wins over its delete index within
    one change (update_udt, replicator_consumer.rs:531-585)."""
    from scylla_cdc_rust_spark import model as M
    from scylla_cdc_rust_spark.functions.decode import decode
    from scylla_cdc_rust_spark.operators.fold import fold

    d = _derived_log(spark, sf_dir)
    is_wr = F.col("base_op").isin(1, 2)
    ordc = F.col("ord")
    meta = F.when(
        is_wr,
        F.struct(
            F.when(ordc % 3 != 2, F.col("n_tok")).alias("int_val"),
            F.when(ordc % 5 < 3, (ordc % 2 == 0)).alias("bool_val"),
        ),
    )
    dflag = is_wr & ((F.col("base_op") == 2) | (ordc % 11 == 0))
    delems = F.when(
        is_wr,
        F.filter(
            F.array(
                F.when(ordc % 13 == 0, F.lit(0).cast("smallint")),
                F.when(ordc % 17 == 0, F.lit(1).cast("smallint")),
            ),
            lambda x: x.isNotNull(),
        ),
    )
    log = d.select(
        F.col("raw_op").cast("tinyint").alias(M.OPERATION),
        (ordc + F.lit(M.ORD_BASE_MS)).alias(M.TIME_MS),
        F.lit(0).cast("long").alias(M.TIME_SEQ),
        F.lit(0).cast("int").alias(M.BATCH_SEQ),
        F.lit(None).cast("long").alias(M.TTL),
        F.col("doc_id"),
        meta.alias("meta"),
        dflag.alias(M.DELETED_PREFIX + "meta"),
        delems.alias(M.DELETED_ELEMS_PREFIX + "meta"),
    )
    out = fold(decode(log), collection_modes={"meta": "udt"})
    return out.select(
        "doc_id",
        F.col("meta")["int_val"].alias("int_val"),
        F.col("meta")["bool_val"].alias("bool_val"),
        "last_ord",
    )


SQL_CDC_FOLD_UDT = (
    _log_cte()
    + """
, w AS (
  SELECT doc_id, ord,
         (base_op = 2 OR ord % 11 = 0)              AS dflag,
         CASE WHEN ord % 3 <> 2 THEN n_tok END      AS f0,
         CASE WHEN ord % 5 < 3 THEN (ord % 2 = 0) END AS f1,
         (ord % 13 = 0)                             AS del0,
         (ord % 17 = 0)                             AS del1
  FROM log WHERE base_op IN (1,2)
),
t AS (
  SELECT doc_id,
         coalesce(max(CASE WHEN base_op IN (3,4) THEN ord END), -1) AS tomb,
         coalesce(max(CASE WHEN base_op = 2 THEN ord END), -1)      AS marker,
         max(CASE WHEN base_op IN (1,2) THEN ord END)               AS last_w
  FROM log GROUP BY doc_id
),
agg AS (
  SELECT doc_id,
         (arg_max({'v': f0}, CASE WHEN dflag OR f0 IS NOT NULL OR del0 THEN ord END)).v AS f0v,
         max(CASE WHEN dflag OR f0 IS NOT NULL OR del0 THEN ord END)                    AS f0o,
         (arg_max({'v': f1}, CASE WHEN dflag OR f1 IS NOT NULL OR del1 THEN ord END)).v AS f1v,
         max(CASE WHEN dflag OR f1 IS NOT NULL OR del1 THEN ord END)                    AS f1o
  FROM w GROUP BY doc_id
)
SELECT t.doc_id,
       CASE WHEN a.f0o > t.tomb THEN a.f0v END AS int_val,
       CASE WHEN a.f1o > t.tomb THEN a.f1v END AS bool_val,
       t.last_w * 4194304                      AS last_ord
FROM t LEFT JOIN agg a ON t.doc_id = a.doc_id
WHERE t.marker > t.tomb
   OR (a.f0o > t.tomb AND a.f0v IS NOT NULL)
   OR (a.f1o > t.tomb AND a.f1v IS NOT NULL)
"""
)


def _derived_map_log(spark, sf_dir):
    """CDC-shaped log with a non-frozen map<string,int> column 'attrs'
    derived deterministically from `events`."""
    from scylla_cdc_rust_spark import model as M

    d = _derived_log(spark, sf_dir, fan_out=True)
    is_wr = F.col("base_op").isin(1, 2)
    ordc = F.col("ord")
    k1 = F.concat(F.lit("k"), (ordc % 5).cast("string"))
    k2 = F.concat(F.lit("k"), ((ordc + 2) % 5).cast("string"))
    attrs = F.when(is_wr, F.create_map(k1, F.col("n_tok"), k2, F.col("n_tok") + 7))
    dflag = is_wr & ((F.col("base_op") == 2) | (ordc % 9 == 0))
    delk = F.when(
        is_wr & (F.col("base_op") == 1) & (ordc % 4 == 0),
        F.array(F.concat(F.lit("k"), (ordc % 3).cast("string"))),
    )
    return d.select(
        F.col("raw_op").cast("tinyint").alias(M.OPERATION),
        (ordc + F.lit(M.ORD_BASE_MS)).alias(M.TIME_MS),
        F.lit(0).cast("long").alias(M.TIME_SEQ),
        F.lit(0).cast("int").alias(M.BATCH_SEQ),
        F.lit(None).cast("long").alias(M.TTL),
        F.col("doc_id"),
        attrs.alias("attrs"),
        dflag.alias(M.DELETED_PREFIX + "attrs"),
        delk.alias(M.DELETED_ELEMS_PREFIX + "attrs"),
    )


# per-(map)key LWW CTEs shared by the map and list_delta oracles:
# adds are the value map's entries (same-change removed keys dropped —
# removal wins the tie), removes are cdc$deleted_elements keys
_MAP_EV_CTE = """
, w AS (
  SELECT doc_id, ord, base_op,
         'k' || (ord % 5)       AS k1, n_tok     AS v1,
         'k' || ((ord + 2) % 5) AS k2, n_tok + 7 AS v2,
         (base_op = 2 OR ord % 9 = 0)            AS dflag,
         CASE WHEN base_op = 1 AND ord % 4 = 0
              THEN 'k' || (ord % 3) END          AS delk
  FROM log WHERE base_op IN (1,2)
),
t AS (
  SELECT doc_id,
         coalesce(max(CASE WHEN base_op IN (3,4) THEN ord END), -1) AS tomb,
         coalesce(max(CASE WHEN base_op = 2 THEN ord END), -1)      AS marker,
         max(CASE WHEN base_op IN (1,2) THEN ord END)               AS last_w
  FROM log GROUP BY doc_id
),
ctomb AS (
  SELECT doc_id, coalesce(max(CASE WHEN dflag THEN ord END), -1) AS ctomb
  FROM w GROUP BY doc_id
),
ev AS (
  SELECT doc_id, ord, k1 AS k, v1 AS v, 1 AS a FROM w WHERE k1 IS DISTINCT FROM delk
  UNION ALL
  SELECT doc_id, ord, k2 AS k, v2 AS v, 1 AS a FROM w WHERE k2 IS DISTINCT FROM delk
  UNION ALL
  SELECT doc_id, ord, delk AS k, NULL AS v, 0 AS a FROM w WHERE delk IS NOT NULL
),
per_key AS (
  SELECT doc_id, k,
         (arg_max({'v': v}, ord * 2 + (1 - a))).v AS v,
         arg_max(a, ord * 2 + (1 - a))            AS last_act,
         max(ord)                                 AS last_ord_e
  FROM ev GROUP BY doc_id, k
),
alive AS (
  SELECT p.doc_id, p.k, p.v
  FROM per_key p JOIN t ON p.doc_id = t.doc_id
                 JOIN ctomb c ON p.doc_id = c.doc_id
  WHERE p.last_act = 1 AND p.last_ord_e > t.tomb AND p.last_ord_e >= c.ctomb
)
"""


def q_cdc_fold_map(spark, sf_dir):
    """A7 general form (SURVEY §2.4): non-frozen map<k,v> per-key value
    LWW — adds from value entries, key tombstones from
    cdc$deleted_elements, overwrite resets (update_map_or_set,
    replicator_consumer.rs:415-469)."""
    from scylla_cdc_rust_spark.functions.decode import decode
    from scylla_cdc_rust_spark.operators.fold import fold

    out = fold(decode(_derived_map_log(spark, sf_dir)),
               collection_modes={"attrs": "map"})
    # canonicalizer-safe: sorted "k:v" CSV
    return out.select(
        "doc_id",
        F.when(
            F.col("attrs").isNotNull(),
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.map_entries("attrs")),
                    lambda e: F.concat(e["key"], F.lit(":"), e["value"].cast("string")),
                ),
            ),
        ).alias("attrs"),
        "last_ord",
    )


SQL_CDC_FOLD_MAP = (
    _log_cte()
    + _MAP_EV_CTE
    + """
, folded AS (
  SELECT doc_id, string_agg(k || ':' || v, ',' ORDER BY k) AS attrs
  FROM alive GROUP BY doc_id
)
SELECT t.doc_id, f.attrs AS attrs, t.last_w * 4194304 AS last_ord
FROM t LEFT JOIN folded f ON t.doc_id = f.doc_id
WHERE t.marker > t.tomb OR f.attrs IS NOT NULL
"""
)


def q_cdc_fold_list_delta(spark, sf_dir):
    """A8 general form (SURVEY §2.4): non-frozen list as its CDC
    timeuuid-keyed map encoding — per-key element set/remove, overwrite
    resets preserving this change's keys, final list = values ordered
    by key (update_list, replicator_consumer.rs:472-528)."""
    from scylla_cdc_rust_spark.functions.decode import decode
    from scylla_cdc_rust_spark.operators.fold import fold, present

    out = fold(decode(_derived_map_log(spark, sf_dir).withColumnRenamed(
        "attrs", "vals").withColumnRenamed(
        "cdc$deleted_attrs", "cdc$deleted_vals").withColumnRenamed(
        "cdc$deleted_elements_attrs", "cdc$deleted_elements_vals")),
        collection_modes={"vals": "list_delta"})
    out = present(out, {"vals": "list_delta"})
    return out.select(
        "doc_id",
        F.when(
            F.col("vals").isNotNull(),
            F.concat_ws(",", F.col("vals").cast("array<string>")),
        ).alias("vals"),
        "last_ord",
    )


SQL_CDC_FOLD_LIST_DELTA = (
    _log_cte()
    + _MAP_EV_CTE
    + """
, folded AS (
  SELECT doc_id, string_agg(v, ',' ORDER BY k) AS vals
  FROM alive GROUP BY doc_id
)
SELECT t.doc_id, f.vals AS vals, t.last_w * 4194304 AS last_ord
FROM t LEFT JOIN folded f ON t.doc_id = f.doc_id
WHERE t.marker > t.tomb OR f.vals IS NOT NULL
"""
)


def q_cdc_partition_delete(spark, sf_dir):
    """A5 general form: composite (pk, ck) key — PARTITION_DELETE (no
    clustering key on the change row) kills every clustering row of the
    pk written at/before it; ROW_DELETE kills only its own (pk, ck)
    (delete_partition replicator_consumer.rs:392-402; scenario
    replication_tests.rs:705-723)."""
    from scylla_cdc_rust_spark import model as M
    from scylla_cdc_rust_spark.functions.decode import decode
    from scylla_cdc_rust_spark.operators.fold import fold

    d = _derived_log(spark, sf_dir)
    log = d.select(
        F.col("raw_op").cast("tinyint").alias(M.OPERATION),
        (F.col("ord") + F.lit(M.ORD_BASE_MS)).alias(M.TIME_MS),
        F.lit(0).cast("long").alias(M.TIME_SEQ),
        F.lit(0).cast("int").alias(M.BATCH_SEQ),
        F.lit(None).cast("long").alias(M.TTL),
        (F.col("doc_id").cast("int") % 50).alias("pk"),
        F.when(F.col("base_op").isin(1, 2, 3), (F.col("ord") % 8).cast("int")).alias("ck"),
        F.when(F.col("base_op").isin(1, 2), F.col("n_tok")).alias("v"),
    )
    out = fold(decode(log), key=["pk", "ck"], collection_modes={}, partition_key="pk")
    return out.select("pk", "ck", "v", "last_ord")


SQL_CDC_PARTITION_DELETE = (
    _log_cte()
    + """
, cl AS (
  SELECT CAST(doc_id AS INT) % 50 AS pk,
         CASE WHEN base_op IN (1,2,3) THEN CAST(ord % 8 AS INT) END AS ck,
         ord, base_op,
         CASE WHEN base_op IN (1,2) THEN n_tok END AS v
  FROM log
),
pd AS (SELECT pk, max(ord) AS ptomb FROM cl WHERE base_op = 4 GROUP BY pk),
g AS (
  SELECT pk, ck,
         coalesce(max(CASE WHEN base_op = 3 THEN ord END), -1) AS rtomb,
         coalesce(max(CASE WHEN base_op = 2 THEN ord END), -1) AS marker,
         max(CASE WHEN base_op IN (1,2) THEN ord END)          AS last_w,
         arg_max(v, CASE WHEN base_op IN (1,2) THEN ord END)   AS v
  FROM cl WHERE base_op IN (1,2,3) GROUP BY pk, ck
)
SELECT g.pk, g.ck,
       CASE WHEN g.last_w > greatest(g.rtomb, coalesce(p.ptomb, -1))
            THEN g.v END                AS v,
       g.last_w * 4194304              AS last_ord
FROM g LEFT JOIN pd p ON g.pk = p.pk
WHERE g.marker > greatest(g.rtomb, coalesce(p.ptomb, -1))
   OR (g.last_w > greatest(g.rtomb, coalesce(p.ptomb, -1)) AND g.v IS NOT NULL)
"""
)


def q_cdc_image_pairs(spark, sf_dir):
    """Pre-/post-image pairing (operators/images.py): image rows share
    the change's (stream, time) and are re-attached as struct columns —
    the op family the Consumer surface delivers (consumer.rs:37-52)
    though the replicator skips it (replicator_consumer.rs:878)."""
    from scylla_cdc_rust_spark import model as M
    from scylla_cdc_rust_spark.functions.decode import decode
    from scylla_cdc_rust_spark.operators.images import attach_images

    d = _derived_log(spark, sf_dir, fan_out=True)

    def shape(dd, op_col, ntok_col, batch_seq):
        return dd.select(
            F.sha2(F.col("sid").cast("string"), 256).cast("binary").alias(M.STREAM_ID),
            op_col.cast("tinyint").alias(M.OPERATION),
            (F.col("ord") + F.lit(M.ORD_BASE_MS)).alias(M.TIME_MS),
            F.lit(0).cast("long").alias(M.TIME_SEQ),
            F.lit(batch_seq).cast("int").alias(M.BATCH_SEQ),
            F.lit(None).cast("long").alias(M.TTL),
            F.col("doc_id"),
            ntok_col.cast("int").alias("n_tok"),
            F.col("source"),
        )

    is_wr = F.col("base_op").isin(1, 2)
    changes = shape(d, F.col("raw_op"), F.col("n_tok"), 1)
    pre = shape(
        d.where(is_wr & (F.col("ord") % 5 == 0)), F.lit(0), F.col("n_tok") - 1, 0
    )
    post = shape(
        d.where(is_wr & (F.col("ord") % 7 == 1)), F.lit(9), F.col("n_tok") + 1, 2
    )
    log = changes.unionAll(pre).unionAll(post)
    out = attach_images(decode(log), ["n_tok", "source"], "doc_id")
    return (
        out.where(F.col("pre_image").isNotNull() | F.col("post_image").isNotNull())
        .select(
            "doc_id",
            F.col("ord"),
            F.col("op").cast("int").alias("op"),
            "n_tok",
            F.col("pre_image")["n_tok"].alias("pre_n"),
            F.col("post_image")["n_tok"].alias("post_n"),
        )
    )


SQL_CDC_IMAGE_PAIRS = (
    _log_cte()
    + """
SELECT doc_id,
       ord * 4194304 + 1                          AS ord,
       abs(raw_op)                                AS op,
       n_tok,
       CASE WHEN base_op IN (1,2) AND ord % 5 = 0 THEN n_tok - 1 END AS pre_n,
       CASE WHEN base_op IN (1,2) AND ord % 7 = 1 THEN n_tok + 1 END AS post_n
FROM log
WHERE base_op IN (1,2) AND (ord % 5 = 0 OR ord % 7 = 1)
"""
)


def q_cdc_dedup_replay(spark, sf_dir):
    """F7/R6 (SURVEY §2.2): exactly-once dedup — a doubled (replayed) log
    deduplicated on (doc_id, ord) must collapse to the original
    (replication_tests.rs:93-98)."""
    log = _derived_log(spark, sf_dir).select("sid", "doc_id", "ord")
    doubled = log.unionAll(log)
    dedup = doubled.dropDuplicates(["doc_id", "ord"])
    return dedup.groupBy("sid").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


SQL_CDC_DEDUP_REPLAY = (
    _log_cte()
    + """
, doubled AS (
  SELECT sid, doc_id, ord FROM log
  UNION ALL
  SELECT sid, doc_id, ord FROM log
),
dedup AS (SELECT DISTINCT sid, doc_id, ord FROM doubled)
SELECT sid, count(*) AS n_events, count(DISTINCT doc_id) AS n_docs
FROM dedup GROUP BY sid
"""
)


def q_cdc_window_scan(spark, sf_dir):
    """S8/F1 (SURVEY §2.1): half-open time-window scan per stream with
    predicate pushdown (stream_reader.rs:200-213)."""
    log = _derived_log(spark, sf_dir)
    win = log.where(
        (F.col("ts") >= F.lit("2024-01-08 00:00:00").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-15 00:00:00").cast("timestamp"))
    )
    return win.groupBy("sid").agg(
        F.count("*").alias("n"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.min("ord").alias("min_ord"),
        F.max("ord").alias("max_ord"),
    )


SQL_CDC_WINDOW_SCAN = (
    _log_cte()
    + """
SELECT sid, count(*) AS n, count(DISTINCT doc_id) AS n_docs,
       min(ord) AS min_ord, max(ord) AS max_ord
FROM log
WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-15 00:00:00'
GROUP BY sid
"""
)


def q_cdc_generation_lookup(spark, sf_dir):
    """S3/S4 (SURVEY §2.1): generation-by-timestamp and next-generation
    lookups over day-bucketed generations
    (stream_generations.rs:146-170)."""
    e = _events(spark, sf_dir)
    gens = e.select(F.date_trunc("day", "ts").alias("gen")).distinct()
    x = F.lit("2024-01-15 12:00:00").cast("timestamp")
    cur = gens.where(F.col("gen") <= x).agg(
        F.unix_millis(F.max("gen")).alias("current_gen_ms")
    )
    nxt = gens.where(F.col("gen") > x).agg(
        F.unix_millis(F.min("gen")).alias("next_gen_ms")
    )
    return cur.crossJoin(nxt)


SQL_CDC_GENERATION_LOOKUP = """
WITH gens AS (SELECT DISTINCT date_trunc('day', ts) AS gen FROM events)
SELECT
  (SELECT epoch_ms(max(gen)) FROM gens WHERE gen <= TIMESTAMP '2024-01-15 12:00:00') AS current_gen_ms,
  (SELECT epoch_ms(min(gen)) FROM gens WHERE gen >  TIMESTAMP '2024-01-15 12:00:00') AS next_gen_ms
"""


def q_cdc_stream_groups(spark, sf_dir):
    """S5/O2 (SURVEY §2.1/§2.3): vnode grouping of streams — streams
    grouped per worker, events counted per group
    (stream_generations.rs:243-266, log_reader.rs:208-236)."""
    log = _derived_log(spark, sf_dir)
    return (
        log.withColumn("vnode", (F.col("sid") % 8).cast("bigint"))
        .groupBy("vnode")
        .agg(
            F.countDistinct("sid").alias("n_streams"),
            F.count("*").alias("n_events"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )


SQL_CDC_STREAM_GROUPS = (
    _log_cte()
    + """
SELECT sid % 8 AS vnode, count(DISTINCT sid) AS n_streams,
       count(*) AS n_events, count(DISTINCT doc_id) AS n_docs
FROM log GROUP BY 1
"""
)


def q_cdc_safety_clamp(spark, sf_dir):
    """F3 (SURVEY §2.2): safety-interval clamp — never consume rows newer
    than now − safety_interval (stream_reader.rs:304-331); 24h here."""
    log = _derived_log(spark, sf_dir)
    bound = log.agg(
        (F.unix_micros(F.max("ts").cast("timestamp")) - F.lit(86_400_000_000)).alias("safe_end_us")
    )
    return (
        log.crossJoin(F.broadcast(bound))
        .groupBy("sid")
        .agg(
            F.sum(
                F.when(F.unix_micros(F.col("ts").cast("timestamp")) < F.col("safe_end_us"), 1).otherwise(0)
            ).cast("long").alias("n_safe"),
            F.sum(
                F.when(F.unix_micros(F.col("ts").cast("timestamp")) >= F.col("safe_end_us"), 1).otherwise(0)
            ).cast("long").alias("n_held_back"),
        )
    )


SQL_CDC_SAFETY_CLAMP = (
    _log_cte()
    + """
, bound AS (SELECT max(epoch_us(ts)) - 86400000000 AS safe_end_us FROM log)
SELECT sid,
       CAST(sum(CASE WHEN epoch_us(ts) <  safe_end_us THEN 1 ELSE 0 END) AS BIGINT) AS n_safe,
       CAST(sum(CASE WHEN epoch_us(ts) >= safe_end_us THEN 1 ELSE 0 END) AS BIGINT) AS n_held_back
FROM log, bound GROUP BY sid
"""
)


def q_cdc_checkpoint_resume(spark, sf_dir):
    """S9/C4 (SURVEY §2.1/§2.5): resume from per-stream watermarks —
    events at/after the saved timestamp are re-read
    (stream_reader.rs:226-244)."""
    log = _derived_log(spark, sf_dir)
    wm = log.groupBy("sid").agg(
        (F.unix_micros(F.max("ts").cast("timestamp")) - F.lit(86_400_000_000)).alias("wm_us")
    )
    j = log.join(wm, "sid")
    return (
        j.where(F.unix_micros(F.col("ts").cast("timestamp")) >= F.col("wm_us"))
        .groupBy("sid")
        .agg(F.count("*").alias("n_resume"), F.min("ord").alias("resume_min_ord"))
        .join(wm, "sid")
        .select("sid", "wm_us", "n_resume", "resume_min_ord")
    )


SQL_CDC_CHECKPOINT_RESUME = (
    _log_cte()
    + """
, wm AS (SELECT sid, max(epoch_us(ts)) - 86400000000 AS wm_us FROM log GROUP BY sid)
SELECT l.sid AS sid, any_value(w.wm_us) AS wm_us,
       count(*) AS n_resume, min(l.ord) AS resume_min_ord
FROM log l JOIN wm w ON l.sid = w.sid
WHERE epoch_us(l.ts) >= w.wm_us
GROUP BY l.sid
"""
)


def q_cdc_range_delete_pairing(spark, sf_dir):
    """A6 (SURVEY §2.4): range-delete bound pairing — a left-bound row is
    buffered and paired with the next right-bound row in per-stream
    clustering order via lead() (replicator_consumer.rs:587-659)."""
    log = _derived_log(spark, sf_dir)
    bounds = log.where(F.col("ord") % 50 < 2).select(
        "sid",
        "ord",
        F.when(F.col("ord") % 50 == 0, F.lit(5)).otherwise(F.lit(7)).alias("bop"),
    )
    w = W.partitionBy("sid").orderBy("ord")
    paired = bounds.withColumn("next_bop", F.lead("bop").over(w)).withColumn(
        "next_ord", F.lead("ord").over(w)
    )
    pairs = paired.where((F.col("bop") == 5) & (F.col("next_bop") == 7))
    return pairs.groupBy("sid").agg(
        F.count("*").alias("n_pairs"),
        F.sum(F.col("next_ord") - F.col("ord")).cast("long").alias("total_span"),
    )


SQL_CDC_RANGE_DELETE_PAIRING = (
    _log_cte()
    + """
, bounds AS (
  SELECT sid, ord, CASE WHEN ord % 50 = 0 THEN 5 ELSE 7 END AS bop
  FROM log WHERE ord % 50 < 2
),
paired AS (
  SELECT sid, ord, bop,
         lead(bop) OVER (PARTITION BY sid ORDER BY ord) AS next_bop,
         lead(ord) OVER (PARTITION BY sid ORDER BY ord) AS next_ord
  FROM bounds
)
SELECT sid, count(*) AS n_pairs,
       CAST(sum(next_ord - ord) AS BIGINT) AS total_span
FROM paired WHERE bop = 5 AND next_bop = 7
GROUP BY sid
"""
)


def q_cdc_ttl_propagation(spark, sf_dir):
    """A10/A11 (SURVEY §2.4): TTL and write-timestamp propagation — the
    final row carries the ttl of its last write; absent ttl clears it
    (replicator_consumer.rs:703-716)."""
    log = _derived_log(spark, sf_dir)
    is_w = F.col("base_op").isin(1, 2)
    ttl = F.when(is_w & (F.col("ord") % 5 < 2), (F.col("ord") % 86400)).otherwise(
        F.lit(None)
    )
    lg = log.withColumn("ttl", ttl)
    g = lg.groupBy("doc_id").agg(
        F.coalesce(
            F.max(F.when(F.col("base_op").isin(3, 4), F.col("ord"))), F.lit(-1)
        ).alias("tomb"),
        F.max(F.when(is_w, F.col("ord"))).alias("last_ord"),
        F.max_by(
            F.when(is_w, F.coalesce(F.col("ttl"), F.lit(-1))),
            F.when(is_w, F.col("ord")),
        ).alias("ttl_c"),
    )
    return g.where(F.col("last_ord") > F.col("tomb")).select(
        "doc_id",
        F.nullif(F.col("ttl_c"), F.lit(-1)).alias("ttl"),
        "last_ord",
    )


SQL_CDC_TTL_PROPAGATION = (
    _log_cte()
    + """
, lg AS (
  SELECT *, CASE WHEN base_op IN (1,2) AND ord % 5 < 2 THEN ord % 86400 END AS ttl
  FROM log
)
SELECT doc_id,
       nullif(arg_max(coalesce(ttl, -1), CASE WHEN base_op IN (1,2) THEN ord END), -1) AS ttl,
       max(CASE WHEN base_op IN (1,2) THEN ord END) AS last_ord
FROM lg
GROUP BY doc_id
HAVING max(CASE WHEN base_op IN (1,2) THEN ord END)
     > coalesce(max(CASE WHEN base_op IN (3,4) THEN ord END), -1)
"""
)


def q_cdc_batch_stats(spark, sf_dir):
    """Batch-write semantics (consumer.rs:163-164): events sharing one
    second form a batch; distribution of batch sizes with the last
    member flagged end_of_batch."""
    log = _derived_log(spark, sf_dir)
    b = log.groupBy("sid", F.date_trunc("second", "ts").alias("bt")).agg(
        F.count("*").alias("batch_size"), F.max("ord").alias("eob_ord")
    )
    return b.groupBy("batch_size").agg(
        F.count("*").alias("n_batches"),
        F.sum("eob_ord").cast("long").alias("sum_eob_ord"),
    )


SQL_CDC_BATCH_STATS = (
    _log_cte()
    + """
, b AS (
  SELECT sid, date_trunc('second', ts) AS bt,
         count(*) AS batch_size, max(ord) AS eob_ord
  FROM log GROUP BY sid, date_trunc('second', ts)
)
SELECT batch_size, count(*) AS n_batches,
       CAST(sum(eob_ord) AS BIGINT) AS sum_eob_ord
FROM b GROUP BY batch_size
"""
)


# ===========================================================================
# Training-data pipeline operators (documents / embeddings)
# ===========================================================================


def q_doc_token_count(spark, sf_dir):
    """Token counting (whitespace tokenizer) per language."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.size(F.split(F.col("text"), " "))
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(toks).cast("long").alias("total_tokens"),
        F.round(F.avg(toks), 4).alias("avg_tokens"),
    )


SQL_DOC_TOKEN_COUNT = """
SELECT lang, count(*) AS n_docs,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       round(avg(len(string_split(text, ' '))), 4) AS avg_tokens
FROM documents GROUP BY lang
"""


def q_doc_exact_dedup(spark, sf_dir):
    """Exact dedup via content hash: canonical survivor = min doc_id per
    md5(text) group; report per-source group stats."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    g = d.groupBy(F.md5("text").alias("h"), F.col("source")).agg(
        F.min("doc_id").alias("survivor"), F.count("*").alias("copies")
    )
    return g.groupBy("source").agg(
        F.count("*").alias("n_groups"),
        F.sum("copies").cast("long").alias("n_docs"),
        F.sum(F.col("copies") - 1).cast("long").alias("n_dups_removed"),
    )


SQL_DOC_EXACT_DEDUP = """
WITH g AS (
  SELECT md5(text) AS h, source, min(doc_id) AS survivor, count(*) AS copies
  FROM documents GROUP BY md5(text), source
)
SELECT source, count(*) AS n_groups, CAST(sum(copies) AS BIGINT) AS n_docs,
       CAST(sum(copies - 1) AS BIGINT) AS n_dups_removed
FROM g GROUP BY source
"""


_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def q_doc_quality_score(spark, sf_dir):
    """Quality scoring: length + mean word length + stopword ratio."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = F.split(F.col("text"), " ")
    n_words = F.size(words)
    sw = F.size(F.filter(words, lambda w: w.isin(*_STOPWORDS)))
    awl = F.length("text").cast("double") / n_words.cast("double")
    score = F.round(
        F.least(F.lit(1.0), n_words.cast("double") / F.lit(100.0)) * 0.5
        + (F.lit(1.0) / (F.lit(1.0) + F.abs(awl - F.lit(5.0)))) * 0.3
        + (sw.cast("double") / n_words.cast("double")) * 0.2,
        4,
    )
    return d.select(F.col("source"), score.alias("q")).groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("q"), 4).alias("avg_quality"),
        F.round(F.min("q"), 4).alias("min_quality"),
        F.round(F.max("q"), 4).alias("max_quality"),
    )


_SW_SQL = "('the','a','of','and','to','in','is','it')"
SQL_DOC_QUALITY_SCORE = f"""
WITH s AS (
  SELECT source,
    round(
      least(1.0, len(string_split(text,' ')) / 100.0) * 0.5
      + (1.0 / (1.0 + abs(CAST(length(text) AS DOUBLE) / len(string_split(text,' ')) - 5.0))) * 0.3
      + (CAST(len(list_filter(string_split(text,' '), w -> w IN {_SW_SQL})) AS DOUBLE)
         / len(string_split(text,' '))) * 0.2,
      4) AS q
  FROM documents
)
SELECT source, count(*) AS n_docs, round(avg(q), 4) AS avg_quality,
       round(min(q), 4) AS min_quality, round(max(q), 4) AS max_quality
FROM s GROUP BY source
"""


def q_doc_lang_id(spark, sf_dir):
    """Language-ID heuristic: stopword-ratio thresholding, compared
    against the labeled lang column (confusion counts)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = F.split(F.col("text"), " ")
    ratio = F.size(F.filter(words, lambda w: w.isin(*_STOPWORDS))).cast(
        "double"
    ) / F.size(words).cast("double")
    guess = (
        F.when(ratio > 0.08, F.lit("en"))
        .when(ratio > 0.03, F.lit("latin"))
        .otherwise(F.lit("other"))
    )
    return d.select("lang", guess.alias("guess")).groupBy("lang", "guess").agg(
        F.count("*").alias("n")
    )


SQL_DOC_LANG_ID = f"""
WITH r AS (
  SELECT lang,
         CAST(len(list_filter(string_split(text,' '), w -> w IN {_SW_SQL})) AS DOUBLE)
         / len(string_split(text,' ')) AS ratio
  FROM documents
)
SELECT lang,
       CASE WHEN ratio > 0.08 THEN 'en'
            WHEN ratio > 0.03 THEN 'latin'
            ELSE 'other' END AS guess,
       count(*) AS n
FROM r GROUP BY 1, 2
"""


def q_doc_minhash_signatures(spark, sf_dir):
    """MinHash signatures (4 hash functions over distinct words) for the
    first 25 documents — the signature stage of MinHash-LSH dedup."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").where(F.col("doc_id") < 25)
    w = d.select("doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("w"))
    hw = w.withColumn("h", F.expr(_h_spark("w")))
    aggs = [
        F.min((F.col("h") * a + b) % M31).alias(f"m{i}")
        for i, (a, b) in enumerate([(1, 0), (31, 7), (131, 3), (997, 11)])
    ]
    return hw.groupBy("doc_id").agg(*aggs)


SQL_DOC_MINHASH_SIGNATURES = f"""
WITH w AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w
  FROM documents WHERE doc_id < 25
),
hw AS (SELECT doc_id, {_h_duck("w")} AS h FROM w)
SELECT doc_id,
       min((h * 1 + 0) % {M31})   AS m0,
       min((h * 31 + 7) % {M31})  AS m1,
       min((h * 131 + 3) % {M31}) AS m2,
       min((h * 997 + 11) % {M31}) AS m3
FROM hw GROUP BY doc_id
"""


def q_doc_ngram_jaccard(spark, sf_dir):
    """N-gram (word 2-gram shingle) Jaccard similarity for all pairs among
    the first 20 docs — the verification stage of near-dup detection."""
    from scylla_cdc_rust_spark.operators.dedup_docs import shingles

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").where(F.col("doc_id") < 20)
    sh = d.select("doc_id", F.explode(shingles(F.col("text"), 2)).alias("sh"))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    inter = (
        sh.alias("x")
        .join(sh.alias("y"), (F.col("x.sh") == F.col("y.sh")) & (F.col("x.doc_id") < F.col("y.doc_id")))
        .groupBy(F.col("x.doc_id").alias("d1"), F.col("y.doc_id").alias("d2"))
        .agg(F.count("*").alias("inter"))
    )
    j = (
        inter.join(sizes.withColumnRenamed("doc_id", "d1").withColumnRenamed("sz", "sz1"), "d1")
        .join(sizes.withColumnRenamed("doc_id", "d2").withColumnRenamed("sz", "sz2"), "d2")
        .select(
            "d1",
            "d2",
            F.round(
                F.col("inter").cast("double")
                / (F.col("sz1") + F.col("sz2") - F.col("inter")).cast("double"),
                4,
            ).alias("jaccard"),
        )
    )
    return j.where(F.col("jaccard") > 0.01)


SQL_DOC_NGRAM_JACCARD = """
WITH docs AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents WHERE doc_id < 20),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(generate_series(1, len(ws) - 1),
                i -> ws[i] || '_' || ws[i + 1]))) AS sh
  FROM docs
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS d1, y.doc_id AS d2, count(*) AS inter
  FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id
)
SELECT d1, d2,
       round(CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter), 4) AS jaccard
FROM inter
JOIN sizes s1 ON s1.doc_id = d1
JOIN sizes s2 ON s2.doc_id = d2
WHERE round(CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter), 4) > 0.01
"""


def q_doc_repetition_stats(spark, sf_dir):
    """Gopher-style intra-document repetition signals
    (operators/repetition.py): per doc, the most-frequent-n-gram
    fraction and duplicate-n-gram fraction for n=2,3 — the boilerplate
    / degenerate-text quality rules that length/stopword scoring
    misses.  Pure map-side column block (one higher-order aggregate
    over the doc's own sorted n-grams; no explode, zero shuffle) —
    like stratified sampling, it stacks straight onto the scan."""
    from scylla_cdc_rust_spark.operators.repetition import repetition_stats

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = repetition_stats(d)
    return out.withColumn("n_words", F.col("n_words").cast("long"))


SQL_DOC_REPETITION_STATS = """
WITH docs AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
base AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words, ws FROM docs),
g2 AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) - 1),
         i -> ws[i] || '_' || ws[i + 1])) AS g
  FROM base WHERE n_words >= 2
),
c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2),
a2 AS (SELECT doc_id, max(c) AS mx, count(*) AS nd, sum(c) AS tot
       FROM c2 GROUP BY 1),
g3 AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) - 2),
         i -> ws[i] || '_' || ws[i + 1] || '_' || ws[i + 2])) AS g
  FROM base WHERE n_words >= 3
),
c3 AS (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2),
a3 AS (SELECT doc_id, max(c) AS mx, count(*) AS nd, sum(c) AS tot
       FROM c3 GROUP BY 1)
SELECT b.doc_id, b.n_words,
       round(coalesce(a2.mx / CAST(a2.tot AS DOUBLE), 0), 6) AS top2_frac,
       round(coalesce(1 - a2.nd / CAST(a2.tot AS DOUBLE), 0), 6) AS dup2_frac,
       round(coalesce(a3.mx / CAST(a3.tot AS DOUBLE), 0), 6) AS top3_frac,
       round(coalesce(1 - a3.nd / CAST(a3.tot AS DOUBLE), 0), 6) AS dup3_frac
FROM base b
LEFT JOIN a2 ON a2.doc_id = b.doc_id
LEFT JOIN a3 ON a3.doc_id = b.doc_id
"""


def q_doc_pii_scrub(spark, sf_dir):
    """PII scrubbing (operators/pii.py): emails / bare IPv4s / long
    digit runs → placeholder tokens, with per-class counts.  The
    synthetic corpus carries no PII-shaped strings, so the query plants
    deterministic PII per document (identically in the oracle) and
    verifies the scrub end-to-end via counts + an md5 fingerprint of
    the scrubbed text.  Pure chained regexp_replace/regexp_count —
    map-side, zero shuffle, regex subset chosen to behave identically
    under Java regex and RE2."""
    from scylla_cdc_rust_spark.operators.pii import pii_scrub

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    planted = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@mail.example.com from 10."),
            (F.col("doc_id") % 200).cast("string"),
            F.lit(".3.7 acct 90210"),
            F.lpad(F.col("doc_id").cast("string"), 6, "0"),
        ).alias("text"),
    )
    out = pii_scrub(planted)
    return out.select(
        "doc_id", "n_emails", "n_ips", "n_longnums",
        F.md5("text").alias("scrub_digest"),
        F.length("text").cast("long").alias("scrub_len"),
    )


SQL_DOC_PII_SCRUB = r"""
WITH planted AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@mail.example.com from 10.'
              || CAST(doc_id % 200 AS VARCHAR)
              || '.3.7 acct 90210' || lpad(CAST(doc_id AS VARCHAR), 6, '0')
           AS text
  FROM documents
),
s1 AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
           AS n_emails,
         regexp_replace(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g')
           AS text
  FROM planted
),
s2 AS (
  SELECT doc_id, n_emails,
         CAST(len(regexp_extract_all(text,
           '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS BIGINT) AS n_ips,
         regexp_replace(text,
           '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g') AS text
  FROM s1
),
s3 AS (
  SELECT doc_id, n_emails, n_ips,
         CAST(len(regexp_extract_all(text, '\b[0-9]{9,}\b')) AS BIGINT)
           AS n_longnums,
         regexp_replace(text, '\b[0-9]{9,}\b', '<NUM>', 'g') AS text
  FROM s2
)
SELECT doc_id, n_emails, n_ips, n_longnums,
       md5(text) AS scrub_digest,
       CAST(length(text) AS BIGINT) AS scrub_len
FROM s3
"""


def q_doc_dedup_clusters(spark, sf_dir):
    """Corpus-level near-dup CLUSTERS (operators/dedup_docs.dedup_clusters):
    2-gram-shingle Jaccard pairs (≥ 0.5, whole corpus) resolved into
    connected components by alternating large-star/small-star
    contraction — all joins, no driver graph.  This is the transitive
    stage pairwise dedup lacks: A~B~C collapses to one cluster with
    cluster_id = min member even when (A, C) was never a candidate
    pair.  The oracle replays the same pairs through a recursive-CTE
    min-label closure.  Pair generation here is the oracle-checkable
    brute-force tier; the production feed is minhash_lsh_candidates →
    dedup_clusters (pytest-pinned), where candidates are bucketed, not
    all-pairs.  Stop-shingles (document frequency > 50) are trimmed
    before the join — the standard move that keeps the per-shingle
    pair blowup bounded (a shingle in f docs contributes f² join rows)
    — via a broadcast anti-join on the SMALL hot set, so the shingle
    stream itself is never shuffled for the trim."""
    from scylla_cdc_rust_spark.functions.generate_util import explode_nonnull
    from scylla_cdc_rust_spark.operators.dedup_docs import dedup_clusters, shingles
    from scylla_cdc_rust_spark.session import ensure_min_parallelism

    d = ensure_min_parallelism(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )
    # shingles() carries the short-doc guard (a 1-word doc must yield no
    # shingles, matching the oracle's generate_series(1, len-1));
    # explode_nonnull keeps the shingle build out of the scan stage
    sh_all = explode_nonnull(d, shingles(F.col("text"), 2), "sh", "doc_id")
    hot = sh_all.groupBy("sh").agg(F.count("*").alias("df")).where(F.col("df") > 50)
    sh = sh_all.join(F.broadcast(hot.select("sh")), "sh", "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    inter = (
        sh.alias("x")
        .join(sh.alias("y"), (F.col("x.sh") == F.col("y.sh")) & (F.col("x.doc_id") < F.col("y.doc_id")))
        .groupBy(F.col("x.doc_id").alias("d1"), F.col("y.doc_id").alias("d2"))
        .agg(F.count("*").alias("inter"))
    )
    pairs = (
        inter.join(sizes.withColumnRenamed("doc_id", "d1").withColumnRenamed("sz", "sz1"), "d1")
        .join(sizes.withColumnRenamed("doc_id", "d2").withColumnRenamed("sz", "sz2"), "d2")
        .where(
            F.round(
                F.col("inter").cast("double")
                / (F.col("sz1") + F.col("sz2") - F.col("inter")).cast("double"),
                4,
            )
            >= 0.5
        )
        .select("d1", "d2")
    )
    cl = dedup_clusters(pairs)
    from pyspark.sql import Window as W

    return cl.select(
        F.col("d1").alias("doc_id"),
        "cluster_id",
        F.count("*").over(W.partitionBy("cluster_id")).cast("long").alias(
            "cluster_size"
        ),
    )


SQL_DOC_DEDUP_CLUSTERS = """
WITH RECURSIVE docs AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
sh_all AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(generate_series(1, len(ws) - 1),
                i -> ws[i] || '_' || ws[i + 1]))) AS sh
  FROM docs
),
hot AS (SELECT sh FROM sh_all GROUP BY sh HAVING count(*) > 50),
sh AS (
  SELECT a.* FROM sh_all a LEFT JOIN hot h USING (sh) WHERE h.sh IS NULL
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS d1, y.doc_id AS d2, count(*) AS inter
  FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id
),
pairs AS (
  SELECT d1, d2 FROM inter
  JOIN sizes s1 ON s1.doc_id = d1
  JOIN sizes s2 ON s2.doc_id = d2
  WHERE round(CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter), 4) >= 0.5
),
edges AS (
  SELECT d1 AS u, d2 AS v FROM pairs UNION SELECT d2, d1 FROM pairs
),
nodes AS (SELECT DISTINCT u AS node FROM edges),
walk(node, label) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.v, w.label FROM walk w JOIN edges e ON e.u = w.node
  WHERE w.label < e.v
),
cc AS (SELECT node AS doc_id, min(label) AS cluster_id FROM walk GROUP BY node)
SELECT doc_id, cluster_id,
       CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
FROM cc
"""

#: shared oracle prelude: the banded-minhash LSH candidate pairs — the
#: PRODUCTION pair feed (operators/dedup_docs.minhash_lsh_candidates),
#: reproduced exactly: distinct 2-gram shingles → md5-prefix word hash →
#: 8 permutation minima → 4 band hashes (h = (m_even·31 + m_odd) % M31)
#: → bucket self-join.  At this corpus every bucket is far below the
#: 10k salting cap, so cap_buckets contributes __sub = 0 for all rows
#: and the capped Spark plan equals the uncapped oracle.
_SQL_LSH_CANDIDATES_CTE = f"""
docs AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(generate_series(1, len(ws) - 1),
                i -> ws[i] || '_' || ws[i + 1]))) AS sh
  FROM docs
),
hw AS (SELECT doc_id, {_h_duck("sh")} AS h FROM sh),
sigs AS (
  SELECT doc_id,
         min((h * 1 + 0) % {M31})          AS m0,
         min((h * 31 + 7) % {M31})         AS m1,
         min((h * 131 + 3) % {M31})        AS m2,
         min((h * 997 + 11) % {M31})       AS m3,
         min((h * 8191 + 19) % {M31})      AS m4,
         min((h * 131071 + 23) % {M31})    AS m5,
         min((h * 524287 + 29) % {M31})    AS m6,
         min((h * {2147483647 % M31} + 31) % {M31}) AS m7
  FROM hw GROUP BY doc_id
),
bu AS (
  SELECT doc_id, 0 AS band, (m0 * 31 + m1) % {M31} AS bh FROM sigs
  UNION ALL SELECT doc_id, 1, (m2 * 31 + m3) % {M31} FROM sigs
  UNION ALL SELECT doc_id, 2, (m4 * 31 + m5) % {M31} FROM sigs
  UNION ALL SELECT doc_id, 3, (m6 * 31 + m7) % {M31} FROM sigs
),
cand AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM bu a JOIN bu b ON a.band = b.band AND a.bh = b.bh
                     AND a.doc_id < b.doc_id
)
"""


def q_doc_lsh_candidates(spark, sf_dir):
    """PRODUCTION near-dup candidate generation, driver-gated end to end:
    minhash_signatures → minhash_lsh_candidates with the hot-bucket cap
    ACTIVE (max_bucket_size=10k — a no-op on this corpus since no bucket
    comes near the cap, so the oracle's uncapped banding is exact).
    This is the pair feed the 100 TB dedup pipeline runs — bucketed
    Σ bucket², never the brute-force all-pairs shingle join that
    doc_dedup_clusters uses as its verification-tier oracle surface."""
    from scylla_cdc_rust_spark.operators.dedup_docs import (
        minhash_lsh_candidates,
        minhash_signatures,
    )
    from scylla_cdc_rust_spark.session import ensure_min_parallelism

    d = ensure_min_parallelism(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    sigs = minhash_signatures(d, num_hashes=8)
    # the hot-bucket guard cache stays registered until the returned
    # (lazy) frame materializes — the next cap_buckets call or an
    # explicit release_guard_caches() frees it (dedup_docs lifecycle);
    # releasing HERE would unpersist before the action ever runs and
    # the candidate self-join would recompute the signatures up to 4×
    return minhash_lsh_candidates(
        sigs, num_hashes=8, bands=4, max_bucket_size=10_000
    )


SQL_DOC_LSH_CANDIDATES = f"""
WITH {_SQL_LSH_CANDIDATES_CTE}
SELECT d1, d2 FROM cand
"""


def q_doc_dedup_clusters_lsh(spark, sf_dir):
    """The PRODUCTION corpus-dedup path end to end: bucketed LSH
    candidates (q_doc_lsh_candidates) resolved into connected-component
    clusters by star contraction (operators/dedup_docs.dedup_clusters).
    The oracle replays the same banded candidates through a
    recursive-CTE min-label closure — so both production stages
    (candidate generation AND transitive clustering) sit behind the
    value-hash gate, not just the brute-force verification tier."""
    from pyspark.sql import Window as W

    from scylla_cdc_rust_spark.operators.dedup_docs import (
        dedup_clusters,
        minhash_lsh_star_edges,
        minhash_signatures,
        release_guard_caches,
    )
    from scylla_cdc_rust_spark.session import ensure_min_parallelism

    d = ensure_min_parallelism(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    sigs = minhash_signatures(d, num_hashes=8)
    # Connectivity-equivalent star edges instead of the m²-per-bucket
    # candidate pairs: every LSH bucket is a clique, so member →
    # min(bucket member) stars yield the IDENTICAL component set while
    # shuffling O(Σ m) edges instead of O(Σ m²) — 4.84M pairs → ~150k
    # edges on the bench corpus, and the first star-contraction round no
    # longer grinds through the clique blowup (equivalence pinned
    # against the pair path by tests/test_training_ops.py and against
    # the unchanged pair-replaying DuckDB oracle at every SF).
    pairs = minhash_lsh_star_edges(
        sigs, num_hashes=8, bands=4, max_bucket_size=10_000
    )
    # dedup_clusters is EAGER (localCheckpoint per contraction round), so
    # the edges — and the cap_buckets guard cache they depend on — have
    # fully materialized by the time it returns; releasing the guard
    # cache here is the documented lifecycle point
    cl = dedup_clusters(pairs)
    release_guard_caches()
    return cl.select(
        F.col("d1").alias("doc_id"),
        "cluster_id",
        F.count("*").over(W.partitionBy("cluster_id")).cast("long").alias(
            "cluster_size"
        ),
    )


SQL_DOC_DEDUP_CLUSTERS_LSH = f"""
WITH RECURSIVE {_SQL_LSH_CANDIDATES_CTE},
edges AS (
  SELECT d1 AS u, d2 AS v FROM cand UNION SELECT d2, d1 FROM cand
),
nodes AS (SELECT DISTINCT u AS node FROM edges),
walk(node, label) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.v, w.label FROM walk w JOIN edges e ON e.u = w.node
  WHERE w.label < e.v
),
cc AS (SELECT node AS doc_id, min(label) AS cluster_id FROM walk GROUP BY node)
SELECT doc_id, cluster_id,
       CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
FROM cc
"""


def q_doc_simhash(spark, sf_dir):
    """SimHash (16-bit) document fingerprints, bucketed — the other
    classic near-dup sketch."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    h = _h_spark("w")
    bit_terms = " + ".join(
        f"(CASE WHEN size(filter(hs, h -> (h >> {b}) % 2 = 1)) * 2 > size(hs) "
        f"THEN {1 << b} ELSE 0 END)"
        for b in range(16)
    )
    hs = d.select(
        "doc_id",
        "lang",
        F.expr(
            f"transform(array_distinct(split(text, ' ')), w -> {h})"
        ).alias("hs"),
    )
    sim = hs.select("lang", F.expr(f"CAST({bit_terms} AS BIGINT)").alias("simhash"))
    return sim.groupBy("lang").agg(
        F.countDistinct("simhash").alias("n_distinct_sketches"),
        F.count("*").alias("n_docs"),
    )


_DUCK_BITS = " + ".join(
    f"(CASE WHEN len(list_filter(hs, h -> (h >> {b}) % 2 = 1)) * 2 > len(hs) "
    f"THEN {1 << b} ELSE 0 END)"
    for b in range(16)
)
SQL_DOC_SIMHASH = f"""
WITH hs AS (
  SELECT doc_id, lang,
         list_transform(list_distinct(string_split(text, ' ')), w -> {_h_duck("w")}) AS hs
  FROM documents
),
sim AS (SELECT lang, CAST({_DUCK_BITS} AS BIGINT) AS simhash FROM hs)
SELECT lang, count(DISTINCT simhash) AS n_distinct_sketches, count(*) AS n_docs
FROM sim GROUP BY lang
"""


def q_doc_simhash_neardups(spark, sf_dir):
    """SimHash Hamming-radius near-dup pairs via the block-pigeonhole
    candidate join (operators/dedup_docs.simhash_near_dups) — oracle is
    the all-pairs Hamming filter (fine as a gate at sf scale; the
    production path never goes all-pairs)."""
    from scylla_cdc_rust_spark.operators.dedup_docs import simhash_near_dups

    # bounded doc subset: a 16-bit sketch space saturates at large doc
    # counts (every pair lands within radius), which tests nothing extra
    # and bloats the gate output; production uses 64-bit sketches
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.col("doc_id") < 500
    )
    out = simhash_near_dups(d, bits=16, radius=2)
    return out.select("d1", "d2", F.col("hamming").cast("int").alias("hamming"))


SQL_DOC_SIMHASH_NEARDUPS = f"""
WITH hs AS (
  SELECT doc_id,
         list_transform(list_distinct(string_split(text, ' ')), w -> {_h_duck("w")}) AS hs
  FROM documents WHERE doc_id < 500
),
sim AS (SELECT doc_id, CAST({_DUCK_BITS} AS BIGINT) AS s FROM hs)
SELECT a.doc_id AS d1, b.doc_id AS d2,
       CAST(bit_count(xor(a.s, b.s)) AS INT) AS hamming
FROM sim a JOIN sim b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.s, b.s)) <= 2
"""


def q_doc_pack_offsets(spark, sf_dir):
    """Sequence packing (operators/packing.py): shard the corpus, order
    docs deterministically, cut the concatenated token stream into
    seq_len packs — per-doc offsets + per-shard accounting."""
    from scylla_cdc_rust_spark.operators.packing import pack_offsets, pack_stats

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    offs = pack_offsets(d, seq_len=2048, n_shards=4)
    return pack_stats(offs, seq_len=2048)


SQL_DOC_PACK_OFFSETS = f"""
WITH base AS (
  SELECT doc_id,
         CAST(({_h_duck("CAST(doc_id AS VARCHAR)")}) % 4 AS INT) AS shard,
         CAST(len(string_split(text, ' ')) AS BIGINT)            AS n_tok
  FROM documents
),
offs AS (
  SELECT doc_id, shard, n_tok,
         coalesce(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_off
  FROM base
),
p AS (
  SELECT *,
         CAST(floor(start_off / 2048) AS BIGINT)                 AS first_pack,
         CAST(floor((start_off + n_tok - 1) / 2048) AS BIGINT)   AS last_pack
  FROM offs
)
SELECT shard, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       CAST(max(last_pack) + 1 AS BIGINT) AS n_packs,
       CAST(sum(CASE WHEN last_pack > first_pack THEN 1 ELSE 0 END)
            AS BIGINT) AS n_straddling,
       CAST((max(last_pack) + 1) * 2048 - sum(n_tok) AS BIGINT) AS tail_waste
FROM p GROUP BY shard
"""


def q_doc_fingerprint(spark, sf_dir):
    """Rolling polynomial document fingerprint (order-sensitive hash of
    the word sequence)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    h = _h_spark("w")
    fp = F.expr(
        f"aggregate(transform(split(text, ' '), w -> {h}), 0L, "
        f"(acc, x) -> (acc * 31 + x) % {M31})"
    )
    return d.select("lang", fp.alias("fp")).groupBy("lang").agg(
        F.countDistinct("fp").alias("n_distinct_fp"),
        F.count("*").alias("n_docs"),
    )


SQL_DOC_FINGERPRINT = f"""
WITH f AS (
  SELECT lang,
         list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_transform(string_split(text, ' '), w -> {_h_duck("w")})),
           (acc, x) -> (acc * 31 + x) % {M31}) AS fp
  FROM documents
)
SELECT lang, count(DISTINCT fp) AS n_distinct_fp, count(*) AS n_docs
FROM f GROUP BY lang
"""


def q_emb_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k ANN baseline: queries = vec_id < 5,
    top-5 neighbours each among the rest."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v")
    )
    q = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    c = e.where(F.col("vec_id") >= 5).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    dot = F.expr("aggregate(zip_with(qv, cv, (x, y) -> x * y), 0D, (a, x) -> a + x)")
    nq = F.sqrt(F.expr("aggregate(qv, 0D, (a, x) -> a + x * x)"))
    nc = F.sqrt(F.expr("aggregate(cv, 0D, (a, x) -> a + x * x)"))
    scored = q.crossJoin(c).select(
        "qid", "cid", F.round(dot / (nq * nc), 4).alias("cos")
    )
    w = W.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select("qid", "cid", "cos", F.col("rank").cast("int").alias("rank"))
    )


SQL_EMB_COSINE_TOPK = """
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id >= 5),
scored AS (
  SELECT qid, cid,
         round(
           list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(generate_series(1, len(qv)), i -> qv[i] * cv[i])),
             (a, x) -> a + x)
           / (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                list_transform(qv, x -> x * x)), (a, x) -> a + x))
              * sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                list_transform(cv, x -> x * x)), (a, x) -> a + x))),
           4) AS cos
  FROM q, c
),
ranked AS (
  SELECT qid, cid, cos,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rank
  FROM scored
)
SELECT qid, cid, cos, CAST(rank AS INTEGER) AS rank FROM ranked WHERE rank <= 5
"""


def q_emb_lsh_buckets(spark, sf_dir):
    """LSH bucketing for ANN at scale: 4 deterministic hyperplane signs →
    bucket id; report bucket occupancy (the candidate-pruning stage)."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    terms = []
    for j in range(4):
        dot = " + ".join(
            f"CAST(element_at(embedding, {d + 1}) AS DOUBLE) * {((j * 131 + d * 197) % 17) - 8}"
            for d in range(0, 64, 4)
        )
        terms.append(f"(CASE WHEN ({dot}) > 0 THEN {1 << j} ELSE 0 END)")
    bucket = F.expr("CAST(" + " + ".join(terms) + " AS INTEGER)")
    return (
        e.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vectors"))
    )


def _duck_lsh_bucket() -> str:
    terms = []
    for j in range(4):
        dot = " + ".join(
            f"CAST(embedding[{d + 1}] AS DOUBLE) * {((j * 131 + d * 197) % 17) - 8}"
            for d in range(0, 64, 4)
        )
        terms.append(f"(CASE WHEN ({dot}) > 0 THEN {1 << j} ELSE 0 END)")
    return "CAST(" + " + ".join(terms) + " AS INTEGER)"


SQL_EMB_LSH_BUCKETS = f"""
SELECT {_duck_lsh_bucket()} AS bucket, count(*) AS n_vectors
FROM embeddings GROUP BY 1
"""


def q_emb_binary_meta(spark, sf_dir):
    """Multimodal plumbing: vectors treated as opaque binary payloads with
    typed metadata (schema/bytes accounting per label) — the metadata
    half of the image/audio column design (decode itself is stubbed in
    operators/multimodal.py)."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return e.groupBy("label").agg(
        F.count("*").alias("n_payloads"),
        F.sum(F.size("embedding") * 4).cast("long").alias("total_bytes"),
        F.min("vec_id").alias("min_id"),
        F.max("vec_id").alias("max_id"),
    )


SQL_EMB_BINARY_META = """
SELECT label, count(*) AS n_payloads,
       CAST(sum(len(embedding) * 4) AS BIGINT) AS total_bytes,
       min(vec_id) AS min_id, max(vec_id) AS max_id
FROM embeddings GROUP BY label
"""


def q_img_channel_stats(spark, sf_dir):
    """REAL image decode driver gate (operators/multimodal.py): a
    deterministic synthetic image per document (even doc_id → PPM P6,
    odd → 24-bit BMP; pixel law v(x,y,c) = (id·31 + (y·W+x)·3 + c·7)
    % 256 with W = 8 + id%5, H = 6 + id%4), encoded AND decoded by the
    shipped numpy-only codecs inside mapInPandas (extract_features with
    the default registry).  Output is exact integer pixel math — width,
    height, per-channel sums — which the DuckDB oracle reproduces from
    the closed-form law without any codec, so a decode bug of even one
    byte (BMP row padding, bottom-up order, BGR swap) hash-mismatches."""
    from scylla_cdc_rust_spark.operators.multimodal import (
        extract_features,
        synthetic_images,
    )

    from scylla_cdc_rust_spark.session import ensure_min_parallelism

    # codec work runs inside mapInPandas: fan a single-file scan out
    # so encode/decode parallelizes (structural no-op at real scale)
    d = ensure_min_parallelism(
        spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    )
    media = synthetic_images(d)
    f = extract_features(media, dim=6)
    e = lambda i: F.element_at("features", i).cast("bigint")  # noqa: E731
    return f.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        e(1).alias("width"),
        e(2).alias("height"),
        e(3).alias("n_px"),
        e(4).alias("sum_r"),
        e(5).alias("sum_g"),
        e(6).alias("sum_b"),
    )


SQL_IMG_CHANNEL_STATS = """
WITH d AS (
  SELECT doc_id, 8 + doc_id % 5 AS w, 6 + doc_id % 4 AS h FROM documents
),
px AS (
  SELECT doc_id, w, h, unnest(generate_series(0, w * h - 1)) AS p FROM d
)
SELECT doc_id,
       CAST(w AS BIGINT) AS width,
       CAST(h AS BIGINT) AS height,
       CAST(w * h AS BIGINT) AS n_px,
       CAST(SUM((doc_id * 31 + p * 3) % 256) AS BIGINT) AS sum_r,
       CAST(SUM((doc_id * 31 + p * 3 + 7) % 256) AS BIGINT) AS sum_g,
       CAST(SUM((doc_id * 31 + p * 3 + 14) % 256) AS BIGINT) AS sum_b
FROM px GROUP BY doc_id, w, h
"""


def q_img_resize_stats(spark, sf_dir):
    """REAL resize driver gate: the synthetic corpus above pushed through
    resize_images(5, 4) — decode (PPM or BMP) → floor nearest-neighbor
    (src_x = x₂·W // 5, src_y = y₂·H // 4) → re-encode in the same
    container — then decoded AGAIN for exact channel sums.  The oracle
    replays the NN index map arithmetically, so both codecs' encode and
    decode sides plus the resample kernel are all on the hook."""
    from scylla_cdc_rust_spark.operators.multimodal import (
        extract_features,
        resize_images,
        synthetic_images,
    )

    from scylla_cdc_rust_spark.session import ensure_min_parallelism

    # codec work runs inside mapInPandas: fan a single-file scan out
    # so encode/decode parallelizes (structural no-op at real scale)
    d = ensure_min_parallelism(
        spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    )
    media = synthetic_images(d)
    f = extract_features(resize_images(media, 5, 4), dim=6)
    e = lambda i: F.element_at("features", i).cast("bigint")  # noqa: E731
    return f.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        e(1).alias("width"),
        e(2).alias("height"),
        e(4).alias("sum_r"),
        e(5).alias("sum_g"),
        e(6).alias("sum_b"),
    )


SQL_IMG_RESIZE_STATS = """
WITH d AS (
  SELECT doc_id, 8 + doc_id % 5 AS w, 6 + doc_id % 4 AS h FROM documents
),
tgt AS (
  SELECT doc_id, w, h, unnest(generate_series(0, 19)) AS t FROM d
),
src AS (
  SELECT doc_id,
         (((t // 5) * h // 4) * w + ((t % 5) * w // 5)) AS p
  FROM tgt
)
SELECT doc_id,
       CAST(5 AS BIGINT) AS width,
       CAST(4 AS BIGINT) AS height,
       CAST(SUM((doc_id * 31 + p * 3) % 256) AS BIGINT) AS sum_r,
       CAST(SUM((doc_id * 31 + p * 3 + 7) % 256) AS BIGINT) AS sum_g,
       CAST(SUM((doc_id * 31 + p * 3 + 14) % 256) AS BIGINT) AS sum_b
FROM src GROUP BY doc_id
"""


def _doc_tokens(spark, sf_dir, fan_out=False):
    """documents → (doc_id, tokens array<int>): the deterministic
    text→token derivation shared by the tok_* queries (portable word
    hash mod 32000 — replayed identically in every oracle).

    ``fan_out``: hash-repartition the RAW (doc_id, text) scan before
    the per-word md5 derivation — the repartition must sit BELOW the
    projection or the single scan task still does all the hashing
    (guide §2.5; same structure as ``_derived_log``)."""
    from scylla_cdc_rust_spark.functions.text import word_hash

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    if fan_out:
        from scylla_cdc_rust_spark.session import ensure_min_parallelism

        d = ensure_min_parallelism(d, by="doc_id")
    return d.select(
        "doc_id",
        F.transform(
            F.split("text", " "), lambda w: word_hash(w) % 32000
        ).alias("tokens"),
    )


_SQL_DOC_TOKS = f"""
  SELECT doc_id,
         list_transform(string_split(text, ' '),
                        w -> ({_h_duck("w")}) % 32000) AS toks
  FROM documents
"""


def q_tok_ngram_contamination(spark, sf_dir):
    """Decontamination on PRE-TOKENIZED sequences — the engine's target
    shape (doc_id, tokens array<int>), no detokenization round-trip
    (operators/decontam.token_ngram_contamination).  Tokens are derived
    deterministically from the text (portable word hash mod 32000 —
    identically in the oracle); token 3-gram hashes fold as
    a = (a·31 + t) % M31, closed-form reproducible in SQL; benchmark =
    the 1-in-16 doc_id hash slice, its distinct gram set broadcast."""
    from scylla_cdc_rust_spark.operators.decontam import (
        token_ngram_contamination,
    )
    from scylla_cdc_rust_spark.operators.sampling import sample_hash

    d = _doc_tokens(spark, sf_dir, fan_out=True)
    is_bench = sample_hash("doc_id", 16) == 0
    out = token_ngram_contamination(
        corpus=d.where(~is_bench), benchmark=d.where(is_bench), n=3
    )
    return out.select("doc_id", "n_ngrams", "n_contaminated", "contamination")


SQL_TOK_NGRAM_CONTAMINATION = f"""
WITH d AS ({_SQL_DOC_TOKS}),
tagged AS (
  SELECT doc_id, toks,
         {_h_duck("CAST(doc_id AS VARCHAR)")} % 16 = 0 AS is_bench
  FROM d
), grams AS (
  SELECT doc_id, is_bench,
         ((toks[i] * 31 + toks[i + 1]) % {M31} * 31 + toks[i + 2]) % {M31} AS h
  FROM tagged, UNNEST(range(1, greatest(len(toks) - 3, 0) + 2)) AS t(i)
  WHERE len(toks) >= 3
), bench AS (
  SELECT DISTINCT h FROM grams WHERE is_bench
), corp AS (
  SELECT DISTINCT doc_id, h FROM grams WHERE NOT is_bench
), totals AS (
  SELECT doc_id, count(*) AS n_ngrams FROM corp GROUP BY doc_id
), matched AS (
  SELECT c.doc_id, count(*) AS n_contaminated
  FROM corp c JOIN bench USING (h) GROUP BY c.doc_id
)
SELECT m.doc_id, t.n_ngrams, m.n_contaminated,
       round(m.n_contaminated / CAST(t.n_ngrams AS DOUBLE), 6) AS contamination
FROM matched m JOIN totals t USING (doc_id)
"""


def q_video_frame_index(spark, sf_dir):
    """Frame-sampling PLUMBING driver-gated (operators/multimodal.py
    sample_frames): one synthetic video row per document with a
    deterministic duration (id·97 % 40000 ms), expanded 1→N inside
    mapInPandas to min(duration//1000 + 1, 32) frames at 1 s spacing.
    The frame BYTES stay the documented deterministic fake (no video
    demuxer exists numpy-only — the honesty boundary), but everything
    the oracle checks is real plumbing: row expansion count, frame
    indices, timestamps, and the 32-byte digest length."""
    import pandas as pd

    from scylla_cdc_rust_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        sample_frames,
    )

    from scylla_cdc_rust_spark.session import ensure_min_parallelism

    # codec work runs inside mapInPandas: fan a single-file scan out
    # so encode/decode parallelizes (structural no-op at real scale)
    d = ensure_min_parallelism(
        spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    )

    def gen(batches):
        for pdf in batches:
            ids = [str(int(x)) for x in pdf["doc_id"]]
            durs = [(int(x) * 97) % 40000 for x in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [d_.to_bytes(4, "big") for d_ in durs],
                    "meta": [
                        {
                            "media_type": "video",
                            "codec": "fake",
                            "width": None,
                            "height": None,
                            "duration_ms": dur,
                            "n_bytes": 4,
                        }
                        for dur in durs
                    ],
                }
            )

    media = d.mapInPandas(gen, schema=MEDIA_SCHEMA)
    f = sample_frames(media, every_ms=1000, max_frames=32)
    return f.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("frame_idx").cast("bigint").alias("frame_idx"),
        F.col("ts_ms").cast("bigint").alias("ts_ms"),
        F.length("frame").cast("bigint").alias("frame_bytes"),
    )


SQL_VIDEO_FRAME_INDEX = """
WITH d AS (
  SELECT doc_id, (doc_id * 97) % 40000 AS dur FROM documents
),
f AS (
  SELECT doc_id,
         unnest(generate_series(0, least(dur // 1000 + 1, 32) - 1)) AS i
  FROM d
)
SELECT doc_id, i AS frame_idx, i * 1000 AS ts_ms,
       CAST(32 AS BIGINT) AS frame_bytes
FROM f
"""


def q_emb_neardup_clusters(spark, sf_dir):
    """Embedding near-dup dedup, production shape end to end: hyperplane
    LSH bucketing (the emb_lsh_buckets stage) → exact cosine ≥ 0.99
    verification WITHIN buckets only (never all-pairs) → connected-
    component clusters (star contraction).  The synthetic corpus has no
    natural near-dups (max pairwise cosine ≈ 0.48), so every 20th
    vector is planted back as an exact duplicate under vec_id+100000 —
    identically in the oracle — giving real cluster structure; exact
    duplicates always share all hyperplane signs, so bucketing loses
    none.  At scale the plane count grows with corpus size (buckets =
    2^planes) and hot buckets get the cap_buckets salting guard; 4
    planes keep this oracle-checkable corpus-sized."""
    from pyspark.sql import Window as W2

    from scylla_cdc_rust_spark.operators.dedup_docs import dedup_clusters

    from scylla_cdc_rust_spark.session import ensure_min_parallelism

    # fan the single-split scan out below the (heavy) hyperplane/norm
    # projections — 16 sign-plane dots + a 64-term norm per vector
    # otherwise run on 1-2 scan tasks (guide §2.5); no-op at scale
    raw = ensure_min_parallelism(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        ),
        by="vec_id",
    )
    e = raw.select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v")
    )
    planted = e.where(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "v"
    )
    allv = e.unionByName(planted)
    terms = []
    for j in range(4):
        dot = " + ".join(
            f"element_at(v, {d + 1}) * {((j * 131 + d * 197) % 17) - 8}"
            for d in range(0, 64, 4)
        )
        terms.append(f"(CASE WHEN ({dot}) > 0 THEN {1 << j} ELSE 0 END)")
    # norms are precomputed ONCE per vector (identical float expression
    # to an inline per-pair norm, so the oracle's arithmetic is
    # unchanged); the per-pair work is then just the dot product
    b = allv.select(
        "vec_id",
        "v",
        F.expr("CAST(" + " + ".join(terms) + " AS INTEGER)").alias("bucket"),
        F.sqrt(F.expr("aggregate(v, 0D, (a, p) -> a + p * p)")).alias("norm"),
    )
    # Within-bucket verification runs as a per-bucket BLAS gram matrix
    # (operators/ann.gram_cosine_pairs) instead of the former per-pair
    # interpreted zip_with/aggregate self-join — 13.8M pairs at sf1.0
    # cost ~229 s there, ~2.5 s here (guide §4.2).  Result identity: the
    # corpus' cosines are ≈1.0 (planted exact dups) or ≤ ~0.55
    # (everything else — measured margin at sf1.0), so BLAS summation
    # order cannot flip any round(·,4) ≥ 0.99 decision; parity vs the
    # DuckDB oracle is re-verified at every SF (tests/test_entry_parity,
    # plus the focused pair-set test in tests/test_training_ops.py).
    from scylla_cdc_rust_spark.operators.ann import gram_cosine_pairs

    pairs = gram_cosine_pairs(b, threshold=0.99)
    cl = dedup_clusters(pairs)
    return cl.select(
        F.col("d1").alias("vec_id"),
        "cluster_id",
        F.count("*").over(W2.partitionBy("cluster_id")).cast("long").alias(
            "cluster_size"
        ),
    )


SQL_EMB_NEARDUP_CLUSTERS = f"""
WITH RECURSIVE base AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
allv AS (
  SELECT vec_id, v FROM base
  UNION ALL
  SELECT vec_id + 100000, v FROM base WHERE vec_id % 20 = 0
),
b AS (SELECT vec_id, v, {_duck_lsh_bucket().replace("embedding[", "v[")} AS bucket
      FROM allv),
pairs AS (
  SELECT x.vec_id AS d1, y.vec_id AS d2
  FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
  WHERE round(
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1, len(x.v)), i -> x.v[i] * y.v[i])),
            (a, p) -> a + p)
          / (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(x.v, p -> p * p)), (a, p) -> a + p))
             * sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(y.v, p -> p * p)), (a, p) -> a + p))),
          4) >= 0.99
),
edges AS (
  SELECT d1 AS u, d2 AS v FROM pairs UNION SELECT d2, d1 FROM pairs
),
nodes AS (SELECT DISTINCT u AS node FROM edges),
walk(node, label) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.v, w.label FROM walk w JOIN edges e ON e.u = w.node
  WHERE w.label < e.v
),
cc AS (SELECT node AS vec_id, min(label) AS cluster_id FROM walk GROUP BY node)
SELECT vec_id, cluster_id,
       CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
FROM cc
"""


def q_audio_sample_stats(spark, sf_dir):
    """REAL audio decode driver gate: one deterministic mono PCM16 WAV
    per document (sample law s(i) = (id·7 + i·13) % 4001 − 2000,
    n = 64 + id % 32, 8 kHz), encoded AND decoded by the shipped
    numpy-only RIFF/WAVE codec inside mapInPandas (extract_features,
    default registry).  Exact integer outputs — channel count, rate,
    sample count, Σ|s| — reproduced arithmetically by the DuckDB
    oracle, so a chunk-walk or byte-order bug hash-mismatches."""
    from scylla_cdc_rust_spark.operators.multimodal import (
        extract_features,
        synthetic_wavs,
    )

    from scylla_cdc_rust_spark.session import ensure_min_parallelism

    # codec work runs inside mapInPandas: fan a single-file scan out
    # so encode/decode parallelizes (structural no-op at real scale)
    d = ensure_min_parallelism(
        spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    )
    f = extract_features(synthetic_wavs(d), dim=4)
    e = lambda i: F.element_at("features", i).cast("bigint")  # noqa: E731
    return f.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        e(1).alias("n_channels"),
        e(2).alias("sample_rate"),
        e(3).alias("n_samples"),
        e(4).alias("sum_abs"),
    )


SQL_AUDIO_SAMPLE_STATS = """
WITH d AS (SELECT doc_id, 64 + doc_id % 32 AS n FROM documents),
s AS (
  SELECT doc_id, n, unnest(generate_series(0, n - 1)) AS i FROM d
)
SELECT doc_id,
       CAST(1 AS BIGINT) AS n_channels,
       CAST(8000 AS BIGINT) AS sample_rate,
       CAST(n AS BIGINT) AS n_samples,
       CAST(SUM(abs((doc_id * 7 + i * 13) % 4001 - 2000)) AS BIGINT) AS sum_abs
FROM s GROUP BY doc_id, n
"""


def q_emb_ivf_topk(spark, sf_dir):
    """IVF ANN probe path (operators/ann.py IVFQuantizer / ivf_topk):
    candidates assigned to their nearest coarse cell, each query probes
    its nprobe=3 nearest cells, exact cosine inside probed cells — the
    similarity-search scale path beside LSH.  The quantizer here is the
    pinned deterministic grid (``IVFQuantizer.grid``): at 10^10 rows the
    quantizer is *index metadata* trained once offline and persisted
    (``IVFQuantizer.save``/``load``), never retrained per query — so the
    gate checks the probe machinery against a full DuckDB oracle
    (cell argmin + nprobe + cosine top-k) with the same centroid
    literals on both sides.  K-means *training* determinism is pinned by
    pytest (nprobe == n_centroids ≡ brute force; train-once/probe-many
    equality via save/load)."""
    from scylla_cdc_rust_spark.operators.ann import IVFQuantizer

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.where(F.col("vec_id") < 5)
    c = e.where(F.col("vec_id") >= 5)
    quant = IVFQuantizer.grid(dim=64, n_centroids=8)
    out = quant.topk(q, c, k=5, nprobe=3)
    return out.select("qid", "cid", "cos", F.col("rank").cast("int").alias("rank"))


def _sql_emb_ivf_topk() -> str:
    """DuckDB oracle for q_emb_ivf_topk: identical grid-centroid
    literals, identical left-fold float arithmetic (list_reduce over
    generate_series mirrors Spark's zip_with+aggregate), argmin cell by
    (distance, cell) just like ann._nearest_cells' array_sort."""
    from scylla_cdc_rust_spark.operators.ann import grid_centroids

    cents = grid_centroids(dim=64, n_centroids=8)
    values = ",\n    ".join(
        f"({j}, [{', '.join(repr(x) for x in c)}]::DOUBLE[])"
        for j, c in enumerate(cents)
    )
    fold = (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), {terms}), (a, x) -> a + x)"
    )
    sqdist = fold.format(
        terms="list_transform(generate_series(1, len(v)),"
        " i -> (v[i] - cv_c[i]) * (v[i] - cv_c[i]))"
    )
    dot = fold.format(
        terms="list_transform(generate_series(1, len(qv)), i -> qv[i] * cv[i])"
    )
    nq = "sqrt(" + fold.format(terms="list_transform(qv, x -> x * x)") + ")"
    nc = "sqrt(" + fold.format(terms="list_transform(cv, x -> x * x)") + ")"
    return f"""
WITH cent AS (
  SELECT * FROM (VALUES
    {values}) AS t(cell, cv_c)
),
e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
dist AS (
  SELECT vec_id, cell, {sqdist} AS d
  FROM e, cent
),
rc AS (
  SELECT vec_id, cell,
         row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cell ASC) AS rn
  FROM dist
),
cand AS (SELECT e.vec_id AS cid, e.v AS cv, rc.cell
         FROM e JOIN rc ON e.vec_id = rc.vec_id AND rc.rn = 1
         WHERE e.vec_id >= 5),
qry AS (SELECT e.vec_id AS qid, e.v AS qv, rc.cell
        FROM e JOIN rc ON e.vec_id = rc.vec_id AND rc.rn <= 3
        WHERE e.vec_id < 5),
scored AS (
  SELECT qid, cid, round({dot} / ({nq} * {nc}), 6) AS cos
  FROM qry JOIN cand USING (cell)
),
ranked AS (
  SELECT qid, cid, cos,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rank
  FROM scored
)
SELECT qid, cid, cos, CAST(rank AS INTEGER) AS rank FROM ranked WHERE rank <= 5
"""


SQL_EMB_IVF_TOPK = _sql_emb_ivf_topk()


# ===========================================================================
# The engine itself, oracle-checked end-to-end
# ===========================================================================


def _tokens_csv():
    """Canonicalizer-safe token projection: the driver's oracle compare
    sorts result rows via pandas, which cannot hash raw array cells —
    emit ``tokens`` as a CSV string (NULL stays NULL, order preserved;
    set-mode arrays are already sorted by the fold)."""
    c = F.col("tokens")
    return F.when(
        c.isNotNull(), F.concat_ws(",", c.cast("array<string>"))
    ).alias("tokens")


def q_engine_cdc_replay(spark, sf_dir):
    """The real engine (functions.decode + operators.fold) replaying a
    CDC-shaped change log derived from `events`, oracle-checked against
    an ANSI-SQL replica of the full LWW semantics (scalar cells +
    set-element deltas + tombstone/marker existence)."""
    from scylla_cdc_rust_spark import model as M
    from scylla_cdc_rust_spark.functions.decode import decode
    from scylla_cdc_rust_spark.operators.fold import fold

    log = _derived_log(spark, sf_dir).select(
        F.col("raw_op").cast("tinyint").alias(M.OPERATION),
        (F.col("ord") + F.lit(M.ORD_BASE_MS)).alias(M.TIME_MS),
        F.lit(0).cast("long").alias(M.TIME_SEQ),
        F.lit(0).cast("int").alias(M.BATCH_SEQ),
        F.lit(None).cast("long").alias(M.TTL),
        F.col("doc_id"),
        F.col("tokens"),
        F.col("n_tok"),
        F.col("source"),
        F.col("is_ovw").alias(M.DELETED_PREFIX + "tokens"),
        F.col("del_elems").alias(M.DELETED_ELEMS_PREFIX + "tokens"),
    )
    out = fold(decode(log), collection_modes={"tokens": "set"})
    return out.select(
        "doc_id",
        _tokens_csv(),
        "n_tok",
        "source",
        F.col("ttl").cast("long").alias("ttl"),
        "last_ord",
    )


SQL_ENGINE_CDC_REPLAY = (
    _log_cte()
    + f"""
, per_doc AS (
  SELECT doc_id,
         coalesce(max(CASE WHEN base_op IN (3,4) THEN ord END), -1) AS tomb,
         coalesce(max(CASE WHEN is_ovw THEN ord END), -1)           AS ctomb,
         max(CASE WHEN base_op IN (1,2) THEN ord END)               AS last_w,
         arg_max(n_tok,  CASE WHEN base_op IN (1,2) THEN ord END)   AS n_tok,
         arg_max(source, CASE WHEN base_op IN (1,2) THEN ord END)   AS source
  FROM log GROUP BY doc_id
),
ev AS (
  SELECT doc_id, ord, unnest(tokens) AS elem, 1 AS act
  FROM log WHERE tokens IS NOT NULL AND base_op IN (1,2)
  UNION ALL
  SELECT doc_id, ord, unnest(del_elems) AS elem, 0 AS act
  FROM log WHERE del_elems IS NOT NULL AND base_op IN (1,2)
),
per_elem AS (
  SELECT doc_id, elem,
         arg_max(act, ord * 2 + (1 - act)) AS last_act,
         max(ord)                          AS last_ord_e
  FROM ev GROUP BY doc_id, elem
),
alive AS (
  SELECT p.doc_id, list_sort(list(p.elem)) AS tokens
  FROM per_elem p JOIN per_doc d ON p.doc_id = d.doc_id
  WHERE p.last_act = 1 AND p.last_ord_e > d.tomb AND p.last_ord_e >= d.ctomb
  GROUP BY p.doc_id
)
SELECT d.doc_id,
       CASE WHEN a.tokens IS NOT NULL
            THEN array_to_string(a.tokens, ',') END AS tokens,
       d.n_tok               AS n_tok,
       d.source              AS source,
       CAST(NULL AS BIGINT)  AS ttl,
       d.last_w * 4194304    AS last_ord   -- engine packs ord = time_ms << 22
FROM per_doc d LEFT JOIN alive a ON d.doc_id = a.doc_id
WHERE d.last_w > d.tomb
"""
)


def _cdc_shaped_log(spark, sf_dir, fan_out=False):
    # fan_out default False: consumers whose dominant cost is the
    # heavy map-side shaping opt in (see _derived_log); the
    # changelog gate and bench.py's changelog split measured ~1 s
    # SLOWER with the exchange (interleaved A/B), so they keep the
    # shuffle-free plan.
    from scylla_cdc_rust_spark import model as M

    return _derived_log(spark, sf_dir, fan_out=fan_out).select(
        F.sha2(F.col("sid").cast("string"), 256).cast("binary").alias(M.STREAM_ID),
        F.col("raw_op").cast("tinyint").alias(M.OPERATION),
        (F.col("ord") + F.lit(M.ORD_BASE_MS)).alias(M.TIME_MS),
        F.lit(0).cast("long").alias(M.TIME_SEQ),
        F.lit(0).cast("int").alias(M.BATCH_SEQ),
        F.lit(None).cast("long").alias(M.TTL),
        F.col("doc_id"),
        F.col("tokens"),
        F.col("n_tok"),
        F.col("source"),
        F.col("is_ovw").alias(M.DELETED_PREFIX + "tokens"),
        F.col("del_elems").alias(M.DELETED_ELEMS_PREFIX + "tokens"),
    )


def _shaped_log_time_bounds(spark, sf_dir):
    """(min, max) of the derived CDC log's ``cdc_time_ms`` WITHOUT a
    Spark job.  ``_derived_log`` sets ord = event_id verbatim and
    ``_cdc_shaped_log`` sets TIME_MS = ord + ORD_BASE_MS, so the bounds
    are the events parquet's exact int64 footer statistics shifted by
    the constant — the same driver-side metadata read the pipeline's
    own ``time_bounds`` uses (sources/log_source.py).  The per-gate
    Spark aggregate this replaces paid the fan-out exchange of the full
    event stream (~0.5 s per gate invocation at 1M events) to compute
    two numbers the footers already hold.  Falls back to that aggregate
    when stats are absent, so the values are identical by construction
    either way."""
    try:
        import pyarrow.parquet as pq

        md = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata
        idx = next(
            i
            for i in range(md.schema.num_columns)
            if md.schema.column(i).path == "event_id"
        )
        lo = hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                raise ValueError("row group without event_id stats")
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if lo is None:
            raise ValueError("no row groups")
        from scylla_cdc_rust_spark.model import ORD_BASE_MS

        return int(lo) + ORD_BASE_MS, int(hi) + ORD_BASE_MS
    except Exception:  # noqa: BLE001 — any surprise falls back to the agg
        from scylla_cdc_rust_spark import model as M

        b = _cdc_shaped_log(spark, sf_dir).agg(
            F.min(F.col(M.TIME_MS)).alias("lo"),
            F.max(F.col(M.TIME_MS)).alias("hi"),
        ).first()
        return int(b["lo"]), int(b["hi"])


def q_engine_consumer_replay(spark, sf_dir):
    """The reference-shaped sequential Consumer path (operators/
    consumer_api.py: repartition by stream → in-order mapInPandas) run
    end-to-end against the same ANSI oracle as the declarative fold —
    proving the two execution strategies agree."""
    from scylla_cdc_rust_spark.functions.decode import decode
    from scylla_cdc_rust_spark.operators.consumer_api import replay_consumer_fold

    log = _cdc_shaped_log(spark, sf_dir, fan_out=True)
    out = replay_consumer_fold(decode(log), collection_modes={"tokens": "set"})
    return out.select(
        "doc_id", _tokens_csv(), "n_tok", "source",
        F.col("ttl").cast("long").alias("ttl"), "last_ord",
    )


def q_engine_salted_replay(spark, sf_dir):
    """Salted two-stage fold (operators/salt.py, north-rule skew path) in
    'list' mode, oracle-checked."""
    from scylla_cdc_rust_spark.functions.decode import decode
    from scylla_cdc_rust_spark.operators.fold import finalize
    from scylla_cdc_rust_spark.operators.salt import fold_delta_salted

    log = _cdc_shaped_log(spark, sf_dir, fan_out=True)
    delta = fold_delta_salted(
        decode(log), salt_factor=8, collection_modes={"tokens": "list"}
    )
    out = finalize(
        delta, payload=["tokens", "n_tok", "source"],
        collection_modes={"tokens": "list"},
    )
    return out.select(
        "doc_id", _tokens_csv(), "n_tok", "source",
        F.col("ttl").cast("long").alias("ttl"), "last_ord",
    )


# list mode: tokens is a whole cell — value wins over the tombstone flag
# within one change; every write in the derived log carries tokens, so the
# final array is simply the value at the max write ord
SQL_ENGINE_LIST_REPLAY = (
    _log_cte()
    + """
SELECT doc_id,
       CASE WHEN arg_max(tokens, CASE WHEN base_op IN (1,2) THEN ord END) IS NOT NULL
            THEN array_to_string(
                   arg_max(tokens, CASE WHEN base_op IN (1,2) THEN ord END), ',')
       END AS tokens,
       arg_max(n_tok,  CASE WHEN base_op IN (1,2) THEN ord END) AS n_tok,
       arg_max(source, CASE WHEN base_op IN (1,2) THEN ord END) AS source,
       CAST(NULL AS BIGINT) AS ttl,
       max(CASE WHEN base_op IN (1,2) THEN ord END) * 4194304 AS last_ord
FROM log
GROUP BY doc_id
HAVING max(CASE WHEN base_op IN (1,2) THEN ord END)
     > coalesce(max(CASE WHEN base_op IN (3,4) THEN ord END), -1)
"""
)


def q_doc_stratified_sample(spark, sf_dir):
    """Deterministic stratified sampling (operators/sampling.py): keep
    each language at its configured rate via the portable id hash — a
    pure map-side filter, zero shuffle at any scale.  Reported as
    per-(lang, source) sampled counts so the gate pins the exact
    selected set (same hash in DuckDB ⇒ same rows)."""
    from scylla_cdc_rust_spark.operators.sampling import stratified_sample

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    s = stratified_sample(
        d, {"en": 0.5, "de": 0.25, "zh": 0.1}, strata_col="lang",
        id_col="doc_id", default_rate=0.05,
    )
    return s.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


SQL_DOC_STRATIFIED_SAMPLE = f"""
WITH h AS (
  SELECT lang, source, doc_id,
         {_h_duck("CAST(doc_id AS VARCHAR)")} % 1000000 AS hh
  FROM documents
)
SELECT lang, source, count(*) AS n_sampled,
       min(doc_id) AS min_doc, max(doc_id) AS max_doc
FROM h
WHERE hh < CASE lang WHEN 'en' THEN 500000 WHEN 'de' THEN 250000
                     WHEN 'zh' THEN 100000 ELSE 50000 END
GROUP BY lang, source
"""


def q_doc_ngram_contamination(spark, sf_dir):
    """Benchmark decontamination (operators/decontam.py): flag corpus
    documents sharing word 3-grams with a held-out benchmark set (here
    a deterministic 1-in-16 hash slice of the table).  The benchmark's
    distinct n-gram hashes broadcast into the corpus join — the corpus
    n-gram stream is never shuffled."""
    from scylla_cdc_rust_spark.operators.decontam import ngram_contamination
    from scylla_cdc_rust_spark.operators.sampling import sample_hash

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    is_bench = sample_hash("doc_id", 16) == 0
    out = ngram_contamination(
        corpus=d.where(~is_bench), benchmark=d.where(is_bench), n=3
    )
    return out.select(
        "doc_id", "n_ngrams", "n_contaminated", "contamination"
    )


SQL_DOC_NGRAM_CONTAMINATION = f"""
WITH tagged AS (
  SELECT doc_id, string_split(text, ' ') AS ws,
         {_h_duck("CAST(doc_id AS VARCHAR)")} % 16 = 0 AS is_bench
  FROM documents
), grams AS (
  SELECT doc_id, is_bench,
         {_h_duck("array_to_string(ws[i:i+2], ' ')")} AS h
  FROM tagged, UNNEST(range(1, greatest(len(ws) - 2, 0) + 1)) AS t(i)
), bench AS (
  SELECT DISTINCT h FROM grams WHERE is_bench
), corp AS (
  SELECT DISTINCT doc_id, h FROM grams WHERE NOT is_bench
), totals AS (
  SELECT doc_id, count(*) AS n_ngrams FROM corp GROUP BY doc_id
), matched AS (
  SELECT c.doc_id, count(*) AS n_contaminated
  FROM corp c JOIN bench USING (h) GROUP BY c.doc_id
)
SELECT m.doc_id, t.n_ngrams, m.n_contaminated,
       round(m.n_contaminated / CAST(t.n_ngrams AS DOUBLE), 6) AS contamination
FROM matched m JOIN totals t USING (doc_id)
"""


def q_doc_curation_funnel(spark, sf_dir):
    """The full training-corpus curation funnel (plans/curation.py):
    quality filter → exact dedup → decontamination vs a held-out
    benchmark slice → stratified sampling → sequence packing, reported
    as the one-row stage-count funnel.  Composes five independently
    oracled operators into the pipeline a production corpus run uses."""
    from scylla_cdc_rust_spark.operators.sampling import sample_hash
    from scylla_cdc_rust_spark.plans.curation import curation_funnel

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    is_bench = sample_hash("doc_id", 16) == 0
    return curation_funnel(
        d.where(~is_bench),
        benchmark=d.where(is_bench),
        quality_min=0.3,
        contamination_max=0.05,
        ngram_n=3,
        sample_rates={"en": 0.5},
        default_rate=0.8,
        seq_len=2048,
        n_shards=4,
    )


SQL_DOC_CURATION_FUNNEL = f"""
WITH tagged AS (
  SELECT doc_id, text, lang,
         {_h_duck("CAST(doc_id AS VARCHAR)")} % 16 = 0 AS is_bench,
         {_h_duck("CAST(doc_id AS VARCHAR)")} % 1000000 AS shash,
         string_split(text, ' ') AS ws
  FROM documents
), corpus AS (
  SELECT * FROM tagged WHERE NOT is_bench
), q AS (
  SELECT *,
    round(
      least(1.0, len(ws) / 100.0) * 0.5
      + (1.0 / (1.0 + abs(CAST(length(text) AS DOUBLE) / len(ws) - 5.0))) * 0.3
      + (CAST(len(list_filter(ws, w -> w IN {_SW_SQL})) AS DOUBLE) / len(ws)) * 0.2,
      4) AS qs
  FROM corpus
), quality AS (
  SELECT * FROM q WHERE qs >= 0.3
), surv AS (
  SELECT min(doc_id) AS doc_id FROM quality GROUP BY md5(text)
), deduped AS (
  SELECT quality.* FROM quality JOIN surv USING (doc_id)
), bench_grams AS (
  SELECT DISTINCT {_h_duck("array_to_string(ws[i:i+2], ' ')")} AS h
  FROM tagged, UNNEST(range(1, greatest(len(ws) - 2, 0) + 1)) AS t(i)
  WHERE is_bench
), corp_grams AS (
  SELECT DISTINCT doc_id, {_h_duck("array_to_string(ws[i:i+2], ' ')")} AS h
  FROM deduped, UNNEST(range(1, greatest(len(ws) - 2, 0) + 1)) AS t(i)
), totals AS (
  SELECT doc_id, count(*) AS n_ngrams FROM corp_grams GROUP BY doc_id
), matched AS (
  SELECT c.doc_id, count(*) AS n_cont
  FROM corp_grams c JOIN bench_grams USING (h) GROUP BY c.doc_id
), contaminated AS (
  SELECT m.doc_id FROM matched m JOIN totals t USING (doc_id)
  WHERE m.n_cont / CAST(t.n_ngrams AS DOUBLE) > 0.05
), clean AS (
  SELECT * FROM deduped WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
), sampled AS (
  SELECT * FROM clean
  WHERE shash < CASE lang WHEN 'en' THEN 500000 ELSE 800000 END
), packed AS (
  SELECT CAST({_h_duck("CAST(doc_id AS VARCHAR)")} % 4 AS INT) AS shard,
         doc_id, CAST(len(ws) AS BIGINT) AS n_tok
  FROM sampled
), offs AS (
  SELECT shard, n_tok,
         coalesce(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_off
  FROM packed
), acct AS (
  SELECT shard, sum(n_tok) AS toks,
         max(CAST(floor((start_off + n_tok - 1) / 2048) AS BIGINT)) + 1 AS packs
  FROM offs GROUP BY shard
)
SELECT (SELECT count(*) FROM corpus)  AS n_total,
       (SELECT count(*) FROM quality) AS n_quality,
       (SELECT count(*) FROM deduped) AS n_after_dedup,
       (SELECT count(*) FROM clean)   AS n_clean,
       (SELECT count(*) FROM sampled) AS n_sampled,
       CAST(coalesce((SELECT sum(toks) FROM acct), 0) AS BIGINT) AS n_tokens,
       CAST(coalesce((SELECT sum(packs) FROM acct), 0) AS BIGINT) AS n_packs
"""


def q_engine_changelog(spark, sf_dir):
    """Snapshot changelog (merge.read_changes): replay the derived CDC
    log in two halves (split at the midpoint timestamp) into a COW
    merge table — commit v1, then v2 — and emit the incremental
    changelog between the snapshots.  The oracle computes both final
    states in SQL and diffs them, so INSERT/UPDATE/DELETE
    classification, bucket pruning, and the exactly-once composition of
    delta-merge-onto-v1 ≡ full fold are all checked at once.  The
    table lives in a fresh tmpdir per invocation (deterministic output;
    /tmp is ephemeral)."""
    import tempfile

    from scylla_cdc_rust_spark import model as M
    from scylla_cdc_rust_spark.functions.decode import decode
    from scylla_cdc_rust_spark.operators.fold import fold_delta
    from scylla_cdc_rust_spark.operators.merge import ParquetMergeTable

    log = _cdc_shaped_log(spark, sf_dir)
    # footer-stat bounds: identical to the former Spark aggregate's
    # ((min + max) / 2) double-division-then-truncate, computed without
    # a job (_shaped_log_time_bounds; both operands are exact in float64)
    _lo, _hi = _shaped_log_time_bounds(spark, sf_dir)
    cut = int((_lo + _hi) / 2)
    table = ParquetMergeTable(
        spark, tempfile.mkdtemp(prefix="engine_changelog_"), num_buckets=8
    )
    # the two MERGES are consecutive COW versions and must stay ordered,
    # but the two half-FOLDS only read the log — materialize both deltas
    # concurrently (persist + count on a 2-thread pool, guide §2.6) so
    # the second fold hides behind the first fold+merge instead of
    # serializing after it; the merges then run from the cached deltas
    from concurrent.futures import ThreadPoolExecutor

    deltas = [
        fold_delta(decode(half), collection_modes={"tokens": "set"}).persist()
        for half in (
            log.where(F.col(M.TIME_MS) <= cut),
            log.where(F.col(M.TIME_MS) > cut),
        )
    ]
    try:
        with ThreadPoolExecutor(max_workers=2) as pool:
            for f in [pool.submit(d.count) for d in deltas]:
                f.result()
        for delta in deltas:
            table.merge(
                delta,
                payload=["tokens", "n_tok", "source"],
                collection_modes={"tokens": "set"},
                assume_all_buckets=True,
            )
    finally:
        for d in deltas:
            d.unpersist()
    ch = table.read_changes(1, 2)
    return ch.select(
        "doc_id", _tokens_csv(), "n_tok", "source",
        F.col("ttl").cast("long").alias("ttl"), "last_ord", "change_type",
    )


def _engine_state_sql(prefix: str, where: str) -> str:
    """Final-state CTE block over ``log`` restricted by ``where`` —
    the SQL_ENGINE_CDC_REPLAY body with a filter, prefixed so two
    states can coexist in one query."""
    p = prefix
    return f"""
{p}per_doc AS (
  SELECT doc_id,
         coalesce(max(CASE WHEN base_op IN (3,4) THEN ord END), -1) AS tomb,
         coalesce(max(CASE WHEN is_ovw THEN ord END), -1)           AS ctomb,
         max(CASE WHEN base_op IN (1,2) THEN ord END)               AS last_w,
         arg_max(n_tok,  CASE WHEN base_op IN (1,2) THEN ord END)   AS n_tok,
         arg_max(source, CASE WHEN base_op IN (1,2) THEN ord END)   AS source
  FROM log, cutv WHERE {where} GROUP BY doc_id
),
{p}ev AS (
  SELECT doc_id, ord, unnest(tokens) AS elem, 1 AS act
  FROM log, cutv WHERE tokens IS NOT NULL AND base_op IN (1,2) AND ({where})
  UNION ALL
  SELECT doc_id, ord, unnest(del_elems) AS elem, 0 AS act
  FROM log, cutv WHERE del_elems IS NOT NULL AND base_op IN (1,2) AND ({where})
),
{p}per_elem AS (
  SELECT doc_id, elem,
         arg_max(act, ord * 2 + (1 - act)) AS last_act,
         max(ord)                          AS last_ord_e
  FROM {p}ev GROUP BY doc_id, elem
),
{p}alive AS (
  SELECT p.doc_id, list_sort(list(p.elem)) AS tokens
  FROM {p}per_elem p JOIN {p}per_doc d ON p.doc_id = d.doc_id
  WHERE p.last_act = 1 AND p.last_ord_e > d.tomb AND p.last_ord_e >= d.ctomb
  GROUP BY p.doc_id
),
{p}final AS (
  SELECT d.doc_id,
         CASE WHEN a.tokens IS NOT NULL
              THEN array_to_string(a.tokens, ',') END AS tokens,
         d.n_tok AS n_tok, d.source AS source,
         d.last_w * 4194304 AS last_ord
  FROM {p}per_doc d LEFT JOIN {p}alive a ON d.doc_id = a.doc_id
  WHERE d.last_w > d.tomb
)"""


SQL_ENGINE_CHANGELOG = (
    _log_cte()
    + """
, cutv AS (SELECT CAST((min(ord) + max(ord)) / 2 AS BIGINT) AS cut FROM log),
"""
    + _engine_state_sql("a_", "ord <= cut")
    + ","
    + _engine_state_sql("b_", "TRUE")
    + """
SELECT coalesce(b.doc_id, a.doc_id) AS doc_id,
       b.tokens, b.n_tok, b.source,
       CAST(NULL AS BIGINT) AS ttl, b.last_ord,
       CASE WHEN a.doc_id IS NULL THEN 'INSERT'
            WHEN b.doc_id IS NULL THEN 'DELETE'
            WHEN (a.tokens  IS DISTINCT FROM b.tokens)
              OR (a.n_tok   IS DISTINCT FROM b.n_tok)
              OR (a.source  IS DISTINCT FROM b.source)
              OR (a.last_ord IS DISTINCT FROM b.last_ord)
            THEN 'UPDATE' END AS change_type
FROM a_final a FULL OUTER JOIN b_final b ON a.doc_id = b.doc_id
WHERE CASE WHEN a.doc_id IS NULL THEN 'INSERT'
           WHEN b.doc_id IS NULL THEN 'DELETE'
           WHEN (a.tokens  IS DISTINCT FROM b.tokens)
             OR (a.n_tok   IS DISTINCT FROM b.n_tok)
             OR (a.source  IS DISTINCT FROM b.source)
             OR (a.last_ord IS DISTINCT FROM b.last_ord)
           THEN 'UPDATE' END IS NOT NULL
"""
)


# ===========================================================================
# Round-5 additions: context-window chunking, vocabulary stats, domain
# mixture resampling — all over the input_hint token shape
# ===========================================================================


def q_tok_chunking(spark, sf_dir):
    """Context-window chunking of pre-tokenized sequences
    (operators/chunking.chunk_tokens): sliding windows of ≤32 tokens
    advancing by 24 (overlapping — the usual no-span-without-context
    recipe), one narrow projection + one generate, zero shuffle.
    Chunk CONTENT is gated through an order-sensitive fold digest
    (chunking.chunk_digest ≡ DuckDB list_reduce) because the driver
    canon cannot hash raw array cells."""
    from scylla_cdc_rust_spark.operators.chunking import (
        chunk_digest,
        chunk_tokens,
    )

    # the token derivation (one md5 per word) otherwise serializes on
    # the testdata's single parquet split (guide §2.5); fan_out hash-
    # repartitions the raw scan below the derivation, no-op at scale
    c = chunk_tokens(_doc_tokens(spark, sf_dir, fan_out=True), max_len=32, stride=24)
    return c.select(
        "doc_id",
        "chunk_idx",
        "start_off",
        "n_chunk_tok",
        chunk_digest("chunk_tokens").alias("chunk_digest"),
    )


SQL_TOK_CHUNKING = f"""
WITH d AS ({_SQL_DOC_TOKS}),
n AS (
  SELECT doc_id, toks, len(toks) AS n FROM d WHERE len(toks) > 0
),
c AS (
  SELECT doc_id, toks, n,
         unnest(range(0, CASE WHEN n <= 32 THEN 1
                              ELSE (n - 32 + 23) // 24 + 1 END)) AS i
  FROM n
)
SELECT doc_id, i AS chunk_idx, i * 24 AS start_off,
       len(list_slice(toks, i * 24 + 1, least(i * 24 + 32, n)))
         AS n_chunk_tok,
       list_reduce(list_slice(toks, i * 24 + 1, least(i * 24 + 32, n)),
                   (a, b) -> (a * 31 + b) % {M31}) AS chunk_digest
FROM c
"""


def q_tok_vocab_topk(spark, sf_dir):
    """Corpus vocabulary statistics (operators/vocab.vocab_topk):
    top-256 tokens by occurrence count with document frequencies.
    Both aggregates partial map-side (the exchange carries ≤|vocab|
    rows per task, never the token stream); the cut is
    TakeOrderedAndProject under a total (count desc, token asc)
    order, so it is deterministic and oracle-checkable."""
    from scylla_cdc_rust_spark.operators.vocab import vocab_topk

    # same single-split fan-out rationale as q_tok_chunking
    return vocab_topk(_doc_tokens(spark, sf_dir, fan_out=True), k=256)


SQL_TOK_VOCAB_TOPK = f"""
WITH d AS ({_SQL_DOC_TOKS}),
t AS (
  SELECT doc_id, unnest(toks) AS token FROM d
),
occ AS (
  SELECT token, count(*) AS n_occurrences FROM t GROUP BY token
),
docs AS (
  SELECT token, count(*) AS n_docs
  FROM (SELECT DISTINCT doc_id, token FROM t) GROUP BY token
),
r AS (
  SELECT row_number() OVER (ORDER BY n_occurrences DESC, token ASC)
           AS rank,
         token, n_occurrences, n_docs
  FROM occ JOIN docs USING (token)
)
SELECT rank, token, n_occurrences, n_docs FROM r WHERE rank <= 256
"""


#: target mixture for the driver query: 5:3:2:1:1 over five domains,
#: the other fifteen dropped (weight 0) — exercises both the retention
#: maximization and the unlisted-stratum drop path
_MIX_WEIGHTS = {"src0": 5, "src1": 3, "src2": 2, "src3": 1, "src4": 1}


def q_doc_mixture_sample(spark, sf_dir):
    """Domain-mixture resampling (operators/sampling.mixture_sample):
    resample the corpus to a 5:3:2:1:1 mixture over five sources with
    maximum retention.  Thresholds are derived from one catalog-sized
    count aggregate in pure INTEGER floor-division arithmetic (so the
    oracle reproduces them bit-exactly); the filter itself is the same
    zero-shuffle map-side hash threshold as stratified sampling."""
    from scylla_cdc_rust_spark.operators.sampling import mixture_sample

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return mixture_sample(d, _MIX_WEIGHTS, strata_col="source").select(
        "doc_id", "source"
    )


_MIX_W_SQL = " UNION ALL ".join(
    f"SELECT '{s}' AS source, {w} AS wt" for s, w in sorted(_MIX_WEIGHTS.items())
)

SQL_DOC_MIXTURE_SAMPLE = f"""
WITH w AS ({_MIX_W_SQL}),
counts AS (
  SELECT source, count(*) AS c FROM documents GROUP BY source
),
tot AS (SELECT sum(wt) AS tw FROM w),
cap AS (
  SELECT min((c * tw) // wt) AS t
  FROM counts JOIN w USING (source) CROSS JOIN tot
),
th AS (
  SELECT w.source,
         (1000000 * ((cap.t * w.wt) // tot.tw)) // counts.c AS thresh
  FROM w JOIN counts USING (source) CROSS JOIN cap CROSS JOIN tot
)
SELECT d.doc_id, d.source
FROM documents d JOIN th ON d.source = th.source
WHERE ({_h_duck("CAST(d.doc_id AS VARCHAR)")}) % 1000000 < th.thresh
"""


def q_tok_contamination_spans(spark, sf_dir):
    """Token-SPAN decontamination (operators/decontam.
    contamination_spans): contaminated 3-grams merged into maximal
    covered token intervals per document — the excision shape (cut the
    leaked paragraph, keep the document), not just the flag.  Same
    broadcast-probe skeleton as tok_ngram_contamination; only hit
    POSITIONS reach the single exchange, where per-document lag/island
    windows resolve span bounds."""
    from scylla_cdc_rust_spark.operators.decontam import (
        contamination_spans,
    )
    from scylla_cdc_rust_spark.operators.sampling import sample_hash

    d = _doc_tokens(spark, sf_dir, fan_out=True)
    is_bench = sample_hash("doc_id", 16) == 0
    return contamination_spans(
        corpus=d.where(~is_bench), benchmark=d.where(is_bench), n=3
    )


SQL_TOK_CONTAMINATION_SPANS = f"""
WITH tagged AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '),
                        w -> ({_h_duck("w")}) % 32000) AS toks,
         {_h_duck("CAST(doc_id AS VARCHAR)")} % 16 = 0 AS is_bench
  FROM documents
), grams AS (
  SELECT doc_id, is_bench, i - 1 AS pos,
         ((toks[i] * 31 + toks[i + 1]) % {M31} * 31 + toks[i + 2]) % {M31} AS h
  FROM tagged, UNNEST(range(1, greatest(len(toks) - 3, 0) + 2)) AS t(i)
  WHERE len(toks) >= 3
), bench AS (
  SELECT DISTINCT h FROM grams WHERE is_bench
), hits AS (
  SELECT DISTINCT g.doc_id, g.pos
  FROM grams g JOIN bench USING (h) WHERE NOT g.is_bench
), flagged AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                   > 3 THEN 1 ELSE 0 END AS new_span
  FROM hits
), isl AS (
  SELECT doc_id, pos,
         sum(new_span) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS UNBOUNDED PRECEDING) AS span_id
  FROM flagged
), spans AS (
  SELECT doc_id, span_id, min(pos) AS s, max(pos) + 3 AS e
  FROM isl GROUP BY doc_id, span_id
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
       CAST(max(e - s) AS BIGINT) AS max_span_tok,
       CAST(sum(e - s) AS BIGINT) AS covered_tok
FROM spans GROUP BY doc_id
"""


def q_tok_dup_spans(spark, sf_dir):
    """Cross-document duplicate token spans (operators/decontam.
    duplicate_spans): every 5-token window occurring verbatim in ≥2
    distinct documents, merged into maximal covered intervals per
    document — the window-granularity exact-substring dedup of Lee et
    al. 2021.  Corpus probes itself, so the ≥2-docs test runs as window
    min/max over ONE gram-keyed exchange and one corpus scan (no
    groupBy+self-join; plan shape pinned in tests)."""
    from scylla_cdc_rust_spark.operators.decontam import duplicate_spans

    return duplicate_spans(_doc_tokens(spark, sf_dir, fan_out=True), n=5)


SQL_TOK_DUP_SPANS = f"""
WITH t AS ({_SQL_DOC_TOKS}
), grams AS (
  SELECT doc_id, i - 1 AS pos,
         list_reduce(toks[i : i + 4],
                     (a, b) -> (a * 31 + b) % {M31}) AS h
  FROM t, UNNEST(range(1, greatest(len(toks) - 5, 0) + 2)) AS r(i)
  WHERE len(toks) >= 5
), dup AS (
  SELECT h FROM grams GROUP BY h HAVING min(doc_id) <> max(doc_id)
), hits AS (
  SELECT DISTINCT g.doc_id, g.pos FROM grams g JOIN dup USING (h)
), flagged AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                   > 5 THEN 1 ELSE 0 END AS new_span
  FROM hits
), isl AS (
  SELECT doc_id, pos,
         sum(new_span) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS UNBOUNDED PRECEDING) AS span_id
  FROM flagged
), spans AS (
  SELECT doc_id, span_id, min(pos) AS s, max(pos) + 5 AS e
  FROM isl GROUP BY doc_id, span_id
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
       CAST(max(e - s) AS BIGINT) AS max_span_tok,
       CAST(sum(e - s) AS BIGINT) AS covered_tok
FROM spans GROUP BY doc_id
"""


def q_engine_replay_lineage(spark, sf_dir):
    """North-rule lineage surface, end to end: run the REAL windowed
    pipeline (plans/pipeline.replay: decode → exactly-once filter →
    fold → bucketed merge → per-stream checkpoint commit) over a
    CDC-shaped log written to a scratch dir, then return the
    WatermarkStore's final per-stream lineage counters — stream id,
    generation, committed window end, last batch id, events applied.
    The oracle reproduces the window math in closed form (4 aligned
    windows over [min, max+1); a stream's batch id is its last event's
    window slot), so a drift in batching, watermark advancement, or the
    applied-count bookkeeping hash-mismatches.

    Reference analog: per-stream progress rows persisted by the saver
    (checkpoints.rs:146-187) and asserted by the replication tests'
    resume scenarios."""
    import os
    import shutil
    import tempfile

    from scylla_cdc_rust_spark.config import CDCPipelineConfig
    from scylla_cdc_rust_spark.plans.pipeline import replay
    from scylla_cdc_rust_spark.sources.checkpoints import (
        GENERATION_SENTINEL,
        WatermarkStore,
    )

    log = _cdc_shaped_log(spark, sf_dir, fan_out=True)
    # bounds from parquet footer stats — no Spark job, identical values
    lo, hi = _shaped_log_time_bounds(spark, sf_dir)
    hi += 1
    win = (hi - lo + 3) // 4  # exactly 4 aligned window slots
    d = tempfile.mkdtemp(prefix="lineage_q_")
    try:
        log.write.parquet(os.path.join(d, "log"))
        cfg = CDCPipelineConfig(
            log_path=os.path.join(d, "log"),
            target_path=os.path.join(d, "target"),
            watermark_path=os.path.join(d, "wm"),
            window_size_ms=win,
            target_num_buckets=8,
            collection_modes={"tokens": "list"},
        )
        replay(spark, cfg)
        snap = WatermarkStore(spark, cfg.watermark_path).load()
        rows = sorted(
            (
                # stream_id is cast(sha2-hex as binary) = utf-8 of the hex
                bytes(r["stream_id"]).decode("utf-8"),
                int(r["generation"]),
                int(r["time_ms"]),
                int(r["batch_id"]),
                int(r["n_applied"]),
            )
            for r in snap.collect()
            if bytes(r["stream_id"]) != GENERATION_SENTINEL
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return spark.createDataFrame(
        rows, "sid_hex string, generation long, time_ms long, batch_id long, n_applied long"
    )


SQL_ENGINE_REPLAY_LINEAGE = (
    _log_cte()
    + f"""
, t AS (SELECT sid, ord + {ORD_BASE_MS} AS tm FROM log),
b AS (SELECT min(tm) AS lo, max(tm) + 1 AS hi FROM t),
w AS (SELECT lo, hi, (hi - lo + 3) // 4 AS win FROM b),
per AS (SELECT sid, count(*) AS n_applied, max(tm) AS last_t FROM t GROUP BY sid)
SELECT sha256(CAST(p.sid AS VARCHAR)) AS sid_hex,
       CAST(0 AS BIGINT) AS generation,
       CAST(least(w.lo + ((p.last_t - w.lo) // w.win + 1) * w.win, w.hi)
            AS BIGINT) AS time_ms,
       CAST((p.last_t - w.lo) // w.win AS BIGINT) AS batch_id,
       CAST(p.n_applied AS BIGINT) AS n_applied
FROM per p, w
"""
)


def q_engine_schema_evolution(spark, sf_dir):
    """Schema evolution driver gate (north rule M6 / SURVEY A13), end to
    end: split the CDC-shaped log at its midpoint into two generations,
    give generation 1 an ADDED column (``lang``) and a WIDENED
    ``n_tok`` (int → bigint), replay both through the real pipeline
    (generation barrier → fold → evolving bucketed merge), and return
    the final visible table.  The oracle computes the same final state
    in SQL — epoch-0-only docs must surface NULL lang (metadata-only
    column add), every doc must surface the widened bigint n_tok, and a
    lang cell must die under a later row tombstone like any other cell.

    Reference analog: CDCRowSchema re-derivation per query page
    (stream_reader.rs:389-390, consumer.rs:82-151); the sink-side
    evolution is ours (operators/schema_evolution.py)."""
    import os
    import shutil
    import tempfile

    from scylla_cdc_rust_spark import model as M
    from scylla_cdc_rust_spark.config import CDCPipelineConfig
    from scylla_cdc_rust_spark.operators.merge import ParquetMergeTable
    from scylla_cdc_rust_spark.plans.pipeline import replay

    log = _cdc_shaped_log(spark, sf_dir, fan_out=True)
    # footer-stat bounds; int((lo+hi)/2) reproduces the former Spark
    # double-division-then-cast exactly (operands exact in float64)
    _lo, _hi = _shaped_log_time_bounds(spark, sf_dir)
    cut = int((_lo + _hi) / 2)
    lang = F.concat(
        F.lit("l"), (F.col("doc_id").cast("long") % 4).cast("string")
    )
    e0 = log.where(F.col(M.TIME_MS) <= cut)
    e1 = (
        log.where(F.col(M.TIME_MS) > cut)
        .withColumn("n_tok", F.col("n_tok").cast("long"))
        .withColumn("lang", lang)
    )
    d = tempfile.mkdtemp(prefix="schema_evo_q_")
    try:
        # the two generation dirs are independent writes over disjoint
        # row sets — submit both and let the second back-fill the
        # first's task tail (guide §2.6); wall = max, not sum
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            f0 = pool.submit(
                e0.write.parquet, os.path.join(d, "log", "epoch=0")
            )
            f1 = pool.submit(
                e1.write.parquet, os.path.join(d, "log", "epoch=1")
            )
            f0.result(), f1.result()
        cfg = CDCPipelineConfig(
            log_path=os.path.join(d, "log"),
            target_path=os.path.join(d, "target"),
            watermark_path=os.path.join(d, "wm"),
            window_size_ms=1 << 60,  # one bulk window per generation
            target_num_buckets=8,
            collection_modes={"tokens": "list"},
        )
        replay(spark, cfg)
        table = ParquetMergeTable(
            spark, cfg.target_path, num_buckets=8
        )
        out = table.read_visible().select(
            "doc_id",
            _tokens_csv(),
            F.col("n_tok").cast("long").alias("n_tok"),
            "lang",
            "source",
        )
        rows = out.collect()  # materialize before the tmpdir vanishes
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return spark.createDataFrame(rows, out.schema)


SQL_ENGINE_SCHEMA_EVOLUTION = (
    _log_cte()
    + """
, cutv AS (SELECT (min(ord) + max(ord)) // 2 AS cut FROM log),
e AS (
  SELECT doc_id, ord, base_op, tokens, n_tok, source,
         CASE WHEN ord > cut
              THEN 'l' || CAST(CAST(doc_id AS BIGINT) % 4 AS VARCHAR)
         END AS lang
  FROM log, cutv
),
per AS (
  SELECT doc_id,
         coalesce(max(CASE WHEN base_op IN (3,4) THEN ord END), -1) AS tomb,
         max(CASE WHEN base_op IN (1,2) THEN ord END)               AS last_w,
         arg_max(tokens, CASE WHEN base_op IN (1,2) THEN ord END)   AS tokens,
         arg_max(n_tok,  CASE WHEN base_op IN (1,2) THEN ord END)   AS n_tok,
         arg_max(source, CASE WHEN base_op IN (1,2) THEN ord END)   AS source
  FROM e GROUP BY doc_id
),
lang_cell AS (
  SELECT e.doc_id, arg_max(e.lang, e.ord) AS lang
  FROM e JOIN per USING (doc_id)
  WHERE e.base_op IN (1,2) AND e.lang IS NOT NULL AND e.ord > per.tomb
  GROUP BY e.doc_id
)
SELECT p.doc_id,
       array_to_string(p.tokens, ',') AS tokens,
       CAST(p.n_tok AS BIGINT) AS n_tok,
       l.lang AS lang,
       p.source AS source
FROM per p LEFT JOIN lang_cell l USING (doc_id)
WHERE p.last_w > p.tomb
"""
)


def q_engine_streaming_replay(spark, sf_dir):
    """Structured Streaming driver gate (north star: "a Structured
    Streaming micro-batch pipeline that tails the change log"), end to
    end: write the CDC-shaped log as TWO generations of multi-file
    parquet segments, tail them with the REAL streaming pipeline
    (``readStream`` file source + ``maxFilesPerTrigger`` discovery →
    foreachBatch frontier → windowed decode → exactly-once filter →
    fold → bucketed MERGE → per-stream checkpoint, generation barrier
    between epochs, Trigger.AvailableNow + safety-tail drain = the
    reference's stop_at flush, stream_reader.rs:336-340), then return
    the final visible target table.  The oracle is the closed-form LWW
    final state — any drift in micro-batch discovery, window math,
    watermark filtering, the epoch barrier, or the merge itself
    hash-mismatches.

    The synthetic segment files are NOT time-ordered (each file spans
    the whole epoch), so the safety interval is set to the epoch span —
    the same clock-disorder contract the reference's safety_interval
    guards (stream_reader.rs:256-345); every window then applies at the
    bounded run's drain, in order, through the identical apply path.

    Reference analog: the end-to-end replication tests driving
    CDCLogReader over a live log (replication_tests.rs:166-208)."""
    import os
    import shutil
    import tempfile

    from scylla_cdc_rust_spark import model as M
    from scylla_cdc_rust_spark.config import CDCPipelineConfig
    from scylla_cdc_rust_spark.operators.merge import ParquetMergeTable
    from scylla_cdc_rust_spark.streaming.stream_pipeline import (
        run_streaming_epochs,
    )

    log = _cdc_shaped_log(spark, sf_dir, fan_out=True)
    # bounds from parquet footer stats — no Spark job, identical values
    lo, hi = _shaped_log_time_bounds(spark, sf_dir)
    cut = (lo + hi) // 2
    span = hi + 1 - lo
    d = tempfile.mkdtemp(prefix="streaming_q_")
    try:
        # independent generation-dir writes over disjoint row sets —
        # run both concurrently so the wall cost is max, not sum (§2.6)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            f0 = pool.submit(
                log.where(F.col(M.TIME_MS) <= cut).repartition(3)
                .write.parquet, os.path.join(d, "log", "epoch=0")
            )
            f1 = pool.submit(
                log.where(F.col(M.TIME_MS) > cut).repartition(3)
                .write.parquet, os.path.join(d, "log", "epoch=1")
            )
            f0.result(), f1.result()
        cfg = CDCPipelineConfig(
            log_path=os.path.join(d, "log"),
            target_path=os.path.join(d, "target"),
            watermark_path=os.path.join(d, "wm"),
            checkpoint_location=os.path.join(d, "ckpt"),
            window_size_ms=max(1, (span + 3) // 4),  # ≥2 windows per epoch
            safety_interval_ms=span,  # files are time-disordered (above)
            target_num_buckets=8,
            max_files_per_trigger=2,  # ≥2 discovery triggers per epoch
            collection_modes={"tokens": "list"},
        )
        run_streaming_epochs(spark, cfg)
        out = ParquetMergeTable(
            spark, cfg.target_path, num_buckets=8
        ).read_visible().select(
            "doc_id",
            _tokens_csv(),
            F.col("n_tok").cast("long").alias("n_tok"),
            "source",
        )
        rows = out.collect()  # materialize before the tmpdir vanishes
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return spark.createDataFrame(rows, out.schema)


# final state must equal the batch list-mode replay (streaming is a
# different *schedule* over the same apply path, never different data)
SQL_ENGINE_STREAMING_REPLAY = (
    _log_cte()
    + """
SELECT doc_id,
       CASE WHEN arg_max(tokens, CASE WHEN base_op IN (1,2) THEN ord END) IS NOT NULL
            THEN array_to_string(
                   arg_max(tokens, CASE WHEN base_op IN (1,2) THEN ord END), ',')
       END AS tokens,
       CAST(arg_max(n_tok, CASE WHEN base_op IN (1,2) THEN ord END) AS BIGINT) AS n_tok,
       arg_max(source, CASE WHEN base_op IN (1,2) THEN ord END) AS source
FROM log
GROUP BY doc_id
HAVING max(CASE WHEN base_op IN (1,2) THEN ord END)
     > coalesce(max(CASE WHEN base_op IN (3,4) THEN ord END), -1)
"""
)


def q_engine_repair_replay(spark, sf_dir):
    """Late-data REPAIR driver gate (plans.pipeline.repair_span): carve a
    mid-log time slice out of the on-disk log, replay the rest — the
    watermarks advance PAST the gap — then land the slice late and
    re-apply exactly [a, b) through the same fold→merge path with the
    watermark filter bypassed.  The healed final table must equal the
    closed-form LWW state of the FULL log: the gate proves the
    join-semilattice repair story end to end (missing history lands,
    already-applied history cannot regress, tombstones stay authoritative
    over late writes below them).

    Reference analog: replication tests replaying overlapping windows
    through the consumer and asserting convergence
    (replication_tests.rs:166-208)."""
    import os
    import shutil
    import tempfile

    from scylla_cdc_rust_spark import model as M
    from scylla_cdc_rust_spark.config import CDCPipelineConfig
    from scylla_cdc_rust_spark.operators.merge import ParquetMergeTable
    from scylla_cdc_rust_spark.plans.pipeline import repair_span, replay

    log = _cdc_shaped_log(spark, sf_dir, fan_out=True)
    # bounds from parquet footer stats — no Spark job, identical values
    lo, hi = _shaped_log_time_bounds(spark, sf_dir)
    a = lo + 2 * (hi + 1 - lo) // 5
    z = lo + 3 * (hi + 1 - lo) // 5  # the held-back slice: [a, z)
    in_slice = (F.col(M.TIME_MS) >= a) & (F.col(M.TIME_MS) < z)
    d = tempfile.mkdtemp(prefix="repair_q_")
    try:
        ep = os.path.join(d, "log", "epoch=0")
        log.where(~in_slice).write.parquet(ep)
        cfg = CDCPipelineConfig(
            log_path=os.path.join(d, "log"),
            target_path=os.path.join(d, "target"),
            watermark_path=os.path.join(d, "wm"),
            window_size_ms=max(1, (hi + 1 - lo + 1) // 2),
            target_num_buckets=8,
            collection_modes={"tokens": "list"},
        )
        # pre-materialize the held-back slice CONCURRENTLY with the
        # replay (guide §2.6): computing its rows is invisible to the
        # scenario — the slice only "arrives" when the append lands in
        # the log dir AFTER replay, exactly as before; the append then
        # writes from cache instead of re-deriving the log
        from concurrent.futures import ThreadPoolExecutor

        late = log.where(in_slice).persist()
        try:
            with ThreadPoolExecutor(max_workers=1) as pool:
                warm = pool.submit(late.count)
                replay(spark, cfg)  # advances watermarks past the gap
                warm.result()
            late.write.mode("append").parquet(ep)  # arrives late
        finally:
            late.unpersist()
        repair_span(spark, cfg, a, z)
        out = ParquetMergeTable(
            spark, cfg.target_path, num_buckets=8
        ).read_visible().select(
            "doc_id",
            _tokens_csv(),
            F.col("n_tok").cast("long").alias("n_tok"),
            "source",
        )
        rows = out.collect()  # materialize before the tmpdir vanishes
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return spark.createDataFrame(rows, out.schema)


# the healed state must equal the full-log list-mode LWW final state —
# identical closed form to the streaming gate's oracle
SQL_ENGINE_REPAIR_REPLAY = SQL_ENGINE_STREAMING_REPLAY


# ===========================================================================
# Registry
# ===========================================================================

QUERIES = {
    "engine_cdc_replay": q_engine_cdc_replay,
    "engine_consumer_replay": q_engine_consumer_replay,
    "engine_salted_replay": q_engine_salted_replay,
    "engine_changelog": q_engine_changelog,
    "cdc_decode": q_cdc_decode,
    "cdc_fold_scalar": q_cdc_fold_scalar,
    "cdc_fold_set": q_cdc_fold_set,
    "cdc_fold_udt": q_cdc_fold_udt,
    "cdc_fold_map": q_cdc_fold_map,
    "cdc_fold_list_delta": q_cdc_fold_list_delta,
    "cdc_partition_delete": q_cdc_partition_delete,
    "cdc_image_pairs": q_cdc_image_pairs,
    "cdc_dedup_replay": q_cdc_dedup_replay,
    "cdc_window_scan": q_cdc_window_scan,
    "cdc_generation_lookup": q_cdc_generation_lookup,
    "cdc_stream_groups": q_cdc_stream_groups,
    "cdc_safety_clamp": q_cdc_safety_clamp,
    "cdc_checkpoint_resume": q_cdc_checkpoint_resume,
    "cdc_range_delete_pairing": q_cdc_range_delete_pairing,
    "cdc_ttl_propagation": q_cdc_ttl_propagation,
    "cdc_batch_stats": q_cdc_batch_stats,
    "doc_token_count": q_doc_token_count,
    "doc_exact_dedup": q_doc_exact_dedup,
    "doc_quality_score": q_doc_quality_score,
    "doc_lang_id": q_doc_lang_id,
    "doc_minhash_signatures": q_doc_minhash_signatures,
    "doc_ngram_jaccard": q_doc_ngram_jaccard,
    "doc_repetition_stats": q_doc_repetition_stats,
    "doc_pii_scrub": q_doc_pii_scrub,
    "doc_dedup_clusters": q_doc_dedup_clusters,
    "doc_lsh_candidates": q_doc_lsh_candidates,
    "doc_dedup_clusters_lsh": q_doc_dedup_clusters_lsh,
    "doc_simhash": q_doc_simhash,
    "doc_simhash_neardups": q_doc_simhash_neardups,
    "doc_fingerprint": q_doc_fingerprint,
    "doc_pack_offsets": q_doc_pack_offsets,
    "doc_stratified_sample": q_doc_stratified_sample,
    "doc_ngram_contamination": q_doc_ngram_contamination,
    "doc_curation_funnel": q_doc_curation_funnel,
    "emb_cosine_topk": q_emb_cosine_topk,
    "emb_lsh_buckets": q_emb_lsh_buckets,
    "emb_ivf_topk": q_emb_ivf_topk,
    "emb_binary_meta": q_emb_binary_meta,
    "img_channel_stats": q_img_channel_stats,
    "img_resize_stats": q_img_resize_stats,
    "audio_sample_stats": q_audio_sample_stats,
    "emb_neardup_clusters": q_emb_neardup_clusters,
    "tok_ngram_contamination": q_tok_ngram_contamination,
    "video_frame_index": q_video_frame_index,
    "tok_chunking": q_tok_chunking,
    "tok_vocab_topk": q_tok_vocab_topk,
    "doc_mixture_sample": q_doc_mixture_sample,
    "tok_contamination_spans": q_tok_contamination_spans,
    "tok_dup_spans": q_tok_dup_spans,
    "engine_replay_lineage": q_engine_replay_lineage,
    "engine_schema_evolution": q_engine_schema_evolution,
    "engine_streaming_replay": q_engine_streaming_replay,
    "engine_repair_replay": q_engine_repair_replay,
}

ORACLE_SQL = {
    "engine_cdc_replay": SQL_ENGINE_CDC_REPLAY,
    "engine_consumer_replay": SQL_ENGINE_CDC_REPLAY,
    "engine_salted_replay": SQL_ENGINE_LIST_REPLAY,
    "engine_changelog": SQL_ENGINE_CHANGELOG,
    "cdc_decode": SQL_CDC_DECODE,
    "cdc_fold_scalar": SQL_CDC_FOLD_SCALAR,
    "cdc_fold_set": SQL_CDC_FOLD_SET,
    "cdc_fold_udt": SQL_CDC_FOLD_UDT,
    "cdc_fold_map": SQL_CDC_FOLD_MAP,
    "cdc_fold_list_delta": SQL_CDC_FOLD_LIST_DELTA,
    "cdc_partition_delete": SQL_CDC_PARTITION_DELETE,
    "cdc_image_pairs": SQL_CDC_IMAGE_PAIRS,
    "cdc_dedup_replay": SQL_CDC_DEDUP_REPLAY,
    "cdc_window_scan": SQL_CDC_WINDOW_SCAN,
    "cdc_generation_lookup": SQL_CDC_GENERATION_LOOKUP,
    "cdc_stream_groups": SQL_CDC_STREAM_GROUPS,
    "cdc_safety_clamp": SQL_CDC_SAFETY_CLAMP,
    "cdc_checkpoint_resume": SQL_CDC_CHECKPOINT_RESUME,
    "cdc_range_delete_pairing": SQL_CDC_RANGE_DELETE_PAIRING,
    "cdc_ttl_propagation": SQL_CDC_TTL_PROPAGATION,
    "cdc_batch_stats": SQL_CDC_BATCH_STATS,
    "doc_token_count": SQL_DOC_TOKEN_COUNT,
    "doc_exact_dedup": SQL_DOC_EXACT_DEDUP,
    "doc_quality_score": SQL_DOC_QUALITY_SCORE,
    "doc_lang_id": SQL_DOC_LANG_ID,
    "doc_minhash_signatures": SQL_DOC_MINHASH_SIGNATURES,
    "doc_ngram_jaccard": SQL_DOC_NGRAM_JACCARD,
    "doc_repetition_stats": SQL_DOC_REPETITION_STATS,
    "doc_pii_scrub": SQL_DOC_PII_SCRUB,
    "doc_dedup_clusters": SQL_DOC_DEDUP_CLUSTERS,
    "doc_lsh_candidates": SQL_DOC_LSH_CANDIDATES,
    "doc_dedup_clusters_lsh": SQL_DOC_DEDUP_CLUSTERS_LSH,
    "doc_simhash": SQL_DOC_SIMHASH,
    "doc_simhash_neardups": SQL_DOC_SIMHASH_NEARDUPS,
    "doc_fingerprint": SQL_DOC_FINGERPRINT,
    "doc_pack_offsets": SQL_DOC_PACK_OFFSETS,
    "doc_stratified_sample": SQL_DOC_STRATIFIED_SAMPLE,
    "doc_ngram_contamination": SQL_DOC_NGRAM_CONTAMINATION,
    "doc_curation_funnel": SQL_DOC_CURATION_FUNNEL,
    "emb_cosine_topk": SQL_EMB_COSINE_TOPK,
    "emb_lsh_buckets": SQL_EMB_LSH_BUCKETS,
    "emb_ivf_topk": SQL_EMB_IVF_TOPK,
    "emb_binary_meta": SQL_EMB_BINARY_META,
    "img_channel_stats": SQL_IMG_CHANNEL_STATS,
    "img_resize_stats": SQL_IMG_RESIZE_STATS,
    "audio_sample_stats": SQL_AUDIO_SAMPLE_STATS,
    "emb_neardup_clusters": SQL_EMB_NEARDUP_CLUSTERS,
    "tok_ngram_contamination": SQL_TOK_NGRAM_CONTAMINATION,
    "video_frame_index": SQL_VIDEO_FRAME_INDEX,
    "tok_chunking": SQL_TOK_CHUNKING,
    "tok_vocab_topk": SQL_TOK_VOCAB_TOPK,
    "doc_mixture_sample": SQL_DOC_MIXTURE_SAMPLE,
    "tok_contamination_spans": SQL_TOK_CONTAMINATION_SPANS,
    "tok_dup_spans": SQL_TOK_DUP_SPANS,
    "engine_replay_lineage": SQL_ENGINE_REPLAY_LINEAGE,
    "engine_schema_evolution": SQL_ENGINE_SCHEMA_EVOLUTION,
    "engine_streaming_replay": SQL_ENGINE_STREAMING_REPLAY,
    "engine_repair_replay": SQL_ENGINE_REPAIR_REPLAY,
}

#: execution tier per query.  "production" = the declarative JVM-side
#: path you would run at 10^10 events.  "verification" = deliberately
#: reference-shaped cross-checks kept to prove the production path
#: equivalent — correct, oracle-gated, but NOT the scale path:
#:   - engine_consumer_replay drives the sequential per-stream Consumer
#:     state machine (operators/consumer_api.py ReplayConsumer — the
#:     row-oriented shape of the reference's consume loop,
#:     stream_reader.rs:392-396); the production equivalent is
#:     engine_cdc_replay (same semantics, one declarative fold).
#:   - emb_cosine_topk / doc_ngram_jaccard are brute-force baselines for
#:     the bucketed LSH variants (emb_lsh_buckets etc.).
QUERY_TIERS = {name: "production" for name in QUERIES}
QUERY_TIERS.update(
    {
        "engine_consumer_replay": "verification",
        "emb_cosine_topk": "verification",
        "doc_ngram_jaccard": "verification",
        # its cluster stage is the production operator, but the PAIR
        # feed is the brute-force all-pairs shingle join kept for
        # oracle-checkability; the production path end to end is
        # doc_lsh_candidates → doc_dedup_clusters_lsh
        "doc_dedup_clusters": "verification",
    }
)
