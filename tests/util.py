"""Shared helpers: run the engine fold over an arrow log and diff vs oracle."""

from __future__ import annotations

import pyarrow as pa

from scylla_cdc_rust_spark.datagen.oracle import oracle_replay
from scylla_cdc_rust_spark.functions.decode import decode
from scylla_cdc_rust_spark.operators.fold import fold


def spark_df_from_arrow(spark, tbl: pa.Table):
    from scylla_cdc_rust_spark.model import CDC_LOG_SCHEMA

    names = set(tbl.column_names)
    schema_fields = [f for f in CDC_LOG_SCHEMA.fields if f.name in names]
    import pyspark.sql.types as T

    return spark.createDataFrame(
        tbl.to_pandas(), schema=T.StructType(schema_fields)
    )


def spark_df_via_parquet(spark, tbl: pa.Table, tmpdir=None):
    """Round-trip an arrow table through parquet so Spark gets exact
    types (maps/structs don't survive the pandas hop)."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    d = str(tmpdir) if tmpdir is not None else tempfile.mkdtemp()
    os.makedirs(d, exist_ok=True)
    p = os.path.join(d, "log.parquet")
    pq.write_table(tbl, p)
    return spark.read.parquet(p)


def present_oracle(oracle: dict, modes: dict) -> dict:
    """Project oracle cells into the user-visible shape (list_delta →
    values ordered by key), mirroring operators.fold.present."""
    out = {}
    for k, rec in oracle.items():
        rec = dict(rec)
        for c, m in modes.items():
            if m == "list_delta" and rec.get(c) is not None:
                rec[c] = [v for _, v in sorted(rec[c].items())]
        out[k] = rec
    return out


def check_general_fold(spark, tbl: pa.Table, modes: dict, tmpdir=None):
    """Engine fold (+present) vs sequential oracle on the general table."""
    from scylla_cdc_rust_spark.operators.fold import fold, present

    df = spark_df_via_parquet(spark, tbl, tmpdir)
    out = present(fold(decode(df), collection_modes=modes), modes)
    payload = tuple(c for c in ("vals", "attrs", "meta") if c in tbl.column_names)
    engine = normalize_engine(out.collect(), payload=payload)
    oracle = present_oracle(oracle_replay(tbl, collection_modes=modes), modes)
    assert_state_equal(engine, oracle)
    return engine


def run_fold(spark, tbl: pa.Table, modes=None, set_impl="elements"):
    from scylla_cdc_rust_spark.operators.fold import finalize, fold_delta

    df = spark_df_from_arrow(spark, tbl)
    modes = modes or {"tokens": "set"}
    delta = fold_delta(decode(df), collection_modes=modes, set_impl=set_impl)
    return finalize(delta, collection_modes=modes)


def normalize_engine(rows, payload=("tokens", "n_tok", "source")):
    out = {}
    for r in rows:
        d = r.asDict(recursive=True)
        rec = {c: d.get(c) for c in payload}
        rec["ttl"] = d.get("ttl")
        rec["last_ord"] = d.get("last_ord")
        out[d["doc_id"]] = rec
    return out


def assert_state_equal(engine: dict, oracle: dict):
    assert set(engine) == set(oracle), (
        f"key sets differ: only-engine={sorted(set(engine) - set(oracle))[:5]} "
        f"only-oracle={sorted(set(oracle) - set(engine))[:5]}"
    )
    for k in oracle:
        e, o = engine[k], oracle[k]
        for c in o:
            ev, ov = e.get(c), o[c]
            if isinstance(ov, list) and ev is not None:
                ev = list(ev)
            assert ev == ov, f"doc {k} col {c}: engine={ev!r} oracle={ov!r}"


def check_fold_matches_oracle(spark, tbl: pa.Table, modes=None, set_impl="elements"):
    modes = modes or {"tokens": "set"}
    oracle = oracle_replay(tbl, collection_modes=modes)
    engine = normalize_engine(run_fold(spark, tbl, modes, set_impl=set_impl).collect())
    assert_state_equal(engine, oracle)
    return engine
