"""Consumer API (reference trait parity) + salted fold tests."""

from pyspark.sql import functions as F

from scylla_cdc_rust_spark.datagen.gen_log import LogSpec, generate_log
from scylla_cdc_rust_spark.datagen.oracle import oracle_replay
from scylla_cdc_rust_spark.functions.decode import decode
from scylla_cdc_rust_spark.operators.consumer_api import (
    printer,
    replay_consumer_fold,
)
from scylla_cdc_rust_spark.operators.fold import finalize
from scylla_cdc_rust_spark.operators.salt import fold_delta_salted, hot_keys
from tests.util import assert_state_equal, normalize_engine, spark_df_from_arrow

MODES = {"tokens": "set"}


def test_replay_consumer_matches_oracle(spark):
    """The sequential pandas consumer path (reference shape) agrees with
    both the oracle and (transitively) the declarative fold."""
    tbl = generate_log(LogSpec(n_events=3_000, n_docs=120, seed=47))
    df = decode(spark_df_from_arrow(spark, tbl))
    out = replay_consumer_fold(df, collection_modes=MODES)
    engine = normalize_engine(out.collect())
    assert_state_equal(engine, oracle_replay(tbl, collection_modes=MODES))


def test_printer_consumer_emits_all_rows(spark):
    tbl = generate_log(LogSpec(n_events=500, n_docs=40, seed=3))
    df = decode(spark_df_from_arrow(spark, tbl))
    lines = printer(df, ["doc_id", "tokens", "n_tok", "source"]).collect()
    assert len(lines) == tbl.num_rows
    assert any("op=ROW_INSERT" in r["line"] for r in lines)
    assert any("deleted_elems[tokens]" in r["line"] for r in lines)


def test_salted_fold_matches_plain_fold(spark):
    """Salted two-stage fold ≡ plain fold ≡ oracle, under heavy skew."""
    modes = {"tokens": "list"}
    tbl = generate_log(
        LogSpec(n_events=8_000, n_docs=100, seed=53, hot_doc_frac=0.7)
    )
    df = decode(spark_df_from_arrow(spark, tbl))
    delta = fold_delta_salted(df, salt_factor=8, collection_modes=modes)
    final = finalize(delta, payload=["tokens", "n_tok", "source"], collection_modes=modes)
    assert_state_equal(
        normalize_engine(final.collect()), oracle_replay(tbl, collection_modes=modes)
    )


def test_hot_key_detection(spark):
    tbl = generate_log(LogSpec(n_events=5_000, n_docs=50, seed=5, hot_doc_frac=0.5))
    df = decode(spark_df_from_arrow(spark, tbl))
    hot = hot_keys(df, threshold=1_000)
    assert hot == ["doc_00000000"]
