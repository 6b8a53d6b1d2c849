from scylla_cdc_rust_spark.datagen.gen_log import LogSpec, generate_log, write_log  # noqa: F401
from scylla_cdc_rust_spark.datagen.oracle import oracle_replay  # noqa: F401
