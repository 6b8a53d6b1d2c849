from scylla_cdc_rust_spark.functions.decode import decode, pack_ord_col  # noqa: F401
