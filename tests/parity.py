"""Local replica of the driver's Spark-vs-DuckDB correctness gate."""

from __future__ import annotations

import math

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, (list, tuple)) or v.__class__.__name__ == "ndarray":
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [cols[i] for i in order], out


def _driver_canon_safe(cols, rows) -> str | None:
    """Replicate the driver harness's canonicalizer, which sorts the result
    via ``pandas.DataFrame.sort_values`` over every column — raw array/map
    cells are unhashable there and error the whole gate (round-1 failure
    mode). Return an error string if the result would break it."""
    import pandas as pd

    try:
        pd.DataFrame(rows, columns=cols).sort_values(by=sorted(cols))
    except TypeError as e:
        return f"driver-canon unsafe output (unhashable cell?): {e}"
    return None


def compare_query(spark, sf_dir: str, spark_fn, sql: str) -> str | None:
    """Return None if results match, else a diff description."""
    sdf = spark_fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    canon_err = _driver_canon_safe(s_cols, s_rows)
    if canon_err:
        return canon_err
    con = duck_con(sf_dir)
    res = con.sql(sql)
    d_cols = res.columns
    d_rows = res.fetchall()
    if sorted(s_cols) != sorted(d_cols):
        return f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    sc, sn = _norm_rows(s_cols, s_rows)
    dc, dn = _norm_rows(d_cols, d_rows)
    if len(sn) != len(dn):
        return f"row count: spark={len(sn)} duck={len(dn)}"
    for i, (a, b) in enumerate(zip(sn, dn)):
        if a != b:
            return f"row {i} differs (cols {sc}):\n  spark={a}\n  duck ={b}"
        # the driver hashes raw pandas values, where 5616 (int64) and
        # 5616.0 (float, from DuckDB HUGEINT sums) hash DIFFERENTLY even
        # though == holds — the round-2 doc_pack_offsets failure mode.
        # Catch int-vs-float dtype drift per cell, not just equality.
        for j, (x, y) in enumerate(zip(a, b)):
            if isinstance(x, bool) != isinstance(y, bool) or (
                isinstance(x, float) != isinstance(y, float)
                and isinstance(x, (int, float))
                and isinstance(y, (int, float))
            ):
                return (
                    f"row {i} col {sc[j]} dtype drift (driver hash would "
                    f"differ): spark={x!r} ({type(x).__name__}) "
                    f"duck={y!r} ({type(y).__name__})"
                )
    return None
