"""The example CLIs (printer / replicator — the reference's two binaries)
run end-to-end via their public entry points."""

import json
import os
import subprocess
import sys

from pyspark.sql import functions as F

from scylla_cdc_rust_spark.datagen.gen_log import LogSpec, generate_log, write_log
from scylla_cdc_rust_spark.datagen.oracle import oracle_replay

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_incremental_curation_cli(spark, tmp_path):
    """Two runs of examples/incremental_curation.py: the first curates
    the log prefix in full, the second resumes the replay, commits a
    new snapshot, and re-curates ONLY the changelog's changed docs —
    while the final curated table must equal a from-scratch curation of
    the final state."""
    import pyarrow.compute as pc
    from pyspark.sql import functions as F

    from scylla_cdc_rust_spark.model import TIME_MS

    tmp = str(tmp_path)
    tbl = generate_log(LogSpec(n_events=3_000, n_docs=150, seed=45))
    log_dir = os.path.join(tmp, "log")
    write_log(tbl, log_dir)
    cut = int(pc.approximate_median(tbl.column(TIME_MS)).as_py())

    def run(extra):
        r = subprocess.run(
            [sys.executable,
             os.path.join(REPO, "examples", "incremental_curation.py"),
             "--log-path", log_dir,
             "--target-path", os.path.join(tmp, "t"),
             "--watermark-path", os.path.join(tmp, "wm"),
             "--curated-out", os.path.join(tmp, "cur"), *extra],
            capture_output=True, text=True, timeout=300,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        return json.loads(r.stderr.strip().splitlines()[-1])

    m1 = run(["--stop-at-ms", str(cut)])
    assert m1["n_total"] == m1["n_changed"] > 0  # initial full curation
    m2 = run([])
    # second run is incremental: only changelog docs re-curated
    assert 0 < m2["n_changed"]
    assert m2["curated_version"] > m1["curated_version"]

    # final curated set == from-scratch curation of the final state
    from scylla_cdc_rust_spark.operators.merge import ParquetMergeTable
    from scylla_cdc_rust_spark.operators.repetition import (
        array_repetition_signals,
    )

    cur = spark.read.parquet(
        os.path.join(tmp, "cur", f"data-v{m2['curated_version']}")
    )
    table = ParquetMergeTable(spark, os.path.join(tmp, "t"))
    toks = F.coalesce(F.col("tokens"), F.array().cast("array<int>"))
    full = table.read_visible().select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tok"),
        *array_repetition_signals(toks, (2, 3)),
    )
    got = {r["doc_id"]: tuple(r)[1:] for r in cur.drop("keep").collect()}
    want = {r["doc_id"]: tuple(r)[1:] for r in full.collect()}
    assert got == want


def test_example_clis_end_to_end(spark, tmp_path):
    tmp = str(tmp_path)
    tbl = generate_log(LogSpec(n_events=2_000, n_docs=100, seed=67))
    write_log(tbl, os.path.join(tmp, "log"))

    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "printer.py"),
         "--log-path", os.path.join(tmp, "log"), "--limit", "5"],
        capture_output=True, text=True, timeout=240,
    )
    assert p.returncode == 0 and len(p.stdout.strip().splitlines()) == 5
    assert "op=" in p.stdout and "stream=" in p.stdout

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "replicator.py"),
         "--log-path", os.path.join(tmp, "log"),
         "--target-path", os.path.join(tmp, "t"),
         "--watermark-path", os.path.join(tmp, "wm")],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0 and f"applied {tbl.num_rows} events" in r.stderr

    # the produced target matches the oracle (read with the session fixture)
    from scylla_cdc_rust_spark.operators.merge import ParquetMergeTable
    from tests.util import assert_state_equal, normalize_engine

    t = ParquetMergeTable(spark, os.path.join(tmp, "t"), num_buckets=32)
    assert_state_equal(
        normalize_engine(t.read_visible().collect()),
        oracle_replay(tbl, collection_modes={"tokens": "set"}),
    )


def test_token_curation_cli(spark, tmp_path):
    tmp = str(tmp_path)
    # dup1/dup2: identical 30-token docs -> fully covered by duplicate
    # spans -> both dropped at --max-dup-frac 0.5.  contam shares its
    # leading 3-gram with the benchmark -> dropped by decontamination.
    # cleanN: disjoint token ranges, unique, survive to chunking.
    rows = (
        [("dup1", list(range(100, 130)), "web"),
         ("dup2", list(range(100, 130)), "web"),
         ("contam", [7, 8, 9] + list(range(500, 530)), "books")]
        + [(f"clean{i}", list(range(1000 + 100 * i, 1040 + 100 * i)), "web")
           for i in range(4)]
    )
    spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, source string"
    ).write.parquet(os.path.join(tmp, "corpus"))
    spark.createDataFrame(
        [("b0", [7, 8, 9], "bench")],
        "doc_id string, tokens array<int>, source string",
    ).write.parquet(os.path.join(tmp, "bench"))

    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "token_curation.py"),
         "--corpus", os.path.join(tmp, "corpus"),
         "--out", os.path.join(tmp, "out"),
         "--bench-path", os.path.join(tmp, "bench"),
         "--max-len", "16", "--stride", "8"],
        capture_output=True, text=True, timeout=300,
    )
    assert p.returncode == 0, p.stderr[-2000:]
    funnel = json.load(open(os.path.join(tmp, "out", "manifest.json")))
    assert funnel["input_docs"] == 7
    assert funnel["after_dup_spans"] == 5  # both full duplicates dropped
    assert funnel["after_decontam"] == 4  # benchmark overlap dropped
    assert funnel["after_mixture"] == 4  # no --mixture: pass-through

    chunks = spark.read.parquet(os.path.join(tmp, "out", "chunks"))
    got_ids = {r["doc_id"] for r in chunks.select("doc_id").distinct().collect()}
    assert got_ids == {f"clean{i}" for i in range(4)}
    assert funnel["chunks"] == chunks.count()
    # every chunk fits the context window; per-doc token coverage is exact
    assert chunks.where(F.col("n_chunk_tok") > 16).count() == 0
    assert funnel["chunk_tokens"] == sum(
        r["n_chunk_tok"] for r in chunks.collect()
    )
