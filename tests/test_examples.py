"""The example CLIs (printer / replicator — the reference's two binaries)
run end-to-end via their public entry points."""

import os
import subprocess
import sys

from scylla_cdc_rust_spark.datagen.gen_log import LogSpec, generate_log, write_log
from scylla_cdc_rust_spark.datagen.oracle import oracle_replay

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


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
