"""The spark-submit --py-files contract: the package must run from the
shipped zip alone (zipimport), because that is how executors receive it
on a real cluster.  A clean subprocess gets ONLY the zip on PYTHONPATH
(cwd moved off the repo) and replays a small log end-to-end against the
sequential oracle."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = """
import json, os, sys
import scylla_cdc_rust_spark
assert "scylla_cdc_rust_spark.zip" in scylla_cdc_rust_spark.__file__, (
    "package must load from the zip, not a source tree: "
    + scylla_cdc_rust_spark.__file__
)
from scylla_cdc_rust_spark.session import get_spark
from scylla_cdc_rust_spark.config import CDCPipelineConfig
from scylla_cdc_rust_spark.datagen.gen_log import LogSpec, generate_log, write_log
from scylla_cdc_rust_spark.datagen.oracle import oracle_replay
from scylla_cdc_rust_spark.plans.pipeline import replay
from scylla_cdc_rust_spark.operators.merge import ParquetMergeTable

d = sys.argv[1]
tbl = generate_log(LogSpec(n_events=3_000, n_docs=150, seed=5))
cfg = CDCPipelineConfig(
    log_path=os.path.join(d, "log"),
    target_path=os.path.join(d, "t"),
    watermark_path=os.path.join(d, "wm"),
    window_size_ms=1 << 60,
    target_num_buckets=4,
)
write_log(tbl, cfg.log_path)
spark = get_spark(cores=4)
replay(spark, cfg, {"tokens": "set"})
table = ParquetMergeTable(spark, cfg.target_path, num_buckets=4)
got = {r["doc_id"]: sorted(r["tokens"] or []) for r in table.read_visible().collect()}
want = {k: sorted(v["tokens"] or []) for k, v in
        oracle_replay(tbl, collection_modes={"tokens": "set"}).items()}
print(json.dumps({"match": got == want, "docs": len(want)}))
"""


def test_replay_runs_from_pyfiles_zip(tmp_path):
    sys.path.insert(0, REPO)
    from scripts.make_pyfiles_zip import build

    zp = build(str(tmp_path / "scylla_cdc_rust_spark.zip"))
    driver = tmp_path / "driver.py"
    driver.write_text(DRIVER)

    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH",)
    }
    env["PYTHONPATH"] = zp  # the zip IS the deployment artifact
    out = subprocess.run(
        [sys.executable, str(driver), str(tmp_path / "work")],
        capture_output=True,
        text=True,
        env=env,
        cwd=str(tmp_path),  # off the repo: no accidental source imports
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["match"] and res["docs"] > 0


def test_replay_runs_via_spark_submit_py_files(tmp_path):
    """The literal deployment command the north rule names:
    ``spark-submit --py-files scylla_cdc_rust_spark.zip driver.py`` —
    the driver imports the package from the shipped zip (spark-submit
    puts --py-files on the driver's sys.path and ships it to executors)
    and replays a log end-to-end against the sequential oracle."""
    import pyspark

    spark_submit = os.path.join(
        os.path.dirname(pyspark.__file__), "bin", "spark-submit"
    )
    if not os.path.exists(spark_submit):  # pragma: no cover
        import pytest

        pytest.skip("no spark-submit launcher in this pyspark install")
    sys.path.insert(0, REPO)
    from scripts.make_pyfiles_zip import build

    zp = build(str(tmp_path / "scylla_cdc_rust_spark.zip"))
    driver = tmp_path / "driver.py"
    # spark-submit provides the SparkSession config via the CLI; the
    # driver must not re-point PYTHONPATH at the repo
    driver.write_text(DRIVER)
    env = {k: v for k, v in os.environ.items() if k not in ("PYTHONPATH",)}
    out = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zp,
            str(driver), str(tmp_path / "work"),
        ],
        capture_output=True,
        text=True,
        env=env,
        cwd=str(tmp_path),  # off the repo: no accidental source imports
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["match"] and res["docs"] > 0
