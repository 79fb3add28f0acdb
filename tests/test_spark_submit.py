"""North-rule deployment contract: the pipeline must run via
``spark-submit --py-files kgcompass_spark.zip`` (BASELINE.json) — i.e. the
package has to be importable from the shipped zip alone, with no repo
checkout on the python path. This drives the real spark-submit binary in a
fresh JVM from a neutral cwd; a regression here (an import that resolves
only relative to the repo, a data file missing from the zip, a module-level
dependency on the driver env) reproduces nowhere else in the suite."""

import os
import re
import subprocess
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"

JOB = """
from pyspark.sql import SparkSession

spark = SparkSession.builder.getOrCreate()
# import AFTER the session exists: --py-files lands on the driver path at
# context init (the classic spark-submit ordering gotcha)
from kgcompass_spark.pipeline import build_kg
from kgcompass_spark.sources.datagen import corpus_dataframes, CUTOFF

pages, entities, goldens, _ = corpus_dataframes(spark, n_pages=20)
out = build_kg(pages, entities, cutoff=CUTOFF)
print("TRIPLES_OK", out["triples"].count())
"""


def test_spark_submit_pyfiles_smoke(tmp_path):
    if not os.path.exists(SPARK_SUBMIT):
        import pytest

        pytest.skip("spark-submit not installed")
    build = subprocess.run(
        ["bash", str(REPO / "scripts" / "package.sh")],
        capture_output=True,
        text=True,
    )
    assert build.returncode == 0, build.stderr
    job = tmp_path / "job.py"
    job.write_text(JOB)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    r = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master",
            "local[4]",
            "--py-files",
            str(REPO / "kgcompass_spark.zip"),
            str(job),
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        env=env,
        timeout=600,
    )
    assert r.returncode == 0, (r.stderr or "")[-3000:]
    m = re.search(r"TRIPLES_OK (\d+)", r.stdout)
    assert m, r.stdout[-2000:]
    assert int(m.group(1)) > 0
