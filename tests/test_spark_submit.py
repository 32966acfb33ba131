"""The north rule's delivery form: the pipeline ships as
``spark-submit --py-files <engine.zip> jobs/run_pipeline.py`` and is
resumable from its checkpoint dir. This test runs the REAL spark-submit
binary twice (fresh + resume) against a small fixture parquet."""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _zip_engine(dest: str) -> str:
    zpath = os.path.join(dest, "nama_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "nama_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def _run_job(zpath, input_path, out_dir, ckpt_dir):
    cmd = [
        SPARK_SUBMIT,
        "--master", "local[4]",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--conf", "spark.ui.enabled=false",
        "--py-files", zpath,
        os.path.join(REPO, "jobs", "run_pipeline.py"),
        "--input", input_path,
        "--string-col", "repo",
        "--output", out_dir,
        "--checkpoint-dir", ckpt_dir,
        "--passes", "exact_key,token_sim",
        "--token-threshold", "0.7",
    ]
    return subprocess.run(cmd, capture_output=True, text=True, timeout=600)


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit")
def test_spark_submit_pipeline_fresh_and_resume(spark, tmp_path):
    from fixtures.make_fixtures import fixture_dataframes, make_fixture

    fx = make_fixture(seed=5, n_entities=30, max_files=2)
    records, _, _ = fixture_dataframes(spark, fx)
    input_path = str(tmp_path / "records.parquet")
    records.write.mode("overwrite").parquet(input_path)
    n_strings = records.select("repo").distinct().count()

    zpath = _zip_engine(str(tmp_path))
    out_dir = str(tmp_path / "out")
    ckpt_dir = str(tmp_path / "ckpt")

    r1 = _run_job(zpath, input_path, out_dir, ckpt_dir)
    assert r1.returncode == 0, r1.stderr[-3000:]
    summary1 = json.loads(
        [l for l in r1.stdout.splitlines() if l.strip().startswith("{")][-1]
    )
    assert summary1["strings"] == n_strings
    assert 0 < summary1["groups"] <= n_strings

    clusters = spark.read.parquet(out_dir + "/clusters")
    # materialize BEFORE the resume run overwrites the output files
    rows1 = clusters.collect()
    assert len(rows1) == n_strings
    assert set(clusters.columns) == {"string", "count", "group"}
    got1 = {(r["string"], r["group"]) for r in rows1}

    # resume: re-running with the same checkpoint dir must reuse every pass
    # and reproduce the identical partition
    r2 = _run_job(zpath, input_path, out_dir, ckpt_dir)
    assert r2.returncode == 0, r2.stderr[-3000:]
    summary2 = json.loads(
        [l for l in r2.stdout.splitlines() if l.strip().startswith("{")][-1]
    )
    assert summary2["groups"] == summary1["groups"]
    got2 = {
        (r["string"], r["group"])
        for r in spark.read.parquet(out_dir + "/clusters").collect()
    }
    assert got1 == got2
