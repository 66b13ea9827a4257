"""End-to-end CLI smoke: the spark-submit entry point run as a real
subprocess (its own JVM/session, exactly how `python -m` / spark-submit
drives it), including the resume-is-a-no-op contract."""

import json
import os
import subprocess
import sys

import pytest


@pytest.fixture(scope="module")
def pages_parquet(spark, tmp_path_factory):
    from language_identification_spark.fixtures import pages_df

    p = str(tmp_path_factory.mktemp("cli") / "pages")
    pages_df(spark, 60).write.mode("overwrite").parquet(p)
    return p


def _run_cli(args):
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = "2"
    proc = subprocess.run(
        [sys.executable, "-m", "language_identification_spark", *args],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    # last stdout line is the JSON summary
    return json.loads(proc.stdout.strip().splitlines()[-1])


def test_cli_end_to_end_and_resume(pages_parquet, tmp_path):
    out = str(tmp_path / "out")
    summary = _run_cli(
        [
            "--input", pages_parquet,
            "--output", out,
            "--buckets", "3",
            "--cores", "2",
            "--no-kn",
        ]
    )
    assert summary["buckets_done"] == [0, 1, 2]
    assert summary["rows"] == 60
    assert os.path.exists(os.path.join(out, "_progress.json"))
    assert os.path.isdir(os.path.join(out, "_metrics"))
    assert os.path.isdir(os.path.join(out, "_langdist"))

    # re-run with the same output: resume finds the complete manifest and
    # processes nothing new (rows counts total history, still 60)
    summary2 = _run_cli(
        [
            "--input", pages_parquet,
            "--output", out,
            "--buckets", "3",
            "--cores", "2",
            "--no-kn",
        ]
    )
    assert summary2["buckets_done"] == [0, 1, 2]
    assert summary2["rows"] == 60
