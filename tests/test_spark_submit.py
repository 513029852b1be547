"""The literal spark-submit --py-files surface: build the package zip,
submit tools/submit_job.py through the real spark-submit binary from a
neutral cwd (so the package can only come from the zip), and
golden-check the output — the deployment path a multi-executor cluster
uses, exercised end-to-end."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPARK_SUBMIT = shutil.which("spark-submit") or (
    "/opt/spark/bin/spark-submit"
    if os.path.exists("/opt/spark/bin/spark-submit")
    else None
)


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on this host")
def test_spark_submit_pyfiles_golden(dataset, tmp_path):
    zip_path = str(tmp_path / "ocr_service_spark.zip")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_pyfiles.py"), zip_path],
        check=True,
    )
    out_dir = str(tmp_path / "out")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    data_dir = os.path.dirname(dataset["documents"])
    subprocess.run(
        [
            SPARK_SUBMIT,
            "--master",
            "local[4]",
            "--py-files",
            zip_path,
            os.path.join(REPO, "tools", "submit_job.py"),
            "--data-dir",
            data_dir,
            "--out-dir",
            out_dir,
            "--master",
            "local[4]",
            "--n-buckets",
            "8",
        ],
        check=True,
        cwd=str(tmp_path),  # neutral cwd: the repo package is NOT importable
        env=env,
        timeout=280,
    )

    import duckdb

    got = duckdb.sql(
        f"""
        WITH o AS (SELECT doc_id, list_transform(spans, s -> struct_pack(
                     kind := s.kind, text := s.text, media_ref := s.media_ref,
                     ord := s."order")) sp
                   FROM read_parquet('{out_dir}/extracted/*/*.parquet')),
        g AS (SELECT doc_id, list_transform(spans, s -> struct_pack(
                     kind := s.kind, text := s.text, media_ref := s.media_ref,
                     ord := s."order")) sp
              FROM '{data_dir}/golden.parquet')
        SELECT (SELECT count(*) FROM o), (SELECT count(*) FROM g),
               (SELECT count(*) FROM o JOIN g USING(doc_id) WHERE o.sp = g.sp)
        """
    ).fetchone()
    assert got[0] == got[1] == got[2] > 0


def test_pyfiles_zip_deterministic(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        from make_pyfiles import build
    finally:
        sys.path.pop(0)

    a = build(str(tmp_path / "a.zip"))
    b = build(str(tmp_path / "b.zip"))
    with open(a, "rb") as fa, open(b, "rb") as fb:
        assert fa.read() == fb.read()
