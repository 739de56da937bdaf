"""End-to-end spark-submit --py-files verification (BASELINE.json:14:
"runs via spark-submit --py-files on multi-executor clusters").

The subprocess runs from a cwd OUTSIDE the repo with the package
shipped ONLY as a --py-files zip, so any module the driver or the
executors can't import from the zip fails here — the exact failure
mode hidden by running pytest from the repo root.
"""

from __future__ import annotations

import shutil
import subprocess
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _spark_submit() -> str | None:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    import pyspark

    cand = Path(pyspark.__file__).parent / "bin" / "spark-submit"
    return str(cand) if cand.exists() else None


def test_spark_submit_py_files_end_to_end(spark, tmp_path):
    submit = _spark_submit()
    if submit is None:
        pytest.skip("spark-submit not on PATH and not in the pyspark dist")

    # package zip — exactly the documented recipe
    zip_path = tmp_path / "dm.zip"
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted((REPO / "datamunging_spark").rglob("*")):
            if py.suffix in (".py", ".tsv", ".txt") and py.is_file():
                zf.write(py, py.relative_to(REPO))

    from datamunging_spark.generator import corpus_to_rows, generate_corpus
    from datamunging_spark.operators.munge import INPUT_SCHEMA

    in_path = str(tmp_path / "volumes_in")
    spark.createDataFrame(
        corpus_to_rows(generate_corpus(seed=3, n_docs=8)), schema=INPUT_SCHEMA
    ).write.parquet(in_path)

    out_path = str(tmp_path / "volumes_out")
    proc = subprocess.run(
        [
            submit,
            "--master", "local[4]",
            "--py-files", str(zip_path),
            "--conf", "spark.sql.adaptive.enabled=true",
            "--conf", "spark.sql.shuffle.partitions=8",
            str(REPO / "tools" / "submit.py"),
            "--job", "munge",
            "--input", in_path,
            "--output", out_path,
            "--run-id", "submit-test",
        ],
        cwd=tmp_path,  # NOT the repo root — imports must come from the zip
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "run=submit-test docs=8" in proc.stdout, (
        proc.stdout[-2000:] + proc.stderr[-1000:]
    )

    # the output table is real and complete
    assert (
        spark.read.parquet(out_path).select("doc_id").distinct().count() == 8
    )
