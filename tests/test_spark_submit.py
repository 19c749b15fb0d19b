"""north_rule run-mode evidence: the pipeline runs via REAL
``spark-submit --py-files prase_spark.zip`` subprocesses (not in-process
imports), and resumes from its checkpoint across submissions.

The entry script is copied to a temp dir before submitting, so its
``sys.path`` bootstrap points at an empty parent — every ``prase_spark``
import must resolve from the --py-files zip, proving the packaging
actually carries the engine (reference run mode: ``python test.py``,
/root/reference/README.md:19-23)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


def _submit(script: str, zip_path: str, *args: str) -> dict:
    cmd = [
        SPARK_SUBMIT,
        "--master", "local[4]",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--conf", "spark.ui.enabled=false",
        "--py-files", zip_path,
        script, *args,
    ]
    proc = subprocess.run(
        cmd, capture_output=True, text=True, timeout=420, cwd=os.path.dirname(script)
    )
    assert proc.returncode == 0, f"spark-submit failed:\n{proc.stdout[-3000:]}\n{proc.stderr[-3000:]}"
    summaries = [
        line for line in proc.stdout.splitlines()
        if line.startswith("{") and "triples_out" in line
    ]
    assert summaries, f"no summary JSON in stdout:\n{proc.stdout[-2000:]}"
    return json.loads(summaries[-1])


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_py_files_end_to_end(tmp_path):
    # fresh zip via the packaging script (what a cluster deploy would ship)
    subprocess.run(["bash", os.path.join(REPO, "scripts", "package.sh")], check=True)
    zip_path = os.path.join(REPO, "dist", "prase_spark.zip")
    script = str(tmp_path / "run_pipeline.py")
    shutil.copy(os.path.join(REPO, "scripts", "run_pipeline.py"), script)
    out_dir, ckpt_dir = str(tmp_path / "out"), str(tmp_path / "ckpt")

    first = _submit(
        script, zip_path,
        "--demo-pages", "150", "--iterations", "1",
        "--out", out_dir, "--checkpoint-dir", ckpt_dir,
    )
    assert first["iterations"] == 1 and first["triples_out"] > 0

    # second submission resumes the checkpointed state and runs exactly one
    # more iteration (S7 resume across independent driver JVMs)
    second = _submit(
        script, zip_path,
        "--demo-pages", "150", "--iterations", "2", "--resume",
        "--out", out_dir, "--checkpoint-dir", ckpt_dir,
    )
    assert second["iterations"] == 2
    assert second["match_pairs"] > 0

    # materialized graph + per-partition lineage/metrics landed as parquet
    import pyarrow.parquet as pq

    graph = pq.read_table(os.path.join(out_dir, "graph"))
    for col in ("subj", "pred", "obj", "canonical_subj", "lineage", "partition_id"):
        assert col in graph.column_names
    metrics = pq.read_table(os.path.join(out_dir, "metrics"))
    assert metrics.num_rows >= 1
    assert {"rows", "subj_canonicalized", "obj_canonicalized"} <= set(metrics.column_names)


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_streaming_incremental_ingest(tmp_path):
    """--streaming mode: pages are ingested via Structured Streaming
    (availableNow). Each demo submission APPENDS new page files; the
    stream checkpoint makes the second run extract only the new files,
    and alignment sees the accumulated triples — triples_out must grow."""
    zip_path = os.path.join(REPO, "dist", "prase_spark.zip")
    if not os.path.exists(zip_path):
        subprocess.run(["bash", os.path.join(REPO, "scripts", "package.sh")], check=True)
    script = str(tmp_path / "run_pipeline.py")
    shutil.copy(os.path.join(REPO, "scripts", "run_pipeline.py"), script)
    out_dir, ckpt_dir = str(tmp_path / "out"), str(tmp_path / "ckpt")

    args = ["--streaming", "--demo-pages", "120", "--iterations", "1",
            "--out", out_dir, "--checkpoint-dir", ckpt_dir]
    first = _submit(script, zip_path, *args)
    second = _submit(script, zip_path, *args)
    assert first["triples_out"] > 0
    # second submission appended 120 more pages; the stream drained ONLY
    # the new files into the same sink, so the aligned graph grew
    assert second["triples_out"] > first["triples_out"]
