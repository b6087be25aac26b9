"""Smoke tests for the `ray job submit` entry points (jobs/) — each job
owns its own Ray session, so they run as subprocesses against tiny
inputs. Covers the deployment surface end-to-end: argparse → pipeline →
resumable partitioned sink → JSON metrics line, plus the resume
contract (a re-run with the same --output writes 0 new partitions)."""

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_job(script: str, args: list) -> dict:
    env = dict(os.environ, RAY_ADDRESS="local")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", script), *args],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO)
    assert proc.returncode == 0, f"{script} failed:\n{proc.stderr[-3000:]}"
    # Last stdout line is the metrics JSON.
    line = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


@pytest.fixture(scope="module")
def tiny_pages(tmp_path_factory):
    from buteo_ray.sources.pages import synth_pages_table

    d = tmp_path_factory.mktemp("pages_tiny")
    pq.write_table(synth_pages_table(2000), str(d / "part-0.parquet"))
    return str(d)


def test_headline_job_smoke_and_resume(tiny_pages, tmp_path):
    out = str(tmp_path / "headline_out")
    m1 = _run_job("headline_job.py",
                  ["--input", tiny_pages, "--output", out, "--aoi", "200"])
    assert m1["partitions_written_this_run"] >= 1
    assert m1["partitions_total"] == m1["partitions_written_this_run"]
    # Output is real partitioned parquet with join+tile columns.
    files = [os.path.join(r, f) for r, _, fs in os.walk(out)
             for f in fs if f.endswith(".parquet")]
    assert files
    schema = pq.read_schema(files[0])
    for col in ("url", "aoi_id", "tile_x", "tile_y", "cell_r5"):
        assert col in schema.names, schema.names
    # Resume: identical re-submit skips every finished partition.
    m2 = _run_job("headline_job.py",
                  ["--input", tiny_pages, "--output", out, "--aoi", "200"])
    assert m2["partitions_written_this_run"] == 0
    assert m2["partitions_total"] == m1["partitions_total"]


def test_training_job_smoke_and_resume(tmp_path):
    sf_dir = os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    docs = os.path.join(sf_dir, "documents.parquet")
    if not os.path.exists(docs):
        pytest.skip("no sf0.001 testdata")
    out = str(tmp_path / "training_out")
    m1 = _run_job("training_job.py",
                  ["--input", docs, "--output", out, "--scrub-pii"])
    assert m1["partitions_written_this_run"] >= 1
    files = [os.path.join(r, f) for r, _, fs in os.walk(out)
             for f in fs if f.endswith(".parquet")]
    assert files
    schema = pq.read_schema(files[0])
    assert "doc_id" in schema.names and "text" in schema.names
    m2 = _run_job("training_job.py",
                  ["--input", docs, "--output", out, "--scrub-pii"])
    assert m2["partitions_written_this_run"] == 0
    assert m2["partitions_total"] == m1["partitions_total"]
