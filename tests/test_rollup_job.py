"""End-to-end rollup job: run, interrupt-resume, verify tiers."""

import json
import subprocess
import sys


def _run(args):
    r = subprocess.run([sys.executable, "jobs/rollup_job.py"] + args,
                       capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    return json.loads(r.stdout.strip().splitlines()[-1])


def test_rollup_job_end_to_end_and_resume(tmp_path):
    out = str(tmp_path / "rollup_out")
    common = ["--input", "/root/repo/.fixtures/tokseq_sf0.001",
              "--output", out, "--slices", "4", "--job-id", "t1",
              "--cpus", "4"]
    m1 = _run(common)
    assert m1["n_docs"] == 1000
    assert len(m1["slices_run"]) == 4
    assert m1["tier_rows"]["1m"] > m1["tier_rows"]["1h"] > \
        m1["tier_rows"]["1d"]
    # resume: all slices checkpointed → none re-run, tiers unchanged
    m2 = _run(common)
    assert m2["slices_run"] == []
    assert m2["slices_skipped"] == 4
    assert m2["n_docs"] == 1000
    assert m2["tier_rows"] == m1["tier_rows"]


def test_package_builds():
    r = subprocess.run([sys.executable, "jobs/rollup_job.py", "--package"],
                       capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0
    assert r.stdout.strip().endswith("stumpy_spark.zip")
