"""End-to-end crash recovery: SIGKILL a spark-submit pipeline run
mid-flight, then rerun against the same out_dir — the manifest contract
must converge to the complete, correct result (manifest rows are only
recorded AFTER a bucket's output is written, so a killed run can only
lose work, never record phantom completions)."""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVER = os.path.join(REPO, "tools", "drive_kg.py")


@pytest.mark.slow
def test_killed_run_recovers_on_rerun(tmp_path):
    out = str(tmp_path / "crash_out")
    env = {**os.environ, "PYTHONPATH": REPO}
    cmd = [sys.executable, DRIVER, out, "200", "4"]

    # run 1: kill hard mid-run (after JVM+pipeline start, before finish —
    # a full run at local[4] takes ~30-60 s, so 16 s lands mid-stage)
    p = subprocess.Popen(
        cmd, env=env, cwd=REPO,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        start_new_session=True,  # kill the whole process group (JVM too)
    )
    time.sleep(16)
    assert p.poll() is None, "run finished before the kill — raise the page count"
    os.killpg(os.getpgid(p.pid), signal.SIGKILL)
    p.wait()

    # run 2: same out_dir — must complete and be fully correct
    r = subprocess.run(
        cmd, env=env, cwd=REPO, capture_output=True, text=True, timeout=560
    )
    verify = [ln for ln in r.stdout.splitlines() if ln.startswith("VERIFY")]
    assert verify, f"no VERIFY line; stderr tail: {r.stderr[-2000:]}"
    assert "P=1.0000 R=1.0000" in verify[0], verify[0]
    assert "docs=187" in verify[0] and "edges=541" in verify[0], verify[0]
