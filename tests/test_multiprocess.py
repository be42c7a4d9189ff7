"""Multi-process distributed runtime (the real DCN axis).

Exercises parallel/mesh.initialize_distributed + make_pod_mesh across
actual process boundaries — 2 coordinated processes x 4 virtual CPU
devices each, Gloo collectives — against a single-process 8-device run
of the same sharded solve (SURVEY.md §4's multi-process simulation of
the multi-host runtime; the reference is single-process, §2.9)."""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_pod_mesh_matches_single_process():
    # fresh subprocesses: jax.distributed cannot initialize inside the
    # already-initialized test process
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "dist_multiprocess.py"),
         "--procs", "2", "--cams", "40", "--pts", "4000", "--iters", "8"],
        capture_output=True, text=True, timeout=1200, cwd=ROOT,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    res = json.loads(line)
    assert res["ok"], res
    assert res["parity_pct"] < 1.0, res


@pytest.mark.slow
def test_cross_process_parity_sweep():
    """5 sizes x 2 seeds at 2 processes, 1% gate each (r4 verdict weak
    #2: the psum accept test passed at exactly one tuned point and
    failed at 30 cams/2000 pts/5 iters with 4.02%; the deterministic
    all_gather+fixed-order reduction makes every point bit-identical)."""
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "dist_multiprocess.py"),
         "--procs", "2", "--sweep"],
        capture_output=True, text=True, timeout=3600, cwd=ROOT,
    )
    assert out.returncode == 0, out.stdout[-4000:] + out.stderr[-2000:]
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    res = json.loads(line)
    assert res["ok"], out.stdout[-4000:]
    assert res["sweep"] == 10, res
    # deterministic reduction: the sweep should be EXACTLY zero, but the
    # contract gate is the 1% parity the production path promises
    assert res["max_parity_pct"] < 1.0, res
