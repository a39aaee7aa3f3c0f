"""Launcher for the per-proposal invariance suite.

test_proposal_invariance.py needs f64 and ~20 jit programs; running it
in-process on the axon TPU tunnel emulates f64 at prohibitive compile cost.
This launcher re-runs it under pytest in a plain-CPU child (native f64),
with the axon site hook stripped so "cpu" is truly local.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_invariance_suite_in_cpu_child():
    env = dict(os.environ)
    env["INVARIANCE_CHILD"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    pp = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
          if p and "axon" not in p]
    env["PYTHONPATH"] = os.pathsep.join([REPO] + pp)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cpu")
    r = subprocess.run(
        [sys.executable, "-m", "pytest",
         os.path.join(REPO, "tests", "test_proposal_invariance.py"),
         "-q", "--no-header", "-p", "no:cacheprovider"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=3600,
    )
    tail = (r.stdout + r.stderr)[-4000:]
    assert r.returncode == 0, f"invariance child failed:\n{tail}"
    assert " passed" in r.stdout, tail
