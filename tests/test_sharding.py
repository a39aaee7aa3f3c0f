"""Mesh-sharded production runs on a virtual 8-device CPU mesh.

``run_analysis`` and ``run_mc3`` must shard the chain batch over all local
devices (SURVEY.md §2.5): the sweep program partitions with zero
communication, MC3 swap permutations cross shards as collective permutes.
The tests re-exec a child interpreter with ``JAX_PLATFORMS=cpu`` and
``--xla_force_host_platform_device_count=8`` (set BEFORE JAX initializes;
any site hook tunneling "cpu" to a remote backend is stripped), then drive
the real production entry points.
"""

import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_child(code: str, timeout=900):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    xla = [f for f in env.get("XLA_FLAGS", "").split()
           if not f.startswith("--xla_force_host_platform_device_count")]
    xla.append("--xla_force_host_platform_device_count=8")
    env["XLA_FLAGS"] = " ".join(xla)
    pp = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
          if p and "axon" not in p]
    env["PYTHONPATH"] = os.pathsep.join([REPO] + pp)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cpu")
    r = subprocess.run(
        [sys.executable, "-c", textwrap.dedent(code)],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=timeout,
    )
    assert r.returncode == 0, f"child failed:\n{r.stdout[-4000:]}\n{r.stderr[-4000:]}"
    return r.stdout


COMMON = """
import os, tempfile
import numpy as np
import jax
import jax.numpy as jnp

assert len(jax.devices()) == 8, jax.devices()

from mcmcdate_tpu.models import DatingModel, init_state
from mcmcdate_tpu.ops import mvn
from mcmcdate_tpu.tree import FlatTopology
from mcmcdate_tpu.utils.simulate import random_ultrametric_tree

rng = np.random.default_rng(0)
tree = random_ultrametric_tree(rng, 8)
topo = FlatTopology.from_tree(tree)
k = topo.n - 2
a = rng.normal(size=(k, k)) / np.sqrt(k)
sigma = a @ a.T + np.eye(k) * 0.05
mu = rng.uniform(0.05, 0.5, size=k)
data = mvn.LikelihoodData.full(mu, np.linalg.inv(sigma),
                               np.linalg.slogdet(sigma)[1])
model = DatingModel(topo=topo, likelihood=data)
init = init_state(tree, topo, dtype=jnp.float32)
"""


def test_run_analysis_sharded():
    out = _run_child(COMMON + """
from mcmcdate_tpu.engine.chains import RunSettings, run_analysis
from mcmcdate_tpu.engine.mh import BurnInSettings

d = tempfile.mkdtemp()
s = RunSettings(analysis_name="sh", burn_in=BurnInSettings([10], [10]),
                iterations=20, n_chains=16, out_dir=d, seed=1)
logs = []
run_analysis(model, init, s, log=lambda *a: logs.append(" ".join(map(str, a))))
text = "\\n".join(logs)
assert "sharding 16 chains over 8 devices" in text, text
assert os.path.exists(os.path.join(d, "sh.params.monitor"))
assert os.path.exists(os.path.join(d, "sh.mcmc.npz"))
print("RUN_ANALYSIS_SHARDED_OK")
""")
    assert "RUN_ANALYSIS_SHARDED_OK" in out


def test_mc3_sharded_swaps():
    out = _run_child(COMMON + """
from mcmcdate_tpu.engine.chains import RunSettings
from mcmcdate_tpu.engine.mh import BurnInSettings
from mcmcdate_tpu.engine.mc3 import run_mc3

d = tempfile.mkdtemp()
# 2 groups x 4 temps = 8 chains over 8 devices: every swap crosses shards.
s = RunSettings(analysis_name="shmc3", burn_in=BurnInSettings([10], [10]),
                iterations=20, n_chains=2, out_dir=d, seed=2)
logs = []
run_mc3(model, init, s, log=lambda *a: logs.append(" ".join(map(str, a))))
text = "\\n".join(logs)
assert "sharding 8 chains over 8 devices" in text, text
assert "swap" in text
assert os.path.exists(os.path.join(d, "shmc3.params.monitor"))
print("MC3_SHARDED_OK")
""")
    assert "MC3_SHARDED_OK" in out


@pytest.mark.fast_guard
def test_sharded_sweep_quick():
    """Minutes-scale guardrail (VERDICT r3 item 10): one jitted production
    sweep chunk over the 8-device mesh — the batch stays sharded across all
    devices and the carried log prior is finite.  The full e2e tests above
    drive run_analysis/run_mc3 end to end but take >10 min cold."""
    out = _run_child(COMMON + """
from mcmcdate_tpu.engine import proposals as P
from mcmcdate_tpu.engine.chains import ChainRunner, RunSettings

table = P.build_proposal_table(topo, model.braces, False)
s = RunSettings(analysis_name="q", n_chains=16, out_dir="/tmp", seed=0)
runner = ChainRunner(model, table, s, log=print)
assert runner.mesh is not None, "mesh not created on 8 devices"
batch, tuning = runner.init_chains(init)
batch, tuning = runner.maybe_shard(batch, tuning)
fn = runner.chunk_fn(collect=False)
b2, lp, ll, acc, tot, _ = fn(batch, tuning, jax.random.PRNGKey(0))
assert np.all(np.isfinite(np.asarray(lp))), np.asarray(lp)
assert len(b2.heights.sharding.device_set) == 8, b2.heights.sharding
print("SHARD_QUICK_OK")
""", timeout=600)
    assert "SHARD_QUICK_OK" in out
