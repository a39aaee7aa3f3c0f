"""Cross-chain fiber-DE ensemble move (engine/ensemble.py, --fiber-de).

Three guarantees: (1) the rate-map Jacobian used in the acceptance is
EXACTLY the determinant of the move's (h, r) diffeomorphism (checked
against autodiff); (2) the move leaves every expected-substitution branch
length unchanged (likelihood exactly invariant) and every state valid;
(3) the stationary distribution is unchanged — posterior height moments
with the DE phase interleaved match the plain batched sweep.

Runs in plain-CPU children like test_fast_sweep (the in-process axon
path compiles too slowly at test sizes).
"""

import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_child(code: str, timeout=1500):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    pp = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
          if p and "axon" not in p]
    env["PYTHONPATH"] = os.pathsep.join([REPO] + pp)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cpu")
    r = subprocess.run(
        [sys.executable, "-c", textwrap.dedent(code)],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=timeout,
    )
    assert r.returncode == 0, (
        f"child failed:\n{r.stdout[-4000:]}\n{r.stderr[-4000:]}"
    )
    return r.stdout


COMMON = """
import dataclasses
import numpy as np
import jax, jax.numpy as jnp
from mcmcdate_tpu.models import DatingModel, init_state
from mcmcdate_tpu.ops import mvn
from mcmcdate_tpu.tree import FlatTopology
from mcmcdate_tpu.utils.simulate import random_ultrametric_tree
from mcmcdate_tpu.engine import proposals as P
from mcmcdate_tpu.engine.fast_sweep import FastSweeps
from mcmcdate_tpu.engine.ensemble import make_fiber_de

def build(n_leaves=10, seed=0, C=64):
    rng = np.random.default_rng(seed)
    tree = random_ultrametric_tree(rng, n_leaves)
    topo = FlatTopology.from_tree(tree)
    k = topo.n - 2
    a = rng.normal(size=(k, k)) / np.sqrt(k)
    sigma = a @ a.T + np.eye(k) * 0.05
    mu = rng.uniform(0.05, 0.5, size=k)
    data = mvn.LikelihoodData.full(mu, np.linalg.inv(sigma),
                                   np.linalg.slogdet(sigma)[1])
    model = DatingModel(topo=topo, likelihood=data)
    table = P.build_proposal_table(topo, model.braces, False)
    state = init_state(tree, topo, dtype=jnp.float32)
    batch = jax.tree.map(lambda x: jnp.broadcast_to(x, (C,) + x.shape),
                         state)
    r = rng.gamma(5.0, 0.2, size=(C, topo.n)); r[:, 0] = 1.0
    batch = batch.replace(rates=jnp.asarray(r, jnp.float32))
    tuning = jnp.ones((C, table.n_proposals), jnp.float32)
    return model, table, batch, tuning, topo

def distances(batch, topo):
    parent = np.asarray(topo.parent)
    h = np.asarray(batch.heights, np.float64)
    r = np.asarray(batch.rates, np.float64)
    t = h[:, parent] - h
    d = (t * np.asarray(batch.height, np.float64)[:, None]
         * r * np.asarray(batch.rate_mean, np.float64)[:, None])
    d[:, 0] = 0.0
    return d
"""


@pytest.mark.fast_guard
def test_fiber_de_jacobian_matches_autodiff():
    """For fixed donors and gamma the move is a deterministic
    diffeomorphism (h, r) -> (h + g*delta, r * t/t'); the acceptance uses
    log|det J| = sum_j log(t_j / t'_j) over non-root branches.  Check
    that formula against the autodiff log-determinant of the flattened
    map on a small tree (f64 child)."""
    out = _run_child("""
import jax
jax.config.update("jax_enable_x64", True)
""" + COMMON + """
model, table, batch, tuning, topo = build(6, seed=3, C=4)
parent = np.asarray(topo.parent)
inner = [i for i in range(topo.n)
         if i != 0 and not bool(np.asarray(topo.is_leaf)[i])]
inner = np.asarray(inner)
free_r = np.arange(1, topo.n)

h0 = np.asarray(batch.heights, np.float64)[0]
r0 = np.asarray(batch.rates, np.float64)[1]
rng = np.random.default_rng(0)
delta = np.zeros(topo.n)
delta[inner] = rng.normal(0, 0.02, size=inner.size)
gamma = 1.0
pj = jnp.asarray(parent)

def flat_map(x):
    hi, rf = x[: inner.size], x[inner.size:]
    h = jnp.asarray(h0).at[jnp.asarray(inner)].set(hi)
    r = jnp.asarray(r0).at[jnp.asarray(free_r)].set(rf)
    hp = h + gamma * jnp.asarray(delta)
    t0 = h[pj] - h
    t1 = hp[pj] - hp
    ratio = (t0 / t1).at[0].set(1.0)
    rp = r * ratio
    return jnp.concatenate([hp[jnp.asarray(inner)],
                            rp[jnp.asarray(free_r)]])

x0 = jnp.asarray(np.concatenate([h0[inner], r0[free_r]]))
J = jax.jacfwd(flat_map)(x0)
sign, logdet = np.linalg.slogdet(np.asarray(J))
assert sign > 0, sign

h1 = h0 + gamma * delta
t0 = (h0[parent] - h0)[1:]
t1 = (h1[parent] - h1)[1:]
analytic = float(np.sum(np.log(t0 / t1)))
assert abs(float(logdet) - analytic) < 1e-9, (logdet, analytic)
print("OK jac", float(logdet), analytic)
""", timeout=900)
    assert "OK jac" in out


@pytest.mark.fast_guard
def test_fiber_de_invariance_and_likelihood_exactness():
    """Interleaving fiber-DE rounds with the batched sweep must leave the
    posterior unchanged, the move itself must leave every branch's
    expected-substitution length bit-identical up to f32 rounding, every
    state valid, and the move must actually accept."""
    out = _run_child(COMMON + """
from mcmcdate_tpu.models.state import is_valid_state

model, table, batch, tuning, topo = build(10, seed=5, C=64)
move = jax.jit(make_fiber_de(model, jnp.float32))

# Direct single-move checks on a tight valid ensemble (an equilibrated
# within-mode ensemble stand-in): move each internal node a random
# fraction toward its parent, in preorder so every span stays positive.
parent = np.asarray(topo.parent)
is_leaf = np.asarray(topo.is_leaf)
h = np.asarray(batch.heights, np.float64).copy()
rng2 = np.random.default_rng(9)
for c in range(h.shape[0]):
    for i in range(1, h.shape[1]):
        if not is_leaf[i]:
            h[c, i] += rng2.uniform(0, 0.25) * (h[c, parent[i]] - h[c, i])
b = batch.replace(heights=jnp.asarray(h, jnp.float32))
d_before = distances(b, topo)
b_mv, rates0 = b, []
for j in range(8):
    b_mv, r_ = move(b_mv, jax.random.PRNGKey(100 + j))
    rates0.append(float(r_))
d_after = distances(b_mv, topo)
rel = np.abs(d_after - d_before) / np.maximum(np.abs(d_before), 1e-12)
assert rel.max() < 2e-4, rel.max()   # f32 rounding only, per accepted move
ok = np.asarray(jax.vmap(lambda s: is_valid_state(s, topo))(b_mv))
assert ok.all()
moved = np.abs(np.asarray(b_mv.heights) - np.asarray(b.heights)).max()
rate0 = float(np.mean(rates0))
assert rate0 > 0.005, rates0
assert moved > 0, "accepted moves changed nothing"

# Stationarity: sweep+DE vs plain sweep posterior height moments.
fast = FastSweeps(model, table)
run = jax.jit(lambda b, tu, k2: fast.sweeps(b, tu, k2, 20))
key = jax.random.PRNGKey(1)
hs = []
b2 = batch
for it in range(40):
    key, k1, k2 = jax.random.split(key, 3)
    b2 = run(b2, tuning, k1)[0]
    b2, _ = move(b2, k2)
    if it >= 5:
        hs.append(np.asarray(b2.heights))
hf = np.concatenate(hs)

hp_ = []
b3 = batch
key = jax.random.PRNGKey(1)
for it in range(40):
    key, k1, k2 = jax.random.split(key, 3)
    b3 = run(b3, tuning, k1)[0]
    if it >= 5:
        hp_.append(np.asarray(b3.heights))
hp_ = np.concatenate(hp_)

inner = np.asarray(topo.inner_nodes)
mf, mp = hf[:, inner].mean(0), hp_[:, inner].mean(0)
se = hf[:, inner].std(0) / np.sqrt(len(hf) / 16.0)
err = np.abs(mf - mp)
assert np.all(err < 5 * np.maximum(se, 0.01)), (err, se)
print("OK de", float(rate0), err.max())
""", timeout=1500)
    assert "OK de" in out


def test_fiber_de_chain_runner_plumbing():
    """--fiber-de through RunSettings/ChainRunner: the DE phase runs
    inside the jitted chunk, acceptance statistics surface through the
    extra-phase mechanism, and the window still samples."""
    out = _run_child(COMMON + """
from mcmcdate_tpu.engine.chains import ChainRunner, RunSettings

model, table, batch, tuning, topo = build(8, seed=2, C=16)
s = RunSettings(analysis_name="t", n_chains=16, fiber_de=2.0,
                iterations=20, seed=1)
runner = ChainRunner(model, table, s, log=lambda *a: None)
assert runner._fiber_de_move is not None
assert "fiber DE" in runner._extra_names
b, key, acc, tot, _ = runner._run_window(
    batch, tuning, jax.random.PRNGKey(0), 20)
accs = runner._extra_accs["fiber DE"]
assert len(accs) == 4, len(accs)  # 2 chunks x 2 rounds
assert all(0.0 <= a <= 1.0 for a in accs), accs
print("OK plumbing", accs)
""", timeout=1500)
    assert "OK plumbing" in out
