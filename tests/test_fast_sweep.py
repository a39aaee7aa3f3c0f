"""Fast (ticket-batched) sweep vs. the sequential reference sweep.

The batched sweep (engine/fast_sweep.py) must sample the same posterior as
the sequential MHKernel: same proposal distributions, exact prior deltas on
provably disjoint ticket sets, and exact likelihood bookkeeping through the
carried ``z = P (d - mu)`` / quadratic form with sequential-correction
accept scans.  These tests run both samplers on the same model and compare
posterior moments, and check the carried log-posterior against a direct
recomputation (any bookkeeping error accumulates there).

Runs in a plain-CPU child (the in-process axon path compiles too slowly for
the sequential reference at test sizes).
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
    assert r.returncode == 0, f"child failed:\n{r.stdout[-4000:]}\n{r.stderr[-4000:]}"
    return r.stdout


COMMON = """
import numpy as np
import jax, jax.numpy as jnp
from mcmcdate_tpu.models import DatingModel, init_state
from mcmcdate_tpu.ops import mvn
from mcmcdate_tpu.tree import FlatTopology
from mcmcdate_tpu.utils.simulate import random_ultrametric_tree
from mcmcdate_tpu.engine import proposals as P
from mcmcdate_tpu.engine.mh import MHKernel
from mcmcdate_tpu.engine.fast_sweep import FastSweeps

def build(n_leaves=10, lik="full", seed=0):
    rng = np.random.default_rng(seed)
    tree = random_ultrametric_tree(rng, n_leaves)
    topo = FlatTopology.from_tree(tree)
    k = topo.n - 2
    if lik == "full":
        a = rng.normal(size=(k, k)) / np.sqrt(k)
        sigma = a @ a.T + np.eye(k) * 0.05
        mu = rng.uniform(0.05, 0.5, size=k)
        data = mvn.LikelihoodData.full(mu, np.linalg.inv(sigma),
                                       np.linalg.slogdet(sigma)[1])
    elif lik == "uni":
        mu = rng.uniform(0.05, 0.5, size=k)
        data = mvn.LikelihoodData.univariate(
            mu, rng.uniform(0.01, 0.1, size=k) ** 2
        )
    else:
        data = mvn.LikelihoodData.none()
    model = DatingModel(topo=topo, likelihood=data)
    table = P.build_proposal_table(topo, model.braces, False)
    C = 64
    state = init_state(tree, topo, dtype=jnp.float32)
    batch = jax.tree.map(lambda x: jnp.broadcast_to(x, (C,) + x.shape), state)
    r = rng.gamma(5.0, 0.2, size=(C, topo.n)); r[:, 0] = 1.0
    batch = batch.replace(rates=jnp.asarray(r, jnp.float32))
    tuning = jnp.ones((C, table.n_proposals), jnp.float32)
    return model, table, batch, tuning, topo

def moments(kern, batch, tuning, topo, n_rounds=25, burn=5, seed=1):
    run = jax.jit(lambda b, tu, k2: kern.sweeps(b, tu, k2, 20))
    key = jax.random.PRNGKey(seed)
    hs, lp_last = [], None
    b = batch
    for it in range(n_rounds):
        key, k1 = jax.random.split(key)
        b, lp, ll, acc, tot, _ = run(b, tuning, k1)
        if it >= burn:
            hs.append(np.asarray(b.heights))
        lp_last = (b, lp, ll)
    return np.concatenate(hs), lp_last
"""


def test_fast_matches_sequential_full_likelihood():
    out = _run_child(COMMON + """
model, table, batch, tuning, topo = build(10, "full")
fast = FastSweeps(model, table)
assert fast.plan.specs, "nothing batched"
assert fast.plan.range_specs, "no range batches"
hf, (bf, lpf, llf) = moments(fast, batch, tuning, topo)
hs, _ = moments(MHKernel(model, table), batch, tuning, topo)
inner = np.asarray(topo.inner_nodes)
mf, ms = hf[:, inner].mean(0), hs[:, inner].mean(0)
se = hf[:, inner].std(0) / np.sqrt(len(hf) / 16.0)
err = np.abs(mf - ms)
assert np.all(err < 5 * np.maximum(se, 0.01)), (err, se)
# carried log posterior must match a direct recomputation
lp_direct = np.asarray(jax.vmap(model.log_posterior)(bf))
lp_carried = np.asarray(lpf + llf)
drift = np.abs(lp_direct - lp_carried).max()
assert drift < 0.05, drift
print("OK full", err.max(), drift)
""")
    assert "OK full" in out


def test_fast_matches_sequential_univariate():
    """The diagonal likelihood rides the dense batched machinery
    (P = diag(1/var)); posterior moments and carried lp must match the
    sequential O(N) reference path (VERDICT round-2 item 4)."""
    out = _run_child(COMMON + """
model, table, batch, tuning, topo = build(10, "uni")
fast = FastSweeps(model, table)
assert fast.plan.specs, "nothing batched"
hf, (bf, lpf, llf) = moments(fast, batch, tuning, topo)
hs, _ = moments(MHKernel(model, table), batch, tuning, topo)
inner = np.asarray(topo.inner_nodes)
mf, ms = hf[:, inner].mean(0), hs[:, inner].mean(0)
se = hf[:, inner].std(0) / np.sqrt(len(hf) / 16.0)
err = np.abs(mf - ms)
assert np.all(err < 5 * np.maximum(se, 0.01)), (err, se)
lp_direct = np.asarray(jax.vmap(model.log_posterior)(bf))
lp_carried = np.asarray(lpf + llf)
drift = np.abs(lp_direct - lp_carried).max()
assert drift < 0.05, drift
print("OK uni", err.max(), drift)
""")
    assert "OK uni" in out


def test_fast_matches_sequential_prior_only():
    out = _run_child(COMMON + """
model, table, batch, tuning, topo = build(10, "none")
fast = FastSweeps(model, table)
hf, (bf, lpf, llf) = moments(fast, batch, tuning, topo)
hs, _ = moments(MHKernel(model, table), batch, tuning, topo)
inner = np.asarray(topo.inner_nodes)
mf, ms = hf[:, inner].mean(0), hs[:, inner].mean(0)
se = hf[:, inner].std(0) / np.sqrt(len(hf) / 16.0)
err = np.abs(mf - ms)
assert np.all(err < 5 * np.maximum(se, 0.01)), (err, se)
lp_direct = np.asarray(jax.vmap(model.log_prior)(bf))
assert np.abs(lp_direct - np.asarray(lpf)).max() < 0.05
print("OK prior", err.max())
""")
    assert "OK prior" in out


def test_fast_with_calibrations_excludes_correctly():
    """Calibrated model policy (round 3): CONSTRAINT-involved nodes route
    to the sequential phase; CALIBRATED-only nodes batch (their soft term
    is elementwise in the node's own height and the mega-steps recompute
    it), and the run must still match the sequential reference."""
    out = _run_child(COMMON + """
import json
from mcmcdate_tpu.io.specs import load_calibrations_csv, load_constraints_csv
def _q(*a, **k): pass
rng = np.random.default_rng(3)
tree = random_ultrametric_tree(rng, 8)
topo = FlatTopology.from_tree(tree)
names = [n for n in topo.names if n]
leaves = [topo.names[i] for i in np.asarray(topo.leaf_nodes)]
# Root calibration + a NON-root-adjacent calibration (exercises the
# batched calibration slots; root-adjacent nodes are root_jac-excluded
# regardless) + a constraint (stays sequential).
con = load_constraints_csv(
    "Name,YoungA,YoungB,OldA,OldB,PM\\n"
    f"C1,{leaves[2]},{leaves[3]},{leaves[-2]},{leaves[-1]},0.05\\n",
    tree, topo, is_text=True, log=_q)
hard = set(int(x) for x in np.asarray(con.young).ravel())
hard |= set(int(x) for x in np.asarray(con.old).ravel())
parent = np.asarray(topo.parent)
end = np.asarray(topo.subtree_end)
deep = next(int(i) for i in np.asarray(topo.inner_nodes)
            if i != 0 and parent[i] != 0 and parent[parent[i]] != 0
            and i not in hard)
sub_leaves = [topo.names[j] for j in range(deep, end[deep])
              if topo.is_leaf[j]]
cal = load_calibrations_csv(
    "Name,LeafA,LeafB,Lower,LowerPM,Upper,UpperPM\\n"
    f"Root,{leaves[0]},{leaves[-1]},0.8,0.05,1.2,0.05\\n"
    f"Inner,{sub_leaves[0]},{sub_leaves[-1]},0.05,0.05,0.9,0.05\\n",
    tree, topo, is_text=True, log=_q)
model = DatingModel(topo=topo, likelihood=mvn.LikelihoodData.none(),
                    calibrations=cal, constraints=con, mean_root_height=1.0)
table = P.build_proposal_table(topo, model.braces, True)
fast = FastSweeps(model, table)
hard = set(int(x) for x in np.asarray(con.young).ravel())
hard |= set(int(x) for x in np.asarray(con.old).ravel())
cal_nodes = set(int(x) for x in np.asarray(cal.node).ravel())
batched_nodes = set()
for k, s in fast.plan.specs.items():
    if k in (P.K_SLIDE_NODE_ULTRA, P.K_SLIDE_NODES_CONTRA):
        batched_nodes |= set(s.node[s.valid].tolist())
        # constrained nodes never batch
        assert not (set(s.node[s.valid].tolist()) & hard)
# the non-root calibrated node DOES batch now
assert (cal_nodes - {0}) & batched_nodes, (cal_nodes, batched_nodes)
C = 64
state = init_state(tree, topo, dtype=jnp.float32)
batch = jax.tree.map(lambda x: jnp.broadcast_to(x, (C,) + x.shape), state)
tuning = jnp.ones((C, table.n_proposals), jnp.float32)
hf, (bf, lpf, llf) = moments(fast, batch, tuning, topo)
hs, _ = moments(MHKernel(model, table), batch, tuning, topo)
inner = np.asarray(topo.inner_nodes)
mf, ms = hf[:, inner].mean(0), hs[:, inner].mean(0)
se = hf[:, inner].std(0) / np.sqrt(len(hf) / 16.0)
err = np.abs(mf - ms)
assert np.all(err < 5 * np.maximum(se, 0.01)), (err, se)
lp_direct = np.asarray(jax.vmap(model.log_prior)(bf))
assert np.abs(lp_direct - np.asarray(lpf)).max() < 0.05
print("OK calibrated", err.max())
""")
    assert "OK calibrated" in out


@pytest.mark.fast_guard
def test_bold_contra_invariance():
    """The occasional-bold contrary mixture (MCMCDATE_BOLD_P,
    fast_sweep.BOLD_P) must leave the stationary distribution unchanged:
    a state-independent mixture of reversible kernels is reversible, and
    each component's MHG factor is computed from its own effective tune.
    Compare posterior height moments with the mixture on (p=0.25, 8x)
    vs off on a full-MVN model, and check the carried log posterior
    stays exact under bold steps.  At 10 leaves the contrary subtree
    scales split across BOTH bold sites — the batched range steps
    (_mega_range_contra) and the glob ``sub_contra`` family
    (root-adjacent subtrees) — so this covers the round-5 glob-side
    mixture and the ``bold_p`` constructor plumbing (--bold-contra)."""
    out = _run_child(COMMON + """
from mcmcdate_tpu.engine import fast_sweep as fs
model, table, batch, tuning, topo = build(10, "full", seed=2)

fast_bold = FastSweeps(model, table, bold_p=0.25)
hb, (bb, lpb, llb) = moments(fast_bold, batch, tuning, topo, n_rounds=40)
fast_plain = FastSweeps(model, table)
hp_, _ = moments(fast_plain, batch, tuning, topo, n_rounds=40)

inner = np.asarray(topo.inner_nodes)
mb, mp = hb[:, inner].mean(0), hp_[:, inner].mean(0)
se = hb[:, inner].std(0) / np.sqrt(len(hb) / 16.0)
err = np.abs(mb - mp)
assert np.all(err < 5 * np.maximum(se, 0.01)), (err, se)
lp_direct = np.asarray(jax.vmap(model.log_posterior)(bb))
drift = np.abs(lp_direct - np.asarray(lpb + llb)).max()
assert drift < 0.05, drift
print("OK bold", err.max(), drift)
""", timeout=1500)
    assert "OK bold" in out


@pytest.mark.fast_guard
def test_fiber_slide_invariance():
    """The fiber node-slide (--fiber-slide,
    FastSweeps._fiber_slide_move) must leave the stationary distribution
    unchanged: per internal node, a uniform redraw of its height over the
    valid interval with the touched branch rates rescaled to hold every
    time*rate product constant (likelihood exactly invariant), accepted on
    the prior term-delta plus the rate-map Jacobian.  Compare posterior
    height moments with the phase on (every sweep) vs off, check the moves
    accept, and check the carried log posterior stays exact (the move
    edits heights+rates+terms but must leave d/z/q/y valid)."""
    out = _run_child(COMMON + """
model, table, batch, tuning, topo = build(10, "full", seed=5)

fast_s = FastSweeps(model, table, fiber_slide=1.0)
run = jax.jit(lambda b, tu, k2: fast_s.sweeps(b, tu, k2, 20))
key = jax.random.PRNGKey(2)
hs, accs = [], []
b = batch
for it in range(40):
    key, k1 = jax.random.split(key)
    b, lp, ll, acc, tot, _, sl = run(b, tuning, k1)
    accs.append(np.asarray(sl))
    if it >= 5:
        hs.append(np.asarray(b.heights))
hf = np.concatenate(hs)
acc_mean = float(np.nanmean(np.concatenate(accs)))
assert acc_mean > 0.05, f"fiber slides never accept: {acc_mean}"

fast_plain = FastSweeps(model, table)
hp_, _ = moments(fast_plain, batch, tuning, topo, n_rounds=40)

inner = np.asarray(topo.inner_nodes)
mf, mp = hf[:, inner].mean(0), hp_[:, inner].mean(0)
se = hf[:, inner].std(0) / np.sqrt(len(hf) / 16.0)
err = np.abs(mf - mp)
assert np.all(err < 5 * np.maximum(se, 0.01)), (err, se)
lp_direct = np.asarray(jax.vmap(model.log_posterior)(b))
drift = np.abs(lp_direct - np.asarray(lp + ll)).max()
assert drift < 0.05, drift
print("OK slide", acc_mean, err.max(), drift)
""", timeout=1500)
    assert "OK slide" in out


@pytest.mark.fast_guard
def test_fast_lp_drift_quick():
    """Minutes-scale guardrail (VERDICT r3 item 10): the batched sweep's
    carried log posterior must match a direct recomputation after many
    sweeps on a full-MVN model.  Any bookkeeping error in the z/q carry,
    the mega-step cross-term corrections, or a new proposal family's
    closed-form delta accumulates here; this runs in ~1 minute where the
    full batched-vs-sequential suite takes ~15."""
    out = _run_child(COMMON + """
model, table, batch, tuning, topo = build(8, "full", seed=7)
fast = FastSweeps(model, table)
assert fast.plan.specs, "nothing batched"
run = jax.jit(lambda b, tu, k2: fast.sweeps(b, tu, k2, 20))
key = jax.random.PRNGKey(3)
b = batch
for it in range(6):
    key, k1 = jax.random.split(key)
    b, lp, ll, acc, tot, _ = run(b, tuning, k1)
lp_direct = np.asarray(jax.vmap(model.log_posterior)(b))
drift = np.abs(lp_direct - np.asarray(lp + ll)).max()
assert drift < 0.05, drift
a = np.asarray(acc).sum() / np.asarray(tot).sum()
assert 0.02 < a < 0.995, a
print("OK quick drift", drift)
""", timeout=600)
    assert "OK quick drift" in out
