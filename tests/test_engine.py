"""Engine validation: the sampler must reproduce exact prior marginals.

The golden values are computed by importance sampling from the analytic
prior of a balanced 4-leaf tree (Exp(1) birth/death, birth-death tree
density, Exp(1) rate mean, Gamma(3/2, 1/6) rate variance, UncorrelatedGamma
clock), with IS effective sample size ~1.5M:

    E[x] = E[y] = 0.4119 / 0.4121   (inner node heights)
    E[birth] = 0.92615, E[death] = 0.41654
    E[rate_mean] = 1 (exact), E[rate_var] = 0.25 (exact)

This exercises every proposal kind's Hastings factor and Jacobian: a wrong
exponent anywhere shifts these marginals by many standard errors.  Root
Jacobians are disabled here — they deliberately tilt the invariant measure
of root-adjacent proposals (jacobianRootBranch, app/Probability.hs:408-410)
and are validated separately for parity.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mcmcdate_tpu.engine import mh, proposals as P
from mcmcdate_tpu.models import DatingModel, init_state, is_valid_state
from mcmcdate_tpu.ops import mvn
from mcmcdate_tpu.tree import FlatTopology, parse_newick

FOUR = "((a:0.5,b:0.5):0.5,(c:0.5,d:0.5):0.5):0.0;"

GOLD = dict(
    hx=0.41182, hy=0.41205, birth=0.92615, death=0.41654,
    rate_mean=1.0, rate_var=0.25,
)


@pytest.fixture(scope="module")
def setup():
    t = parse_newick(FOUR)
    topo = FlatTopology.from_tree(t)
    model = DatingModel(topo=topo, likelihood=mvn.LikelihoodData.none())
    tb = P.build_proposal_table(topo, model.braces, calibrations_available=False)
    table = P.ProposalTable(
        tb.kind, tb.node, tb.aux, tb.par, tb.weight, tb.dim,
        np.zeros_like(tb.root_jac), tb.names, tb.tickets,
    )
    return t, topo, model, table


def _init_batch(t, topo, C, seed=0):
    state = init_state(t, topo, dtype=jnp.float32)
    batch = jax.tree.map(lambda x: jnp.broadcast_to(x, (C,) + x.shape), state)
    r = np.random.default_rng(seed).gamma(5.0, 0.2, size=(C, topo.n))
    r[:, 0] = 1.0
    return batch.replace(rates=jnp.asarray(r, jnp.float32))


def test_sweep_smoke(setup):
    t, topo, model, table = setup
    kern = mh.MHKernel(model, table)
    batch = _init_batch(t, topo, 4)
    tuning = jnp.ones((4, table.n_proposals), jnp.float32)
    out = jax.jit(lambda b, tu, k: kern.sweeps(b, tu, k, 5))(
        batch, tuning, jax.random.PRNGKey(0)
    )
    batch2, lp_pr, lp_lik, acc, tot, _ = out
    assert np.all(np.isfinite(np.asarray(lp_pr)))
    assert np.asarray(tot).sum() == 4 * 5 * table.n_tickets
    a = np.asarray(acc).sum() / np.asarray(tot).sum()
    assert 0.05 < a < 0.99
    ok = jax.vmap(lambda s: is_valid_state(s, topo))(batch2)
    assert bool(np.all(np.asarray(ok)))


def test_prior_marginals_match_golden(setup):
    """End-to-end statistical validation of all proposal kinds."""
    t, topo, model, table = setup
    kern = mh.MHKernel(model, table)
    C = 24
    batch = _init_batch(t, topo, C)
    tuning = jnp.ones((C, table.n_proposals), jnp.float32)
    targets = jnp.asarray(table.target_rates(), jnp.float32)
    tmax = jnp.asarray(table.tune_max(), jnp.float32)

    def collect(s, lp_pr, lp_lik):
        return dict(
            birth=s.birth, death=s.death, rate_mean=s.rate_mean,
            rate_var=s.rate_var, hx=s.heights[1], hy=s.heights[4],
        )

    chunk = jax.jit(lambda b, tu, k: kern.sweeps(b, tu, k, 50, collect=collect))
    tune = jax.jit(
        lambda tu, a, to: mh.tune_step(
            tu, a.astype(jnp.float32), to.astype(jnp.float32), targets,
            tune_max=tmax,
        )
    )
    key = jax.random.PRNGKey(7)
    for _ in range(14):
        key, k = jax.random.split(key)
        batch, _, _, acc, tot, _ = chunk(batch, tuning, k)
        tuning = tune(tuning, acc, tot)
    samples = []
    for _ in range(50):
        key, k = jax.random.split(key)
        batch, _, _, acc, tot, outs = chunk(batch, tuning, k)
        samples.append(jax.tree.map(np.asarray, outs))
    for name, gold in GOLD.items():
        draws = np.concatenate([s[name] for s in samples], axis=0)  # [T, C]
        per_chain = draws.mean(axis=0)
        se = max(per_chain.std() / np.sqrt(C), 1e-9)
        z = (draws.mean() - gold) / se
        assert abs(z) < 6.0, f"{name}: mean {draws.mean():.4f} vs {gold} (z={z:+.1f})"


def test_incremental_likelihood_matches_full():
    """The incrementally-carried whitened residual must match a fresh full
    evaluation after many sweeps (validates the DC_* classification: the
    invariance claims for contrary kernels and the gather/range updates)."""
    from mcmcdate_tpu.utils.simulate import random_ultrametric_tree

    rng = np.random.default_rng(1)
    t = random_ultrametric_tree(rng, 12)
    topo = FlatTopology.from_tree(t)
    k = topo.n - 2
    a = rng.normal(size=(k, k)) / np.sqrt(k)
    sigma = a @ a.T + np.eye(k) * 0.1
    data = mvn.LikelihoodData.full(
        rng.uniform(0.05, 0.6, size=k), np.linalg.inv(sigma),
        np.linalg.slogdet(sigma)[1],
    )
    model = DatingModel(topo=topo, likelihood=data)
    table = P.build_proposal_table(topo, model.braces, False)
    # Every class must actually occur on this tree.
    present = set(int(c) for c in table.d_class)
    assert {P.DC_INV, P.DC_FULL, P.DC_GATHER, P.DC_B64} <= present
    kern = mh.MHKernel(model, table)
    C = 8
    state = init_state(t, topo, dtype=jnp.float32)
    batch = jax.tree.map(lambda x: jnp.broadcast_to(x, (C,) + x.shape), state)
    r = rng.gamma(5.0, 0.2, size=(C, topo.n))
    r[:, 0] = 1.0
    batch = batch.replace(rates=jnp.asarray(r, jnp.float32))
    tuning = jnp.ones((C, table.n_proposals), jnp.float32)
    out = jax.jit(lambda b, tu, kk: kern.sweeps(b, tu, kk, 20))(
        batch, tuning, jax.random.PRNGKey(0)
    )
    batch2, lp_pr, lp_lik, acc, tot, _ = out
    lp_fresh = np.asarray(jax.jit(jax.vmap(model.log_likelihood))(batch2))
    assert np.max(np.abs(np.asarray(lp_lik) - lp_fresh)) < 0.05
    # Internal permutation preserves the quadratic form exactly.
    y_int = np.asarray(jax.vmap(model.whitened_residual_internal)(batch2))
    y_ref = np.asarray(jax.vmap(model.whitened_residual)(batch2))
    assert np.allclose((y_int**2).sum(1), (y_ref**2).sum(1), rtol=1e-4)


def test_tuning_moves_toward_target():
    tuning = jnp.ones(3)
    targets = jnp.asarray([0.44, 0.44, 0.44])
    acc = jnp.asarray([90.0, 10.0, 44.0])
    tot = jnp.asarray([100.0, 100.0, 100.0])
    new = mh.tune_step(tuning, acc, tot, targets)
    assert float(new[0]) > 1.0  # too many acceptances -> larger steps
    assert float(new[1]) < 1.0
    assert abs(float(new[2]) - 1.0) < 0.01


def test_table_structure(setup):
    t, topo, model, table = setup
    assert table.n_proposals > 10
    assert table.n_tickets == int(table.weight.sum())
    # Root-adjacent tree proposals carry the root-branch Jacobian flag in the
    # default (non-neutered) table.
    tb = P.build_proposal_table(topo, model.braces, calibrations_available=True)
    names = [n for n, rj in zip(tb.names, tb.root_jac) if rj]
    assert any("[R]" in n for n in names)
    # Calibrated tables add height proposals.
    assert any("Time height" in n for n in tb.names)
    tb2 = P.build_proposal_table(topo, model.braces, calibrations_available=False)
    assert not any("Time height" == n for n in tb2.names)
    assert tb.n_proposals > tb2.n_proposals
