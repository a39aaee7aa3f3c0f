"""Stepping-stone marginal likelihood validated on a MULTIVARIATE target.

Round 1 validated stepping stone only on a univariate case; the scheme
here (all beta points burned in independently in parallel rather than the
reference's sequential annealing, Definitions.hs:447-472) could in
principle mis-mix at small beta on a harder target.  This test computes
ln Z = ln(∫ p L / ∫ p) for a full 8-leaf dating model (full-MVN
likelihood, all priors) two independent ways:

  1. importance sampling from an exact proposal q over valid states
     (same construction as the invariance suite), with
     ln Z = logsumexp(lw + ll) - logsumexp(lw), lw = ln p - ln q;
  2. the engine's stepping-stone sampler (profile ladder).

and requires agreement within the combined Monte-Carlo error.  Runs in a
plain-CPU child (needs f64 for stable IS weights).
"""

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_stepping_stone_matches_importance_sampling():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    pp = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
          if p and "axon" not in p]
    env["PYTHONPATH"] = os.pathsep.join(
        [REPO, os.path.join(REPO, "tests")] + pp)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cpu")
    env["INVARIANCE_CHILD"] = "1"  # allow importing the invariance helpers
    code = textwrap.dedent("""
    import numpy as np
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from scipy.special import logsumexp

    import test_proposal_invariance as TI
    from mcmcdate_tpu.models import DatingModel, init_state
    from mcmcdate_tpu.ops import mvn
    from mcmcdate_tpu.tree import FlatTopology, parse_newick
    from mcmcdate_tpu.engine.chains import RunSettings
    from mcmcdate_tpu.engine.mh import BurnInSettings
    from mcmcdate_tpu.engine.stepping_stone import run_marginal_likelihood

    t = parse_newick(TI.EIGHT)
    topo = FlatTopology.from_tree(t)
    rng = np.random.default_rng(4)
    k = topo.n - 2
    # weakly informative, well-conditioned full MVN likelihood (IS from q
    # needs the posterior to overlap the prior substantially)
    a = rng.normal(size=(k, k)) / np.sqrt(k)
    sigma = a @ a.T * 0.05 + np.eye(k) * 0.05
    mu = rng.uniform(0.05, 0.35, size=k)
    data = mvn.LikelihoodData.full(mu, np.linalg.inv(sigma),
                                   np.linalg.slogdet(sigma)[1])
    model = DatingModel(topo=topo, likelihood=data)

    # --- 1) importance sampling ---
    M = 1 << 17
    batch, logq = TI._sample_q(topo, M, seed=21)

    def lp_ll(st):
        lp = model.log_prior(st)
        ll = model.log_likelihood(st)
        lp = jnp.where(jnp.isnan(lp), -jnp.inf, lp)
        ll = jnp.where(jnp.isnan(ll), -jnp.inf, ll)
        return lp, ll

    lp, ll = jax.jit(jax.vmap(lp_ll))(batch)
    lw = np.asarray(lp) - np.asarray(logq)
    ll = np.asarray(ll)
    ok = np.isfinite(lw)
    lw, ll = lw[ok], ll[ok]
    lnz_is = logsumexp(lw + ll) - logsumexp(lw)
    # Delta-method MC error of the ratio estimator.
    wp = np.exp(lw + ll - np.max(lw + ll)); wp /= wp.sum()
    w0 = np.exp(lw - np.max(lw)); w0 /= w0.sum()
    ess_p = 1.0 / np.sum(wp * wp)
    ess_0 = 1.0 / np.sum(w0 * w0)
    se = np.sqrt(1.0 / ess_p + 1.0 / ess_0)
    print(f"IS lnZ = {lnz_is:.3f} +- {se:.3f} (ESSp {ess_p:.0f}, ESS0 {ess_0:.0f})")
    assert ess_p > 200 and ess_0 > 200

    # --- 2) stepping stone (profile ladder: 12 points) ---
    s = RunSettings(analysis_name="ssmv", burn_in=BurnInSettings([20], [40]),
                    iterations=600, n_chains=1, out_dir="/tmp", seed=3)
    res = run_marginal_likelihood(model, init_state(t, topo, jnp.float32), s,
                                  profile=True, log=lambda *a: None)
    lnz_ss = res.log_marginal_likelihood
    print(f"SS lnZ = {lnz_ss:.3f}")
    err = abs(lnz_ss - lnz_is)
    # 12-point ladder discretization + SS sampling noise allowance.
    assert err < max(6 * se, 1.5), (lnz_ss, lnz_is, se)
    print("SS_MULTIVARIATE_OK", err)
    """)
    r = subprocess.run(
        [sys.executable, "-c", code],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=2400,
    )
    assert r.returncode == 0, f"child failed:\n{r.stdout[-3000:]}\n{r.stderr[-3000:]}"
    assert "SS_MULTIVARIATE_OK" in r.stdout, r.stdout[-500:]
