"""NUTS exactness harness (round-4 hardening).

The 4-dim Gaussian smoke test in test_samplers.py has 25% tolerances; the
production NUTS kernel runs on ~2k-dim dating states, so it needs the same
class of evidence as the MH kernels:

1. a 64-dim correlated, anisotropic Gaussian with TIGHT moment and
   quantile assertions (cross-chain standard errors, |z| < 6; sd within
   5%; 5%/95% quantiles within 6 standard errors of their MC noise);
2. a prior-only dating-state marginal test against the importance-sampling
   goldens that adjudicate every MH kernel (tests/test_engine.py GOLD).

Both run in a plain-CPU child (native f64, local compiles; the axon TPU
tunnel emulates f64 at prohibitive compile cost).
"""

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_child(code: str, timeout=1800):
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


def test_nuts_highdim_correlated_gaussian():
    """64-dim anisotropic AR(1)-correlated Gaussian, adapted step size and
    true diagonal masses: pooled means, sds, and tail quantiles must match
    the analytic values within Monte-Carlo error."""
    out = _run_child("""
    import numpy as np
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from mcmcdate_tpu.engine import hmc

    DIM, C, WARM, DRAWS = 64, 48, 200, 600
    rho = 0.9
    scales = np.exp(np.linspace(np.log(0.25), np.log(4.0), DIM))
    corr = rho ** np.abs(np.subtract.outer(np.arange(DIM), np.arange(DIM)))
    cov = corr * np.outer(scales, scales)
    prec = jnp.asarray(np.linalg.inv(cov))
    mean = jnp.asarray(np.where(np.arange(DIM) % 2 == 0, 1.0, -1.0) * scales)

    def logp(q):
        d = q - mean
        return -0.5 * d @ prec @ d

    kern = hmc.nuts_kernel(logp, max_depth=8)
    # True diagonal masses (what cross-chain variance adaptation converges
    # to): inv_mass = marginal variances.
    im = jnp.asarray(np.diag(cov))
    step = jax.jit(jax.vmap(lambda k, q, e: kern(k, q, e, im),
                            in_axes=(0, 0, None)))

    key = jax.random.PRNGKey(0)
    q = jnp.zeros((C, DIM))
    eps = 0.5
    da = hmc.DualAveraging.init(eps)
    for _ in range(WARM):
        key, k = jax.random.split(key)
        q, astat, _ = step(jax.random.split(k, C), q, jnp.float64(eps))
        eps, da = da.update(float(jnp.mean(astat)))
    eps = da.final_eps
    print(f"adapted eps {eps:.4f}")

    def scan_draws(key, q):
        def body(c, k):
            q = c
            q2, astat, _ = step(jax.random.split(k, C), q, jnp.float64(eps))
            return q2, (q2, astat)
        _, (draws, astats) = jax.lax.scan(body, q, jax.random.split(key, DRAWS))
        return draws, astats

    draws, astats = jax.jit(scan_draws)(key, q)   # [DRAWS, C, DIM]
    draws = np.asarray(draws)
    print(f"mean accept-stat {float(np.mean(np.asarray(astats))):.3f}")

    true_sd = np.sqrt(np.diag(cov))
    # Means: cross-chain SE (per-chain means are iid across chains).
    chain_means = draws.mean(axis=0)              # [C, DIM]
    se = chain_means.std(axis=0) / np.sqrt(C) + 1e-12
    z = (draws.mean(axis=(0, 1)) - np.asarray(mean)) / se
    print(f"max |z| mean: {np.abs(z).max():.2f}")
    assert np.abs(z).max() < 6.0, z

    got_sd = draws.reshape(-1, DIM).std(axis=0)
    rel = got_sd / true_sd
    print(f"sd ratio range [{rel.min():.3f}, {rel.max():.3f}]")
    assert np.all(np.abs(rel - 1.0) < 0.05), rel

    # Tail quantiles: cross-chain SE of per-chain quantiles.
    from scipy.special import ndtri
    for p in (0.05, 0.95):
        want = np.asarray(mean) + true_sd * float(ndtri(p))
        chain_q = np.quantile(draws, p, axis=0)   # [C, DIM]
        seq = chain_q.std(axis=0) / np.sqrt(C) + 1e-12
        zq = (np.quantile(draws.reshape(-1, DIM), p, axis=0) - want) / seq
        print(f"q{int(p * 100)} max |z|: {np.abs(zq).max():.2f}")
        assert np.abs(zq).max() < 6.0, zq
    print("NUTS_GAUSS_OK")
    """)
    assert "NUTS_GAUSS_OK" in out, out[-500:]


def test_nuts_prior_marginals_match_golden():
    """NUTS alone on the prior-only 4-leaf dating model must reproduce the
    importance-sampling golden marginals (tests/test_engine.py GOLD) — the
    same bar every MH proposal kind passes."""
    out = _run_child("""
    import numpy as np
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from mcmcdate_tpu.engine import hmc
    from mcmcdate_tpu.models import DatingModel, init_state
    from mcmcdate_tpu.ops import mvn
    from mcmcdate_tpu.tree import FlatTopology, parse_newick

    FOUR = "((a:0.5,b:0.5):0.5,(c:0.5,d:0.5):0.5):0.0;"
    GOLD = dict(hx=0.41182, hy=0.41205, birth=0.92615, death=0.41654,
                rate_mean=1.0, rate_var=0.25)

    t = parse_newick(FOUR)
    topo = FlatTopology.from_tree(t)
    model = DatingModel(topo=topo, likelihood=mvn.LikelihoodData.none())
    coords = hmc.FlatCoords(model, calibrated=False)
    template = init_state(t, topo, dtype=jnp.float64)

    # Plain prior target (no root-branch Jacobian): the goldens were
    # computed for the untilted prior (test_engine.py zeroes root_jac).
    def logp(v):
        s = coords.from_vector(template, v)
        lp = model.log_prior(s)
        return jnp.where(jnp.isnan(lp), -jnp.inf, lp)

    kern = hmc.nuts_kernel(logp, max_depth=8)
    C, WARM, DRAWS = 64, 240, 800
    rng = np.random.default_rng(3)

    # Dispersed valid starts.
    qs = []
    for c in range(C):
        s = template.replace(
            birth=jnp.float64(rng.exponential(1.0) + 0.1),
            death=jnp.float64(rng.exponential(1.0) + 0.1),
            rate_mean=jnp.float64(rng.uniform(0.5, 2.0)),
            rate_var=jnp.float64(rng.uniform(0.1, 0.5)),
            heights=template.heights * 1.0,
            rates=jnp.asarray(rng.gamma(5.0, 0.2, topo.n)),
        )
        qs.append(coords.to_vector(s))
    q = jnp.stack(qs)

    im = jnp.ones(coords.dim)
    def step_fn(k, q, eps, im):
        return kern(k, q, eps, im)

    step = jax.jit(jax.vmap(step_fn, in_axes=(0, 0, None, None)))
    key = jax.random.PRNGKey(11)
    eps = 0.02
    da = hmc.DualAveraging.init(eps)
    for i in range(WARM):
        key, k = jax.random.split(key)
        q, astat, _ = step(jax.random.split(k, C), q, jnp.float64(eps), im)
        eps, da = da.update(float(jnp.mean(astat)))
        if i in (80, 160):  # cross-chain mass adaptation, two windows
            im = jnp.asarray(np.var(np.asarray(q), axis=0) + 1e-6)
    eps = da.final_eps
    print(f"adapted eps {eps:.4f}")

    def scan_draws(key, q):
        def body(c, k):
            q2, astat, _ = step(jax.random.split(k, C), c,
                                jnp.float64(eps), im)
            return q2, (q2, astat)
        _, (draws, astats) = jax.lax.scan(body, q, jax.random.split(key, DRAWS))
        return draws, astats

    draws, astats = jax.jit(scan_draws)(key, q)   # [DRAWS, C, dim]
    print(f"mean accept-stat {float(np.mean(np.asarray(astats))):.3f}")
    draws = np.asarray(draws)

    # Unpack named marginals from the flat coordinates.
    hidx = {int(n): 4 + j for j, n in enumerate(coords.height_idx)}
    named = dict(
        birth=draws[:, :, 0], death=draws[:, :, 1],
        rate_mean=draws[:, :, 2], rate_var=draws[:, :, 3],
        hx=draws[:, :, hidx[1]], hy=draws[:, :, hidx[4]],
    )
    for name, gold in GOLD.items():
        x = named[name]
        se = x.mean(axis=0).std() / np.sqrt(C) + 1e-12
        z = (x.mean() - gold) / se
        print(f"{name}: mean {x.mean():.5f} vs {gold} (z {z:+.2f})")
        assert abs(z) < 6.0, (name, x.mean(), gold, z)
    print("NUTS_GOLD_OK")
    """)
    assert "NUTS_GOLD_OK" in out, out[-800:]
