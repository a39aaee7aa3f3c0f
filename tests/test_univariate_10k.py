"""Univariate likelihood at 10k taxa: O(N) memory and compute.

The reference evaluates the univariate (diagonal) likelihood in O(N)
(Probability.hs:186-193); round 1 materialized a dense (N-2)^2 diagonal
matrix (~1.6 GB at 10k taxa).  This exercises the O(N) path end-to-end at
10,000 leaves: model construction, log-likelihood evaluation, whitened
residual, and MH sweeps through the sequential kernel's diagonal fast
path — asserting no quadratic-size allocation exists on the way.

Runs in a plain-CPU child (one real sweep at this scale compiles and runs
fine on CPU; the point is memory/asymptotics, not speed).
"""

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_univariate_10k_taxa_o_n():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    pp = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
          if p and "axon" not in p]
    env["PYTHONPATH"] = os.pathsep.join([REPO] + pp)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cpu")
    code = textwrap.dedent("""
    import resource
    import numpy as np
    import jax, jax.numpy as jnp
    from mcmcdate_tpu.models import DatingModel, init_state
    from mcmcdate_tpu.ops import mvn
    from mcmcdate_tpu.tree import FlatTopology
    from mcmcdate_tpu.utils.simulate import random_ultrametric_tree
    from mcmcdate_tpu.engine import proposals as P
    from mcmcdate_tpu.engine.mh import MHKernel

    N = 10_000
    rng = np.random.default_rng(0)
    tree = random_ultrametric_tree(rng, N)
    topo = FlatTopology.from_tree(tree)
    k = topo.n - 2
    mu = rng.uniform(0.05, 0.5, size=k)
    var = rng.uniform(1e-4, 1e-2, size=k)
    data = mvn.LikelihoodData.univariate(mu, var)
    model = DatingModel(topo=topo, likelihood=data)

    # O(N) accessors only; the dense Cholesky must not exist for this kind.
    assert model.chol_internal is None
    assert model.inv_sd_internal.shape == (k,)

    state = init_state(tree, topo, dtype=jnp.float32)
    C = 8
    batch = jax.tree.map(lambda x: jnp.broadcast_to(x, (C,) + x.shape), state)
    r = rng.gamma(5.0, 0.2, size=(C, topo.n)).astype(np.float32)
    r[:, 0] = 1.0
    batch = batch.replace(rates=jnp.asarray(r))

    ll = jax.jit(jax.vmap(model.log_likelihood))(batch)
    assert ll.shape == (C,) and bool(np.all(np.isfinite(np.asarray(ll))))
    y = jax.jit(jax.vmap(model.whitened_residual_internal))(batch)
    assert y.shape == (C, k)

    # One real sweep chunk through the sequential kernel's diagonal path
    # (a hand-built sub-table keeps the 10k-scale program small).
    table = P.build_proposal_table(topo, model.braces, False)
    keep = np.nonzero(np.isin(np.asarray(table.kind),
                              [P.K_SLIDE_NODE_ULTRA,
                               P.K_SCALE_BRANCH_RATE]))[0][:50]
    from mcmcdate_tpu.engine.fast_sweep import _subset_table
    sub = _subset_table(table, keep.astype(np.int32))
    kern = MHKernel(model, sub)
    tuning = jnp.ones((C, sub.n_proposals), jnp.float32)
    out = jax.jit(lambda b, tu, k2: kern.sweeps(b, tu, k2, 1))(
        batch, tuning, jax.random.PRNGKey(0)
    )
    lp = np.asarray(out[1] + out[2])
    assert np.all(np.isfinite(lp)), lp

    # Peak RSS stays far below what a dense (N-2)^2 f32 matrix needs
    # (1.6 GB) plus baseline; the whole process must fit comfortably.
    peak_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    assert peak_gb < 4.0, f"peak RSS {peak_gb:.2f} GB suggests O(N^2) blowup"
    print(f"UNIVARIATE_10K_OK peak_rss={peak_gb:.2f}GB")
    """)
    r = subprocess.run(
        [sys.executable, "-c", code],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=1800,
    )
    assert r.returncode == 0, f"child failed:\n{r.stdout[-3000:]}\n{r.stderr[-3000:]}"
    assert "UNIVARIATE_10K_OK" in r.stdout, r.stdout[-500:]
