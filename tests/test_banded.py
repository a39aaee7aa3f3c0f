"""Banded-precision likelihood kind (ops/banded.py).

The banded kind is the TPU-native scaling replacement for the reference's
unstructured sparse mat-vec (app/Main.hs:93-97, app/Probability.hs:178-184):
a Cholesky-banding estimator in the engine's internal pre-order layout,
evaluated everywhere through block-tridiagonal matmuls.  These tests pin

- the block kernels against dense linear algebra,
- the estimator against a known banded ground truth,
- the banded ``LikelihoodData`` against a densified FULL twin (same
  precision matrix, two evaluation paths) through ``make_log_likelihood``,
  the sequential MHKernel, and the batched FastSweeps,
- the ``.data`` round-trip.
"""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _densify_L(Lb):
    D, w1 = Lb.shape
    L = np.zeros((D, D))
    for t in range(w1):
        idx = np.arange(D - t)
        L[idx, idx + t] = Lb[: D - t, t]
    return L


def test_block_kernels_match_dense():
    import jax.numpy as jnp

    from mcmcdate_tpu.ops import banded as B

    rng = np.random.default_rng(0)
    D, w = 101, 7
    Lb = rng.normal(size=(D, w + 1)) * 0.2
    Lb[:, 0] = rng.uniform(0.8, 1.5, size=D)
    for t in range(1, w + 1):
        Lb[D - t:, t] = 0.0
    L = _densify_L(Lb)
    P = L @ L.T
    pband = B.pband_from_chol_upper(Lb)
    X = rng.normal(size=(3, D))
    for wb in (8, 16, 33):
        P3 = B.blocks_from_sym_band(pband, wb)
        out = np.asarray(B.block_tridiag_matmul(jnp.asarray(X), jnp.asarray(P3), D))
        np.testing.assert_allclose(out, X @ P, rtol=0, atol=2e-5)
        outT = np.asarray(
            B.block_tridiag_matmul_t(jnp.asarray(X), jnp.asarray(P3), D)
        )
        np.testing.assert_allclose(outT, X @ P.T, rtol=0, atol=2e-5)
        L3 = B.blocks_from_upper_band(Lb, wb)
        outL = np.asarray(B.block_tridiag_matmul(jnp.asarray(X), jnp.asarray(L3), D))
        np.testing.assert_allclose(outL, X @ L, rtol=0, atol=2e-5)
        outLT = np.asarray(
            B.block_tridiag_matmul_t(jnp.asarray(X), jnp.asarray(L3), D)
        )
        np.testing.assert_allclose(outLT, X @ L.T, rtol=0, atol=2e-5)
    pmv = B.sym_band_matvec(pband, X[0])
    np.testing.assert_allclose(pmv, P @ X[0], rtol=1e-12, atol=1e-12)


def test_estimator_recovers_banded_truth():
    from mcmcdate_tpu.ops import banded as B

    rng = np.random.default_rng(1)
    D, w, n = 60, 4, 60000
    Lb_true = rng.normal(size=(D, w + 1)) * 0.25
    Lb_true[:, 0] = rng.uniform(0.9, 1.4, size=D)
    for t in range(1, w + 1):
        Lb_true[D - t:, t] = 0.0
    L = _densify_L(Lb_true)
    P = L @ L.T
    Sig = np.linalg.inv(P)
    mu_true = rng.normal(size=D)
    xs = rng.multivariate_normal(mu_true, Sig, size=n)
    mu, Lb, ld = B.estimate_banded_chol(xs, w, ridge=1e-6)
    np.testing.assert_allclose(mu, mu_true, atol=0.05)
    P_est = _densify_L(Lb) @ _densify_L(Lb).T
    # Relative Frobenius error of the precision estimate at n=60k samples.
    rel = np.linalg.norm(P_est - P) / np.linalg.norm(P)
    assert rel < 0.05, rel
    assert abs(ld - np.linalg.slogdet(Sig)[1]) < 0.5


def test_likelihood_data_matches_densified_full():
    import jax.numpy as jnp

    from mcmcdate_tpu.ops import banded as B
    from mcmcdate_tpu.ops import mvn

    rng = np.random.default_rng(2)
    D, w = 48, 5
    Lb = rng.normal(size=(D, w + 1)) * 0.2
    Lb[:, 0] = rng.uniform(0.8, 1.5, size=D)
    for t in range(1, w + 1):
        Lb[D - t:, t] = 0.0
    L = _densify_L(Lb)
    P_int = L @ L.T
    ld = -np.linalg.slogdet(P_int)[1]
    perm = rng.permutation(D)
    mu_ref = rng.uniform(0.05, 0.5, size=D)
    # FULL twin in reference order: P_ref[perm, perm] = P_int
    iperm = np.argsort(perm)
    P_ref = P_int[np.ix_(iperm, iperm)]
    banded = mvn.LikelihoodData.banded(mu_ref, Lb, ld, perm)
    full = mvn.LikelihoodData.full(mu_ref, P_ref, ld)
    f_b = mvn.make_log_likelihood(banded, dtype=jnp.float32)
    f_f = mvn.make_log_likelihood(full, dtype=jnp.float32)
    d = jnp.asarray(rng.uniform(0.05, 0.6, size=(7, D)), jnp.float32)
    lb, lf = np.asarray(f_b(d)), np.asarray(f_f(d))
    np.testing.assert_allclose(lb, lf, rtol=0, atol=0.02)
    assert banded.dim == D


def test_data_file_round_trip(tmp_path):
    from mcmcdate_tpu.io.lhdata import load_data, save_data
    from mcmcdate_tpu.ops import mvn

    rng = np.random.default_rng(3)
    D, w = 20, 3
    Lb = rng.normal(size=(D, w + 1)) * 0.2
    Lb[:, 0] = 1.0
    data = mvn.LikelihoodData.banded(
        rng.uniform(size=D), Lb, -1.25, rng.permutation(D)
    )
    p = str(tmp_path / "x.data")
    save_data(p, data)
    back = load_data(p)
    assert back.kind == mvn.BANDED
    assert back.bandwidth == w
    np.testing.assert_allclose(back.band_chol, data.band_chol)
    np.testing.assert_array_equal(back.band_perm, data.band_perm)
    assert back.log_det_sigma == data.log_det_sigma


def test_cli_spec_parse():
    from mcmcdate_tpu.cli import _parse_likelihood_spec
    from mcmcdate_tpu.ops import mvn

    assert _parse_likelihood_spec("banded") == (mvn.BANDED, 128.0)
    assert _parse_likelihood_spec("banded 64") == (mvn.BANDED, 64.0)
    assert _parse_likelihood_spec("b 32") == (mvn.BANDED, 32.0)
    assert _parse_likelihood_spec("sparse") == (mvn.SPARSE, 0.1)


# -- sampler equivalence: banded vs densified FULL twin --------------------
#
# Both kernels run on the SAME precision matrix; only the evaluation path
# differs (block-tridiagonal vs dense).  Runs in a plain-CPU child like
# tests/test_fast_sweep.py.


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


CHILD = """
import numpy as np
import jax, jax.numpy as jnp
from mcmcdate_tpu.models import DatingModel, init_state
from mcmcdate_tpu.ops import mvn, banded as B
from mcmcdate_tpu.tree import FlatTopology
from mcmcdate_tpu.utils.simulate import random_ultrametric_tree
from mcmcdate_tpu.engine import proposals as P
from mcmcdate_tpu.engine.mh import MHKernel
from mcmcdate_tpu.engine.fast_sweep import FastSweeps

rng = np.random.default_rng(0)
tree = random_ultrametric_tree(rng, 10)
topo = FlatTopology.from_tree(tree)
k = topo.n - 2
perm = topo.ref_to_internal_perm
# correlated branch data -> banded estimate in the internal layout
xs = rng.normal(size=(2000, k)) * 0.1 + rng.uniform(0.05, 0.5, size=k)
for i in range(1, k):
    xs[:, i] += 0.5 * xs[:, i - 1]
w = 5
mu_int, Lb, ld = B.estimate_banded_chol(xs[:, perm], w)
mu_ref = xs.mean(axis=0)
banded = mvn.LikelihoodData.banded(mu_ref, Lb, ld, perm)
# densified FULL twin: same precision, reference order
L = np.zeros((k, k))
for t in range(w + 1):
    idx = np.arange(k - t)
    L[idx, idx + t] = Lb[:k - t, t]
P_int = L @ L.T
iperm = np.argsort(perm)
P_ref = P_int[np.ix_(iperm, iperm)]
full = mvn.LikelihoodData.full(mu_ref, P_ref, ld)

def build(data):
    model = DatingModel(topo=topo, likelihood=data)
    table = P.build_proposal_table(topo, model.braces, False)
    C = 48
    state = init_state(tree, topo, dtype=jnp.float32)
    batch = jax.tree.map(lambda x: jnp.broadcast_to(x, (C,) + x.shape), state)
    r2 = np.random.default_rng(7).gamma(5.0, 0.2, size=(C, topo.n))
    r2[:, 0] = 1.0
    batch = batch.replace(rates=jnp.asarray(r2, jnp.float32))
    tuning = jnp.ones((C, table.n_proposals), jnp.float32)
    return model, table, batch, tuning

def moments(kern_cls, data, n_rounds=20, burn=4):
    model, table, batch, tuning = build(data)
    kern = kern_cls(model, table)
    run = jax.jit(lambda b, tu, k2: kern.sweeps(b, tu, k2, 10))
    key = jax.random.PRNGKey(1)
    hs = []
    lp_gap = 0.0
    for i in range(n_rounds):
        key, k2 = jax.random.split(key)
        out = run(batch, tuning, k2)
        batch, lp_pr, lp_lik = out[0], out[1], out[2]
        if i >= burn:
            hs.append(np.asarray(batch.heights))
        # carried vs direct recomputation (accumulating bookkeeping error)
        lik_direct = jax.vmap(model.log_likelihood)(batch)
        lp_gap = max(lp_gap, float(jnp.max(jnp.abs(lp_lik - lik_direct))))
    hs = np.concatenate(hs, axis=0)
    return hs.mean(axis=0), hs.std(axis=0), lp_gap

mb, sb, gap_b = moments(FastSweeps, banded)
mf, sf, gap_f = moments(FastSweeps, full)
print("gap banded", gap_b, "gap full", gap_f)
assert gap_b < 5e-3, gap_b
err = np.max(np.abs(mb - mf) / np.maximum(sf / np.sqrt(400), 1e-6))
print("fast banded-vs-full mean err (se units):", err)
assert np.max(np.abs(mb - mf)) < 0.06, (mb, mf)

ms, ss, gap_s = moments(MHKernel, banded, n_rounds=20, burn=4)
print("gap seq banded", gap_s)
assert gap_s < 5e-3, gap_s
assert np.max(np.abs(ms - mf)) < 0.06, (ms, mf)
print("OK")
"""


@pytest.mark.fast_guard
def test_banded_sampler_equivalence():
    out = _run_child(CHILD)
    assert "OK" in out
