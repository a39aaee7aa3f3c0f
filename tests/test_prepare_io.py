"""Tests for the prepare pipeline, spec loading, glasso, and .data I/O."""

import json
import math
import os

import numpy as np
import pytest

from mcmcdate_tpu import prepare as P
from mcmcdate_tpu.io import lhdata
from mcmcdate_tpu.io.specs import (
    SpecError,
    load_braces_json,
    load_calibrations_csv,
    load_calibrations_tree,
    load_constraints_csv,
    mean_root_height,
)
from mcmcdate_tpu.ops import mvn
from mcmcdate_tpu.tree import FlatTopology, parse_newick, write_newick
from mcmcdate_tpu.utils import glasso as G
from mcmcdate_tpu.utils.simulate import simulate, write_fixture

SIX = "(((a:0.33,b:0.33):0.33,(c:0.33,d:0.33):0.33):0.34,(e:0.33,f:0.33):0.67):0.0;"


def _quiet(*a, **k):
    pass


# ---------------------------------------------------------------------------
# Specs
# ---------------------------------------------------------------------------


def test_load_calibrations_csv():
    t = parse_newick(SIX)
    topo = FlatTopology.from_tree(t)
    text = (
        "Name,LeafA,LeafB,Lower,LowerPM,Upper,UpperPM\n"
        "CladeRoot,a,f,0.8,0.025,1.2,0.025\n"
        "OnlyLower,a,b,0.1,0.01,,\n"
    )
    cal = load_calibrations_csv(text, t, topo, is_text=True, log=_quiet)
    assert cal.n == 2
    assert cal.node[0] == 0  # MRCA(a, f) is the root
    assert cal.lower[0] == 0.8 and cal.upper[0] == 1.2
    assert not np.isfinite(cal.upper[1])
    assert mean_root_height(cal) == pytest.approx(1.0)


def test_load_calibrations_duplicate_errors():
    t = parse_newick(SIX)
    topo = FlatTopology.from_tree(t)
    text = (
        "Name,LeafA,LeafB,Lower,LowerPM,Upper,UpperPM\n"
        "A,a,f,0.8,0.025,1.2,0.025\n"
        "B,a,e,0.7,0.025,1.3,0.025\n"
    )
    with pytest.raises(SpecError):
        load_calibrations_csv(text, t, topo, is_text=True, log=_quiet)
    cal = load_calibrations_csv(
        text, t, topo, is_text=True, ignore_problematic=True, log=_quiet
    )
    assert cal.n == 2


def test_load_calibrations_tree(tmp_path):
    s = (
        "(((a:0.3,b:0.3):0.3,(c:0.3,d:0.3):0.3):0.3,(e:0.3,f:0.3):0.6)"
        "'B(0.8,1.2,0.025,0.025)':0.0;"
    )
    p = tmp_path / "cal.tree"
    p.write_text(s)
    t = parse_newick(SIX)
    topo = FlatTopology.from_tree(t)
    cal = load_calibrations_tree(str(p), t, topo, log=_quiet)
    assert cal.n == 1
    assert cal.node[0] == 0
    assert cal.lower[0] == 0.8 and cal.upper[0] == 1.2
    assert cal.lower_pm[0] == 0.025


def test_load_calibrations_tree_LU(tmp_path):
    s = "(((a:1,b:1)'L(0.5)':1,(c:1,d:1)'U(2.0,0.05)':1):1,(e:1,f:1):2):0.0;"
    p = tmp_path / "cal.tree"
    p.write_text(s)
    t = parse_newick(SIX)
    topo = FlatTopology.from_tree(t)
    cal = load_calibrations_tree(str(p), t, topo, log=_quiet)
    assert cal.n == 2
    by_name = dict(zip(cal.names, range(cal.n)))
    i = by_name["a-b"]
    assert cal.lower[i] == 0.5 and cal.lower_pm[i] == 0.01  # default pm
    assert not np.isfinite(cal.upper[i])
    j = by_name["c-d"]
    assert cal.upper[j] == 2.0 and cal.upper_pm[j] == 0.05


def test_load_constraints():
    t = parse_newick(SIX)
    topo = FlatTopology.from_tree(t)
    text = (
        "Name,YoungA,YoungB,OldA,OldB,PM\n"
        "C1,a,b,e,f,0.025\n"  # (a,b) younger than (e,f)
        "Red,a,d,a,b,0.025\n"  # old=MRCA(a,b) is BELOW young=MRCA(a,d): redundant? no:
    )
    # MRCA(a,d) is an ancestor of MRCA(a,b) -> young ancestor of old is an error;
    # here young=MRCA(a,d), old=MRCA(a,b): young IS ancestor of old -> error.
    with pytest.raises(SpecError):
        load_constraints_csv(text, t, topo, is_text=True, log=_quiet)
    text_ok = (
        "Name,YoungA,YoungB,OldA,OldB,PM\n"
        "C1,a,b,e,f,0.025\n"
        "Red,a,b,a,d,0.025\n"  # old is an ancestor of young: redundant, dropped
        "Dup,a,b,e,f,0.05\n"  # duplicate pair, dropped
    )
    con = load_constraints_csv(text_ok, t, topo, is_text=True, log=_quiet)
    assert con.n == 1
    assert con.names == ("C1",)


def test_load_braces():
    t = parse_newick(SIX)
    topo = FlatTopology.from_tree(t)
    text = json.dumps(
        [
            {
                "braceDataName": "Brace",
                "braceDataNodes": [["a", "b"], ["c", "d"]],
                "braceDataStandardDeviation": 1e-4,
            }
        ]
    )
    br = load_braces_json(text, t, topo, is_text=True, log=_quiet)
    assert br.n == 1
    assert br.node.shape == (1, 2)
    assert br.sd[0] == 1e-4
    bad = json.dumps(
        [
            {
                "braceDataName": "Anc",
                "braceDataNodes": [["a", "b"], ["a", "d"]],
                "braceDataStandardDeviation": 1e-4,
            }
        ]
    )
    with pytest.raises(SpecError):
        load_braces_json(bad, t, topo, is_text=True, log=_quiet)


# ---------------------------------------------------------------------------
# Likelihood data round-trip
# ---------------------------------------------------------------------------


def test_lhdata_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    k = 5
    a = rng.normal(size=(k, k))
    sigma = a @ a.T + k * np.eye(k)
    prec = np.linalg.inv(sigma)
    mu = rng.uniform(size=k)
    ld = np.linalg.slogdet(sigma)[1]

    for data in [
        mvn.LikelihoodData.full(mu, prec, ld),
        mvn.LikelihoodData.univariate(mu, np.diag(sigma)),
        mvn.LikelihoodData.none(),
        mvn.LikelihoodData.sparse(mu, prec, ld, assoc=lhdata.dense_to_assoc(prec)),
    ]:
        p = tmp_path / f"{data.kind}.data"
        lhdata.save_data(str(p), data)
        back = lhdata.load_data(str(p))
        assert back.kind == data.kind
        if data.kind != mvn.NONE:
            assert np.allclose(back.mu, data.mu)
        if data.kind in (mvn.FULL, mvn.SPARSE):
            assert np.allclose(back.precision, data.precision, atol=1e-7)
            assert back.log_det_sigma == pytest.approx(data.log_det_sigma)


# ---------------------------------------------------------------------------
# Graphical lasso
# ---------------------------------------------------------------------------


def test_glasso_identity_limit():
    # With rho -> 0, glasso must recover the inverse of the covariance.
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4000, 4))
    S = np.cov(x, rowvar=False)
    W, Theta = G.graphical_lasso(S, 1e-8)
    assert np.allclose(Theta, np.linalg.inv(S), atol=1e-3)


def test_glasso_sparsifies():
    rng = np.random.default_rng(1)
    # Block-diagonal truth: variables 0-1 correlated, 2-3 correlated.
    n = 3000
    z1 = rng.normal(size=n)
    z2 = rng.normal(size=n)
    x = np.stack(
        [z1 + 0.1 * rng.normal(size=n), z1 + 0.1 * rng.normal(size=n),
         z2 + 0.1 * rng.normal(size=n), z2 + 0.1 * rng.normal(size=n)],
        axis=1,
    )
    mu, sd, xn = G.scale_data(x)
    S = np.cov(xn, rowvar=False)
    W, Theta = G.graphical_lasso(S, 0.2)
    # Cross-block precision entries shrink to (near) zero.
    assert abs(Theta[0, 2]) < 1e-6
    assert abs(Theta[1, 3]) < 1e-6
    # Within-block entries survive.
    assert abs(Theta[0, 1]) > 0.1


def test_glasso_admm_matches_bcd():
    """The accelerator ADMM solver and the host BCD solver minimize the
    same strictly convex objective (FHT-2008 graphical lasso, penalty on
    every entry), so their solutions agree to solver tolerance — on both
    the precision entries and the objective value."""
    rng = np.random.default_rng(7)
    p, n = 40, 2000
    a = rng.normal(size=(p, p)) / np.sqrt(p)
    truth = a @ a.T + np.eye(p)
    x = rng.multivariate_normal(np.zeros(p), np.linalg.inv(truth), size=n)
    mu, sd, xn = G.scale_data(x)
    S = np.cov(xn, rowvar=False)
    rho = 0.05

    def objective(Theta):
        sign, ld = np.linalg.slogdet(Theta)
        assert sign > 0
        return -ld + np.sum(S * Theta) + rho * np.abs(Theta).sum()

    W_b, T_b = G.graphical_lasso(S, rho)
    W_a, T_a = G.graphical_lasso_admm(S, rho, tol=1e-8)
    assert abs(objective(T_a) - objective(T_b)) < 1e-4
    assert np.max(np.abs(T_a - T_b)) < 5e-3
    # The returned covariance is the inverse of the returned precision.
    assert np.allclose(W_a @ T_a, np.eye(p), atol=1e-8)
    # ADMM's soft threshold produces exact zeros (a sparse Theta), like BCD.
    assert (T_a == 0.0).sum() > 0


# ---------------------------------------------------------------------------
# Prepare pipeline end-to-end on a simulated fixture
# ---------------------------------------------------------------------------


def test_prepare_full(tmp_path):
    sim = simulate(n_leaves=6, n_trees=240, seed=7, noise=0.05)
    write_fixture(sim, str(tmp_path))
    res = P.prepare(
        "an",
        os.path.join(tmp_path, "time.tree"),
        os.path.join(tmp_path, "trees.nwk"),
        mvn.FULL,
        out_dir=str(tmp_path),
        log=_quiet,
    )
    assert res.n_trees_used == 240 - 240 // 6
    assert os.path.exists(tmp_path / "an.data")
    assert os.path.exists(tmp_path / "an.meantree")
    data = lhdata.load_data(str(tmp_path / "an.data"))
    assert data.kind == mvn.FULL
    k = sim.topo.n - 2
    assert data.dim == k
    # The posterior means should be near the true distances (merged root).
    hs, rates = sim.true_heights, sim.true_rates
    d_true = (hs[sim.topo.parent] - hs) * rates
    order = sim.topo.ref_branch_order
    d_ref = d_true[order]
    d_ref = np.concatenate([[d_ref[0] + d_ref[1]], d_ref[2:]])
    assert np.allclose(data.mu, d_ref, rtol=0.1, atol=0.02)
    # Mean tree parses and matches the topology.
    mt = parse_newick(open(tmp_path / "an.meantree").read())
    assert set(mt.leaf_names()) == set(sim.time_tree.leaf_names())


def test_prepare_univariate_and_none(tmp_path):
    sim = simulate(n_leaves=6, n_trees=120, seed=8)
    write_fixture(sim, str(tmp_path))
    res = P.prepare(
        "an",
        os.path.join(tmp_path, "time.tree"),
        os.path.join(tmp_path, "trees.nwk"),
        mvn.UNIVARIATE,
        out_dir=str(tmp_path),
        log=_quiet,
    )
    assert res.data.kind == mvn.UNIVARIATE
    res = P.prepare(
        "an2",
        os.path.join(tmp_path, "time.tree"),
        os.path.join(tmp_path, "trees.nwk"),
        mvn.NONE,
        out_dir=str(tmp_path),
        log=_quiet,
    )
    assert res.data.kind == mvn.NONE


def test_prepare_sparse(tmp_path):
    sim = simulate(n_leaves=5, n_trees=200, seed=9, noise=0.08)
    write_fixture(sim, str(tmp_path))
    res = P.prepare(
        "an",
        os.path.join(tmp_path, "time.tree"),
        os.path.join(tmp_path, "trees.nwk"),
        mvn.SPARSE,
        sparse_rho=0.1,
        out_dir=str(tmp_path),
        log=_quiet,
    )
    assert res.data.kind == mvn.SPARSE
    assert res.data.precision_assoc is not None
    # The sparse precision must be positive definite (Cholesky succeeded).
    assert res.data.chol_precision is not None


def test_simulate_is_ultrametric():
    sim = simulate(n_leaves=10, n_trees=3, seed=11)
    assert sim.time_tree.is_ultrametric()
    assert sim.topo.n == 19
