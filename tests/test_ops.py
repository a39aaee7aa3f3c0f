"""Unit tests for the log-density ops, with golden values.

Golden sources:
- computeDE and RevBayes cross-checks recorded in the reference
  (lib/Mcmc/Tree/Prior/BirthDeath.hs:50-52, 260-271).
- scipy-free recomputation of standard densities in plain Python.
"""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mcmcdate_tpu.ops import birth_death, clocks, dists, heights as H, mvn, node_priors
from mcmcdate_tpu.models import DatingModel, State, init_state, is_valid_state
from mcmcdate_tpu.tree import FlatTopology, parse_newick


# ---------------------------------------------------------------------------
# Naive reference implementation of the birth-death recursion (python floats),
# following Stadler (2011) eqs. [1], [2] and the boundary conditions — used to
# cross-check the vectorized closed-form implementation.
# ---------------------------------------------------------------------------


def _compute_de(la, mu, rho, dt, e0):
    d = la - mu
    if abs(d) < 1e-6:
        c = (1 - rho) + rho * e0
        y = (mu - c * la) * dt
        return (1 - d * dt) / (1 + y) ** 2, (c + y) / (1 + y)
    x = math.exp(-d * dt)
    c = (1 - rho) + rho * e0
    y = (mu - c * la) * x
    nom_d = d * d * x
    c1 = c - 1
    nom_e = mu * c1 + y
    denom = la * c1 + y
    return nom_d / denom / denom, nom_e / denom


def _bd_naive(node, la, mu, rho):
    """Return (log D, E) for a subtree, origin-conditioned including the stem."""
    br = node.length
    if not node.children:
        d_top, e_top = _compute_de(la, mu, rho, br, 0.0)
        return math.log(d_top * rho), e_top
    logs = []
    e_bottom = None
    for c in node.children:
        lg, e = _bd_naive(c, la, mu, rho)
        logs.append(lg)
        e_bottom = e
    d_top, e_top = _compute_de(la, mu, 1.0, br, e_bottom)
    return math.log(d_top * la) + sum(logs), e_top


def _bd_naive_mrca(tree, la, mu, rho):
    assert len(tree.children) == 2
    return sum(_bd_naive(c, la, mu, rho)[0] for c in tree.children)


REVBAYES_TREE = "(((a:1.0,b:1.0):1.0,c:2.0):1.0,d:3.0):0.0;"


def _heights_topo(newick):
    t = parse_newick(newick)
    topo = FlatTopology.from_tree(t)
    from mcmcdate_tpu.tree import node_heights

    hs = jnp.asarray(np.asarray(node_heights(t)))
    return t, topo, hs


def _bd_vec(topo, hs, la, mu, rho):
    return float(
        birth_death.birth_death_log(
            hs, jnp.asarray(topo.parent), jnp.asarray(topo.is_leaf), la, mu, rho
        )
    )


def test_compute_de_golden():
    # BirthDeath.hs:50-52 doctest (la=1.2, mu=3.2, rho=1, dt=1, e0=0.3).
    d, e = _compute_de(1.2, 3.2, 1.0, 1.0, 0.3)
    assert d == pytest.approx(7.283127121752474e-2, rel=1e-12)
    assert e == pytest.approx(0.9305035687810801, rel=1e-12)


def test_birth_death_revbayes_golden():
    # BirthDeath.hs:260-271: ln(1/3 * birthDeath WithoutStem la mu rho tree).
    t, topo, hs = _heights_topo(REVBAYES_TREE)
    third = math.log(1.0 / 3.0)
    golden_mu = {
        0.0: -10.09861228866811,
        0.01: -10.07675364864067,
        0.05: -9.993307032921498,
        0.1: -9.898174270006024,
        0.2: -9.73975910235509,
        0.5: -9.54137886890279,
    }
    for mu, want in golden_mu.items():
        got = _bd_vec(topo, hs, 1.0, mu, 1.0) + third
        assert got == pytest.approx(want, rel=1e-10), f"mu={mu}"
    golden_rho = {1.0: -10.09861228866811, 0.9: -9.809211822253452, 0.8: -9.498032504556043}
    for rho, want in golden_rho.items():
        got = _bd_vec(topo, hs, 1.0, 0.0, rho) + third
        assert got == pytest.approx(want, rel=1e-10), f"rho={rho}"
    got = _bd_vec(topo, hs, 0.2, 0.5, 0.8) + third
    assert got == pytest.approx(-9.700151607658995, rel=1e-10)


def test_birth_death_vec_matches_naive_random():
    rng = np.random.default_rng(0)
    t, topo, _ = _heights_topo(
        "((((a:1,b:1):1,(c:1.5,d:1.5):0.5):1,e:3):1,(f:2,g:2):2):0.0;"
    )
    for _ in range(10):
        la, mu, rho = rng.uniform(0.05, 3), rng.uniform(0.0, 3), rng.uniform(0.3, 1.0)
        # random ultrametric heights consistent with topology
        hs = np.zeros(topo.n)
        hs[0] = 1.0
        for i in range(1, topo.n):
            if not topo.is_leaf[i]:
                hs[i] = hs[topo.parent[i]] * rng.uniform(0.3, 0.95)
        # put heights back on the rose tree as branch lengths
        def set_lengths(node, idx_ref=[0]):
            i = idx_ref[0]
            for c in node.children:
                idx_ref[0] += 1
                j = idx_ref[0]
                c.length = hs[i] - hs[j]
                set_lengths(c, idx_ref)

        t2 = t.copy()
        set_lengths(t2)
        want = _bd_naive_mrca(t2, la, mu, rho)
        got = _bd_vec(topo, jnp.asarray(hs), la, mu, rho)
        assert got == pytest.approx(want, rel=1e-9)


def test_birth_death_near_critical():
    t, topo, hs = _heights_topo(REVBAYES_TREE)
    a = _bd_vec(topo, hs, 1.0, 1.0 - 1e-8, 1.0)  # near-critical branch
    b = _bd_vec(topo, hs, 1.0, 1.0 - 1e-5, 1.0)  # standard branch
    assert a == pytest.approx(b, rel=1e-3)


def test_birth_death_extreme_rates_no_overflow_f32():
    """mu >> la in f32: the textbook D/E evaluation overflows (exp(|d| dt)
    -> inf, so a log-density TERM turns +inf — an absorbing state for the
    sampler).  The scaled evaluation must stay finite-or-(-inf) and match
    f64 (round-4 regression; found live by a CLI drive whose chains froze
    at lp = +inf after a joint birth-death scale walked death to ~86)."""
    t, topo, hs = _heights_topo(REVBAYES_TREE)
    hs32 = jnp.asarray(np.asarray(hs), jnp.float32)
    parent = jnp.asarray(topo.parent)
    leaf = jnp.asarray(topo.is_leaf)
    for mu in (50.0, 86.0, 300.0, 1e4):
        terms32 = np.asarray(birth_death.birth_death_terms(
            hs32, parent, leaf, jnp.float32(2.0), jnp.float32(mu), 1.0))
        assert not np.any(terms32 == np.inf), (mu, terms32)
        lp32 = float(birth_death.birth_death_log(
            hs32, parent, leaf, jnp.float32(2.0), jnp.float32(mu), 1.0))
        lp64 = _bd_vec(topo, hs, 2.0, mu, 1.0)
        assert np.isfinite(lp32)
        assert lp32 == pytest.approx(lp64, rel=1e-4), (mu, lp32, lp64)


def test_birth_death_invalid():
    t, topo, hs = _heights_topo(REVBAYES_TREE)
    assert _bd_vec(topo, hs, -1.0, 0.5, 1.0) == -np.inf
    assert _bd_vec(topo, hs, 1.0, 0.5, 0.0) == -np.inf
    bad = np.asarray(hs).copy()
    bad[1] = 3.5  # child above root
    assert _bd_vec(topo, jnp.asarray(bad), 1.0, 0.5, 1.0) == -np.inf


# ---------------------------------------------------------------------------
# Distributions
# ---------------------------------------------------------------------------


def test_gamma_logpdf():
    # Gamma(shape=1.5, scale=1/6) at 1.0: cross-check against the formula.
    k, th, x = 1.5, 1.0 / 6.0, 1.0
    want = (k - 1) * math.log(x) - x / th - k * math.log(th) - math.lgamma(k)
    # JAX's gammaln is a polynomial approximation; ~1e-10 relative agreement.
    assert float(dists.gamma_logpdf(k, th, x)) == pytest.approx(want, rel=1e-8)
    assert float(dists.gamma_logpdf(k, th, -1.0)) == -np.inf


def test_gamma_logpdf_extreme_shape_f32():
    """Regression: the textbook gamma logpdf loses everything to f32
    cancellation at large shape (observed +5.2e9 garbage for a collapsed
    clock variance v=1.5e-13, i.e. shape ~ 6.6e12, which glued the sampler
    to a fake absorbing state).  The stable Stirling-cancelled branch must
    agree with f64 scipy within ~0.05 nats near the mean across 10 decades
    of shape."""
    from scipy import stats

    for shape in [2e2, 1e4, 1e7, 1e10, 6.6e12]:
        scale = 1.0 / shape  # mean 1
        for x in [1.0, 1.0 + 3.0 / math.sqrt(shape), 0.9, 1.2]:
            x32 = float(np.float32(x))  # what the engine actually stores
            got = float(
                dists.gamma_logpdf(
                    jnp.float32(shape), jnp.float32(scale), jnp.float32(x32)
                )
            )
            want = stats.gamma.logpdf(x32, a=shape, scale=scale)
            # near the peak: absolute agreement; in the far tail the value
            # is astronomically negative and only the sign/scale matters
            if want > -1e4:
                assert abs(got - want) < 0.05, (shape, x, got, want)
            else:
                assert got == pytest.approx(want, rel=1e-3)
    # shape=inf (variance underflow) must reject, not NaN
    assert float(dists.gamma_logpdf(jnp.float32(np.inf), 1e-30, 1.0)) == -np.inf


def test_lognormal_mean_param():
    # logNormal' has mean exactly `m`: check by numerical integration.
    m, v = 1.3, 0.7
    xs = np.linspace(1e-6, 60, 100000)
    pdf = np.exp(np.asarray(dists.log_normal_mean_param_logpdf(m, v, jnp.asarray(xs))))
    total = np.trapezoid(pdf, xs)
    mean = np.trapezoid(pdf * xs, xs)
    assert total == pytest.approx(1.0, abs=1e-4)
    assert mean == pytest.approx(m, abs=1e-3)


def test_truncated_normal_sample_and_hastings():
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, 8000)
    f = jax.jit(jax.vmap(lambda k: dists.truncated_normal_sample(k, 0.5, 1.0, 1.0, 0.0, 1.0)))
    xs, lh = f(keys)
    assert np.all(np.asarray(xs) > 0) and np.all(np.asarray(xs) < 1)
    assert np.all(np.isfinite(np.asarray(lh)))
    # Distribution check: empirical CDF vs analytic truncated-normal CDF.
    def phi(z):
        return 0.5 * (1 + math.erf(z / math.sqrt(2)))

    m, s, a, b = 0.5, 1.0, 0.0, 1.0
    z = phi((b - m) / s) - phi((a - m) / s)
    xs = np.sort(np.asarray(xs))
    for q in (0.1, 0.25, 0.5, 0.75, 0.9):
        x_emp = xs[int(q * len(xs))]
        cdf = (phi((x_emp - m) / s) - phi((a - m) / s)) / z
        assert cdf == pytest.approx(q, abs=0.02)


def test_gamma_scale_sample():
    key = jax.random.PRNGKey(1)
    keys = jax.random.split(key, 20000)
    f = jax.jit(jax.vmap(lambda k: dists.gamma_scale_sample(k, 10.0, 1.0)))
    u, lmhg, lu = f(keys)
    u = np.asarray(u)
    assert u.mean() == pytest.approx(1.0, abs=0.02)
    assert np.allclose(np.asarray(lu), np.log(u))


# ---------------------------------------------------------------------------
# Node priors
# ---------------------------------------------------------------------------


def test_calibration_soft():
    cal = node_priors.CalibrationSet(
        node=np.array([1], np.int32),
        lower=np.array([0.8]),
        lower_pm=np.array([0.025]),
        upper=np.array([1.2]),
        upper_pm=np.array([0.025]),
    )
    hs = jnp.zeros(3)
    # inside interval (h_rel * H in [0.8, 1.2]) -> log density 0
    got = node_priors.calibrations_log(cal, hs.at[1].set(1.0), 1.0)
    assert float(got) == pytest.approx(0.0)
    # below the lower bound: one-sided normal tail with s = sqrt(2/pi)*pm
    h = 0.7
    s = node_priors.SQRT_2_OVER_PI * 0.025
    want = -0.5 * ((0.8 - h) / s) ** 2
    got = node_priors.calibrations_log(cal, hs.at[1].set(h), 1.0)
    assert float(got) == pytest.approx(want, rel=1e-12)
    # above the upper bound
    h = 1.5
    want = -0.5 * ((h - 1.2) / s) ** 2
    got = node_priors.calibrations_log(cal, hs.at[1].set(h), 1.0)
    assert float(got) == pytest.approx(want, rel=1e-12)
    # height multiplier transforms the interval (transformCalibration)
    got = node_priors.calibrations_log(cal, hs.at[1].set(0.5), 2.0)
    assert float(got) == pytest.approx(0.0)  # 0.5*2 = 1.0 inside [0.8, 1.2]
    # non-positive height multiplier: zero probability
    assert float(node_priors.calibrations_log(cal, hs, 0.0)) == -np.inf


def test_constraint_soft():
    con = node_priors.ConstraintSet(
        young=np.array([1], np.int32), old=np.array([2], np.int32), pm=np.array([0.025])
    )
    hs = jnp.asarray([1.0, 0.3, 0.6])
    assert float(node_priors.constraints_log(con, hs)) == 0.0
    hs = jnp.asarray([1.0, 0.6, 0.3])
    s = node_priors.SQRT_2_OVER_PI * 0.025
    want = -0.5 * (0.3 / s) ** 2
    assert float(node_priors.constraints_log(con, hs)) == pytest.approx(want, rel=1e-12)


def test_brace_soft():
    br = node_priors.BraceSet(node=np.array([[1, 2, -1]], np.int32), sd=np.array([1e-2]))
    hs = jnp.asarray([1.0, 0.5, 0.5, 0.0])
    assert float(node_priors.braces_log(br, hs)) == 0.0
    hs = jnp.asarray([1.0, 0.5, 0.52, 0.0])
    want = 2 * (-0.5 * (0.01 / 1e-2) ** 2)
    assert float(node_priors.braces_log(br, hs)) == pytest.approx(want, rel=1e-12)


# ---------------------------------------------------------------------------
# Heights / distances / MVN / model composition
# ---------------------------------------------------------------------------

SIX = "(((a:0.33,b:0.33):0.33,(c:0.33,d:0.33):0.33):0.34,(e:0.33,f:0.33):0.67):0.0;"


def _model(newick=SIX, kind=mvn.NONE, clock=clocks.UNCORRELATED_GAMMA):
    t = parse_newick(newick)
    topo = FlatTopology.from_tree(t)
    if kind == mvn.NONE:
        lh = mvn.LikelihoodData.none()
    else:
        k = topo.n - 2
        rng = np.random.default_rng(42)
        a = rng.normal(size=(k, k))
        sigma = a @ a.T + k * np.eye(k)
        prec = np.linalg.inv(sigma)
        mu = rng.uniform(0.1, 1.0, size=k)
        if kind == mvn.FULL:
            lh = mvn.LikelihoodData.full(mu, prec, np.linalg.slogdet(sigma)[1])
        else:
            lh = mvn.LikelihoodData.univariate(mu, np.diag(sigma))
    model = DatingModel(topo=topo, likelihood=lh, clock=clock)
    state = init_state(t, topo)
    return model, state


def test_init_state_valid():
    model, state = _model()
    assert bool(is_valid_state(state, model.topo))
    assert float(state.heights[0]) == 1.0


def test_distances_shape_and_value():
    model, state = _model()
    d = H.distances_from_state(state, model.topo)
    assert d.shape == (model.topo.n - 2,)
    # With all rates 1 and heights from the tree: distance = time branch
    # lengths, root entry = sum of the two root-child branches.
    tl = np.asarray(H.branch_lengths(state.heights, jnp.asarray(model.topo.parent)))
    l, r = model.topo.root_children
    assert float(d[0]) == pytest.approx(tl[l] + tl[r])


def test_mvn_full_matches_direct():
    model, state = _model(kind=mvn.FULL)
    d = H.distances_from_state(state, model.topo)
    data = model.likelihood
    dx = np.asarray(d) - data.mu
    quad = dx @ data.precision @ dx
    k = len(data.mu)
    want = -dists.LN_SQRT_2PI * k - 0.5 * (data.log_det_sigma + quad)
    got = float(model.log_likelihood(state))
    assert got == pytest.approx(want, rel=1e-10)


def test_univariate_matches_direct():
    model, state = _model(kind=mvn.UNIVARIATE)
    d = H.distances_from_state(state, model.topo)
    data = model.likelihood
    dx = np.asarray(d) - data.mu
    k = len(data.mu)
    want = -dists.LN_SQRT_2PI * k - 0.5 * (
        np.sum(np.log(data.variances)) + np.sum(dx**2 / data.variances)
    )
    assert float(model.log_likelihood(state)) == pytest.approx(want, rel=1e-10)


@pytest.mark.parametrize(
    "clock",
    [
        clocks.UNCORRELATED_GAMMA,
        clocks.UNCORRELATED_LOG_NORMAL,
        clocks.UNCORRELATED_WHITE_NOISE,
        clocks.AUTOCORRELATED_GAMMA,
        clocks.AUTOCORRELATED_LOG_NORMAL,
    ],
)
def test_prior_finite_all_clocks(clock):
    model, state = _model(clock=clock)
    lp = float(model.log_prior(state))
    assert np.isfinite(lp)


def test_prior_vmaps_and_jits():
    model, state = _model(kind=mvn.FULL)
    batch = jax.tree.map(lambda x: jnp.broadcast_to(x, (8,) + x.shape), state)
    f = jax.jit(jax.vmap(model.log_posterior))
    out = np.asarray(f(batch))
    assert out.shape == (8,)
    assert np.all(np.isfinite(out))
    assert np.allclose(out, out[0])


def test_clock_golden_values():
    # Hand-computed: uncorrelatedGamma mean 1 var 0.5 at rate 1:
    # shape=2, scale=0.5 -> logpdf(1) = log(1 * e^{-2} / (Gamma(2) 0.25))
    lp = float(dists.gamma_mean_variance_logpdf(1.0, 0.5, 1.0))
    want = math.log(1.0 * math.exp(-2.0) / (1.0 * 0.25))
    # JAX's gammaln(2) is ~3e-9 rather than exactly 0.
    assert lp == pytest.approx(want, abs=1e-7)

def test_root_branch_jacobian():
    model, state = _model()
    rb = float(H.root_branch(state, model.topo))
    l, r = model.topo.root_children
    hs = np.asarray(state.heights)
    want = (1.0 - hs[l]) + (1.0 - hs[r])  # rates/height/mean all one
    assert rb == pytest.approx(want)
    assert float(H.log_jacobian_root_branch(state, model.topo)) == pytest.approx(
        -math.log(want)
    )
