"""Log-density primitives and proposal kernels (jittable, dtype-generic).

Replaces the reference's uses of the Haskell ``statistics`` /
``math-functions`` packages and the ``mcmc`` engine's prior combinators
(``exponential``, ``gamma``, ``normal`` — app/Probability.hs:74-113) and its
truncated-normal proposal sampler
(lib/Mcmc/Tree/Proposal/Internal.hs:107-138,
lib/Statistics/Distribution/TruncatedNormal.hs).

All densities return log values; impossible states return ``-inf``.  The
reference computes in ``Log Double`` (log domain) throughout, so matching the
log-domain semantics here gives numerical parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln, log_ndtr, ndtr, ndtri

LN_SQRT_2PI = 0.9189385332046727  # log(sqrt(2*pi)), m_ln_sqrt_2_pi


# ---------------------------------------------------------------------------
# Log densities
# ---------------------------------------------------------------------------


def exponential_logpdf(rate, x):
    """Exponential distribution with given rate (mean ``1/rate``)."""
    return jnp.where(x >= 0, jnp.log(rate) - rate * x, -jnp.inf)


def _log1pmx(u):
    """``log(1+u) - u``, accurate near ``u = 0`` (direct evaluation loses all
    relative precision there; the leading term is ``-u^2/2``)."""
    small = jnp.abs(u) < 0.35
    us = jnp.where(small, u, 0.0)
    # alternating series -u^2/2 + u^3/3 - ... ; |u|<0.35 keeps the u^9 tail
    # far below the densities' useful precision once multiplied by shape
    ser = -(us * us) * (
        1.0 / 2.0
        - us * (1.0 / 3.0 - us * (1.0 / 4.0 - us * (1.0 / 5.0 - us * (
            1.0 / 6.0 - us * (1.0 / 7.0 - us / 8.0)))))
    )
    ub = jnp.where(small, 0.5, u)  # dead-branch guard for log
    return jnp.where(small, ser, jnp.log1p(ub) - ub)


def gamma_logpdf(shape, scale, x):
    """Gamma distribution with given shape and SCALE (mean = shape*scale).

    Matches the Haskell ``statistics`` package ``gammaDistr`` used by the
    reference's priors and scale-proposal kernels
    (lib/Mcmc/Tree/Proposal/Unconstrained.hs:102).

    For large shape ``k`` the textbook form loses everything to f32
    cancellation (terms scale like ``k log k``; at ``k ~ 1e13`` — an
    uncorrelated-gamma clock with collapsed variance — the error reaches
    ``1e9`` and creates a fake absorbing state for the sampler).  We switch
    to the Stirling-cancelled form around the mean ``m = k*scale``::

        lp = 1/2 log k - log(sqrt 2pi) - log m - log d
             + k*(log d - d + 1) - 1/(12k) + O(1/k^3),   d = x/m

    which is computed entirely from O(1)-sized quantities.
    """
    ok = (x > 0) & jnp.isfinite(x) & jnp.isfinite(shape) & (shape > 0)
    xs = jnp.where(ok, x, 1.0)  # avoid NaN in log for the dead branch
    ks = jnp.where(ok, shape, 1.0)
    naive = (ks - 1.0) * jnp.log(xs) - xs / scale - ks * jnp.log(scale) - gammaln(ks)
    big = ks > 1e2
    kb = jnp.where(big, ks, 1e2)
    m = kb * scale
    d = xs / m
    stable = (
        0.5 * jnp.log(kb)
        - LN_SQRT_2PI
        - jnp.log(m)
        - jnp.log(d)
        + kb * _log1pmx(d - 1.0)
        - 1.0 / (12.0 * kb)
    )
    lp = jnp.where(big, stable, naive)
    return jnp.where(ok, lp, -jnp.inf)


def gamma_mean_variance_logpdf(mean, variance, x):
    """Gamma parameterized by mean and variance (shape=m^2/v, scale=v/m).

    ``gammaMeanVarianceToShapeScale`` of the reference
    (lib/Mcmc/Tree/Prior/Branch/RelaxedClock.hs:118).
    """
    shape = mean * mean / variance
    scale = variance / mean
    return gamma_logpdf(shape, scale, x)


def normal_logpdf(mean, sd, x):
    z = (x - mean) / sd
    return -LN_SQRT_2PI - jnp.log(sd) - 0.5 * z * z


def log_normal_mean_param_logpdf(mean, variance, x):
    """Log-normal parameterized by its actual mean and the variance of the
    underlying normal (``logNormal'``, RelaxedClock.hs:141-150; Yang 2006,
    eq. 7.23)."""
    ok = (x > 0) & jnp.isfinite(x)
    xs = jnp.where(ok, x, 1.0)
    t = -(LN_SQRT_2PI + jnp.log(xs * jnp.sqrt(variance)))
    b = jnp.log(xs / mean) + 0.5 * variance
    e = -b * b / (2.0 * variance)
    return jnp.where(ok, t + e, -jnp.inf)


def dirichlet_symmetric_logpdf(alpha, xs):
    """Symmetric Dirichlet over the simplex (Prior/Branch/Internal.hs:39-79).

    Returns ``-inf`` when the values do not sum to one (tolerance 1e-12, as
    in the reference's ``gammaDirichlet``)."""
    n = xs.shape[-1]
    log_norm = gammaln(alpha * n) - n * gammaln(alpha)
    lp = log_norm + jnp.sum((alpha - 1.0) * jnp.log(xs), axis=-1)
    ok = jnp.abs(jnp.sum(xs, axis=-1) - 1.0) <= 1e-12
    return jnp.where(ok, lp, -jnp.inf)


# ---------------------------------------------------------------------------
# Truncated normal (proposal kernel)
# ---------------------------------------------------------------------------


def _truncnorm_log_z(mean, sd, a, b):
    """log(Phi(beta) - Phi(alpha)), computed stably in the tails."""
    alpha = (a - mean) / sd
    beta = (b - mean) / sd
    # log(Phi(b') - Phi(a')) = logPhi(b') + log1p(-exp(logPhi(a') - logPhi(b')))
    # Mirror into the lower tail for accuracy when both bounds are positive.
    flip = alpha + beta > 0
    lo = jnp.where(flip, -beta, alpha)
    hi = jnp.where(flip, -alpha, beta)
    llo = log_ndtr(lo)
    lhi = log_ndtr(hi)
    diff = jnp.clip(llo - lhi, max=0.0)
    tiny = jnp.finfo(jnp.result_type(mean, 1.0)).tiny
    return lhi + jnp.log1p(-jnp.exp(diff) + tiny)


def truncated_normal_logpdf(mean, sd, a, b, x):
    inside = (x >= a) & (x <= b)
    lp = normal_logpdf(mean, sd, x) - _truncnorm_log_z(mean, sd, a, b)
    return jnp.where(inside, lp, -jnp.inf)


def truncated_normal_sample(key, mean, sd, tune, a, b):
    """Sample from TruncNormal(mean, tune*sd, a, b) and return the log
    Metropolis-Hastings-Green factor ``log q(y->x) - log q(x->y)``.

    TPU-native analog of ``truncatedNormalSample``
    (lib/Mcmc/Tree/Proposal/Internal.hs:107-138): where the reference calls
    ``error`` on numerically out-of-bounds samples, we clamp into the open
    interval (exceptions are impossible under jit; the clamp is a
    measure-zero event).

    Returns ``(value, log_mhg)``.  No Jacobian is included.
    """
    dtype = jnp.result_type(mean, sd, tune, a, b, 1.0)
    mean = jnp.asarray(mean, dtype)
    a = jnp.asarray(a, dtype)
    b = jnp.asarray(b, dtype)
    s = jnp.asarray(tune * sd, dtype)
    u = jax.random.uniform(key, shape=jnp.shape(mean), dtype=dtype)
    alpha = (a - mean) / s
    beta = (b - mean) / s
    pa = ndtr(alpha)
    pb = ndtr(beta)
    p = pa + u * (pb - pa)
    fi = jnp.finfo(dtype)
    x = mean + s * ndtri(jnp.clip(p, fi.tiny, 1.0 - 10 * fi.eps))
    # Clamp strictly inside the interval (reference errors instead); bounds
    # may be infinite (e.g. sliding the root with no parent).  The margin
    # must be resolvable at the dtype's precision, otherwise the clamp can
    # round back onto the bound and downstream contrary factors divide by
    # zero.
    eps = 32 * fi.eps
    width = jnp.where(jnp.isfinite(b - a), b - a, s)
    lo = jnp.where(jnp.isfinite(a), a + eps * width, -jnp.inf)
    hi = jnp.where(jnp.isfinite(b), b - eps * width, jnp.inf)
    x = jnp.clip(x, lo, hi)
    # MHG factor: reverse kernel centered at x, same sd and bounds.
    log_q_fwd = truncated_normal_logpdf(mean, s, a, b, x)
    log_q_rev = truncated_normal_logpdf(x, s, a, b, mean)
    return x, log_q_rev - log_q_fwd


# ---------------------------------------------------------------------------
# Gamma scale kernel (multiplicative proposals)
# ---------------------------------------------------------------------------


def gamma_scale_sample(key, shape, tune):
    """Sample a multiplicative factor ``u ~ Gamma(shape/tune, tune/shape)``
    (mean 1) and return the base log MHG factor.

    Used by all ``scaleUnbiased`` / ``scaleTree``-style proposals
    (lib/Mcmc/Tree/Proposal/Unconstrained.hs:101-106).  The returned
    ``log_mhg_base = log g(1/u) - log g(u) - 2 log u`` contains the kernel
    ratio and the auxiliary-variable part of the Jacobian; a proposal that
    scales ``n_up`` coordinates by ``u`` and ``n_down`` coordinates by
    ``1/u`` must add ``(n_up - n_down) * log u``.  (The reference folds both
    pieces into one "Jacobian" with exponent ``n - 2``; see
    scaleTreeJacobian, Unconstrained.hs:87-93.)

    Returns ``(u, log_mhg_base, log_u)``.
    """
    dtype = jnp.result_type(tune, 1.0)
    shape = jnp.asarray(shape, dtype)
    k = shape / tune
    theta = tune / shape
    u = jax.random.gamma(key, k, dtype=dtype) * theta
    log_u = jnp.log(u)
    log_g_fwd = gamma_logpdf(k, theta, u)
    log_g_rev = gamma_logpdf(k, theta, 1.0 / u)
    return u, log_g_rev - log_g_fwd - 2.0 * log_u, log_u
