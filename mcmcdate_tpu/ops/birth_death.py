"""Birth-death prior on ultrametric (time) trees — vectorized, O(N), scan-free.

The reference computes the Stadler (2011) reconstructed-process density via a
post-order D/E recursion over the rose tree
(lib/Mcmc/Tree/Prior/BirthDeath.hs:53-231).  On TPU we exploit the model
invariant that the time tree is ultrametric with all leaves at height zero
(lib/Mcmc/Tree/Types.hs:181-185): the extinction probability ``E`` then only
depends on a node's height and has a closed form — the Möbius flow of the
Riccati ODE ``dE/dt = mu - (la+mu) E + la E^2`` started at ``E(0) = 1 - rho``.
Every branch factor ``D`` becomes an independent per-node expression, so the
whole prior is one fused elementwise pass over the node arrays with two
reductions — no tree recursion, no ``lax.scan``.

Near-critical processes (|la - mu| < 1e-6) switch to the series expansion, as
in the reference (BirthDeath.hs:89-126).  Golden values are cross-checked
against the reference's RevBayes comparisons (BirthDeath.hs:260-271) in
tests/test_birth_death.py.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS_NEAR_CRITICAL = 1e-6  # BirthDeath.hs:125-126


def _de_factors(la, mu, c, dt):
    """log D and E at the top of a branch of length ``dt`` whose bottom state
    is summarized by ``c = (1 - rho) + rho * e0`` (computeDE,
    BirthDeath.hs:67-79)."""
    d = la - mu
    near = jnp.abs(d) < EPS_NEAR_CRITICAL

    # Standard formula, evaluated in a SCALED form: the textbook expression
    # computes ``x = exp(-d dt)`` in linear space, which overflows f32 when
    # ``mu >> la`` (|d| dt > 88 makes d^2 x = +inf, so the log-density term
    # turns +inf — an ABSORBING state for the sampler, since +inf beats any
    # finite proposal).  Dividing numerator and denominator by x when d < 0
    # keeps every intermediate bounded by O(la + mu):
    #
    #   log D = 2 log|d| - |d| dt - 2 log|P + Q|,
    #   E     = (R + Q) / (P + Q),            with  z = exp(-|d| dt) <= 1,
    #   d > 0:  P = la (c-1),      Q = (mu - c la) z,  R = mu (c-1)
    #   d < 0:  P = la (c-1) z,    Q = (mu - c la),    R = mu (c-1) z
    #
    # The near-critical branch is protected from NaNs by the double-where
    # trick, as before.
    c1 = c - 1.0
    t_pos = jnp.abs(d) * dt
    z = jnp.exp(-t_pos)
    pos = d > 0
    p = jnp.where(pos, la * c1, la * c1 * z)
    q = jnp.where(pos, (mu - c * la) * z, mu - c * la)
    r = jnp.where(pos, mu * c1, mu * c1 * z)
    denom = p + q
    denom_safe = jnp.where(denom == 0, 1.0, denom)
    d_safe = jnp.where(d == 0, 1.0, d)
    log_d_std = jnp.where(
        denom != 0,
        2.0 * jnp.log(jnp.abs(d_safe)) - t_pos
        - 2.0 * jnp.log(jnp.abs(denom_safe)),
        -jnp.inf,
    )
    e_std = (r + q) / denom_safe

    # Near-critical series (computeDENearCritical, BirthDeath.hs:104-113).
    y_nc = (mu - c * la) * dt
    nom_d_nc = 1.0 - d * dt
    denom_nc = 1.0 + y_nc
    denom_nc_safe = jnp.where(denom_nc == 0, 1.0, denom_nc)
    log_d_nc = jnp.where(
        (nom_d_nc > 0) & (denom_nc != 0),
        jnp.log(jnp.where(nom_d_nc > 0, nom_d_nc, 1.0))
        - 2.0 * jnp.log(jnp.abs(denom_nc_safe)),
        -jnp.inf,
    )
    e_nc = (c + y_nc) / denom_nc_safe

    return jnp.where(near, log_d_nc, log_d_std), jnp.where(near, e_nc, e_std)


def extinction_at(la, mu, rho, h):
    """Closed-form E(h): extinction probability of a lineage at height ``h``
    given sampling probability ``rho`` at the present (height 0)."""
    _, e = _de_factors(la, mu, 1.0 - rho, h)
    return e


def birth_death_terms(heights, parent, is_leaf, la, mu, rho):
    """Per-node log contributions of the birth-death prior, plus a validity
    term.  Returns ``f[N + 1]``; the total is their sum.  Exposing the terms
    lets the sampler compute acceptance deltas term-by-term so contributions
    untouched by a proposal cancel exactly in low precision."""
    dtype = heights.dtype
    la = jnp.asarray(la, dtype)
    mu = jnp.asarray(mu, dtype)
    rho = jnp.asarray(rho, dtype)

    hp = heights[parent]
    dt = hp - heights
    e_at = extinction_at(la, mu, rho, heights)
    c = jnp.where(is_leaf, 1.0 - rho, e_at)
    log_d, _ = _de_factors(la, mu, c, dt)
    log_d = jnp.where(dt > 0, log_d, -jnp.inf)
    log_boundary = jnp.where(is_leaf, jnp.log(rho), jnp.log(la))
    non_root = parent >= 0
    per_node = jnp.where(non_root, log_d + log_boundary, 0.0)
    # A +inf log-density term is always a numerical artifact (the density
    # is finite for valid parameters) and would act as an ABSORBING state
    # in the sampler's term-delta acceptance; map it to a rejection.
    per_node = jnp.where(per_node == jnp.inf, -jnp.inf, per_node)
    valid = (la >= 0) & (mu >= 0) & (rho > 0) & (rho <= 1)
    vterm = jnp.where(valid, 0.0, -jnp.inf)
    return jnp.concatenate([per_node, vterm[None]])


def birth_death_log(heights, parent, is_leaf, la, mu, rho, *, condition_mrca=True):
    """Log birth-death prior of an ultrametric time tree.

    Parameters
    ----------
    heights : f[N] node heights, pre-order; ``heights[0]`` is the root, all
        leaves must be at height 0.
    parent : int[N] parent indices (static), root entry -1.
    is_leaf : bool[N] (static).
    la, mu : birth and death rates.
    rho : sampling probability at the present.
    condition_mrca : conditioning on the MRCA time (the model's choice,
        app/Probability.hs:81): the density is the product of the
        origin-conditioned densities of the two root subtrees, i.e. the
        product of branch and boundary factors over all non-root nodes.

    Invalid rates (``la < 0``, ``mu < 0``, ``rho`` outside (0, 1]) yield
    ``-inf`` — under jit, rejections replace the reference's ``error`` calls.
    """
    del condition_mrca  # Same computation either way for a zero stem.
    total = jnp.sum(birth_death_terms(heights, parent, is_leaf, la, mu, rho))
    # Invalid rates produce NaN terms (e.g. log of a negative birth rate);
    # the summed density is simply zero probability.
    return jnp.where(jnp.isnan(total), -jnp.inf, total)
