"""Relaxed molecular clock priors on the rate tree — vectorized over branches.

Re-designs lib/Mcmc/Tree/Prior/Branch/RelaxedClock.hs: instead of folding a
per-branch closure over a rose tree (``branchesWith``, Prior/Branch.hs:23-26),
each model is one fused elementwise pass over the branch (rate) vector.

All models act ``WithoutStem`` as in the app (app/Probability.hs:116-119):
the root entry of the arrays is masked out.

Note on the autocorrelated models: the reference evaluates them as
independent per-branch densities whose variance scales with the branch's
time duration (gamma: variance ``v*t``; log-normal: ``logNormal' m (v*t)``,
RelaxedClock.hs:260-331) — the geometric-Brownian-motion parent coupling
described in its docstrings enters through the proposals, not the density.
We reproduce exactly that density.
"""

from __future__ import annotations

import jax.numpy as jnp

from .dists import (
    dirichlet_symmetric_logpdf,
    gamma_logpdf,
    gamma_mean_variance_logpdf,
    log_normal_mean_param_logpdf,
)

UNCORRELATED_GAMMA = "UncorrelatedGamma"
UNCORRELATED_LOG_NORMAL = "UncorrelatedLogNormal"
UNCORRELATED_WHITE_NOISE = "UncorrelatedWhiteNoise"
AUTOCORRELATED_GAMMA = "AutocorrelatedGamma"
AUTOCORRELATED_LOG_NORMAL = "AutocorrelatedLogNormal"

CLI_CLOCK_MODELS = (
    UNCORRELATED_GAMMA,
    UNCORRELATED_LOG_NORMAL,
    UNCORRELATED_WHITE_NOISE,
    AUTOCORRELATED_LOG_NORMAL,
)  # app/Probability.hs:88-93


def _masked_sum(lp, non_root):
    return jnp.sum(jnp.where(non_root, lp, 0.0))


def uncorrelated_gamma_log(rates, non_root, mean, variance):
    """Rates iid Gamma with given mean and variance (RelaxedClock.hs:110-126)."""
    lp = gamma_mean_variance_logpdf(mean, variance, rates)
    valid = variance > 0
    return jnp.where(valid, _masked_sum(lp, non_root), -jnp.inf)


def uncorrelated_log_normal_log(rates, non_root, mean, variance):
    """Rates iid log-normal with given mean (RelaxedClock.hs:160-172)."""
    lp = log_normal_mean_param_logpdf(mean, variance, rates)
    valid = variance > 0
    return jnp.where(valid, _masked_sum(lp, non_root), -jnp.inf)


def uncorrelated_white_noise_log(rates, time_lengths, non_root, mean, variance):
    """White-noise clock: rate on a branch of duration ``t`` is Gamma with
    mean ``m`` and variance ``v / t`` (RelaxedClock.hs:209-241)."""
    t = jnp.where(time_lengths > 0, time_lengths, 1.0)
    lp = gamma_mean_variance_logpdf(mean, variance / t, rates)
    lp = jnp.where(time_lengths > 0, lp, -jnp.inf)
    valid = variance > 0
    return jnp.where(valid, _masked_sum(lp, non_root), -jnp.inf)


def autocorrelated_gamma_log(rates, time_lengths, non_root, mean, variance):
    """Gamma with variance ``v * t`` (RelaxedClock.hs:260-285)."""
    t = jnp.where(time_lengths > 0, time_lengths, 1.0)
    lp = gamma_mean_variance_logpdf(mean, variance * t, rates)
    lp = jnp.where(time_lengths > 0, lp, -jnp.inf)
    valid = variance > 0
    return jnp.where(valid, _masked_sum(lp, non_root), -jnp.inf)


def autocorrelated_log_normal_log(rates, time_lengths, non_root, mean, variance):
    """Log-normal with variance ``v * t`` (RelaxedClock.hs:307-331)."""
    t = jnp.where(time_lengths > 0, time_lengths, 1.0)
    lp = log_normal_mean_param_logpdf(mean, variance * t, rates)
    lp = jnp.where(time_lengths > 0, lp, -jnp.inf)
    valid = variance > 0
    return jnp.where(valid, _masked_sum(lp, non_root), -jnp.inf)


def gamma_dirichlet_log(alpha_mu, beta_mu, alpha, mu_mean, relative_rates):
    """Gamma-Dirichlet multi-partition rate prior (RelaxedClock.hs:84-98).

    Gamma(shape ``alpha_mu``, scale ``beta_mu``) prior on the overall mean
    rate, symmetric Dirichlet(``alpha``) on the relative partition rates.
    """
    return gamma_logpdf(alpha_mu, beta_mu, mu_mean) + dirichlet_symmetric_logpdf(
        alpha, relative_rates
    )


def relaxed_clock_terms(model: str, rates, time_lengths, non_root, mean, variance):
    """Per-branch log contributions plus a validity term: ``f[N + 1]``.

    The total equals :func:`relaxed_clock_log`; exposing per-branch terms
    lets the sampler compute acceptance deltas with exact cancellation of
    untouched branches (important in f32).
    """
    if model == UNCORRELATED_GAMMA:
        lp = gamma_mean_variance_logpdf(mean, variance, rates)
        tmask = jnp.ones_like(rates, bool)
    elif model == UNCORRELATED_LOG_NORMAL:
        lp = log_normal_mean_param_logpdf(mean, variance, rates)
        tmask = jnp.ones_like(rates, bool)
    elif model == UNCORRELATED_WHITE_NOISE:
        t = jnp.where(time_lengths > 0, time_lengths, 1.0)
        lp = gamma_mean_variance_logpdf(mean, variance / t, rates)
        tmask = time_lengths > 0
    elif model == AUTOCORRELATED_GAMMA:
        t = jnp.where(time_lengths > 0, time_lengths, 1.0)
        lp = gamma_mean_variance_logpdf(mean, variance * t, rates)
        tmask = time_lengths > 0
    elif model == AUTOCORRELATED_LOG_NORMAL:
        t = jnp.where(time_lengths > 0, time_lengths, 1.0)
        lp = log_normal_mean_param_logpdf(mean, variance * t, rates)
        tmask = time_lengths > 0
    else:
        raise ValueError(f"Unknown relaxed clock model: {model!r}")
    lp = jnp.where(tmask, lp, -jnp.inf)
    per_branch = jnp.where(non_root, lp, 0.0)
    vterm = jnp.where(variance > 0, 0.0, -jnp.inf)
    return jnp.concatenate([per_branch, vterm[None]])


def relaxed_clock_log(model: str, rates, time_lengths, non_root, mean, variance):
    """Dispatch on the model name (static string)."""
    if model == UNCORRELATED_GAMMA:
        return uncorrelated_gamma_log(rates, non_root, mean, variance)
    if model == UNCORRELATED_LOG_NORMAL:
        return uncorrelated_log_normal_log(rates, non_root, mean, variance)
    if model == UNCORRELATED_WHITE_NOISE:
        return uncorrelated_white_noise_log(rates, time_lengths, non_root, mean, variance)
    if model == AUTOCORRELATED_GAMMA:
        return autocorrelated_gamma_log(rates, time_lengths, non_root, mean, variance)
    if model == AUTOCORRELATED_LOG_NORMAL:
        return autocorrelated_log_normal_log(rates, time_lengths, non_root, mean, variance)
    raise ValueError(f"Unknown relaxed clock model: {model!r}")
