"""Soft node priors: calibrations, order constraints, and braces — vectorized.

Implements the combined fast path of the reference
(``calibrateConstrainBraceSoft``, lib/Mcmc/Tree/Prior/Node/Combined.hs:70-92):
gather the relevant node heights once, then apply all penalties as fused
elementwise expressions.  SURVEY.md §2.2 flags this module as "the natural
TPU kernel".

Specs are static host-side arrays resolved from leaf-pair MRCAs
(see :mod:`mcmcdate_tpu.io.specs`).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import numpy as np
import jax.numpy as jnp

SQRT_2_OVER_PI = 0.7978845608028654  # Calibration.hs:391


@dataclass(frozen=True)
class CalibrationSet:
    """Static arrays describing node-age calibrations.

    ``lower`` is 0 where no lower bound exists; ``upper`` is +inf where no
    upper bound exists.  Bounds are in absolute time; they are divided by the
    current tree height inside the density (``transformCalibration``,
    Calibration.hs:426-431).
    """

    node: np.ndarray  # int32[C]
    lower: np.ndarray  # f64[C]
    lower_pm: np.ndarray  # f64[C]; probability mass of the lower boundary
    upper: np.ndarray  # f64[C]
    upper_pm: np.ndarray  # f64[C]
    names: Tuple[str, ...] = ()
    paths: Tuple[Tuple[int, ...], ...] = ()

    @property
    def n(self) -> int:
        return len(self.node)

    @staticmethod
    def empty() -> "CalibrationSet":
        z = np.zeros(0)
        return CalibrationSet(np.zeros(0, np.int32), z, z, z, z)


@dataclass(frozen=True)
class ConstraintSet:
    """Static arrays describing node order constraints (young < old)."""

    young: np.ndarray  # int32[K]
    old: np.ndarray  # int32[K]
    pm: np.ndarray  # f64[K]
    names: Tuple[str, ...] = ()

    @property
    def n(self) -> int:
        return len(self.young)

    @staticmethod
    def empty() -> "ConstraintSet":
        return ConstraintSet(np.zeros(0, np.int32), np.zeros(0, np.int32), np.zeros(0))


@dataclass(frozen=True)
class BraceSet:
    """Static arrays describing braces (sets of nodes with tied heights).

    ``node`` is padded with -1; padded entries are masked out.
    """

    node: np.ndarray  # int32[B, max_nodes]; -1 padding
    sd: np.ndarray  # f64[B]
    names: Tuple[str, ...] = ()

    @property
    def n(self) -> int:
        return len(self.sd)

    @staticmethod
    def empty() -> "BraceSet":
        return BraceSet(np.zeros((0, 1), np.int32), np.zeros(0))


def calibrations_log(cal: CalibrationSet, heights, height_mult):
    """Log density of all calibrations given relative node heights and the
    absolute height multiplier (``calibrateSoft``, Calibration.hs:369-419).

    Uniform inside the (relative) interval; one-sided normal tails with
    ``sigma = sqrt(2/pi) * pm`` outside, normalized for continuity.
    """
    if cal.n == 0:
        return jnp.asarray(0.0, heights.dtype)
    h = heights[jnp.asarray(cal.node)]
    lo = jnp.asarray(cal.lower, heights.dtype) / height_mult
    hi = jnp.asarray(cal.upper, heights.dtype) / height_mult
    s_lo = SQRT_2_OVER_PI * jnp.asarray(cal.lower_pm, heights.dtype)
    s_hi = SQRT_2_OVER_PI * jnp.asarray(cal.upper_pm, heights.dtype)

    below = jnp.clip(lo - h, min=0.0)
    above = jnp.clip(h - hi, min=0.0)
    s_lo_safe = jnp.where(s_lo > 0, s_lo, 1.0)
    s_hi_safe = jnp.where(s_hi > 0, s_hi, 1.0)
    lp = -0.5 * (below / s_lo_safe) ** 2 - 0.5 * jnp.where(
        jnp.isfinite(hi), (above / s_hi_safe) ** 2, 0.0
    )
    total = jnp.sum(lp)
    valid = (height_mult > 0) & jnp.all(h >= 0)
    return jnp.where(valid, total, -jnp.inf)


def constraints_log(con: ConstraintSet, heights):
    """Log density of order constraints (``constrainSoft``,
    Constraint.hs:403-416): unit when young < old, normal tail otherwise."""
    if con.n == 0:
        return jnp.asarray(0.0, heights.dtype)
    hy = heights[jnp.asarray(con.young)]
    ho = heights[jnp.asarray(con.old)]
    s = SQRT_2_OVER_PI * jnp.asarray(con.pm, heights.dtype)
    viol = jnp.clip(hy - ho, min=0.0)
    return jnp.sum(-0.5 * (viol / s) ** 2)


def braces_log(br: BraceSet, heights):
    """Log density of braces (``braceSoft``, Brace.hs:218-231): each braced
    node's height is pulled toward the brace mean by a normal penalty."""
    if br.n == 0:
        return jnp.asarray(0.0, heights.dtype)
    idx = jnp.asarray(br.node)
    mask = idx >= 0
    h = heights[jnp.clip(idx, min=0)]
    counts = jnp.sum(mask, axis=1)
    hmean = jnp.sum(jnp.where(mask, h, 0.0), axis=1) / counts
    s = jnp.asarray(br.sd, heights.dtype)[:, None]
    lp = jnp.where(mask, -0.5 * ((h - hmean[:, None]) / s) ** 2, 0.0)
    return jnp.sum(lp)


def calibrate_constrain_brace_log(cal, con, br, heights, height_mult):
    """Fast combined path (Combined.hs:70-92)."""
    return (
        calibrations_log(cal, heights, height_mult)
        + constraints_log(con, heights)
        + braces_log(br, heights)
    )


def calibrate_constrain_brace_terms(cal, con, br, heights, height_mult):
    """Per-item log contributions: ``f[C + K + B]`` (each brace contributes
    one summed term).  Equals :func:`calibrate_constrain_brace_log` in total."""
    parts = []
    dtype = heights.dtype
    if cal.n:
        h = heights[jnp.asarray(cal.node)]
        lo = jnp.asarray(cal.lower, dtype) / height_mult
        hi = jnp.asarray(cal.upper, dtype) / height_mult
        s_lo = SQRT_2_OVER_PI * jnp.asarray(cal.lower_pm, dtype)
        s_hi = SQRT_2_OVER_PI * jnp.asarray(cal.upper_pm, dtype)
        below = jnp.clip(lo - h, min=0.0)
        above = jnp.clip(h - hi, min=0.0)
        s_lo_safe = jnp.where(s_lo > 0, s_lo, 1.0)
        s_hi_safe = jnp.where(s_hi > 0, s_hi, 1.0)
        lp = -0.5 * (below / s_lo_safe) ** 2 - 0.5 * jnp.where(
            jnp.isfinite(hi), (above / s_hi_safe) ** 2, 0.0
        )
        valid = (height_mult > 0) & (h >= 0)
        parts.append(jnp.where(valid, lp, -jnp.inf))
    if con.n:
        hy = heights[jnp.asarray(con.young)]
        ho = heights[jnp.asarray(con.old)]
        s = SQRT_2_OVER_PI * jnp.asarray(con.pm, dtype)
        viol = jnp.clip(hy - ho, min=0.0)
        parts.append(-0.5 * (viol / s) ** 2)
    if br.n:
        idx = jnp.asarray(br.node)
        mask = idx >= 0
        h = heights[jnp.clip(idx, min=0)]
        counts = jnp.sum(mask, axis=1)
        hmean = jnp.sum(jnp.where(mask, h, 0.0), axis=1) / counts
        s = jnp.asarray(br.sd, dtype)[:, None]
        lp = jnp.where(mask, -0.5 * ((h - hmean[:, None]) / s) ** 2, 0.0)
        parts.append(jnp.sum(lp, axis=1))
    if not parts:
        return jnp.zeros(0, dtype)
    return jnp.concatenate(parts)
