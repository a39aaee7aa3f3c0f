"""Multivariate-normal likelihood approximations of the phylogenetic
likelihood (app/Probability.hs:162-281).

Four variants, as in the reference CLI (app/Options.hs:35-44):

- ``full``: dense precision matrix.  On TPU the quadratic form is evaluated
  through the Cholesky factor of the precision, ``dx' P dx = ||L' dx||^2``,
  which maps to one MXU matmul when batched over chains and is better
  conditioned for acceptance deltas than the two-step mat-vec.
- ``sparse``: graphical-lasso precision.  TPU has no profitable sparse
  mat-vec for these densities (the precision is stored dense; zeros ride
  along on the MXU) — behaviour matches the reference, performance comes
  from the dense path.
- ``univariate``: independent normals (diagonal).
- ``none``: prior-only runs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax.numpy as jnp

from .dists import LN_SQRT_2PI

FULL = "full"
SPARSE = "sparse"
BANDED = "banded"
UNIVARIATE = "univariate"
NONE = "none"


@dataclass(frozen=True)
class LikelihoodData:
    """Static (host) likelihood data produced by the prepare pipeline.

    ``kind`` is one of FULL/SPARSE/UNIVARIATE/NONE.  For the MVN kinds,
    ``precision`` is the inverted covariance matrix (dense, f64) and
    ``chol_precision`` its lower Cholesky factor; ``log_det_sigma`` is the
    log determinant of the covariance matrix.  For UNIVARIATE, ``variances``
    holds the per-branch variances.
    """

    kind: str
    mu: Optional[np.ndarray] = None
    precision: Optional[np.ndarray] = None
    chol_precision: Optional[np.ndarray] = None
    log_det_sigma: Optional[float] = None
    variances: Optional[np.ndarray] = None
    # Sparse-only extras kept for .data file round-trips:
    precision_assoc: Optional[tuple] = None
    # Banded-only extras (ops/banded.py).  The band lives in the engine's
    # INTERNAL pre-order layout; ``band_perm`` maps reference branch order
    # into it (``d_internal = d_ref[band_perm]``).  ``band_chol`` is the
    # upper band of L with P_internal = L L' (``band_chol[i, t] =
    # L[i, i+t]``, t = 0..bandwidth).
    band_chol: Optional[np.ndarray] = None
    bandwidth: Optional[int] = None
    band_perm: Optional[np.ndarray] = None

    @staticmethod
    def none() -> "LikelihoodData":
        return LikelihoodData(kind=NONE)

    @staticmethod
    def full(mu, precision, log_det_sigma) -> "LikelihoodData":
        precision = np.asarray(precision, dtype=np.float64)
        return LikelihoodData(
            kind=FULL,
            mu=np.asarray(mu, dtype=np.float64),
            precision=precision,
            chol_precision=np.linalg.cholesky(precision),
            log_det_sigma=float(log_det_sigma),
        )

    @staticmethod
    def sparse(mu, precision, log_det_sigma, assoc=None) -> "LikelihoodData":
        precision = np.asarray(precision, dtype=np.float64)
        return LikelihoodData(
            kind=SPARSE,
            mu=np.asarray(mu, dtype=np.float64),
            precision=precision,
            chol_precision=np.linalg.cholesky(precision),
            log_det_sigma=float(log_det_sigma),
            precision_assoc=tuple(assoc) if assoc is not None else None,
        )

    @staticmethod
    def banded(mu, band_chol, log_det_sigma, perm) -> "LikelihoodData":
        """TPU-native banded precision (ops/banded.py): the scaling
        replacement for the reference's unstructured sparse kind
        (app/Probability.hs:178-184) — O(D*w) storage and evaluation.
        ``mu`` is in reference branch order; ``band_chol`` and the band
        itself live in the internal pre-order layout reached via
        ``perm``."""
        band_chol = np.asarray(band_chol, dtype=np.float64)
        return LikelihoodData(
            kind=BANDED,
            mu=np.asarray(mu, dtype=np.float64),
            log_det_sigma=float(log_det_sigma),
            band_chol=band_chol,
            bandwidth=int(band_chol.shape[1] - 1),
            band_perm=np.asarray(perm, dtype=np.int64),
        )

    @staticmethod
    def univariate(mu, variances) -> "LikelihoodData":
        return LikelihoodData(
            kind=UNIVARIATE,
            mu=np.asarray(mu, dtype=np.float64),
            variances=np.asarray(variances, dtype=np.float64),
        )

    @property
    def dim(self) -> int:
        return 0 if self.mu is None else len(self.mu)


def mvn_log_density(dx, chol_precision, log_det_sigma):
    """log N(dx; 0, Sigma) via the precision Cholesky factor.

    ``dx`` may have a leading batch (chain) dimension; the contraction then
    runs as a single MXU matmul.
    """
    k = dx.shape[-1]
    y = dx @ chol_precision  # y = L' dx  (row-vector convention)
    quad = jnp.sum(y * y, axis=-1)
    return -LN_SQRT_2PI * k - 0.5 * (log_det_sigma + quad)


def univariate_log_density(dx, variances, log_var_sum):
    k = dx.shape[-1]
    quad = jnp.sum(dx * dx / variances, axis=-1)
    return -LN_SQRT_2PI * k - 0.5 * (log_var_sum + quad)


def make_log_likelihood(data: LikelihoodData, dtype=jnp.float64):
    """Build a jittable ``log_lik(distances)`` closure over static data."""
    if data.kind == NONE:
        def f_none(d):
            return jnp.zeros(d.shape[:-1], dtype=d.dtype)

        return f_none
    mu = jnp.asarray(data.mu, dtype)
    if data.kind in (FULL, SPARSE):
        chol = jnp.asarray(data.chol_precision, dtype)
        log_det = jnp.asarray(data.log_det_sigma, dtype)

        def f_mvn(d):
            return mvn_log_density(d - mu, chol, log_det)

        return f_mvn
    if data.kind == BANDED:
        from . import banded as _banded

        wb = _banded.default_block_size(int(data.bandwidth))
        L3 = jnp.asarray(_banded.blocks_from_upper_band(data.band_chol, wb),
                         dtype)
        perm = jnp.asarray(data.band_perm)
        mu_int = jnp.asarray(np.asarray(data.mu)[np.asarray(data.band_perm)],
                             dtype)
        log_det = jnp.asarray(data.log_det_sigma, dtype)
        D = int(data.band_chol.shape[0])

        def f_banded(d):
            dx = d[..., perm] - mu_int
            y = _banded.block_tridiag_matmul(dx, L3, D)
            quad = jnp.sum(y * y, axis=-1)
            return -LN_SQRT_2PI * D - 0.5 * (log_det + quad)

        return f_banded
    if data.kind == UNIVARIATE:
        var = jnp.asarray(data.variances, dtype)
        log_var_sum = jnp.asarray(np.sum(np.log(data.variances)), dtype)

        def f_uni(d):
            return univariate_log_density(d - mu, var, log_var_sum)

        return f_uni
    raise ValueError(f"Unknown likelihood kind {data.kind!r}")
