"""Graphical lasso (sparse precision estimation) — host NumPy.

Replaces the reference's Haskell ``glasso``/``covariance`` packages
(app/Main.hs:257-277): standardize the data, estimate a sparse precision
matrix of the correlation matrix by L1-penalized maximum likelihood, then
rescale back to the covariance scale.

Algorithm: block coordinate descent of Friedman, Hastie & Tibshirani (2008),
with a cyclic coordinate-descent lasso inner solver.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def _lasso_cd(W11: np.ndarray, s12: np.ndarray, rho: float, beta0: np.ndarray,
              tol: float = 1e-6, max_iter: int = 500) -> np.ndarray:
    """Minimize (1/2) b' W11 b - s12' b + rho ||b||_1 by coordinate descent."""
    p = len(s12)
    beta = beta0.copy()
    d = np.diag(W11).copy()
    d[d <= 0] = 1e-12
    for _ in range(max_iter):
        max_delta = 0.0
        for j in range(p):
            # Partial residual.
            r = s12[j] - W11[j] @ beta + W11[j, j] * beta[j]
            new = np.sign(r) * max(abs(r) - rho, 0.0) / d[j]
            delta = abs(new - beta[j])
            if delta > max_delta:
                max_delta = delta
            beta[j] = new
        if max_delta < tol:
            break
    return beta


def graphical_lasso(S: np.ndarray, rho: float, tol: float = 1e-5,
                    max_iter: int = 100) -> Tuple[np.ndarray, np.ndarray]:
    """Estimate (covariance, precision) with an L1 penalty ``rho`` on the
    off-diagonal precision entries.

    Returns ``(W, Theta)`` where ``W ~ S + rho I`` on the diagonal and
    ``Theta`` is sparse.
    """
    S = np.asarray(S, dtype=np.float64)
    p = S.shape[0]
    W = S.copy()
    np.fill_diagonal(W, np.diag(S) + rho)
    B = np.zeros((p, p))  # beta vectors per column
    idx = np.arange(p)
    for it in range(max_iter):
        W_old = W.copy()
        for j in range(p):
            mask = idx != j
            W11 = W[np.ix_(mask, mask)]
            s12 = S[mask, j]
            beta = _lasso_cd(W11, s12, rho, B[mask, j])
            B[mask, j] = beta
            w12 = W11 @ beta
            W[mask, j] = w12
            W[j, mask] = w12
        if np.mean(np.abs(W - W_old)) < tol * np.mean(np.abs(np.diag(S))):
            break
    # Recover the precision matrix from W and the betas.
    Theta = np.zeros((p, p))
    for j in range(p):
        mask = idx != j
        denom = W[j, j] - W[mask, j] @ B[mask, j]
        theta_jj = 1.0 / denom
        Theta[j, j] = theta_jj
        Theta[mask, j] = -B[mask, j] * theta_jj
    # Symmetrize (coordinate descent leaves tiny asymmetries).
    Theta = 0.5 * (Theta + Theta.T)
    return W, Theta


def graphical_lasso_admm(S: np.ndarray, rho: float, *, tol: float = 1e-6,
                         max_iter: int = 1000, t: float = 1.0,
                         dtype=None) -> Tuple[np.ndarray, np.ndarray]:
    """TPU-resident graphical lasso by ADMM (Boyd et al. 2011, §6.5).

    Solves the SAME convex program as :func:`graphical_lasso`
    (``min -logdet T + tr(S T) + rho ||T||_1``, penalty on every entry,
    matching the reference's Haskell ``glasso`` / FHT-2008 convention of
    ``W = S + rho I`` on the diagonal) — the minimizer is unique, so the
    two algorithms agree to solver tolerance.  Each iteration is one
    ``eigh`` plus elementwise work, all on the accelerator; at p ~ 2000
    (the reference's GOE-scale sparse preparation, tutorial_goe.md) this
    runs in minutes where the host block-coordinate-descent path
    (O(p) cyclic lasso solves per sweep in Python) needs days.

    Returns ``(W, Theta)`` with ``W = Theta^{-1}`` (the estimated
    covariance) like the BCD path.
    """
    import jax
    import jax.numpy as jnp

    S = np.asarray(S, dtype=np.float64)
    p = S.shape[0]
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    Sd = jnp.asarray(S, dtype)
    alpha = 1.5  # over-relaxation (Boyd §3.4.3)

    def theta_update(Z, U, t):
        lam, Q = jnp.linalg.eigh(t * (Z - U) - Sd)
        th = (lam + jnp.sqrt(lam * lam + 4.0 * t)) / (2.0 * t)
        return (Q * th) @ Q.T

    def soft(A, k):
        return jnp.sign(A) * jnp.maximum(jnp.abs(A) - k, 0.0)

    def cond(carry):
        Z, U, t, r, s, it = carry
        eps = tol * p
        return (it < max_iter) & ((r > eps) | (s > eps))

    def body(carry):
        Z, U, t, _, _, it = carry
        T = theta_update(Z, U, t)
        Tr = alpha * T + (1.0 - alpha) * Z
        Z_new = soft(Tr + U, rho / t)
        U_new = U + Tr - Z_new
        r = jnp.linalg.norm(T - Z_new)          # primal residual
        s = t * jnp.linalg.norm(Z_new - Z)      # dual residual
        # Residual balancing (Boyd §3.4.1): keep r and s within 10x by
        # rescaling the penalty (and the scaled dual with it).
        grow = r > 10.0 * s
        shrink = s > 10.0 * r
        fac = jnp.where(grow, 2.0, jnp.where(shrink, 0.5, 1.0))
        return Z_new, U_new / fac, t * fac, r, s, it + 1

    Z0 = jnp.eye(p, dtype=dtype)
    U0 = jnp.zeros((p, p), dtype)
    inf = jnp.asarray(jnp.inf, dtype)
    Z, U, t_f, r, s, it = jax.lax.while_loop(
        cond, body,
        (Z0, U0, jnp.asarray(t, dtype), inf, inf, jnp.asarray(0, jnp.int32)),
    )
    # One last Theta consistent with the returned Z; report the sparse
    # iterate Z as Theta (exact zeros from the soft threshold), W as its
    # inverse — the (W, Theta) contract of the BCD path.
    Theta = np.asarray(Z, np.float64)
    Theta = 0.5 * (Theta + Theta.T)
    W = np.linalg.inv(Theta)
    return W, Theta


def scale_data(X: np.ndarray):
    """Standardize columns: return (means, sds, normalized X)
    (``S.scale`` of the covariance package, app/Main.hs:261)."""
    mu = X.mean(axis=0)
    sd = X.std(axis=0, ddof=1)
    return mu, sd, (X - mu) / sd


def rescale_cov(sd: np.ndarray, sigma_norm: np.ndarray) -> np.ndarray:
    """Covariance of standardized data -> covariance of raw data."""
    return sigma_norm * np.outer(sd, sd)


def rescale_precision(sd: np.ndarray, prec_norm: np.ndarray) -> np.ndarray:
    """Precision of standardized data -> precision of raw data."""
    return prec_norm / np.outer(sd, sd)
