"""Block-banded MVN precision: the TPU-native sparse likelihood kind.

The reference evaluates its sparse (graphical-lasso) precision as a true
sparse mat-vec (app/Main.hs:93-97, app/Probability.hs:178-184) — O(nnz) at
any dimension.  Unstructured sparsity is hostile to the TPU (gathers cost
~5 ms flat on this backend; the MXU wants dense tiles), and measurement
shows the glasso support is estimation noise anyway (a well-sampled
simulated treelist at rho=0.1 goes fully diagonal,
tools/sparse_structure_probe.py).  The TPU-first scaling kind is instead a
*banded* precision in the engine's internal pre-order layout:

- Estimation is the Cholesky banding estimator (regress each coordinate on
  its ``w`` predecessors; Bickel & Levina 2008, Rothman et al. 2010):
  ``P = T' D^{-1} T`` with ``T`` unit-lower-banded, so ``P = L L'`` with
  ``L = T' D^{-1/2}`` **upper**-banded and positive definite by
  construction.  Pre-order puts tree-adjacent branches mostly within-band,
  which is where the true correlations live (shared node heights /
  autocorrelated rates).
- Storage is the band ``L[i, i..i+w]`` — O(D w) instead of O(D^2); at
  10k taxa (D ~ 20k, the documented dense-path ceiling in PERF.md) the
  dense precision is 1.6 GB while the w=128 band is ~10 MB.
- Evaluation maps every dense-P site in the sweep onto three batched
  block matmuls: with block size ``wb >= w`` the precision is block
  tridiagonal, so ``X @ P`` is an einsum over ``[nb, 3, wb, wb]`` blocks —
  MXU tiles, no gathers, O(D wb) streamed per call.

Host helpers (NumPy, f64) build the band and its block form once at
prepare time; :func:`block_tridiag_matmul` / :func:`block_tridiag_matmul_t`
are the jittable device kernels.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Host-side estimation and block building
# ---------------------------------------------------------------------------


def estimate_banded_chol(xs: np.ndarray, w: int, ridge: float = 1e-3):
    """Cholesky banding estimator.

    ``xs``: [n_samples, D] data (already in the layout the band should live
    in).  Returns ``(mu [D], Lb [D, w+1], log_det_sigma)`` with ``Lb`` the
    upper band of ``L`` (``Lb[i, t] = L[i, i+t]``) such that the estimated
    precision is ``P = L L'`` and the model density is
    ``N(mu, P^{-1})``.

    Row ``i`` of the regression: ``x_i = sum_a phi_a x_{i-p+a} + eps_i``
    over the window ``p = min(w, i)``; then ``T[i, i-p+a] = -phi_a``,
    ``D_ii = var(eps_i)``, ``P = T' D^{-1} T``.  ``ridge`` scales an
    identity added to each window Gram (relative to its mean diagonal) so
    short samples stay well-posed.
    """
    xs = np.asarray(xs, np.float64)
    n, D = xs.shape
    w = int(min(w, D - 1)) if D > 1 else 0
    mu = xs.mean(axis=0)
    xc = xs - mu
    denom = max(n - 1, 1)
    # Covariance band: Sband[i, s] = Cov(x_i, x_{i-s}) for s = 0..w.
    Sband = np.zeros((D, w + 1))
    Sband[:, 0] = np.einsum("ni,ni->i", xc, xc) / denom
    for s in range(1, w + 1):
        Sband[s:, s] = np.einsum("ni,ni->i", xc[:, s:], xc[:, :-s]) / denom

    phi = np.zeros((D, w))          # phi[i, a]: coefficient on x_{i-p+a}
    sig2 = np.zeros(D)
    sig2[0] = Sband[0, 0]

    def _window_gram(i, p):
        # A[a, b] = Cov(x_{i-p+a}, x_{i-p+b}) from the band.
        r = i - p + np.arange(p)
        A = np.zeros((p, p))
        for a in range(p):
            for b in range(a, p):
                s = r[b] - r[a]
                A[a, b] = A[b, a] = Sband[r[b], s]
        return A

    # Small-i head: individual solves.
    head = min(w, D)
    for i in range(1, head):
        p = i
        A = _window_gram(i, p)
        c = Sband[i, p - np.arange(p)]
        A = A + ridge * (np.trace(A) / p) * np.eye(p)
        f = np.linalg.solve(A, c)
        phi[i, :p] = f
        sig2[i] = max(Sband[i, 0] - c @ f, 1e-12 * Sband[i, 0])

    # Tail i >= w: all windows are width w; batch the solves.
    if D > w and w > 0:
        idx = np.arange(w, D)
        # A_i[a, b] = Sband[i - w + max(a, b), |a - b|]
        a_g, b_g = np.meshgrid(np.arange(w), np.arange(w), indexing="ij")
        rows = idx[:, None, None] - w + np.maximum(a_g, b_g)[None]
        offs = np.abs(a_g - b_g)[None]
        A = Sband[rows, np.broadcast_to(offs, rows.shape)]
        tr = np.trace(A, axis1=1, axis2=2) / w
        A = A + ridge * tr[:, None, None] * np.eye(w)[None]
        c = Sband[idx[:, None], (w - np.arange(w))[None, :]]
        f = np.linalg.solve(A, c[..., None])[..., 0]
        phi[w:] = f
        resid = Sband[idx, 0] - np.einsum("ia,ia->i", c, f)
        sig2[w:] = np.maximum(resid, 1e-12 * Sband[idx, 0])

    inv_sd = 1.0 / np.sqrt(sig2)
    # L = T' D^{-1/2}: L[i, j] for j in [i, i+w];
    # L[i, i] = 1/sd_i, L[i, i+t] = T[i+t, i] / sd_{i+t} = -phi_{i+t, ...}.
    Lb = np.zeros((D, w + 1))
    Lb[:, 0] = inv_sd
    for t in range(1, w + 1):
        j = np.arange(t, D)                      # the regressed row i+t
        p = np.minimum(w, j)                     # its window width
        # coefficient of x_{j-t} in row j sits at slot a = p - t.
        a = p - t
        ok = a >= 0
        Lb[j[ok] - t, t] = -phi[j[ok], a[ok]] * inv_sd[j[ok]]
    log_det_sigma = float(np.sum(np.log(sig2)))
    return mu, Lb, log_det_sigma


def pband_from_chol_upper(Lb: np.ndarray) -> np.ndarray:
    """Symmetric band of ``P = L L'`` from the upper band of ``L``.

    Returns ``pband [D, w+1]`` with ``pband[i, s] = P[i, i+s]``
    (``P[i, i-s]`` by symmetry), ``s = 0..w``.
    """
    Lb = np.asarray(Lb, np.float64)
    D, w1 = Lb.shape
    w = w1 - 1
    pband = np.zeros((D, w + 1))
    # P[i, i+s] = sum_{t=s}^{w} Lb[i, t] * Lb[i+s, t-s]
    for s in range(w + 1):
        prod = Lb[: D - s, s:] * Lb[s:, : w + 1 - s]
        pband[: D - s, s] = prod.sum(axis=1)
    return pband


def blocks_from_sym_band(pband: np.ndarray, wb: int) -> np.ndarray:
    """Block-tridiagonal form ``B3 [nb, 3, wb, wb]`` of a symmetric-banded
    matrix given by ``pband [D, w+1]`` (``w <= wb`` required):
    ``B3[n, o] = M[n*wb:(n+1)*wb, (n+o-1)*wb:(n+o)*wb]`` (zero-padded at
    the edges)."""
    pband = np.asarray(pband, np.float64)
    D, w1 = pband.shape
    w = w1 - 1
    if w > wb:
        raise ValueError(f"band width {w} exceeds block size {wb}")
    nb = max(1, -(-D // wb))
    a_g, b_g = np.meshgrid(np.arange(wb), np.arange(wb), indexing="ij")
    B3 = np.zeros((nb, 3, wb, wb))
    for n in range(nb):
        i = n * wb + a_g
        for o in range(3):
            j = (n + o - 1) * wb + b_g
            s = j - i
            ok = (i < D) & (j >= 0) & (j < D) & (np.abs(s) <= w)
            ii = np.where(ok, np.where(s >= 0, i, j), 0)
            B3[n, o] = np.where(ok, pband[ii, np.abs(np.where(ok, s, 0))], 0.0)
    return B3


def blocks_from_upper_band(Lb: np.ndarray, wb: int) -> np.ndarray:
    """Block-tridiagonal form of the upper-banded ``L`` (sub-diagonal block
    is identically zero but kept for the shared matmul kernel)."""
    Lb = np.asarray(Lb, np.float64)
    D, w1 = Lb.shape
    w = w1 - 1
    if w > wb:
        raise ValueError(f"band width {w} exceeds block size {wb}")
    nb = max(1, -(-D // wb))
    a_g, b_g = np.meshgrid(np.arange(wb), np.arange(wb), indexing="ij")
    B3 = np.zeros((nb, 3, wb, wb))
    for n in range(nb):
        i = n * wb + a_g
        for o in (1, 2):
            j = (n + o - 1) * wb + b_g
            t = j - i
            ok = (i < D) & (j < D) & (t >= 0) & (t <= w)
            B3[n, o] = np.where(
                ok, Lb[np.where(ok, i, 0), np.where(ok, t, 0)], 0.0
            )
    return B3


def sym_band_matvec(pband: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Host ``P @ x`` for a symmetric-banded ``P`` (``pband[i, s] =
    P[i, i+s]``)."""
    pband = np.asarray(pband, np.float64)
    x = np.asarray(x, np.float64)
    D, w1 = pband.shape
    out = pband[:, 0] * x
    for s in range(1, w1):
        out[: D - s] += pband[: D - s, s] * x[s:]
        out[s:] += pband[: D - s, s] * x[: D - s]
    return out


# ---------------------------------------------------------------------------
# Device kernels
# ---------------------------------------------------------------------------


def block_tridiag_matmul(X, B3, D: int):
    """``X @ M`` for block-tridiagonal ``M`` given as ``B3 [nb, 3, wb, wb]``
    (``B3[n, o] = M[block n, block n+o-1]``).  ``X`` is ``[..., D]``; the
    result is ``[..., D]``.  Three batched MXU matmuls + two block shifts —
    O(D * wb) FLOPs per batch row instead of the O(D^2) of a dense
    right-multiplication."""
    nb, _, wb, _ = B3.shape
    pad = nb * wb - D
    lead = X.shape[:-1]
    if pad:
        X = jnp.concatenate(
            [X, jnp.zeros(lead + (pad,), X.dtype)], axis=-1
        )
    Xb = X.reshape(lead + (nb, wb))
    T = jnp.einsum("...nw,nowv->...nov", Xb, B3)
    z = jnp.zeros(lead + (1, wb), X.dtype)
    # out[m] = T[m+1, 0] + T[m, 1] + T[m-1, 2]
    out = (
        jnp.concatenate([T[..., 1:, 0, :], z], axis=-2)
        + T[..., 1, :]
        + jnp.concatenate([z, T[..., :-1, 2, :]], axis=-2)
    )
    out = out.reshape(lead + (nb * wb,))
    return out[..., :D]


def block_tridiag_matmul_t(X, B3, D: int):
    """``X @ M.T`` for the same block-tridiagonal representation."""
    nb, _, wb, _ = B3.shape
    pad = nb * wb - D
    lead = X.shape[:-1]
    if pad:
        X = jnp.concatenate(
            [X, jnp.zeros(lead + (pad,), X.dtype)], axis=-1
        )
    Xb = X.reshape(lead + (nb, wb))
    z = jnp.zeros(lead + (1, wb), X.dtype)
    # out[m] = sum_o Xb[m+o-1] @ B3[m, o].T
    x0 = jnp.concatenate([z, Xb[..., :-1, :]], axis=-2)     # Xb[m-1]
    x2 = jnp.concatenate([Xb[..., 1:, :], z], axis=-2)      # Xb[m+1]
    out = (
        jnp.einsum("...nv,nwv->...nw", x0, B3[:, 0])
        + jnp.einsum("...nv,nwv->...nw", Xb, B3[:, 1])
        + jnp.einsum("...nv,nwv->...nw", x2, B3[:, 2])
    )
    out = out.reshape(lead + (nb * wb,))
    return out[..., :D]


def default_block_size(w: int) -> int:
    """Block size for a band of width ``w``: at least ``w``, padded up to
    the MXU-friendly 128 when the band is narrower."""
    return max(w, 128)
