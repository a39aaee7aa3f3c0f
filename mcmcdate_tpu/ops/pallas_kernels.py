"""Pallas TPU kernels for the likelihood hot path.

The whitened residual ``y = (d - mu) @ L`` is the full-evaluation path of
the sampler (DC_FULL proposals) and the core of bench.py.  XLA already fuses
the subtraction into the matmul well; this kernel exists to (a) pin the
layout/tiling explicitly, and (b) serve as the template for the round-2
"mega-kernel" plan (fusing proposal kernel + prior deltas + residual update
into one VMEM-resident pass, see PERF.md).

The kernel tiles chains x distance-dim onto the MXU with an accumulator
over the K dimension, computing ``y[c, j] = sum_k (d[c, k] - mu[k]) L[k, j]``
in f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _residual_kernel(d_ref, mu_ref, l_ref, out_ref, acc_ref, *, n_k):
    """Grid: (chains/TC, dim/TJ, K/TK); accumulate over the K axis."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    dx = d_ref[:] - mu_ref[:]  # [TC, TK] - [1, TK]
    acc_ref[:] += jnp.dot(
        dx, l_ref[:], preferred_element_type=jnp.float32
    )

    @pl.when(k == n_k - 1)
    def _():
        out_ref[:] = acc_ref[:]


def whitened_residual_pallas(d, mu, L, *, tc=128, tk=256, tj=256):
    """``(d - mu) @ L`` via a tiled Pallas MXU kernel.

    ``d``: [C, K]; ``mu``: [K]; ``L``: [K, J].  Shapes are padded to tile
    multiples; the zero padding contributes nothing to the contraction.
    """
    C, K = d.shape
    J = L.shape[1]

    def up(x, m):
        return (x + m - 1) // m * m

    Cp, Kp, Jp = up(C, tc), up(K, tk), up(J, tj)
    dp = jnp.pad(d, ((0, Cp - C), (0, Kp - K)))
    mup = jnp.pad(mu, (0, Kp - K))[None, :]
    Lp = jnp.pad(L, ((0, Kp - K), (0, Jp - J)))
    n_k = Kp // tk

    out = pl.pallas_call(
        functools.partial(_residual_kernel, n_k=n_k),
        grid=(Cp // tc, Jp // tj, n_k),
        in_specs=[
            pl.BlockSpec((tc, tk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk), lambda i, j, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tj), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tc, tj), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Cp, Jp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tc, tj), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * Cp * Kp * Jp,
            bytes_accessed=4 * (Cp * Kp + Kp * Jp + Cp * Jp),
            transcendentals=0,
        ),
    )(dp, mup, Lp)
    return out[:C, :J]
