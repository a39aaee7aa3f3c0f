"""Pallas TPU row gather / scatter for the batched-sweep hot path.

The ticket-batched sweep (engine/fast_sweep.py) reads and writes *rows* of
large resident arrays — precision-matrix rows ``P[own]``, carried-state rows
``z[own]`` / ``d[own]`` — by dynamic per-step indices.  XLA's native gather
on this platform costs ~5 ms flat (the round-2 finding), so round 2 routed
these through one-hot matmuls on the MXU (~0.3-0.8 ms: an ``[R, D] @ [D, X]``
product that streams the WHOLE source array and burns R*D*X FLOPs to move
R*X values).

A Pallas kernel does the same data movement at HBM speed: a grid over the R
requested rows whose BlockSpec index map reads the row index from a
scalar-prefetch operand, so Mosaic's pipeline DMAs exactly the R requested
rows (R*X*4 bytes, double-buffered) and nothing else.

Padding convention: callers CLAMP invalid indices into range and mask the
gathered values (gather), or point them at a dedicated dump row appended to
the destination (scatter) — see ``fast_sweep``'s ``own_okb`` masks.  Scatter
indices must be unique per call (the planner guarantees disjoint rows within
a step); the dump row may repeat.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _copy_kernel(idx_ref, src_ref, out_ref):
    out_ref[...] = src_ref[...]


@jax.jit
def gather_rows(src, idx):
    """``src[idx]`` for 2-D ``src`` — one pipelined (1, X) DMA per index.

    ``idx`` values must already be valid row positions (callers clamp and
    mask).
    """
    R = idx.shape[0]
    X = src.shape[1]
    grid = (R,)
    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, X), lambda i, idx_ref: (idx_ref[i], 0)),
        ],
        out_specs=pl.BlockSpec((1, X), lambda i, idx_ref: (i, 0)),
    )
    return pl.pallas_call(
        _copy_kernel,
        grid_spec=spec,
        out_shape=jax.ShapeDtypeStruct((R, X), src.dtype),
    )(idx.astype(jnp.int32), src)


@jax.jit
def scatter_rows(dst, idx, values):
    """Out-of-place row scatter-WRITE: ``dst.at[idx].set(values)`` with the
    buffer donated (in-place on TPU).  ``idx`` must be unique except for
    repeats of a dump row whose written values are identical (the caller's
    padding convention); rows not addressed keep their contents.
    """
    R = idx.shape[0]
    X = dst.shape[1]
    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # dst: aliased, untouched
            pl.BlockSpec((1, X), lambda i, idx_ref: (i, 0)),
        ],
        out_specs=pl.BlockSpec((1, X), lambda i, idx_ref: (idx_ref[i], 0)),
    )

    def kernel(idx_ref, dst_ref, val_ref, out_ref):
        out_ref[...] = val_ref[...]

    return pl.pallas_call(
        kernel,
        grid_spec=spec,
        out_shape=jax.ShapeDtypeStruct(dst.shape, dst.dtype),
        input_output_aliases={1: 0},
    )(idx.astype(jnp.int32), dst, values)


def available() -> bool:
    """True when the Pallas TPU backend is usable on the default device."""
    try:
        dev = jax.devices()[0]
    except Exception:  # pragma: no cover
        return False
    return dev.platform == "tpu"
