"""Device mesh and chain sharding.

The reference is a single-process CPU program (SURVEY.md §2.5); the TPU
design scales by sharding the CHAIN batch across devices with
``jax.sharding`` — chains are embarrassingly parallel, so the only
collectives are cross-chain diagnostics (psum/all_gather) and MC3 swap
permutations, which ride the ICI.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CHAIN_AXIS = "chains"


def chain_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = np.asarray(jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs.reshape(-1), (CHAIN_AXIS,))


def shard_chains(batch, mesh: Mesh):
    """Shard the leading (chain) axis of every leaf over the mesh."""
    sharding = NamedSharding(mesh, P(CHAIN_AXIS))

    def put(x):
        if getattr(x, "ndim", 0) >= 1:
            return jax.device_put(x, sharding)
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(put, batch)


def replicate(x, mesh: Mesh):
    return jax.tree.map(
        lambda v: jax.device_put(v, NamedSharding(mesh, P())), x
    )


def sharded_sweeps(kern, mesh: Mesh, n: int, beta=1.0, collect=None):
    """Jitted chain-sharded sweep runner.

    The sweep program is pure data-parallel over chains; with the batch
    sharded on the mesh, XLA partitions it with zero communication.  The
    returned function takes ``(batch, tuning, key)`` like
    ``MHKernel.sweeps``.
    """
    sharding = NamedSharding(mesh, P(CHAIN_AXIS))
    rep = NamedSharding(mesh, P())

    def run(batch, tuning, key):
        return kern.sweeps(batch, tuning, key, n, beta=beta, collect=collect)

    return jax.jit(run)


def cross_chain_mean(x):
    """Mean over the (possibly sharded) chain axis — compiles to a psum when
    the axis is device-sharded."""
    return jnp.mean(x, axis=0)
