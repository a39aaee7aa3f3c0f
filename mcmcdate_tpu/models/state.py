"""Model state space — the flat-array analog of the reference's ``IG a``
record (app/State.hs:70-91).

The reference stores two rose trees plus five scalars; here the state is a
small pytree of dense vectors, so it vmaps over chains and shards over
meshes.  Relative parameterization (app/State.hs:25-68): a branch's length in
expected substitutions is ``d_i = (t_i * height) * (r_i * rate_mean)``.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

from ..tree.flat import FlatTopology
from ..tree.rose import Node, make_ultrametric, node_heights, normalize_height


@struct.dataclass
class State:
    """Sampler state.  All leaves are JAX arrays; an extra leading axis on
    every leaf turns one state into a batch of chains."""

    birth: jnp.ndarray  # () timeBirthRate
    death: jnp.ndarray  # () timeDeathRate
    height: jnp.ndarray  # () timeHeight (absolute)
    heights: jnp.ndarray  # [N] relative node heights; root 1, leaves 0
    rate_mean: jnp.ndarray  # () rateMean
    rate_var: jnp.ndarray  # () rateVariance
    rates: jnp.ndarray  # [N] relative branch rates; root entry unused (stem)


def init_state(tree: Node, topo: FlatTopology, dtype=jnp.float64) -> State:
    """Initial state from a tree with branch lengths (``initWith``,
    app/Definitions.hs:96-123): make the tree ultrametric, normalize its
    height to one, set all rates and hyper-parameters to one.  Zero-length
    branches (excluding the stem) are replaced by the average branch length
    before the ultrametric transform."""
    t = tree.copy()
    bs = [n.length for c in t.children for n in c.preorder()]
    n_branches = len(bs)
    avg = sum(bs) / n_branches if n_branches else 1.0
    for c in t.children:
        for n in c.preorder():
            if n.length == 0:
                n.length = avg
    t.length = 0.0
    tn = normalize_height(make_ultrametric(t))
    hs = np.asarray(node_heights(tn), dtype=np.float64)
    hs[np.asarray(topo.is_leaf)] = 0.0
    hs[0] = 1.0
    one = jnp.asarray(1.0, dtype)
    return State(
        birth=one,
        death=one,
        height=one,
        heights=jnp.asarray(hs, dtype),
        rate_mean=one,
        rate_var=one,
        rates=jnp.ones(topo.n, dtype),
    )


def is_valid_state(state: State, topo: FlatTopology):
    """``isValidState`` (app/State.hs:108-118) as a jittable predicate."""
    parent = jnp.asarray(topo.parent)
    is_leaf = jnp.asarray(topo.is_leaf)
    non_root = parent >= 0
    hp = state.heights[parent]
    heights_ok = (
        jnp.all(jnp.where(non_root, hp > state.heights, True))
        & jnp.all(jnp.where(is_leaf, state.heights == 0, True))
        & (state.heights[0] == 1.0)
    )
    rates_ok = jnp.all(jnp.where(non_root, state.rates > 0, True))
    scalars_ok = (
        (state.birth > 0)
        & (state.death > 0)
        & (state.height > 0)
        & (state.rate_mean > 0)
        & (state.rate_var > 0)
    )
    return heights_ok & rates_ok & scalars_ok
