"""State-to-branch transforms: the core parameterization of the model.

Replaces ``heightTreeToLengthTree`` (lib/Mcmc/Tree/Types.hs:224-233) and the
branch/distance-vector assembly of the likelihood wrapper
(app/Probability.hs:195-207, app/Tools.hs:36-48) with gathers over the flat
topology.  Branch length of node ``i`` is ``heights[parent[i]] - heights[i]``
— no negativity check, so gradients flow (the priors reject invalid states).
"""

from __future__ import annotations

import jax.numpy as jnp


def branch_lengths(heights, parent):
    """Relative time branch lengths per node (root entry is meaningless and
    must be masked by callers)."""
    return heights[parent] - heights


def distances(time_lengths, rates, height, rate_mean, dist_node_index, root_right):
    """Distance vector in expected substitutions, reference branch order.

    ``d = (height * rate_mean) * sumFirstTwo(times * rates)`` with the two
    root-adjacent branches summed into the first entry
    (app/Probability.hs:201-207).
    """
    lens = time_lengths * rates
    d = lens[dist_node_index]
    d = d.at[0].add(lens[root_right])
    return d * (height * rate_mean)


def distances_from_state(state, topo):
    """Distance vector from a model state, reference order."""
    tl = branch_lengths(state.heights, jnp.asarray(topo.parent))
    return distances(
        tl,
        state.rates,
        state.height,
        state.rate_mean,
        jnp.asarray(topo.dist_node_index),
        topo.root_children[1],
    )


def distances_internal(state, topo):
    """Distance vector in the INTERNAL (pre-order) layout (see
    FlatTopology.internal_dist_index); used by the incremental likelihood
    path of the sampler."""
    tl = branch_lengths(state.heights, jnp.asarray(topo.parent))
    return distances(
        tl,
        state.rates,
        state.height,
        state.rate_mean,
        jnp.asarray(topo.internal_dist_index),
        topo.root_children[1],
    )


def root_branch(state, topo):
    """The root branch of the induced unrooted tree in expected
    substitutions: ``tH * rMu * (t1 r1 + t2 r2)`` (app/Probability.hs:393-404).
    Used as the Jacobian of root-adjacent proposals."""
    l, r = topo.root_children
    hl = state.heights[l]
    hr = state.heights[r]
    t1 = state.heights[0] - hl
    t2 = state.heights[0] - hr
    return state.height * state.rate_mean * (t1 * state.rates[l] + t2 * state.rates[r])


def log_jacobian_root_branch(state, topo):
    """log of ``jacobianRootBranch`` = -log(rootBranch)
    (app/Probability.hs:408-410)."""
    return -jnp.log(root_branch(state, topo))
