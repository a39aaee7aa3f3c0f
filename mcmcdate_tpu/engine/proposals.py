"""Proposal kernels and the weighted proposal cycle — all jittable.

Re-designs the reference's proposal taxonomy (lib/Mcmc/Tree/Proposal/*,
app/Definitions.hs:127-278) for TPU: every proposal is a pure function
``(state, key, tune, row) -> (state', log_mhg)`` acting on dense vectors via
masked/gathered updates; the cycle is a static table of proposal rows
(kind, node, tuning, weight, ...) expanded by weight into tickets and
executed as a shuffled ``lax.scan`` with a ``lax.switch`` over kinds — the
whole sweep jits and vmaps over chains.

``log_mhg`` is the log Metropolis-Hastings-Green factor: kernel ratio plus
the FULL log determinant of the (state, auxiliary) -> (state', auxiliary')
map.  Two proposals deviate deliberately from the reference's recorded
exponents where those disagree with the determinant of the map (derivations
in the kernel docstrings): ``scale_var_rate_tree`` (reference
Unconstrained.hs:321-326) and ``slide_root_contra`` (reference
Contrary.hs:173-189).  Both agree to first order around u = 1.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.state import State
from ..ops.dists import gamma_scale_sample, truncated_normal_sample
from ..ops.node_priors import BraceSet
from ..tree.flat import FlatTopology

# Proposal kinds.
K_SCALE_SCALAR = 0
K_SCALE_HEIGHT_RATEMEAN_CONTRA = 1
K_SLIDE_NODE_ULTRA = 2
K_SCALE_SUBTREE_ULTRA = 3
K_PULLEY_ULTRA = 4
K_SCALE_BRANCH_RATE = 5
K_SCALE_SUBTREE_RATE = 6
K_SCALE_NORM_RATE_TREE_CONTRA = 7
K_SCALE_VAR_RATE_TREE = 8
K_SCALE_VAR_RATE_TREE_AUTOCORR = 9
K_SLIDE_NODES_CONTRA = 10
K_SCALE_SUBTREES_CONTRA = 11
K_SLIDE_ROOT_CONTRA = 12
K_SCALE_NORM_HEIGHT_RATE_TREE_CONTRA = 13
K_SCALE_RATES_TIME_TREE_CONTRA = 14
K_SLIDE_BRACED_ULTRA = 15
K_SLIDE_BRACED_CONTRA = 16
N_KINDS = 17

# aux codes for K_SCALE_SCALAR.  The last two are TPU-side extras with no
# reference analog: joint moves along the two principal directions of the
# weakly-identified (birth, death) pair (the reference only moves each rate
# alone, app/Definitions.hs:259-260, which mixes the near-flat ridge of the
# birth-death posterior with a tiny effective step; a joint ray scale
# (b,d) -> (ub, ud) and its contrary (ub, d/u) traverse the ridge directly).
(SC_BIRTH, SC_DEATH, SC_RATE_MEAN, SC_RATE_VAR, SC_HEIGHT,
 SC_BIRTH_DEATH, SC_BIRTH_DEATH_CONTRA) = range(7)

# Likelihood-update classes (static per proposal row).  The whitened
# residual y = (d - mu) @ L is updated incrementally:
#
# - DC_INV: the proposal leaves the distance vector EXACTLY invariant.
#   This covers every "contrary" move — their defining property is that the
#   expected number of substitutions per branch is unchanged (e.g.
#   slideNodesAtContrarily rescales rates by (h_p-h)/(h_p-h') so t*r is
#   constant, Contrary.hs:48-64) — plus scalar moves on parameters the
#   distances do not involve (birth, death, rate variance).
# - DC_FULL: recompute y (pulley, the variance-spread kernels, scalar
#   height / rate-mean scales; all carry O(1) weight, so full O(n^2)
#   evaluations are a vanishing fraction of a sweep).
# - DC_GATHER: <= KG statically-known entries change (node slides: the
#   node's branch and its children; single branch scales; braced slides;
#   scaleRatesAndTreeContrarily touches only the merged root entry 0).
# - DC_B64/B256/B1024: a contiguous internal-layout range changes (sub-tree
#   scales); entry 0 is handled by an unconditional extra term.
DC_INV, DC_FULL, DC_GATHER, DC_B64, DC_B256, DC_B1024 = range(6)
D_BUCKETS = {DC_B64: 64, DC_B256: 256, DC_B1024: 1024}

# Prior-term block classes: which of the [scalars, bd, clock, nodes] blocks
# a proposal can change.  Skipped blocks reuse the carried values (their
# acceptance delta is exactly zero).
PC_SC, PC_SC_BD, PC_SC_CK, PC_CK, PC_ND, PC_SC_ND, PC_BD_CK_ND, PC_ALL = range(8)
PC_BLOCKS = {  # (scalars, bd, clock, nodes)
    PC_SC: (1, 0, 0, 0),
    PC_SC_BD: (1, 1, 0, 0),
    PC_SC_CK: (1, 0, 1, 0),
    PC_CK: (0, 0, 1, 0),
    PC_ND: (0, 0, 0, 1),
    PC_SC_ND: (1, 0, 0, 1),
    PC_BD_CK_ND: (0, 1, 1, 1),
    PC_ALL: (1, 1, 1, 1),
}

NEG_INF = -jnp.inf


@dataclass(frozen=True)
class ProposalTable:
    """Static description of the proposal cycle.

    Mirrors ``proposals`` (app/Definitions.hs:256-278): one row per proposal
    instance; ``tickets`` repeats row indices by weight (``PWeight``); a
    sweep executes the tickets in random order.
    """

    kind: np.ndarray  # int32[P]
    node: np.ndarray  # int32[P] target node (or -1)
    aux: np.ndarray  # int32[P] scalar selector / brace index
    par: np.ndarray  # f64[P] base sd (slides) or gamma shape (scales)
    weight: np.ndarray  # int32[P]
    dim: np.ndarray  # int32[P] PDimension (sets the tuned acceptance target)
    root_jac: np.ndarray  # bool[P] multiply by jacobianRootBranch ratio
    names: Tuple[str, ...]
    tickets: np.ndarray  # int32[T] row index per ticket
    d_class: np.ndarray = None  # int32[P] likelihood-update class (DC_*)
    d_lo: np.ndarray = None  # int32[P] range start for DC_B* rows
    didx: np.ndarray = None  # int32[P, KG] gathered entries; pad = D (zero row)
    prior_class: np.ndarray = None  # int32[P] prior-block class (PC_*)

    @property
    def n_proposals(self) -> int:
        return len(self.kind)

    @property
    def n_tickets(self) -> int:
        return len(self.tickets)

    def init_tuning(self, dtype=jnp.float64):
        return jnp.ones(self.n_proposals, dtype)

    def tune_max(self) -> np.ndarray:
        """Per-proposal tuning upper bound.

        Gamma-scale kernels keep shape ``par / t >= 2``.  The variance-spread
        kernels (scaleVarianceAndTree and its autocorrelated variant) keep
        shape ``>= 10``: heavier kernels propose u ~ 3-5 jumps that
        occasionally tunnel the chain into the near-zero-mass
        (large variance, large rates) ridge where exits are exponentially
        slow — a metastability the reference never exposes because its
        auto-tuner leaves these shape-100 kernels at O(1) tuning.
        """
        is_scale = np.isin(
            self.kind,
            [K_SCALE_SCALAR, K_SCALE_HEIGHT_RATEMEAN_CONTRA, K_SCALE_BRANCH_RATE,
             K_SCALE_SUBTREE_RATE, K_SCALE_NORM_RATE_TREE_CONTRA,
             K_SCALE_NORM_HEIGHT_RATE_TREE_CONTRA],
        )
        is_spread = np.isin(
            self.kind, [K_SCALE_VAR_RATE_TREE, K_SCALE_VAR_RATE_TREE_AUTOCORR]
        )
        out = np.where(is_scale, np.minimum(self.par / 2.0, 1e2), 1e2)
        return np.where(is_spread, self.par / 10.0, out)

    def target_rates(self) -> np.ndarray:
        """Optimal acceptance rate per proposal from its dimension: 0.44 for
        one dimension falling linearly to 0.234 at five or more (the classic
        Roberts-Gelman-Gilks targets; mirrors the reference engine's
        PDimension-based tuning targets)."""
        d = np.clip(self.dim.astype(np.float64), 1, 5)
        return 0.44 + (0.234 - 0.44) * (d - 1) / 4.0


def weight_n_branches(n_nodes: int) -> int:
    """Weight of global proposals: floor(log_1.3 N) (Definitions.hs:127-130)."""
    return int(math.floor(math.log(n_nodes) / math.log(1.3)))


def build_proposal_table(
    topo: FlatTopology,
    braces: BraceSet,
    calibrations_available: bool,
) -> ProposalTable:
    """Assemble the full cycle (app/Definitions.hs:256-278)."""
    rows: List[Tuple] = []

    def add(kind, node, aux, par, weight, dim, root_jac, name,
            dclass=DC_FULL, dlo=1, didx=(), pclass=PC_ALL):
        if weight > 0:
            rows.append((kind, node, aux, par, weight, dim, root_jac, name,
                         dclass, dlo, tuple(didx), pclass))

    n = topo.n
    w_nb = weight_n_branches(n)
    inner = [int(i) for i in topo.inner_nodes if i != 0]
    depth = topo.depth
    level = topo.level
    n_inner_sub = topo.n_inner_subtree
    n_nodes_sub = topo.n_nodes_subtree
    n_inner_total = int((~topo.is_leaf).sum())

    def depth_weight(i):
        # min(wMin + depth - 2, wMax), wMin=3, wMax=8 (Ultrametric.hs:211-217)
        return min(3 + int(depth[i]) - 2, 8)

    pos = topo.internal_pos

    def range_of(i):
        lo, hi = topo.dist_range(i)
        ln = hi - lo
        if ln <= 64:
            return DC_B64, lo
        if ln <= 256:
            return DC_B256, lo
        if ln <= 1024:
            return DC_B1024, lo
        return DC_FULL, 1

    def slide_idx(i):
        out = {int(pos[i])}
        for c in topo.children[i]:
            if c >= 0:
                out.add(int(pos[c]))
        return sorted(out)

    # Hyper-parameter scales (Definitions.hs:259-262).  Birth, death, and
    # rate variance do not enter the distances: likelihood-invariant.
    add(K_SCALE_SCALAR, -1, SC_BIRTH, 10.0, w_nb, 1, False, "Time birth rate",
        DC_INV, pclass=PC_SC_BD)
    add(K_SCALE_SCALAR, -1, SC_DEATH, 10.0, w_nb, 1, False, "Time death rate",
        DC_INV, pclass=PC_SC_BD)
    # Joint (birth, death) ridge moves (see the SC_* comment above).
    add(K_SCALE_SCALAR, -1, SC_BIRTH_DEATH, 10.0, w_nb, 2, False,
        "Time birth and death rates", DC_INV, pclass=PC_SC_BD)
    add(K_SCALE_SCALAR, -1, SC_BIRTH_DEATH_CONTRA, 10.0, w_nb, 2, False,
        "Time birth and death rates (contrary)", DC_INV, pclass=PC_SC_BD)
    add(K_SCALE_SCALAR, -1, SC_RATE_MEAN, 10.0, w_nb, 1, False, "Rate mean",
        DC_FULL, pclass=PC_SC)
    add(K_SCALE_SCALAR, -1, SC_RATE_VAR, 10.0, w_nb, 1, False, "Rate variance",
        DC_INV, pclass=PC_SC_CK)
    # Rates and time tree contrary (Definitions.hs:263, 275): all inner
    # branches are rate-compensated; only the merged root entry changes.
    add(
        K_SCALE_RATES_TIME_TREE_CONTRA, 0, -1, 0.1, w_nb,
        (n_inner_total - 1) + 2, True, "Rates and time tree",
        DC_GATHER, 1, [0], PC_ALL,
    )

    # Time tree proposals (Definitions.hs:144-166).
    l, r = topo.root_children
    if not topo.is_leaf[l] and not topo.is_leaf[r]:
        add(
            K_PULLEY_ULTRA, 0, -1, 0.01, 6,
            int(n_inner_sub[l] + n_inner_sub[r]), True, "[R] Time tree pulley",
            DC_FULL, pclass=PC_BD_CK_ND,
        )
    for i in inner:
        rj = level[i] == 1
        tag = "[R]" if rj else "[O]"
        add(K_SLIDE_NODE_ULTRA, i, -1, 0.01, 5, 1, rj,
            f"{tag} Time tree slide node {i}", DC_GATHER, 1, slide_idx(i),
            PC_BD_CK_ND)
        dc, dlo = range_of(i)
        add(
            K_SCALE_SUBTREE_ULTRA, i, -1, 0.01, depth_weight(i),
            int(n_inner_sub[i]), rj, f"{tag} Time tree scale sub tree {i}",
            dc, dlo, pclass=PC_BD_CK_ND,
        )
    for b in range(braces.n):
        nodes_b = [int(x) for x in braces.node[b] if x >= 0]
        bidx = sorted({j for x in nodes_b for j in slide_idx(x)})
        add(
            K_SLIDE_BRACED_ULTRA, -1, b, 0.01, 5, len(nodes_b), False,
            f"[B] Time tree brace {braces.names[b] if braces.names else b}",
            DC_GATHER, 1, bidx, PC_BD_CK_ND,
        )

    # Rate tree proposals (Definitions.hs:180-201).  The norm-contrary move
    # rescales rates against the mean: distances invariant.
    add(
        K_SCALE_NORM_RATE_TREE_CONTRA, -1, -1, 100.0, w_nb, n, True,
        "[R] Rate mean, Rate tree", DC_INV, pclass=PC_SC_CK,
    )
    add(K_SCALE_VAR_RATE_TREE, -1, -1, 100.0, w_nb, n, True,
        "[R] Rate variance, Rate tree", DC_FULL, pclass=PC_SC_CK)
    add(
        K_SCALE_VAR_RATE_TREE_AUTOCORR, -1, -1, 100.0, w_nb, n, True,
        "[R] Rate variance, Rate tree (autocorrelated)", DC_FULL,
        pclass=PC_SC_CK,
    )
    for i in range(1, n):
        rj = level[i] == 1
        tag = "[R]" if rj else "[O]"
        add(K_SCALE_BRANCH_RATE, i, -1, 100.0, 3, 1, rj,
            f"{tag} Rate tree scale branch {i}", DC_GATHER, 1, [int(pos[i])],
            PC_CK)
    for i in inner:
        rj = level[i] == 1
        tag = "[R]" if rj else "[O]"
        dc, dlo = range_of(i)
        add(
            K_SCALE_SUBTREE_RATE, i, -1, 100.0, depth_weight(i),
            int(n_nodes_sub[i]), rj, f"{tag} Rate tree scale sub tree {i}",
            dc, dlo, pclass=PC_CK,
        )

    # Contrary proposals on both trees (Definitions.hs:204-221): rates are
    # rescaled so t*r stays constant per branch — likelihood-invariant.
    for i in inner:
        rj = level[i] == 1
        tag = "[C] [R]" if rj else "[C] [O]"
        ndaughters = int(topo.n_children[i])
        add(
            K_SLIDE_NODES_CONTRA, i, -1, 0.1, depth_weight(i),
            1 + 1 + ndaughters, rj, f"{tag} Trees slide node {i}", DC_INV,
            pclass=PC_BD_CK_ND,
        )
        add(
            K_SCALE_SUBTREES_CONTRA, i, -1, 0.1, depth_weight(i),
            int(n_inner_sub[i] + n_nodes_sub[i]), rj,
            f"{tag} Trees scale sub tree {i}", DC_INV, pclass=PC_BD_CK_ND,
        )
    for b in range(braces.n):
        nodes_b = [int(x) for x in braces.node[b] if x >= 0]
        ndaughters = sum(int(topo.n_children[x]) for x in nodes_b)
        add(
            K_SLIDE_BRACED_CONTRA, -1, b, 0.1, 5,
            len(nodes_b) * 2 + ndaughters, False,
            f"[C] [B] Trees brace {braces.names[b] if braces.names else b}",
            DC_INV, pclass=PC_BD_CK_ND,
        )

    # Proposals changing the absolute time height — only when calibrated
    # (Definitions.hs:241-253).
    if calibrations_available:
        add(K_SCALE_SCALAR, -1, SC_HEIGHT, 3000.0, w_nb, 1, False,
            "Time height", DC_FULL, pclass=PC_ND)
        add(
            K_SCALE_HEIGHT_RATEMEAN_CONTRA, -1, -1, 10.0, w_nb, 2, False,
            "Time height, rate mean", DC_INV, pclass=PC_SC_ND,
        )
        add(
            K_SCALE_NORM_HEIGHT_RATE_TREE_CONTRA, -1, -1, 100.0, w_nb, n, True,
            "[R] Time height, Rate tree", DC_INV, pclass=PC_BD_CK_ND,
        )
        add(
            K_SLIDE_ROOT_CONTRA, 0, -1, 10.0, w_nb,
            1 + n_inner_total + int(topo.n_children[0]), True,
            "[R] Trees slide root", DC_INV, pclass=PC_BD_CK_ND,
        )

    kind = np.asarray([x[0] for x in rows], np.int32)
    node = np.asarray([x[1] for x in rows], np.int32)
    aux = np.asarray([x[2] for x in rows], np.int32)
    par = np.asarray([x[3] for x in rows], np.float64)
    weight = np.asarray([x[4] for x in rows], np.int32)
    dim = np.asarray([x[5] for x in rows], np.int32)
    root_jac = np.asarray([x[6] for x in rows], bool)
    names = tuple(x[7] for x in rows)
    d_class = np.asarray([x[8] for x in rows], np.int32)
    d_lo = np.asarray([x[9] for x in rows], np.int32)
    prior_class = np.asarray([x[11] for x in rows], np.int32)
    kg = max(max((len(x[10]) for x in rows), default=1), 1)
    n_dist = topo.n - 2
    didx = np.full((len(rows), kg), n_dist, np.int32)  # pad -> zero row
    for p, x in enumerate(rows):
        for j, v in enumerate(x[10]):
            didx[p, j] = v
    tickets = np.concatenate(
        [np.full(w, p, np.int32) for p, w in enumerate(weight)]
    )
    return ProposalTable(kind, node, aux, par, weight, dim, root_jac, names,
                         tickets, d_class, d_lo, didx, prior_class)


# ---------------------------------------------------------------------------
# Kernels.  Row fields arrive as traced scalars gathered from the table:
# row = (node, aux, par, tune).  Each returns (state', log_mhg).
# ---------------------------------------------------------------------------


def _max_child_height(heights, topo, i):
    ch = jnp.asarray(topo.children)[i]
    hc = jnp.where(ch >= 0, heights[jnp.clip(ch, min=0)], -jnp.inf)
    return jnp.max(hc)


def _subtree_mask(topo, i, proper=False):
    idx = jnp.arange(topo.n)
    lo = i + 1 if proper else i
    return (idx >= lo) & (idx < jnp.asarray(topo.subtree_end)[i])


def _k_scale_scalar(state, key, tune, node, aux, par, topo):
    u, base, logu = gamma_scale_sample(key, par, tune)
    # n_up - n_down coordinates scaled by u: 1 for the single-scalar moves,
    # 2 for the joint (birth, death) ray, 0 for its contrary variant.
    coef = jnp.where(aux == SC_BIRTH_DEATH, 2.0,
                     jnp.where(aux == SC_BIRTH_DEATH_CONTRA, 0.0, 1.0))
    log_mhg = base + coef * logu
    b_fac = jnp.where(
        (aux == SC_BIRTH) | (aux == SC_BIRTH_DEATH)
        | (aux == SC_BIRTH_DEATH_CONTRA), u, 1.0)
    d_fac = jnp.where(
        (aux == SC_DEATH) | (aux == SC_BIRTH_DEATH), u,
        jnp.where(aux == SC_BIRTH_DEATH_CONTRA, 1.0 / u, 1.0))
    new = state.replace(
        birth=state.birth * b_fac,
        death=state.death * d_fac,
        rate_mean=jnp.where(aux == SC_RATE_MEAN, state.rate_mean * u, state.rate_mean),
        rate_var=jnp.where(aux == SC_RATE_VAR, state.rate_var * u, state.rate_var),
        height=jnp.where(aux == SC_HEIGHT, state.height * u, state.height),
    )
    return new, log_mhg


def _k_scale_height_ratemean_contra(state, key, tune, node, aux, par, topo):
    """scaleContrarily on (timeHeight, rateMean) (Definitions.hs:244):
    x -> x*u, y -> y/u; exponent 1 - 1 - 2 = -2 (in the base factor)."""
    u, base, logu = gamma_scale_sample(key, par, tune)
    new = state.replace(height=state.height * u, rate_mean=state.rate_mean / u)
    return new, base


def _k_slide_node_ultra(state, key, tune, node, aux, par, topo):
    """slideNodeAtUltrametric (Ultrametric.hs:50-99): truncated-normal slide
    of one inner node height between its highest child and its parent."""
    i = node
    h = state.heights
    hi = h[i]
    hp = h[jnp.asarray(topo.parent)[i]]
    hc = _max_child_height(h, topo, i)
    hnew, lq = truncated_normal_sample(key, hi, par, tune, hc, hp)
    return state.replace(heights=h.at[i].set(hnew)), lq


def _k_scale_subtree_ultra(state, key, tune, node, aux, par, topo):
    """scaleSubTreeAtUltrametric (Ultrametric.hs:126-188): rescale the node
    heights of the sub tree; Jacobian xi^(n_inner - 1)."""
    i = node
    h = state.heights
    hi = h[i]
    hp = h[jnp.asarray(topo.parent)[i]]
    hnew, lq = truncated_normal_sample(key, hi, par, tune, 0.0, hp)
    xi = hnew / hi
    mask = _subtree_mask(topo, i)
    h2 = jnp.where(mask, h * xi, h)
    n_inner = jnp.asarray(topo.n_inner_subtree)[i]
    log_jac = (n_inner - 1) * jnp.log(xi)
    return state.replace(heights=h2), lq + log_jac


def _k_pulley_ultra(state, key, tune, node, aux, par, topo):
    """pulleyUltrametric at the root (Ultrametric.hs:228-316)."""
    l, r = topo.root_children
    h = state.heights
    ht = h[0]
    hl, hr = h[l], h[r]
    brl, brr = ht - hl, ht - hr
    a = -jnp.minimum(brl, hr)
    b = jnp.minimum(brr, hl)
    u, lq = truncated_normal_sample(key, 0.0, par, tune, a, b)
    hl2, hr2 = hl - u, hr + u
    xil, xir = hl2 / hl, hr2 / hr
    mask_l = _subtree_mask(topo, l)
    mask_r = _subtree_mask(topo, r)
    h2 = jnp.where(mask_l, h * xil, jnp.where(mask_r, h * xir, h))
    nl = topo.n_inner_subtree[l]
    nr = topo.n_inner_subtree[r]
    log_jac = (nl - 1) * jnp.log(xil) + (nr - 1) * jnp.log(xir)
    return state.replace(heights=h2), lq + log_jac


def _k_scale_branch_rate(state, key, tune, node, aux, par, topo):
    """scaleBranchAt with a gamma kernel (Unconstrained.hs:45-85)."""
    u, base, logu = gamma_scale_sample(key, par, tune)
    return state.replace(rates=state.rates.at[node].multiply(u)), base + logu


def _k_scale_subtree_rate(state, key, tune, node, aux, par, topo):
    """scaleSubTreeAt (Unconstrained.hs:95-137): scale all branches of the
    sub tree including its stem; Jacobian u^(n-2) with n branches."""
    u, base, logu = gamma_scale_sample(key, par, tune)
    mask = _subtree_mask(topo, node)
    rates = jnp.where(mask, state.rates * u, state.rates)
    n = jnp.asarray(topo.n_nodes_subtree)[node]
    return state.replace(rates=rates), base + n * logu


def _k_scale_norm_rate_tree_contra(state, key, tune, node, aux, par, topo):
    """scaleNormAndTreeContrarily on (rateMean, rateTree)
    (Unconstrained.hs:232-284): norm / u, branches (without stem) * u."""
    u, base, logu = gamma_scale_sample(key, par, tune)
    non_root = jnp.asarray(topo.parent) >= 0
    rates = jnp.where(non_root, state.rates * u, state.rates)
    n = topo.n - 1
    new = state.replace(rate_mean=state.rate_mean / u, rates=rates)
    return new, base + (n - 1) * logu


def _k_scale_norm_height_rate_tree_contra(state, key, tune, node, aux, par, topo):
    """Same proposal applied to (timeHeight, rateTree) (Definitions.hs:245)."""
    u, base, logu = gamma_scale_sample(key, par, tune)
    non_root = jnp.asarray(topo.parent) >= 0
    rates = jnp.where(non_root, state.rates * u, state.rates)
    n = topo.n - 1
    new = state.replace(height=state.height / u, rates=rates)
    return new, base + (n - 1) * logu


def _k_scale_var_rate_tree(state, key, tune, node, aux, par, topo):
    """scaleVarianceAndTree (Unconstrained.hs:286-370): variance * u^2,
    branches spread around their sample mean: b -> (b - mean) u + mean.

    Log determinant: the linear map A = u I + (1-u)/n 11' on the n branch
    coordinates has eigenvalues u (n-1 times) and 1 (mean direction), so
    |det| = u^2 * u^(n-1) * u^-2 = u^(n-1).  (The reference records
    n*log(u - u/n + 1/n), Unconstrained.hs:321-326, which agrees to first
    order at u = 1; we use the exact determinant.)
    """
    u, base, logu = gamma_scale_sample(key, par, tune)
    non_root = jnp.asarray(topo.parent) >= 0
    n = topo.n - 1
    mean = jnp.sum(jnp.where(non_root, state.rates, 0.0)) / n
    rates_new = (state.rates - mean) * u + mean
    ok = jnp.all(jnp.where(non_root, rates_new > 0, True))
    rates = jnp.where(non_root, rates_new, state.rates)
    new = state.replace(rate_var=state.rate_var * u * u, rates=rates)
    log_mhg = jnp.where(ok, base + (n + 1) * logu, NEG_INF)
    return new, log_mhg


def _k_scale_var_rate_tree_autocorr(state, key, tune, node, aux, par, topo):
    """scaleVarianceAndTreeAutocorrelated (Unconstrained.hs:380-439): scale
    the differences between a branch's rate and its parent's rate by u (the
    root-level parent rate is the unchanged rate mean).  The recursion
    r'_i = r'_par + u (r_i - r_par) telescopes to the closed form
    r'_i = mu + u (r_i - mu) — one fused elementwise op, no tree walk.
    Log determinant: triangular with diagonal u per branch -> u^n (matches
    the reference, Unconstrained.hs:417)."""
    u, base, logu = gamma_scale_sample(key, par, tune)
    non_root = jnp.asarray(topo.parent) >= 0
    n = topo.n - 1
    mu = state.rate_mean
    rates_new = mu + u * (state.rates - mu)
    ok = jnp.all(jnp.where(non_root, rates_new > 0, True))
    rates = jnp.where(non_root, rates_new, state.rates)
    new = state.replace(rate_var=state.rate_var * u * u, rates=rates)
    log_mhg = jnp.where(ok, base + (n + 2) * logu, NEG_INF)
    return new, log_mhg


def _k_slide_nodes_contra(state, key, tune, node, aux, par, topo):
    """slideNodesAtContrarily (Contrary.hs:35-137): slide a time-tree node,
    rescale the adjacent rate-tree branches inversely so expected
    substitutions stay constant.  Jacobian: xi_stem * prod xi_children."""
    i = node
    h = state.heights
    hi = h[i]
    hp = h[jnp.asarray(topo.parent)[i]]
    hc_max = _max_child_height(h, topo, i)
    hnew, lq = truncated_normal_sample(key, hi, par, tune, hc_max, hp)
    xi_stem = (hp - hi) / (hp - hnew)
    ch = jnp.asarray(topo.children)[i]
    ch_ok = ch >= 0
    ch_idx = jnp.clip(ch, min=0)
    hch = h[ch_idx]
    xi_ch = jnp.where(ch_ok, (hi - hch) / (hnew - hch), 1.0)
    rates = state.rates.at[i].multiply(xi_stem)
    rates = rates.at[ch_idx].multiply(jnp.where(ch_ok, xi_ch, 1.0))
    log_jac = jnp.log(xi_stem) + jnp.sum(jnp.where(ch_ok, jnp.log(xi_ch), 0.0))
    new = state.replace(heights=h.at[i].set(hnew), rates=rates)
    return new, lq + log_jac


def _k_scale_subtrees_contra(state, key, tune, node, aux, par, topo):
    """scaleSubTreesAtContrarily (Contrary.hs:268-387): scale the time sub
    tree by xi, the rate sub tree (without its stem) by 1/xi, and the rate
    stem by (hp - h)/(hp - h').  Jacobian xi^(nInner - nBranches) * xi_stem."""
    i = node
    h = state.heights
    hi = h[i]
    hp = h[jnp.asarray(topo.parent)[i]]
    hnew, lq = truncated_normal_sample(key, hi, par, tune, 0.0, hp)
    xi = hnew / hi
    xi_stem = (hp - hi) / (hp - hnew)
    mask = _subtree_mask(topo, i)
    mask_proper = _subtree_mask(topo, i, proper=True)
    h2 = jnp.where(mask, h * xi, h)
    rates = jnp.where(mask_proper, state.rates / xi, state.rates)
    rates = rates.at[i].multiply(xi_stem)
    n_inner = jnp.asarray(topo.n_inner_subtree)[i]
    n_branches = jnp.asarray(topo.n_nodes_subtree)[i]
    log_jac = (n_inner - n_branches) * jnp.log(xi) + jnp.log(xi_stem)
    return state.replace(heights=h2, rates=rates), lq + log_jac


def _k_slide_root_contra(state, key, tune, node, aux, par, topo):
    """slideRootContrarily (Contrary.hs:173-266): slide the absolute height
    H -> H' = H u, divide all relative inner node heights by u, and rescale
    the root-adjacent rates by (1 - h_j)/(u - h_j).

    Log determinant: at fixed (H, H'), the (nInner - 1) free inner heights
    scale by 1/u and the k root-adjacent rates by xi_j, giving
    u^-(nInner - 1) * prod xi_j.  (The reference records u^-nInner,
    Contrary.hs:182-189; we use the exact count of scaled coordinates.)
    """
    h = state.heights
    ht = state.height
    child_idx = jnp.asarray([c for c in topo.children[0] if c >= 0])
    hch = h[child_idx]
    ht_oldest = ht * jnp.max(hch)
    ht_new, lq = truncated_normal_sample(key, ht, par, tune, ht_oldest, jnp.inf)
    u = ht_new / ht
    # Scale inner non-root heights by 1/u (leaves stay 0, root stays 1).
    is_leaf = jnp.asarray(topo.is_leaf)
    scale_mask = (~is_leaf) & (jnp.arange(topo.n) != 0)
    h2 = jnp.where(scale_mask, h / u, h)
    xi = (1.0 - hch) / (u - hch)
    rates = state.rates.at[child_idx].multiply(xi)
    n_scaled = int((~topo.is_leaf).sum()) - 1
    log_jac = -n_scaled * jnp.log(u) + jnp.sum(jnp.log(xi))
    new = state.replace(height=ht_new, heights=h2, rates=rates)
    return new, lq + log_jac


def _k_scale_rates_time_tree_contra(state, key, tune, node, aux, par, topo):
    """scaleRatesAndTreeContrarily (Contrary.hs:420-486): scale all non-root
    node heights by xi (root height unchanged), divide the birth rate and
    rate mean by xi.  Jacobian xi^(nNodes - 1 - 2) with nNodes = inner
    nodes except the root."""
    h = state.heights
    child_idx = jnp.asarray([c for c in topo.children[0] if c >= 0])
    h_mc = jnp.max(h[child_idx])
    h_new, lq = truncated_normal_sample(key, h_mc, par, tune, 0.0, h[0])
    xi = h_new / h_mc
    mask = jnp.arange(topo.n) != 0
    h2 = jnp.where(mask, h * xi, h)
    n_nodes = int((~topo.is_leaf).sum()) - 1
    log_jac = (n_nodes - 1 - 2) * jnp.log(xi)
    new = state.replace(
        heights=h2, birth=state.birth / xi, rate_mean=state.rate_mean / xi
    )
    return new, lq + log_jac


def _brace_bounds(state, topo, bnodes, bmask):
    h = state.heights
    parent = jnp.asarray(topo.parent)
    idx = jnp.clip(bnodes, min=0)
    hi = h[idx]
    hp = h[parent[idx]]
    hc = jax.vmap(lambda i: _max_child_height(h, topo, i))(idx)
    lo = jnp.max(jnp.where(bmask, hc - hi, -jnp.inf))
    hi_b = jnp.min(jnp.where(bmask, hp - hi, jnp.inf))
    return lo, hi_b


def _k_slide_braced_ultra(state, key, tune, node, aux, par, topo, braces):
    """slideBracedNodesUltrametric (Proposal/Brace.hs:37-96): one common
    height delta for all braced nodes, bounded by the intersection of the
    per-node intervals.  Jacobian 1."""
    bnodes = jnp.asarray(braces.node)[aux]
    bmask = bnodes >= 0
    lo, hi = _brace_bounds(state, topo, bnodes, bmask)
    delta, lq = truncated_normal_sample(key, 0.0, par, tune, lo, hi)
    idx = jnp.clip(bnodes, min=0)
    h2 = state.heights.at[idx].add(jnp.where(bmask, delta, 0.0))
    return state.replace(heights=h2), lq


def _k_slide_braced_contra(state, key, tune, node, aux, par, topo, braces):
    """slideBracedNodesContrarily (Proposal/Brace.hs:98-209): the braced
    slide plus inverse rate compensation per braced node."""
    bnodes = jnp.asarray(braces.node)[aux]
    bmask = bnodes >= 0
    lo, hi = _brace_bounds(state, topo, bnodes, bmask)
    delta, lq = truncated_normal_sample(key, 0.0, par, tune, lo, hi)
    idx = jnp.clip(bnodes, min=0)
    h = state.heights
    parent = jnp.asarray(topo.parent)
    children = jnp.asarray(topo.children)

    h2 = h.at[idx].add(jnp.where(bmask, delta, 0.0))

    def per_node(rates_and_jac, k):
        rates, log_jac = rates_and_jac
        i = idx[k]
        on = bmask[k]
        hi_k = h[i]
        hp_k = h[parent[i]]
        xi_stem = (hp_k - hi_k) / (hp_k - hi_k - delta)
        ch = children[i]
        ch_ok = (ch >= 0) & on
        ch_idx = jnp.clip(ch, min=0)
        hch = h[ch_idx]
        xi_ch = jnp.where(ch_ok, (hi_k - hch) / (hi_k + delta - hch), 1.0)
        rates = rates.at[i].multiply(jnp.where(on, xi_stem, 1.0))
        rates = rates.at[ch_idx].multiply(xi_ch)
        log_jac = log_jac + jnp.where(on, jnp.log(xi_stem), 0.0) + jnp.sum(
            jnp.where(ch_ok, jnp.log(xi_ch), 0.0)
        )
        return (rates, log_jac), None

    (rates, log_jac), _ = jax.lax.scan(
        per_node, (state.rates, jnp.asarray(0.0, h.dtype)), jnp.arange(bnodes.shape[0])
    )
    new = state.replace(heights=h2, rates=rates)
    return new, lq + log_jac


def make_kernel_switch(topo: FlatTopology, braces: BraceSet):
    """Build the ``lax.switch``-able list of kernels closed over the static
    topology and braces."""

    def wrap(f):
        def g(state, key, tune, node, aux, par):
            return f(state, key, tune, node, aux, par, topo)

        return g

    def wrap_brace(f):
        def g(state, key, tune, node, aux, par):
            return f(state, key, tune, node, aux, par, topo, braces)

        return g

    kernels = [None] * N_KINDS
    kernels[K_SCALE_SCALAR] = wrap(_k_scale_scalar)
    kernels[K_SCALE_HEIGHT_RATEMEAN_CONTRA] = wrap(_k_scale_height_ratemean_contra)
    kernels[K_SLIDE_NODE_ULTRA] = wrap(_k_slide_node_ultra)
    kernels[K_SCALE_SUBTREE_ULTRA] = wrap(_k_scale_subtree_ultra)
    kernels[K_PULLEY_ULTRA] = wrap(_k_pulley_ultra)
    kernels[K_SCALE_BRANCH_RATE] = wrap(_k_scale_branch_rate)
    kernels[K_SCALE_SUBTREE_RATE] = wrap(_k_scale_subtree_rate)
    kernels[K_SCALE_NORM_RATE_TREE_CONTRA] = wrap(_k_scale_norm_rate_tree_contra)
    kernels[K_SCALE_VAR_RATE_TREE] = wrap(_k_scale_var_rate_tree)
    kernels[K_SCALE_VAR_RATE_TREE_AUTOCORR] = wrap(_k_scale_var_rate_tree_autocorr)
    kernels[K_SLIDE_NODES_CONTRA] = wrap(_k_slide_nodes_contra)
    kernels[K_SCALE_SUBTREES_CONTRA] = wrap(_k_scale_subtrees_contra)
    kernels[K_SLIDE_ROOT_CONTRA] = wrap(_k_slide_root_contra)
    kernels[K_SCALE_NORM_HEIGHT_RATE_TREE_CONTRA] = wrap(
        _k_scale_norm_height_rate_tree_contra
    )
    kernels[K_SCALE_RATES_TIME_TREE_CONTRA] = wrap(_k_scale_rates_time_tree_contra)
    if braces.n > 0:
        kernels[K_SLIDE_BRACED_ULTRA] = wrap_brace(_k_slide_braced_ultra)
        kernels[K_SLIDE_BRACED_CONTRA] = wrap_brace(_k_slide_braced_contra)
    else:
        # Dead branches must still trace; substitute a no-op.
        def noop(state, key, tune, node, aux, par):
            return state, jnp.asarray(NEG_INF, state.heights.dtype)

        kernels[K_SLIDE_BRACED_ULTRA] = noop
        kernels[K_SLIDE_BRACED_CONTRA] = noop
    return kernels
