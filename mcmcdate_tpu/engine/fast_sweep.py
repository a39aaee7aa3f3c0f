"""Ticket-batched sweep: the TPU fast path for the proposal cycle.

Why: the sequential sweep (mh.MHKernel) executes ~30k proposal tickets per
iteration at 1k taxa, and its per-ticket cost on TPU is dominated by
fixed per-op overheads (~10 us per dynamic-slice/select HLO inside
``lax.scan``), not by arithmetic or HBM bytes — measured ~200-500 us per
ticket regardless of sparsity.  The fix is to execute MANY provably
non-interacting tickets as ONE vectorized mega-step, collapsing thousands
of tiny HLOs into a handful of large ones (~3-8 us per ticket measured).

Correctness: a mega-step executes a set of tickets whose PRIOR
dependencies are disjoint by construction (no ticket writes a coordinate
another ticket's density terms, bounds, or Jacobians read), so their prior
deltas and Hastings factors are exactly what sequential execution would
produce.  The LIKELIHOOD couples all tickets through the MVN precision P;
mega-steps account for this exactly by carrying ``z = P (d - mu)`` and the
quadratic form ``q = (d-mu)' P (d-mu)`` and running a sequential accept
scan over the batch with pairwise cross terms

    dq_b = 2 delta_b' z + delta_b' P delta_b + 2 sum_{a<b, accepted} T_ab,
    T_ab = delta_b' P delta_a,

computed from on-the-fly gathered P blocks.  This reproduces the exact
sequential acceptance distribution (tickets in a fixed order within the
batch — a valid MCMC composition; the reference's global shuffle is a
uniformly random composition, equally valid).

Batched kinds:

- Point tickets — ``K_SLIDE_NODES_CONTRA`` (distance-invariant: no
  likelihood work at all, whole batch accepted in one vectorized step),
  ``K_SLIDE_NODE_ULTRA`` and ``K_SCALE_BRANCH_RATE`` (likelihood-coupled,
  with the correction scan).
- Subtree-range tickets — ``K_SCALE_SUBTREE_ULTRA``,
  ``K_SCALE_SUBTREE_RATE`` (likelihood-coupled; each ticket's distance
  delta is RANK-1, ``delta_b = (xi_b - 1) g_b``, so pairwise cross terms
  reduce to small quadratics in P blocks) and ``K_SCALE_SUBTREES_CONTRA``
  (distance-invariant).  Sub-blocks come in size buckets sharing a fixed
  1024-row grid (``RANGE_BUCKETS``); the range phase runs in the
  transposed ``[param, chains]`` layout, and all P/z/d row accesses go
  through one-hot MXU matmuls (advanced-index gathers cost ~5 ms flat on
  this backend; the matmul form ~0.5 ms).
- Global-move families (round 3, ``GlobGroup``) — hyper-parameter
  scales, contrary-global moves, variance-tree spreads, root slide,
  rates-time scale, and the subtree scales the range grid cannot take:
  one specialized ``lax.scan`` per family with closed-form or
  single-matmul likelihood carry (see ``_glob_step``).

Excluded from batching (routed to the sequential fallback, mh.MHKernel on
a sub-table): pulleys, root-adjacent point moves, braced slides, and
point/range tickets whose node participates in a constraint or brace
term (those couple other nodes' heights) — at the uncalibrated 1k-taxa
bench shape that is 38 of 30,786 weighted tickets (~0.1%).

Planner: host-side greedy conflict analysis (parent-child pairs,
repeated-weight copies of the same row, subtree-range overlap), packing
point kinds into mega-steps of at most ``BATCH_MAX`` tickets and range
kinds size-descending first-fit into bucketed 1024-row blocks.

Measured at 1000 taxa x 1024 chains: 0.63 s/sweep (round 3) vs 1.30 s
for the round-2 engine and 16-20 s for the sequential scan (see PERF.md).
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.dating import DatingModel
from ..models.state import State
from ..ops import banded as banded_mod
from ..ops import birth_death as BD
from ..ops import clocks as CK
from ..ops import mvn as mvn_mod
from ..ops.dists import gamma_scale_sample, truncated_normal_sample
from ..ops.node_priors import SQRT_2_OVER_PI
from . import proposals as P
from .mh import MHKernel

BATCH_MAX = 512
SUB = 64  # correction-scan sub-block size


# ---------------------------------------------------------------------------
# Local (per-node) prior term evaluation — gathered-operand versions of the
# ops in birth_death.py / clocks.py; elementwise over any shape.
# ---------------------------------------------------------------------------


def bd_term_local(h_node, h_parent, is_leaf, la, mu):
    """Birth-death log term for a non-root node given its and its parent's
    heights (birth_death.birth_death_terms with rho = 1)."""
    dt = h_parent - h_node
    _, e_at = BD._de_factors(la, mu, jnp.zeros_like(h_node), h_node)
    c = jnp.where(is_leaf, 0.0, e_at)
    log_d, _ = BD._de_factors(la, mu, c, dt)
    log_d = jnp.where(dt > 0, log_d, -jnp.inf)
    log_boundary = jnp.where(is_leaf, 0.0, jnp.log(la))
    return log_d + log_boundary


def _cal_terms_local(h_new, height, lo, lo_s, hi, hi_s, dtype):
    """Soft-calibration log term(s) for a node at (relative) height
    ``h_new`` under absolute-height multiplier ``height``
    (calibrateSoftF, Calibration.hs:369-392; matches
    node_priors.calibrate_constrain_brace_terms row-for-row).  All
    arguments broadcast; ``lo``/``hi`` are absolute bounds, ``*_s`` the
    pre-multiplied tail sigmas ``sqrt(2/pi) * pm``."""
    lo_rel = jnp.asarray(lo, dtype) / height
    hi_rel = jnp.asarray(hi, dtype) / height
    below = jnp.clip(lo_rel - h_new, min=0.0)
    above = jnp.clip(h_new - hi_rel, min=0.0)
    s_lo = jnp.asarray(lo_s, dtype)
    s_hi = jnp.asarray(hi_s, dtype)
    s_lo_safe = jnp.where(s_lo > 0, s_lo, 1.0)
    s_hi_safe = jnp.where(s_hi > 0, s_hi, 1.0)
    return -0.5 * (below / s_lo_safe) ** 2 - 0.5 * jnp.where(
        jnp.isfinite(hi_rel), (above / s_hi_safe) ** 2, 0.0
    )


def clock_term_local(model_clock, r, t, var):
    """Relaxed-clock log term for one branch (clocks.relaxed_clock_terms
    body, mean = 1)."""
    from ..ops.dists import (
        gamma_mean_variance_logpdf,
        log_normal_mean_param_logpdf,
    )

    if model_clock == CK.UNCORRELATED_GAMMA:
        return gamma_mean_variance_logpdf(1.0, var, r)
    if model_clock == CK.UNCORRELATED_LOG_NORMAL:
        return log_normal_mean_param_logpdf(1.0, var, r)
    if model_clock == CK.UNCORRELATED_WHITE_NOISE:
        ts = jnp.where(t > 0, t, 1.0)
        lp = gamma_mean_variance_logpdf(1.0, var / ts, r)
        return jnp.where(t > 0, lp, -jnp.inf)
    if model_clock == CK.AUTOCORRELATED_GAMMA:
        ts = jnp.where(t > 0, t, 1.0)
        lp = gamma_mean_variance_logpdf(1.0, var * ts, r)
        return jnp.where(t > 0, lp, -jnp.inf)
    if model_clock == CK.AUTOCORRELATED_LOG_NORMAL:
        ts = jnp.where(t > 0, t, 1.0)
        lp = log_normal_mean_param_logpdf(1.0, var * ts, r)
        return jnp.where(t > 0, lp, -jnp.inf)
    raise ValueError(model_clock)


# ---------------------------------------------------------------------------
# Host-side planning
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class MegaSpec:
    """Stacked static arrays for all mega-steps of one kind.

    Leading axis = mega-step; second = ticket slot (padded to a common B).
    ``valid`` masks pad slots.  ``t_*`` are flat term-vector row indices;
    ``d_rows`` are internal-layout distance rows (-1 where absent).
    """

    kind: int
    rows: np.ndarray      # int32[M, B] proposal-table row per ticket
    node: np.ndarray      # int32[M, B]
    par: np.ndarray       # int32[M, B]
    ch: np.ndarray        # int32[M, B, KC]
    valid: np.ndarray     # bool[M, B]
    t_rows: np.ndarray    # int32[M, B, KT] touched term rows (-1 pad)
    d_rows: np.ndarray    # int32[M, B, KD] touched distance rows (-1 pad)
    sd: np.ndarray        # f64[M, B] base kernel parameter (sd / shape)
    # Calibration slots (height-changing kinds only; round-3 extension so
    # calibrated nodes batch too): term rows + soft-density parameters of
    # the node's own calibrations.  Slot j maps to t_rows slot KT-KN+j.
    cal_lo: np.ndarray    # f64[M, B, KN] absolute lower bound (0 if none)
    cal_lo_s: np.ndarray  # f64[M, B, KN] sqrt(2/pi) * lower pm (1 if none)
    cal_hi: np.ndarray    # f64[M, B, KN] absolute upper bound (inf if none)
    cal_hi_s: np.ndarray  # f64[M, B, KN] sqrt(2/pi) * upper pm (1 if none)

    @property
    def n_mega(self) -> int:
        return self.rows.shape[0]

    @property
    def b(self) -> int:
        return self.rows.shape[1]


@dataclass(frozen=True)
class RangeSpec:
    """Stacked sub-blocks of subtree-range tickets (one scan step = one
    sub-block of ``SUBR`` tickets with pairwise-disjoint pre-order ranges,
    each padded to ``RB`` rows).

    ``own`` holds the covered node rows per ticket slot (-1 pad); ``d_own``
    the matching internal-layout distance rows.  Disjointness of ranges
    within a sub-block makes prior updates exact; the likelihood coupling
    is handled by the rank-1 structure of each ticket's distance delta
    (delta_b = (xi_b - 1) g_b) with exact pairwise cross terms.
    """

    kind: int
    rows: np.ndarray     # int32[M, S]
    node: np.ndarray     # int32[M, S]
    par: np.ndarray      # int32[M, S]
    valid: np.ndarray    # bool[M, S]
    sd: np.ndarray       # f64[M, S]
    n_inner: np.ndarray  # int32[M, S] inner nodes in subtree
    n_nodes: np.ndarray  # int32[M, S] nodes (branches) in subtree
    own: np.ndarray      # int32[M, S, RB] covered node rows (-1 pad)
    own_par: np.ndarray  # int32[M, S, RB] parent of each covered row
    # Calibration slots for calibrated nodes INSIDE the range (their
    # heights all scale by the ticket's xi): term rows, source nodes, and
    # soft-density parameters; -1 pad on cal_t_rows.
    cal_t_rows: np.ndarray  # int32[M, S, KN] term rows (-1 pad)
    cal_hsrc: np.ndarray    # int32[M, S, KN] node whose height feeds slot
    cal_lo: np.ndarray      # f64[M, S, KN]
    cal_lo_s: np.ndarray    # f64[M, S, KN]
    cal_hi: np.ndarray      # f64[M, S, KN]
    cal_hi_s: np.ndarray    # f64[M, S, KN]

    @property
    def n_blocks(self) -> int:
        return self.rows.shape[0]


@dataclass(frozen=True)
class GlobGroup:
    """Weight-expanded tickets of one global-move family (round-3
    extension): hyper-parameter scales (Definitions.hs:259-262), the
    contrary global moves (Definitions.hs:204-221, 241-253) and the
    subtree scales the range phase cannot take (root-adjacent,
    > ``RB_MAX`` rows, or constraint/brace-coupled ranges).

    Each family runs as ONE specialized ``lax.scan`` that recomputes only
    the prior-term blocks the move can touch and updates the carried
    ``d/z/q`` either in closed form (uniform distance scalings), not at
    all (distance-invariant contrary moves), or through one dense
    ``delta @ P`` matmul (rate-spreads, root slides, big subtrees) —
    replacing the ~0.7 ms/ticket general sequential step with a
    ~0.1-0.35 ms specialized one.
    """

    tag: str
    rows: np.ndarray      # int32[n] original table row per ticket
    sd: np.ndarray        # float64[n] kernel width parameter
    aux: np.ndarray       # int32[n] SC_* code or subtree node index
    lo: np.ndarray        # int32[n] subtree node range start (pre-order)
    hi: np.ndarray        # int32[n] subtree node range end
    n_inner: np.ndarray   # int32[n] inner nodes in subtree
    n_nodes: np.ndarray   # int32[n] nodes (branches) in subtree
    rj: np.ndarray        # bool[n]  apply the root-branch Jacobian ratio

    @property
    def n_tickets(self) -> int:
        return self.rows.shape[0]


# Group execution order (static composition; any fixed order is a valid
# kernel composition — see the sweeps() docstring).
GLOB_ORDER = (
    "bd_scale", "rate_mean", "rate_var", "height", "hm_contra",
    "norm_contra", "normh_contra", "var_tree", "var_auto", "rates_time",
    "slide_root", "sub_contra", "sub_ultra", "sub_rate",
)


@dataclass(frozen=True)
class FastPlan:
    specs: Dict[int, MegaSpec]
    range_specs: Dict[int, RangeSpec]
    glob_groups: Dict[str, GlobGroup]
    seq_table: P.ProposalTable  # leftover rows for the sequential fallback
    seq_rows: np.ndarray        # mapping: seq-table row -> original row


def _node_prior_nodes(model: DatingModel) -> set:
    out = set()
    cal, con, br = model.calibrations, model.constraints, model.braces
    if cal.n:
        out.update(int(x) for x in np.asarray(cal.node).ravel())
    if con.n:
        out.update(int(x) for x in np.asarray(con.young).ravel())
        out.update(int(x) for x in np.asarray(con.old).ravel())
    if br.n:
        out.update(int(x) for x in np.asarray(br.node).ravel() if x >= 0)
    return out


BATCHED_KINDS = (P.K_SLIDE_NODES_CONTRA, P.K_SLIDE_NODE_ULTRA,
                 P.K_SCALE_BRANCH_RATE)
RANGE_KINDS = (P.K_SCALE_SUBTREE_ULTRA, P.K_SCALE_SUBTREE_RATE,
               P.K_SCALE_SUBTREES_CONTRA)
# Range sub-blocks come in size buckets sharing a fixed S*RB = 1024 grid:
# small subtrees (the vast majority; mean size ~ log N) pack 64 tickets of
# up to 16 rows, mid-size 16 x 64, large 4 x 256.  Even larger subtrees
# fall back to the sequential phase (a handful near the root).
# (tickets, rows) per block: every bucket is a 1024-row grid.  Block
# ticket counts are capped at 64: the in-block sequential-correction scan
# is linear in tickets-per-block with a [C, S]-sized body, so finer size
# buckets with S up to 256 measured SLOWER despite less row padding
# (0.41 vs 0.39 s at the 1k-taxa bench shape).
RANGE_BUCKETS = ((64, 16), (16, 64), (4, 256))
# Experimental override for the phase-budget probe (tools/phase_budget.py):
# "64x16,16x64,4x256"-style geometry list.  Production uses the default.
_rb_env = os.environ.get("MCMCDATE_RANGE_BUCKETS")
if _rb_env:
    RANGE_BUCKETS = tuple(
        tuple(int(x) for x in part.split("x")) for part in _rb_env.split(",")
    )
RB_MAX = max(rb for _, rb in RANGE_BUCKETS)

# NOTE (round 5): a "static-P hoist" — gathering each range/point
# block's plan-static P rows/sub-blocks ONCE per jitted chunk and
# streaming them through the scans as traced bf16 inputs — lived here in
# round 4 and was DELETED after measurement (PERF.md "The static-P
# hoist, adjudicated"): the per-dispatch bulk gather costs one sweep's
# worth of one-hot matmuls, which cancels the ~11% ranges-phase saving
# at production chunk sizes, and the ~3 GB resident stacks slow the
# full sweep by ~7% net.  Third ranges-phase negative.
# Occasional-bold contrary steps: with probability MCMCDATE_BOLD_P each
# distance-invariant contrary subtree-scale ticket uses a
# MCMCDATE_BOLD_FACTOR-times-wider kernel (see _mega_range_contra).
# Default OFF (0.0): the mixture targets slow deep-backbone valleys at
# GOE scale and is enabled per run; all equivalence/invariance suites
# validate the default kernel.
BOLD_P = float(os.environ.get("MCMCDATE_BOLD_P", "0.0"))
BOLD_FACTOR = float(os.environ.get("MCMCDATE_BOLD_FACTOR", "8.0"))
FIBER_SLIDE = float(os.environ.get("MCMCDATE_FIBER_SLIDE", "0.0"))


def plan_batches(model: DatingModel, table: P.ProposalTable) -> FastPlan:
    topo = model.topo
    n = topo.n
    parent = np.asarray(topo.parent)
    children = np.asarray(topo.children)
    kc = children.shape[1]
    pos = np.asarray(topo.internal_pos)

    # Node-prior involvement splits in two (round-3 extension):
    # - CALIBRATION terms are elementwise in the node's own height, so
    #   calibrated nodes batch fine — the mega-steps just recompute the
    #   node's calibration term row(s) alongside bd/clock
    #   (calibrateSoftF, Calibration.hs:369-392, is h_i-local).
    # - CONSTRAINT/BRACE terms couple OTHER nodes' heights
    #   (constrainSoftF/braceSoftF); tickets on those nodes stay
    #   sequential.
    cal = model.calibrations
    hard_np: set = set()
    if model.constraints.n:
        hard_np.update(int(x) for x in np.asarray(model.constraints.young))
        hard_np.update(int(x) for x in np.asarray(model.constraints.old))
    if model.braces.n:
        hard_np.update(
            int(x) for x in np.asarray(model.braces.node).ravel() if x >= 0
        )
    cal_rows_of: Dict[int, List[int]] = {}
    if cal.n:
        for cr, nd_ in enumerate(np.asarray(cal.node)):
            cal_rows_of.setdefault(int(nd_), []).append(cr)
    nodes_off = 4 + 2 * (n + 1)  # term-vector offset of calibration rows

    kind = np.asarray(table.kind)
    node = np.asarray(table.node)
    weight = np.asarray(table.weight)
    root_jac = np.asarray(table.root_jac)
    par_tab = np.asarray(table.par)

    batched_tickets: Dict[int, List[int]] = {k: [] for k in BATCHED_KINDS}
    seq_row_mask = np.ones(len(kind), bool)

    for r in range(len(kind)):
        k = int(kind[r])
        if k not in BATCHED_KINDS:
            continue
        i = int(node[r])
        if root_jac[r]:
            continue  # root-adjacent: sequential
        if k != P.K_SCALE_BRANCH_RATE and i in hard_np:
            continue  # constraint/brace terms couple other nodes
        # (K_SCALE_BRANCH_RATE touches rates only; node priors never read
        # rates, so no node-prior exclusion applies to it at all.)
        seq_row_mask[r] = False
        batched_tickets[k].extend([r] * int(weight[r]))

    specs = {}
    for k, tickets in batched_tickets.items():
        if not tickets:
            continue
        # Greedy coloring: two tickets conflict if the same row (weight
        # copies) or their nodes are in a parent-child relation.
        order = list(tickets)
        color_of: List[int] = []
        colors: List[List[int]] = []
        color_nodes: List[set] = []   # node sets per color (incl. adjacency)
        color_rows: List[set] = []
        for t in order:
            i = int(node[t])
            neigh = {i, int(parent[i])} | {
                int(c) for c in children[i] if c >= 0
            }
            placed = False
            for ci in range(len(colors)):
                if t in color_rows[ci]:
                    continue
                if neigh & color_nodes[ci]:
                    continue
                if len(colors[ci]) >= BATCH_MAX:
                    continue
                colors[ci].append(t)
                color_nodes[ci].add(i)
                color_rows[ci].add(t)
                placed = True
                break
            if not placed:
                colors.append([t])
                color_nodes.append({i})
                color_rows.append({t})
        # NOTE on the conflict test: a batch's node set must contain no two
        # nodes in parent-child relation.  Checking ``neigh & color_nodes``
        # (candidate's closed neighborhood vs. accepted NODES) is exactly
        # that, symmetric in both directions.
        m = len(colors)
        b = max(len(c) for c in colors)
        if k == P.K_SCALE_BRANCH_RATE:
            kn = 0  # rates only: calibration terms unaffected
        else:
            kn = max(
                (len(cal_rows_of.get(int(node[t]), ())) for t in tickets),
                default=0,
            )
        kt = 2 * (1 + kc) + kn  # bd + clock rows for node + children + cal
        kd = 1 if k == P.K_SCALE_BRANCH_RATE else 1 + kc
        S = dict(
            rows=np.zeros((m, b), np.int32),
            node=np.zeros((m, b), np.int32),
            par=np.zeros((m, b), np.int32),
            ch=np.full((m, b, kc), -1, np.int32),
            valid=np.zeros((m, b), bool),
            t_rows=np.full((m, b, kt), -1, np.int32),
            d_rows=np.full((m, b, kd), -1, np.int32),
            sd=np.zeros((m, b), np.float64),
            cal_lo=np.zeros((m, b, kn), np.float64),
            cal_lo_s=np.ones((m, b, kn), np.float64),
            cal_hi=np.full((m, b, kn), np.inf, np.float64),
            cal_hi_s=np.ones((m, b, kn), np.float64),
        )
        bd_off = 4
        ck_off = 4 + (n + 1)
        for ci, col in enumerate(colors):
            for s, t in enumerate(col):
                i = int(node[t])
                S["rows"][ci, s] = t
                S["node"][ci, s] = i
                S["par"][ci, s] = int(parent[i])
                S["valid"][ci, s] = True
                S["sd"][ci, s] = par_tab[t]
                cs = [int(c) for c in children[i] if c >= 0]
                for j, c in enumerate(cs):
                    S["ch"][ci, s, j] = c
                if k == P.K_SCALE_BRANCH_RATE:
                    S["t_rows"][ci, s, 0] = ck_off + i
                    S["d_rows"][ci, s, 0] = pos[i]
                else:
                    tl = [bd_off + i, ck_off + i]
                    tl += [bd_off + c for c in cs]
                    tl += [ck_off + c for c in cs]
                    S["t_rows"][ci, s, : len(tl)] = tl
                    for j, cr in enumerate(cal_rows_of.get(i, ())):
                        S["t_rows"][ci, s, 2 * (1 + kc) + j] = nodes_off + cr
                        S["cal_lo"][ci, s, j] = cal.lower[cr]
                        S["cal_lo_s"][ci, s, j] = (
                            SQRT_2_OVER_PI * cal.lower_pm[cr]
                        )
                        S["cal_hi"][ci, s, j] = cal.upper[cr]
                        S["cal_hi_s"][ci, s, j] = (
                            SQRT_2_OVER_PI * cal.upper_pm[cr]
                        )
                    if k == P.K_SLIDE_NODE_ULTRA:
                        dl = sorted({int(pos[i])} | {int(pos[c]) for c in cs})
                        S["d_rows"][ci, s, : len(dl)] = dl
        specs[k] = MegaSpec(kind=k, **S)

    # --- range kinds: subtree scales batched as disjoint-range sub-blocks.
    subtree_end = np.asarray(topo.subtree_end)
    n_inner_sub = np.asarray(topo.n_inner_subtree)
    n_nodes_sub = np.asarray(topo.n_nodes_subtree)
    range_tickets: Dict[int, List[int]] = {k: [] for k in RANGE_KINDS}
    for r in range(len(kind)):
        k = int(kind[r])
        if k not in RANGE_KINDS:
            continue
        i = int(node[r])
        size = int(subtree_end[i]) - i
        if root_jac[r] or size > RB_MAX:
            continue
        if k != P.K_SCALE_SUBTREE_RATE:
            # Height-changing kinds: constraint/brace nodes inside the
            # range stay sequential; CALIBRATED nodes are handled by the
            # per-ticket cal slots (their heights scale by the ticket's
            # xi, an elementwise term update).
            if any(i <= x < subtree_end[i] for x in hard_np):
                continue
        seq_row_mask[r] = False
        range_tickets[k].extend([r] * int(weight[r]))

    range_specs = {}
    for k, all_tickets in range_tickets.items():
        prev_rb = 0
        for subr, rb in RANGE_BUCKETS:
            tickets = [
                t for t in all_tickets
                if prev_rb < int(subtree_end[node[t]]) - int(node[t]) <= rb
            ]
            prev_rb = rb
            if not tickets:
                continue
            # Pack directly into subr-sized blocks by first-fit over
            # size-descending tickets: a block needs pairwise-disjoint
            # ranges and distinct table rows ONLY within itself (the old
            # global coloring fragmented a partial block per color).
            tickets = sorted(
                tickets,
                key=lambda t: int(node[t]) - int(subtree_end[node[t]]),
            )
            blocks: List[List[int]] = []
            block_mask: List[np.ndarray] = []
            block_rows: List[set] = []
            for t in tickets:
                i = int(node[t])
                lo, hi = i, int(subtree_end[i])
                placed = False
                for bi in range(len(blocks)):
                    if (len(blocks[bi]) >= subr or t in block_rows[bi]
                            or block_mask[bi][lo:hi].any()):
                        continue
                    blocks[bi].append(t)
                    block_mask[bi][lo:hi] = True
                    block_rows[bi].add(t)
                    placed = True
                    break
                if not placed:
                    blocks.append([t])
                    msk = np.zeros(n, bool)
                    msk[lo:hi] = True
                    block_mask.append(msk)
                    block_rows.append({t})
            m = len(blocks)
            if k == P.K_SCALE_SUBTREE_RATE:
                kn = 0
            else:
                kn = max(
                    (sum(len(cal_rows_of.get(x, ()))
                         for x in range(int(node[t]),
                                        int(subtree_end[node[t]])))
                     for t in tickets),
                    default=0,
                )
            S = dict(
                rows=np.zeros((m, subr), np.int32),
                node=np.zeros((m, subr), np.int32),
                par=np.zeros((m, subr), np.int32),
                valid=np.zeros((m, subr), bool),
                sd=np.zeros((m, subr), np.float64),
                n_inner=np.ones((m, subr), np.int32),
                n_nodes=np.ones((m, subr), np.int32),
                own=np.full((m, subr, rb), -1, np.int32),
                own_par=np.zeros((m, subr, rb), np.int32),
                cal_t_rows=np.full((m, subr, kn), -1, np.int32),
                cal_hsrc=np.zeros((m, subr, kn), np.int32),
                cal_lo=np.zeros((m, subr, kn), np.float64),
                cal_lo_s=np.ones((m, subr, kn), np.float64),
                cal_hi=np.full((m, subr, kn), np.inf, np.float64),
                cal_hi_s=np.ones((m, subr, kn), np.float64),
            )
            for bi, blk in enumerate(blocks):
                for s, t in enumerate(blk):
                    i = int(node[t])
                    lo, hi = i, int(subtree_end[i])
                    S["rows"][bi, s] = t
                    S["node"][bi, s] = i
                    S["par"][bi, s] = int(parent[i])
                    S["valid"][bi, s] = True
                    S["sd"][bi, s] = par_tab[t]
                    S["n_inner"][bi, s] = n_inner_sub[i]
                    S["n_nodes"][bi, s] = n_nodes_sub[i]
                    S["own"][bi, s, : hi - lo] = np.arange(lo, hi)
                    S["own_par"][bi, s, : hi - lo] = parent[lo:hi]
                    if kn:
                        slot = 0
                        for x in range(lo, hi):
                            for cr in cal_rows_of.get(x, ()):
                                S["cal_t_rows"][bi, s, slot] = nodes_off + cr
                                S["cal_hsrc"][bi, s, slot] = x
                                S["cal_lo"][bi, s, slot] = cal.lower[cr]
                                S["cal_lo_s"][bi, s, slot] = (
                                    SQRT_2_OVER_PI * cal.lower_pm[cr]
                                )
                                S["cal_hi"][bi, s, slot] = cal.upper[cr]
                                S["cal_hi_s"][bi, s, slot] = (
                                    SQRT_2_OVER_PI * cal.upper_pm[cr]
                                )
                                slot += 1
            range_specs[(k, rb)] = RangeSpec(kind=k, **S)

    # --- global-move families (round-3 stage): everything here leaves the
    # sequential fallback for a specialized scan (see GlobGroup).
    glob_lists: Dict[str, List[int]] = {t: [] for t in GLOB_ORDER}
    sub_tag = {P.K_SCALE_SUBTREE_ULTRA: "sub_ultra",
               P.K_SCALE_SUBTREE_RATE: "sub_rate",
               P.K_SCALE_SUBTREES_CONTRA: "sub_contra"}
    kind_tag = {P.K_SCALE_HEIGHT_RATEMEAN_CONTRA: "hm_contra",
                P.K_SCALE_NORM_RATE_TREE_CONTRA: "norm_contra",
                P.K_SCALE_NORM_HEIGHT_RATE_TREE_CONTRA: "normh_contra",
                P.K_SCALE_VAR_RATE_TREE: "var_tree",
                P.K_SCALE_VAR_RATE_TREE_AUTOCORR: "var_auto",
                P.K_SCALE_RATES_TIME_TREE_CONTRA: "rates_time",
                P.K_SLIDE_ROOT_CONTRA: "slide_root"}
    sc_tag = {P.SC_BIRTH: "bd_scale", P.SC_DEATH: "bd_scale",
              P.SC_BIRTH_DEATH: "bd_scale",
              P.SC_BIRTH_DEATH_CONTRA: "bd_scale",
              P.SC_RATE_MEAN: "rate_mean", P.SC_RATE_VAR: "rate_var",
              P.SC_HEIGHT: "height"}
    aux_tab = np.asarray(table.aux)
    for r in range(len(kind)):
        if not seq_row_mask[r]:
            continue
        k = int(kind[r])
        if k == P.K_SCALE_SCALAR:
            tag = sc_tag.get(int(aux_tab[r]))
        elif k in kind_tag:
            tag = kind_tag[k]
        elif k in sub_tag:
            tag = sub_tag[k]
        else:
            tag = None
        if tag is None:
            continue
        seq_row_mask[r] = False
        glob_lists[tag].extend([r] * int(weight[r]))
    glob_groups: Dict[str, GlobGroup] = {}
    for tag in GLOB_ORDER:
        ts = glob_lists[tag]
        if not ts:
            continue
        m = len(ts)
        G = dict(
            rows=np.zeros(m, np.int32), sd=np.zeros(m, np.float64),
            aux=np.zeros(m, np.int32), lo=np.zeros(m, np.int32),
            hi=np.zeros(m, np.int32), n_inner=np.ones(m, np.int32),
            n_nodes=np.ones(m, np.int32), rj=np.zeros(m, bool),
        )
        for s, t in enumerate(ts):
            G["rows"][s] = t
            G["sd"][s] = par_tab[t]
            G["rj"][s] = bool(root_jac[t])
            if int(kind[t]) == P.K_SCALE_SCALAR:
                G["aux"][s] = aux_tab[t]
            else:
                i = int(node[t])
                G["aux"][s] = i
                if int(kind[t]) in sub_tag:
                    G["lo"][s] = i
                    G["hi"][s] = subtree_end[i]
                    G["n_inner"][s] = n_inner_sub[i]
                    G["n_nodes"][s] = n_nodes_sub[i]
        glob_groups[tag] = GlobGroup(tag=tag, **G)

    seq_rows = np.nonzero(seq_row_mask)[0].astype(np.int32)
    seq_table = _subset_table(table, seq_rows)
    return FastPlan(specs=specs, range_specs=range_specs,
                    glob_groups=glob_groups,
                    seq_table=seq_table, seq_rows=seq_rows)


def _subset_table(table: P.ProposalTable, rows: np.ndarray) -> P.ProposalTable:
    weight = np.asarray(table.weight)[rows]
    tickets = np.concatenate(
        [np.full(w, p, np.int32) for p, w in enumerate(weight)]
    ) if len(rows) else np.zeros(0, np.int32)
    return P.ProposalTable(
        kind=np.asarray(table.kind)[rows],
        node=np.asarray(table.node)[rows],
        aux=np.asarray(table.aux)[rows],
        par=np.asarray(table.par)[rows],
        weight=weight,
        dim=np.asarray(table.dim)[rows],
        root_jac=np.asarray(table.root_jac)[rows],
        names=tuple(table.names[r] for r in rows),
        tickets=tickets,
        d_class=(np.asarray(table.d_class)[rows]
                 if table.d_class is not None else None),
        d_lo=(np.asarray(table.d_lo)[rows]
              if table.d_lo is not None else None),
        didx=(np.asarray(table.didx)[rows]
              if table.didx is not None else None),
        prior_class=(np.asarray(table.prior_class)[rows]
                     if table.prior_class is not None else None),
    )


# ---------------------------------------------------------------------------
# Device mega-steps
# ---------------------------------------------------------------------------


UNIVARIATE_DENSE_MAX = 4096  # dims; above this the diagonal kind stays O(N)


class FastSweeps:
    """Drop-in alternative to ``MHKernel.sweeps`` using the batched plan.

    The interface matches ``MHKernel.sweeps``; NUTS piggy-backs identically.
    Usable with the FULL/SPARSE (dense precision), BANDED (block-banded
    precision, ops/banded.py — the O(D w) scaling kind), NONE, and — up to
    ``UNIVARIATE_DENSE_MAX`` dims — UNIVARIATE likelihood kinds.  The
    diagonal kind rides the dense machinery with ``P = diag(1/var)`` and
    ``L = diag(1/sd)``: the sweep cost on this platform is per-HLO ticket
    overhead, not arithmetic (the round-2 finding), so the O(N) sequential
    path loses to the batched dense path by ~10x regardless of the
    likelihood's sparsity; the O(N^2) materialization is only gated at
    very large N, where the sequential path remains the fallback
    (Probability.hs:186-193 is the reference's O(N) evaluation).
    """

    def __init__(self, model: DatingModel, table: P.ProposalTable,
                 bold_p: Optional[float] = None,
                 bold_factor: Optional[float] = None,
                 fiber_slide: Optional[float] = None):
        self.model = model
        self.table = table
        # Occasional-bold contrary kernels (PERF.md "GOE deep-backbone
        # bimodality"): constructor args win; the MCMCDATE_BOLD_* env vars
        # remain as fallback defaults for tools/tests.
        self.bold_p = BOLD_P if bold_p is None else float(bold_p)
        self.bold_factor = (BOLD_FACTOR if bold_factor is None
                            else float(bold_factor))
        # Within-chain fiber node-slide (_fiber_slide_move): probability per
        # sweep that the likelihood-invariant per-node slide phase runs.
        # Changes the return shape of ``sweeps`` (an extra per-sweep
        # acceptance array) when > 0.
        self.fiber_slide_p = (FIBER_SLIDE if fiber_slide is None
                              else float(fiber_slide))
        self.plan = plan_batches(model, table)
        self.seq_kern = MHKernel(model, self.plan.seq_table)
        self.use_lik = model.likelihood.kind != mvn_mod.NONE
        self.banded = False
        self._dim = model.likelihood.dim
        if model.likelihood.kind == mvn_mod.UNIVARIATE:
            if model.likelihood.dim > UNIVARIATE_DENSE_MAX:
                raise ValueError(
                    "FastSweeps univariate path materializes a diagonal "
                    f"{model.likelihood.dim}^2 precision; use the "
                    "sequential kernel above "
                    f"{UNIVARIATE_DENSE_MAX} dims"
                )
            inv_sd = np.asarray(model.inv_sd_internal, np.float64)
            self._prec_int = np.diag(inv_sd * inv_sd)
            self._chol_int = np.diag(inv_sd)
        elif model.likelihood.kind == mvn_mod.BANDED:
            # Block-banded precision (ops/banded.py): every dense-P site
            # below rides three batched block matmuls instead of a [D, D]
            # stream — O(D w) memory/traffic, the scaling kind past the
            # dense ceiling documented in PERF.md.
            self.banded = True
            self._L3_int = model.band_L3_internal
            self._pband_int = banded_mod.pband_from_chol_upper(
                model.likelihood.band_chol
            )
            wb = self._L3_int.shape[-1]
            self._P3_int = banded_mod.blocks_from_sym_band(
                self._pband_int, wb
            )
        elif self.use_lik:
            perm = model.topo.ref_to_internal_perm
            self._prec_int = model.likelihood.precision[np.ix_(perm, perm)]
            self._chol_int = model.chol_internal
        if self.use_lik:
            # Constants for the closed-form uniform distance scalings
            # (rate-mean / absolute-height scales, _glob_step): with
            # d' = u d,  z' = u z + (u-1) P mu  and
            # dq = (u^2-1) q + 2u(u-1) mu'z + (u-1)^2 mu'P mu.
            mu64 = np.asarray(model.mu_internal, np.float64)
            if self.banded:
                self._Pmu_int = banded_mod.sym_band_matvec(
                    self._pband_int, mu64
                )
            else:
                self._Pmu_int = np.asarray(self._prec_int, np.float64) @ mu64
            self._mPm_int = float(mu64 @ self._Pmu_int)
        self._const_cache = {}

    def _const(self, name, dtype):
        """Dtype-converted model constant, cached so every mega-step /
        glob-family builder closes over the SAME jax array object.  JAX
        dedupes jaxpr constants by object identity: without this cache each
        builder embedded its own copy of the [D, D] precision (~17 MB at 2k
        dims x ~15 closures), which multiplied both compile time and HBM."""
        key = (name, jnp.dtype(dtype).name)
        out = self._const_cache.get(key)
        if out is None:
            # First use is typically under a jit trace; force eager
            # materialization so the cached value is a concrete device
            # array, not a tracer of whichever trace got here first.
            with jax.ensure_compile_time_eval():
                if name == "prec":
                    out = jnp.asarray(self._prec_int, dtype)
                elif name == "chol":
                    out = jnp.asarray(self._chol_int, dtype)
                elif name == "P3":
                    out = jnp.asarray(self._P3_int, dtype)
                elif name == "L3":
                    out = jnp.asarray(self._L3_int, dtype)
                elif name == "mu":
                    out = jnp.asarray(self.model.mu_internal, dtype)
                elif name == "Pmu":
                    out = jnp.asarray(self._Pmu_int, dtype)
                else:  # pragma: no cover
                    raise KeyError(name)
            self._const_cache[key] = out
        return out

    # -- precision/Cholesky right-multiplications -----------------------
    #
    # Every P/L consumer below goes through these three, so the dense and
    # block-banded representations share all downstream exactness
    # machinery (one-hot row selectors, cross-term corrections,
    # add-form write-backs) unchanged.

    def _x_P(self, X, dtype):
        """``X @ P_internal`` for ``[..., D]`` X."""
        if self.banded:
            return banded_mod.block_tridiag_matmul(
                X, self._const("P3", dtype), self._dim
            )
        return X @ self._const("prec", dtype)

    def _x_L(self, X, dtype):
        """``X @ L`` with ``P_internal = L L'``."""
        if self.banded:
            return banded_mod.block_tridiag_matmul(
                X, self._const("L3", dtype), self._dim
            )
        return X @ self._const("chol", dtype)

    def _x_Lt(self, X, dtype):
        """``X @ L.T``."""
        if self.banded:
            return banded_mod.block_tridiag_matmul_t(
                X, self._const("L3", dtype), self._dim
            )
        return X @ self._const("chol", dtype).T

    # -- carried-quantity conversions ----------------------------------

    def _zq_from_y(self, y, dtype):
        if not self.use_lik:
            C = y.shape[0]
            return jnp.zeros((C, 0), dtype), jnp.zeros((C,), dtype)
        z = self._x_Lt(y, dtype)
        q = jnp.sum(y * y, axis=-1)
        return z, q

    def _y_from_d(self, d, dtype):
        if not self.use_lik:
            return jnp.zeros((d.shape[0], 0), dtype)
        mu = self._const("mu", dtype)
        return self._x_L(d - mu, dtype)

    # -- global-move family scans (round 3) -------------------------------

    def _glob_step(self, tag, dtype, beta=1.0, beta_prior=1.0):
        """One specialized scan step for a :class:`GlobGroup` family.

        Exactness: identical acceptance distribution to the sequential
        kernel for the same ticket — the same proposal sample, the same
        Hastings/Jacobian factors (incl. the root-branch Jacobian ratio
        where the table flags it), prior deltas restricted to the term
        blocks the move can change (untouched blocks cancel bitwise in the
        sequential step too), and the exact MVN quad-form delta
        ``dq = delta'(2z + P delta)`` computed either in closed form
        (uniform distance scalings), as zero (distance-invariant contrary
        moves — the same semantic invariance the mega-steps use), or with
        one dense matmul.
        """
        from ..ops import heights as Hops

        model = self.model
        topo = model.topo
        N = topo.n
        n_br = N - 1
        o_bd = 4
        o_ck = 4 + (N + 1)
        o_nd = 4 + 2 * (N + 1)
        use_lik = self.use_lik
        nn = model.calibrations.n + model.constraints.n + model.braces.n
        parent = jnp.asarray(topo.parent)
        is_leaf = jnp.asarray(topo.is_leaf)
        iota = jnp.arange(N)
        non_root = parent >= 0
        child_list = [int(c) for c in topo.children[0] if c >= 0]
        n_inner_total = int((~np.asarray(topo.is_leaf)).sum())
        if use_lik:
            Pmu = self._const("Pmu", dtype)
            mPm = jnp.asarray(self._mPm_int, dtype)
            mu_int = self._const("mu", dtype)

        sc_of = jax.vmap(model.term_scalars)
        bd_of = jax.vmap(model.term_bd)
        ck_of = jax.vmap(model.term_clock)
        nd_of = jax.vmap(model.term_nodes)

        def block_diffs(terms, blocks):
            """blocks: list of (offset, new_block). Returns
            (outs, d_pr, invalid) with outs carrying the old slices."""
            d_pr = 0.0
            invalid = False
            outs = []
            for o, nb in blocks:
                w = nb.shape[-1]
                old = terms[:, o:o + w]
                diff = nb - old
                d_pr = d_pr + jnp.sum(
                    jnp.where(jnp.isnan(diff), 0.0, diff), axis=-1
                )
                invalid = invalid | jnp.any(
                    jnp.isnan(nb) | jnp.isneginf(nb), axis=-1
                )
                outs.append((o, nb, old))
            return outs, d_pr, invalid

        def uniform_scale_lik(u, d, z, q):
            """Closed-form z/q/d under d' = u*d (all distances scale)."""
            d_new = u[:, None] * d
            if not use_lik:
                return d_new, z, q, jnp.zeros_like(q)
            s = jnp.sum(mu_int * z, axis=-1)
            um1 = u - 1.0
            dq = (u * u - 1.0) * q + 2.0 * u * um1 * s + um1 * um1 * mPm
            z_new = u[:, None] * z + um1[:, None] * Pmu[None, :]
            return d_new, z_new, q + dq, dq

        def dense_lik(batch_new, d, z, q):
            """Exact quad-form delta through one `delta @ P` matmul."""
            d_new = jax.vmap(
                lambda s: Hops.distances_internal(s, topo)
            )(batch_new)
            if not use_lik:
                return d_new, z, q, jnp.zeros_like(q)
            delta = d_new - d
            w = self._x_P(delta, dtype)
            dq = jnp.sum(delta * (2.0 * z + w), axis=-1)
            return d_new, z + w, q + dq, dq

        def range_mask(lo, hi):
            return (iota >= lo) & (iota < hi)

        def step(carry, xs):
            batch, terms, d, z, q = carry
            sx, key, tune = xs
            k1, k2 = jax.random.split(key)
            sd = jnp.asarray(sx["sd"], dtype)
            C = batch.heights.shape[0]
            h = batch.heights
            r = batch.rates
            lik_upd = True   # whether d/z/q were recomputed by this family
            lj = 0.0

            if tag == "bd_scale":
                u, base, logu = gamma_scale_sample(k1, sd, tune)
                aux_s = sx["aux"]
                is_joint = aux_s == P.SC_BIRTH_DEATH
                is_con = aux_s == P.SC_BIRTH_DEATH_CONTRA
                coef = jnp.where(is_joint, 2.0, jnp.where(is_con, 0.0, 1.0))
                lmhg = base + coef * logu
                b_fac = jnp.where(
                    (aux_s == P.SC_BIRTH) | is_joint | is_con, u, 1.0)
                d_fac = jnp.where(
                    (aux_s == P.SC_DEATH) | is_joint, u,
                    jnp.where(is_con, 1.0 / u, 1.0))
                bnew = batch.replace(
                    birth=batch.birth * b_fac, death=batch.death * d_fac,
                )
                blocks = [(0, sc_of(bnew)), (o_bd, bd_of(bnew))]
                fields = ("birth", "death")
                d_new, z_new, q_new, dq = d, z, q, jnp.zeros_like(q)
                lik_upd = False
            elif tag == "rate_mean":
                u, base, logu = gamma_scale_sample(k1, sd, tune)
                lmhg = base + logu
                bnew = batch.replace(rate_mean=batch.rate_mean * u)
                blocks = [(0, sc_of(bnew))]
                fields = ("rate_mean",)
                d_new, z_new, q_new, dq = uniform_scale_lik(u, d, z, q)
            elif tag == "rate_var":
                u, base, logu = gamma_scale_sample(k1, sd, tune)
                lmhg = base + logu
                bnew = batch.replace(rate_var=batch.rate_var * u)
                blocks = [(0, sc_of(bnew)), (o_ck, ck_of(bnew))]
                fields = ("rate_var",)
                d_new, z_new, q_new, dq = d, z, q, jnp.zeros_like(q)
                lik_upd = False
            elif tag == "height":
                u, base, logu = gamma_scale_sample(k1, sd, tune)
                lmhg = base + logu
                bnew = batch.replace(height=batch.height * u)
                blocks = [(o_nd, nd_of(bnew))]
                fields = ("height",)
                d_new, z_new, q_new, dq = uniform_scale_lik(u, d, z, q)
            elif tag == "hm_contra":
                u, base, _ = gamma_scale_sample(k1, sd, tune)
                lmhg = base
                bnew = batch.replace(
                    height=batch.height * u, rate_mean=batch.rate_mean / u
                )
                blocks = [(0, sc_of(bnew)), (o_nd, nd_of(bnew))]
                fields = ("height", "rate_mean")
                d_new, z_new, q_new, dq = d, z, q, jnp.zeros_like(q)
                lik_upd = False
            elif tag == "norm_contra":
                u, base, logu = gamma_scale_sample(k1, sd, tune)
                lmhg = base + (n_br - 1) * logu
                rates = jnp.where(non_root, r * u[:, None], r)
                bnew = batch.replace(
                    rate_mean=batch.rate_mean / u, rates=rates
                )
                blocks = [(0, sc_of(bnew)), (o_ck, ck_of(bnew))]
                fields = ("rate_mean", "rates")
                # distances (incl. the root branch) are exactly invariant:
                # rate_mean / u cancels rates * u, so dq = 0 and the
                # root-branch Jacobian ratio vanishes.
                d_new, z_new, q_new, dq = d, z, q, jnp.zeros_like(q)
                lik_upd = False
            elif tag == "normh_contra":
                u, base, logu = gamma_scale_sample(k1, sd, tune)
                lmhg = base + (n_br - 1) * logu
                rates = jnp.where(non_root, r * u[:, None], r)
                bnew = batch.replace(height=batch.height / u, rates=rates)
                blocks = [(o_ck, ck_of(bnew)), (o_nd, nd_of(bnew))]
                fields = ("height", "rates")
                d_new, z_new, q_new, dq = d, z, q, jnp.zeros_like(q)
                lik_upd = False
            elif tag in ("var_tree", "var_auto"):
                u, base, logu = gamma_scale_sample(k1, sd, tune)
                if tag == "var_tree":
                    mean = (
                        jnp.sum(jnp.where(non_root, r, 0.0), axis=-1) / n_br
                    )
                    rates_new = (r - mean[:, None]) * u[:, None] + mean[:, None]
                    exp_ = n_br + 1
                else:
                    mu_r = batch.rate_mean[:, None]
                    rates_new = mu_r + u[:, None] * (r - mu_r)
                    exp_ = n_br + 2
                ok = jnp.all(
                    jnp.where(non_root, rates_new > 0, True), axis=-1
                )
                lmhg = jnp.where(ok, base + exp_ * logu, -jnp.inf)
                rates = jnp.where(non_root, rates_new, r)
                bnew = batch.replace(
                    rate_var=batch.rate_var * u * u, rates=rates
                )
                blocks = [(0, sc_of(bnew)), (o_ck, ck_of(bnew))]
                fields = ("rate_var", "rates")
                d_new, z_new, q_new, dq = dense_lik(bnew, d, z, q)
            elif tag == "rates_time":
                h_ch = [h[:, c] for c in child_list]
                h_mc = h_ch[0]
                for x in h_ch[1:]:
                    h_mc = jnp.maximum(h_mc, x)
                h_new, lq = truncated_normal_sample(
                    k1, h_mc, sd, tune, 0.0, h[:, 0]
                )
                xi = h_new / h_mc
                h2 = jnp.where(iota[None, :] != 0, h * xi[:, None], h)
                # (inner - 1) non-root heights scale by xi, minus the
                # sampled coordinate, minus 2 for birth and rate_mean
                # divided by xi — matches _k_scale_rates_time_tree_contra.
                lmhg = lq + (n_inner_total - 1 - 1 - 2) * jnp.log(xi)
                bnew = batch.replace(
                    heights=h2, birth=batch.birth / xi,
                    rate_mean=batch.rate_mean / xi,
                )
                blocks = [(0, sc_of(bnew)), (o_bd, bd_of(bnew)),
                          (o_ck, ck_of(bnew))]
                if nn:
                    blocks.append((o_nd, nd_of(bnew)))
                fields = ("heights", "birth", "rate_mean")
                d_new, z_new, q_new, dq = dense_lik(bnew, d, z, q)
            elif tag == "slide_root":
                ht = batch.height
                hch = jnp.stack([h[:, c] for c in child_list], axis=-1)
                ht_oldest = ht * jnp.max(hch, axis=-1)
                ht_new, lq = truncated_normal_sample(
                    k1, ht, sd, tune, ht_oldest, jnp.inf
                )
                u = ht_new / ht
                scale_mask = (~is_leaf) & (iota != 0)
                h2 = jnp.where(scale_mask[None, :], h / u[:, None], h)
                xi = (1.0 - hch) / (u[:, None] - hch)
                rates = r.at[:, jnp.asarray(child_list)].multiply(xi)
                n_scaled = n_inner_total - 1
                lmhg = (lq - n_scaled * jnp.log(u)
                        + jnp.sum(jnp.log(xi), axis=-1))
                bnew = batch.replace(height=ht_new, heights=h2, rates=rates)
                blocks = [(o_bd, bd_of(bnew)), (o_ck, ck_of(bnew))]
                if nn:
                    blocks.append((o_nd, nd_of(bnew)))
                fields = ("height", "heights", "rates")
                d_new, z_new, q_new, dq = dense_lik(bnew, d, z, q)
            elif tag in ("sub_ultra", "sub_contra"):
                i = sx["aux"]
                lo, hi_e = sx["lo"], sx["hi"]
                hi_h = jnp.take(h, i, axis=1)
                hp = jnp.take(h, parent[i], axis=1)
                tune_eff = tune
                if tag == "sub_contra" and self.bold_p > 0:
                    # The SAME occasional-bold mixture as the batched
                    # contrary range steps (_mega_range_contra): the
                    # oversize/root-adjacent contrary subtree scales run
                    # through THIS family, and the slow deep-backbone
                    # valley (PERF.md) sits exactly on those nodes — a
                    # bold mixture that skips them would miss its target.
                    k1, kb = jax.random.split(k1)
                    bold = jax.random.bernoulli(kb, self.bold_p, tune.shape)
                    tune_eff = tune * jnp.where(
                        bold, jnp.asarray(self.bold_factor, dtype),
                        jnp.asarray(1.0, dtype))
                hnew, lq = truncated_normal_sample(
                    k1, hi_h, sd, tune_eff, 0.0, hp
                )
                xi = hnew / hi_h
                mask = range_mask(lo, hi_e)
                h2 = jnp.where(mask[None, :], h * xi[:, None], h)
                if tag == "sub_ultra":
                    lmhg = lq + (sx["n_inner"] - 1) * jnp.log(xi)
                    bnew = batch.replace(heights=h2)
                    fields = ("heights",)
                else:
                    xi_stem = (hp - hi_h) / (hp - hnew)
                    proper = mask & (iota != i)
                    rates = jnp.where(proper[None, :], r / xi[:, None], r)
                    rates = jnp.where(
                        (iota == i)[None, :], rates * xi_stem[:, None], rates
                    )
                    lmhg = (lq
                            + (sx["n_inner"] - sx["n_nodes"]) * jnp.log(xi)
                            + jnp.log(xi_stem))
                    bnew = batch.replace(heights=h2, rates=rates)
                    fields = ("heights", "rates")
                blocks = [(o_bd, bd_of(bnew)), (o_ck, ck_of(bnew))]
                if nn:
                    blocks.append((o_nd, nd_of(bnew)))
                if tag == "sub_ultra":
                    d_new, z_new, q_new, dq = dense_lik(bnew, d, z, q)
                else:
                    # contrary subtree scales are exactly distance
                    # invariant (xi_stem compensates the stem; xi cancels
                    # inside), incl. the merged root entry -> lj = 0.
                    d_new, z_new, q_new, dq = d, z, q, jnp.zeros_like(q)
                    lik_upd = False
            elif tag == "sub_rate":
                i = sx["aux"]
                lo, hi_e = sx["lo"], sx["hi"]
                u, base, logu = gamma_scale_sample(k1, sd, tune)
                mask = range_mask(lo, hi_e)
                rates = jnp.where(mask[None, :], r * u[:, None], r)
                lmhg = base + sx["n_nodes"] * logu
                bnew = batch.replace(rates=rates)
                blocks = [(o_ck, ck_of(bnew))]
                fields = ("rates",)
                d_new, z_new, q_new, dq = dense_lik(bnew, d, z, q)
            else:  # pragma: no cover
                raise ValueError(tag)

            if lik_upd:
                # Root-branch Jacobian ratio for table-flagged tickets
                # (jacobianRootBranch, Probability.hs:393-410; the merged
                # root-adjacent entry is internal row 0).
                lj = jnp.where(
                    sx["rj"],
                    jnp.log(d[:, 0]) - jnp.log(d_new[:, 0]),
                    0.0,
                )

            outs, d_pr, invalid = block_diffs(terms, blocks)
            bl = jnp.broadcast_to(jnp.asarray(beta, dtype), (C,))
            bp = jnp.broadcast_to(jnp.asarray(beta_prior, dtype), (C,))
            log_alpha = bp * d_pr - 0.5 * bl * dq + lmhg + lj
            log_alpha = jnp.where(
                invalid | jnp.isnan(log_alpha), -jnp.inf, log_alpha
            )
            u_acc = jax.random.uniform(k2, (C,), dtype)
            accept = jnp.log(u_acc) < log_alpha

            for o, nb, old in outs:
                terms = terms.at[:, o:o + nb.shape[-1]].set(
                    jnp.where(accept[:, None], nb, old)
                )
            upd = {}
            for f in fields:
                a = getattr(bnew, f)
                b = getattr(batch, f)
                am = accept.reshape(accept.shape + (1,) * (a.ndim - 1))
                upd[f] = jnp.where(am, a, b)
            batch = batch.replace(**upd)
            if lik_upd:
                d = jnp.where(accept[:, None], d_new, d)
                z = jnp.where(accept[:, None], z_new, z) if use_lik else z
                q = jnp.where(accept, q_new, q)
            return (batch, terms, d, z, q), accept

        return step

    # -- mega-step builders ----------------------------------------------

    def _mega_contra_slide(self, spec: MegaSpec, dtype, beta_prior=1.0):
        """All-at-once batch of distance-invariant contrary slides
        (slideNodesAtContrarily, Contrary.hs:35-137)."""
        model = self.model
        nspec = {
            f.name: jnp.asarray(getattr(spec, f.name))
            for f in dataclasses.fields(spec) if f.name != "kind"
        }
        kc = spec.ch.shape[-1]

        def step(carry, xs):
            batch, terms, tuning, acc, key = carry
            sx, key_m = xs
            node, par, ch, valid = sx["node"], sx["par"], sx["ch"], sx["valid"]
            t_rows, rows, sd = sx["t_rows"], sx["rows"], sx["sd"]
            C = batch.heights.shape[0]
            h = batch.heights
            r = batch.rates
            hi = h[:, node]                    # [C, B]
            hp = h[:, par]
            ch_ok = ch >= 0                    # [B, KC]
            ch_i = jnp.clip(ch, min=0)
            hch = h[:, ch_i]                   # [C, B, KC]
            hc_max = jnp.max(jnp.where(ch_ok, hch, -jnp.inf), axis=-1)
            tune = tuning[:, rows]
            k1, k2 = jax.random.split(key_m)
            hnew, lq = truncated_normal_sample(
                k1, hi, jnp.asarray(sd, dtype), tune, hc_max, hp
            )
            xi_stem = (hp - hi) / (hp - hnew)
            xi_ch = jnp.where(
                ch_ok, (hi[..., None] - hch) / (hnew[..., None] - hch), 1.0
            )
            log_jac = jnp.log(xi_stem) + jnp.sum(
                jnp.where(ch_ok, jnp.log(xi_ch), 0.0), axis=-1
            )
            # New prior terms at the touched rows [bd_i, ck_i, bd_ch*, ck_ch*].
            la = batch.birth[:, None]
            mu_ = batch.death[:, None]
            var = batch.rate_var[:, None]
            r_i_new = r[:, node] * xi_stem
            r_ch_new = r[:, ch_i] * jnp.where(ch_ok, xi_ch, 1.0)
            is_leaf = jnp.asarray(self.model.topo.is_leaf)
            new_terms = [
                bd_term_local(hnew, hp, False, la, mu_),
                clock_term_local(model.clock, r_i_new, hp - hnew, var),
            ]
            for j in range(kc):
                new_terms.append(jnp.where(
                    ch_ok[:, j],
                    bd_term_local(hch[:, :, j], hnew, is_leaf[ch_i[:, j]],
                                  la, mu_),
                    0.0,
                ))
            for j in range(kc):
                new_terms.append(jnp.where(
                    ch_ok[:, j],
                    clock_term_local(model.clock, r_ch_new[:, :, j],
                                     hnew - hch[:, :, j], var),
                    0.0,
                ))
            kn = spec.t_rows.shape[-1] - 2 * (1 + kc)
            if kn:
                lp_cal = _cal_terms_local(
                    hnew[..., None], batch.height[:, None, None],
                    sx["cal_lo"][None], sx["cal_lo_s"][None],
                    sx["cal_hi"][None], sx["cal_hi_s"][None], dtype,
                )
                for j in range(kn):
                    new_terms.append(lp_cal[..., j])
            tn = jnp.stack(new_terms, axis=-1)     # [C, B, KT]
            t_ok = t_rows >= 0
            t_safe = jnp.clip(t_rows, min=0)
            told = terms[:, t_safe]                # [C, B, KT]
            diff = jnp.where(t_ok, tn - told, 0.0)
            d_pr = jnp.sum(jnp.where(jnp.isnan(diff), 0.0, diff), axis=-1)
            invalid = jnp.any(
                t_ok & (jnp.isnan(tn) | jnp.isneginf(tn)), axis=-1
            )
            bp = jnp.asarray(beta_prior, dtype)
            bp = bp[:, None] if bp.ndim == 1 else bp
            log_alpha = jnp.where(invalid, -jnp.inf, bp * d_pr + lq + log_jac)
            log_alpha = jnp.where(
                valid & ~jnp.isnan(log_alpha), log_alpha, -jnp.inf
            )
            u = jax.random.uniform(k2, log_alpha.shape, dtype)
            accept = (jnp.log(u) < log_alpha) & valid  # [C, B]
            # Apply: heights at node, rates at node+children, terms.
            h = h.at[:, node].set(jnp.where(accept, hnew, hi))
            r = r.at[:, node].set(jnp.where(accept, r_i_new, r[:, node]))
            accept_ch = accept[..., None] & ch_ok
            r = r.at[:, ch_i].set(jnp.where(accept_ch, r_ch_new, r[:, ch_i]))
            terms = terms.at[:, t_safe].set(
                jnp.where(accept[..., None] & t_ok, tn, told)
            )
            acc = acc.at[:, rows].add(accept.astype(acc.dtype))
            batch = batch.replace(heights=h, rates=r)
            return (batch, terms, tuning, acc, key), None

        return step, nspec

    def _mega_point_lik(self, spec: MegaSpec, dtype, beta=1.0,
                        beta_prior=1.0):
        """Likelihood-coupled point batch (slides / branch-rate scales) with
        the exact sequential-correction accept scan."""
        model = self.model
        is_branch = spec.kind == P.K_SCALE_BRANCH_RATE
        use_lik = self.use_lik
        nspec = {
            f.name: jnp.asarray(getattr(spec, f.name))
            for f in dataclasses.fields(spec) if f.name != "kind"
        }
        kc = spec.ch.shape[-1]
        kd = spec.d_rows.shape[-1]
        kt = spec.t_rows.shape[-1]
        B = spec.b
        n_sub = (B + SUB - 1) // SUB
        topo = self.model.topo
        is_leaf = jnp.asarray(topo.is_leaf)

        def step(carry, xs):
            batch, terms, d, z, q, tuning, acc, key = carry
            sx, key_m = xs
            node, par, ch, valid = sx["node"], sx["par"], sx["ch"], sx["valid"]
            t_rows, d_rows, rows, sd = (sx["t_rows"], sx["d_rows"],
                                        sx["rows"], sx["sd"])
            C = batch.heights.shape[0]
            h, r = batch.heights, batch.rates
            scale = batch.height * batch.rate_mean           # [C]
            tune = tuning[:, rows]
            k1, k2 = jax.random.split(key_m)
            la = batch.birth[:, None]
            mu_ = batch.death[:, None]
            var = batch.rate_var[:, None]

            d_ok = d_rows >= 0
            d_safe = jnp.clip(d_rows, min=0)
            if use_lik:
                # One-hot selector over the step's B*KD touched distance
                # rows (pad slots -> all-zero rows): every P/z/d row access
                # below rides the MXU instead of a flat-cost gather.
                D = self._dim
                d_flat = d_safe.reshape(-1)
                iota_d = jax.lax.broadcasted_iota(jnp.int32, (B * kd, D), 1)
                OHB = ((d_flat[:, None] == iota_d)
                       & d_ok.reshape(-1)[:, None]).astype(dtype)
                d_old = (d @ OHB.T).reshape(C, B, kd)        # [C, B, KD]
            else:
                d_old = d[:, d_safe]                          # [C, B, KD]

            if is_branch:
                u, base, logu = gamma_scale_sample(
                    k1, jnp.asarray(sd, dtype), tune
                )
                r_new = r[:, node] * u
                lq = base + logu
                log_jac = jnp.zeros_like(lq)
                tn0 = clock_term_local(
                    model.clock, r_new, h[:, par] - h[:, node], var
                )[..., None]                                  # [C, B, 1]
                tn = jnp.concatenate(
                    [tn0, jnp.zeros(tn0.shape[:-1] + (kt - 1,), dtype)],
                    axis=-1,
                )
                d_new = jnp.where(d_ok, d_old * u[..., None], d_old)
                h_upd = None
            else:
                hi = h[:, node]
                hp = h[:, par]
                ch_ok = ch >= 0
                ch_i = jnp.clip(ch, min=0)
                hch = h[:, ch_i]
                hc_max = jnp.max(jnp.where(ch_ok, hch, -jnp.inf), axis=-1)
                hnew, lq = truncated_normal_sample(
                    k1, hi, jnp.asarray(sd, dtype), tune, hc_max, hp
                )
                log_jac = jnp.zeros_like(lq)
                new_terms = [
                    bd_term_local(hnew, hp, False, la, mu_),
                    clock_term_local(model.clock, r[:, node], hp - hnew, var),
                ]
                for j in range(kc):
                    new_terms.append(jnp.where(
                        ch_ok[:, j],
                        bd_term_local(hch[:, :, j], hnew,
                                      is_leaf[ch_i[:, j]], la, mu_),
                        0.0,
                    ))
                for j in range(kc):
                    new_terms.append(jnp.where(
                        ch_ok[:, j],
                        clock_term_local(model.clock, r[:, ch_i[:, j]],
                                         hnew - hch[:, :, j], var),
                        0.0,
                    ))
                kn = kt - 2 * (1 + kc)
                if kn:
                    lp_cal = _cal_terms_local(
                        hnew[..., None], batch.height[:, None, None],
                        sx["cal_lo"][None], sx["cal_lo_s"][None],
                        sx["cal_hi"][None], sx["cal_hi_s"][None], dtype,
                    )
                    for j in range(kn):
                        new_terms.append(lp_cal[..., j])
                tn = jnp.stack(new_terms, axis=-1)
                # New distance rows: first slot = branch of node i, then
                # children branches (d_rows built sorted: recompute from
                # the defining formula instead of tracking slot order).
                # d_j = scale * (h_par(j) - h_j) * r_j for each touched row;
                # express via the node sets: row pos(i) gets t = hp - hnew,
                # row pos(c) gets t = hnew - h_c.
                d_new = d_old
                sc = scale[:, None]
                pos = jnp.asarray(np.asarray(topo.internal_pos))
                pos_i = pos[node]                              # [B]
                for slot in range(kd):
                    row = d_safe[:, slot]                      # [B]
                    is_i = (d_rows[:, slot] == pos_i)
                    # children slot: find which child owns this row
                    t_val = jnp.where(
                        is_i, hp - hnew, jnp.zeros_like(hnew)
                    )
                    r_val = jnp.where(is_i, r[:, node], jnp.zeros_like(hnew))
                    for j in range(kc):
                        owns = (d_rows[:, slot] == pos[jnp.clip(ch[:, j], min=0)]) & (ch[:, j] >= 0)
                        t_val = jnp.where(owns, hnew - h[:, jnp.clip(ch[:, j], min=0)], t_val)
                        r_val = jnp.where(owns, r[:, jnp.clip(ch[:, j], min=0)], r_val)
                    d_new = d_new.at[:, :, slot].set(jnp.where(
                        d_ok[:, slot], sc * t_val * r_val, d_old[:, :, slot]
                    ))
                h_upd = hnew

            delta = jnp.where(d_ok, d_new - d_old, 0.0)        # [C, B, KD]

            t_ok = t_rows >= 0
            t_safe = jnp.clip(t_rows, min=0)
            told = terms[:, t_safe]
            diff = jnp.where(t_ok, tn - told, 0.0)
            d_pr = jnp.sum(jnp.where(jnp.isnan(diff), 0.0, diff), axis=-1)
            invalid = jnp.any(
                t_ok & (jnp.isnan(tn) | jnp.isneginf(tn)), axis=-1
            )
            lmhg = jnp.where(invalid | ~valid, -jnp.inf, lq + log_jac)
            bl_c = jnp.broadcast_to(jnp.asarray(beta, dtype), (C,))
            bp_c = jnp.broadcast_to(jnp.asarray(beta_prior, dtype), (C,))

            u_acc = jax.random.uniform(k2, (C, B), dtype)
            if not use_lik:
                log_alpha = bp_c[:, None] * d_pr + lmhg
                log_alpha = jnp.where(jnp.isnan(log_alpha), -jnp.inf,
                                      log_alpha)
                accept = jnp.log(u_acc) < log_alpha
                dq_all = jnp.zeros((C, B), dtype)
            else:
                # --- likelihood with sequential correction, sub-blocked ---
                # All P/z row accesses via the step's one-hot selector:
                # Prow = P[touched rows], Pblk = P between touched rows,
                # zG = the gathered z view — updated INCREMENTALLY between
                # sub-blocks through Pblk so z itself is touched only once
                # at the end (add-form scatter of all accepted deltas).
                Prow = self._x_P(OHB, dtype)                   # [B*KD, D]
                Pblk = Prow @ OHB.T                            # [B*KD, B*KD]
                Pblk4 = Pblk.reshape(B, kd, B, kd)
                zG = z @ OHB.T                                 # [C, B*KD]
                accept = jnp.zeros((C, B), bool)
                dq_all = jnp.zeros((C, B), dtype)
                for s0 in range(n_sub):
                    lo = s0 * SUB
                    hi_ = min(lo + SUB, B)
                    Sn = hi_ - lo
                    dok = d_ok[lo:hi_]
                    dl = delta[:, lo:hi_]                       # [C, S, KD]
                    zg = zG[:, lo * kd:hi_ * kd].reshape(C, Sn, kd)
                    blk = Pblk4[lo:hi_, :, lo:hi_, :]
                    # P blocks: self [S, KD, KD], cross [S, S, KD, KD]
                    Pself = jnp.moveaxis(
                        jnp.diagonal(blk, axis1=0, axis2=2), -1, 0
                    )
                    dq0 = (2.0 * jnp.sum(dl * zg, axis=-1)
                           + jnp.einsum("csi,sij,csj->cs", dl, Pself, dl))
                    Pcross = jnp.moveaxis(blk, 1, 2)
                    # T[c, a, b] = delta_a' P delta_b
                    T = jnp.einsum("cai,abij,cbj->cab", dl, Pcross, dl)

                    def body(accm, xs_t):
                        dq0_t, dpr_t, lmhg_t, u_t, Tt, onehot = xs_t
                        corr = 2.0 * jnp.sum(accm * Tt, axis=-1)   # [C]
                        dq_t = dq0_t + corr
                        la_t = bp_c * dpr_t - 0.5 * bl_c * dq_t + lmhg_t
                        la_t = jnp.where(jnp.isnan(la_t), -jnp.inf, la_t)
                        a_t = jnp.log(u_t) < la_t
                        accm = accm + a_t.astype(dtype)[:, None] * onehot[None, :]
                        return accm, (a_t, dq_t)

                    eye = jnp.eye(Sn, dtype=dtype)
                    accm0 = jnp.zeros((C, Sn), dtype)
                    accm, (a_sub, dq_sub) = jax.lax.scan(
                        body, accm0,
                        (dq0.T, d_pr[:, lo:hi_].T, lmhg[:, lo:hi_].T,
                         u_acc[:, lo:hi_].T, jnp.moveaxis(T, 2, 0), eye),
                        unroll=8,
                    )
                    a_sub = a_sub.T                               # [C, S]
                    dq_sub = dq_sub.T
                    accept = accept.at[:, lo:hi_].set(a_sub)
                    dq_all = dq_all.at[:, lo:hi_].set(dq_sub)
                    # Later sub-blocks see this one's accepted deltas via
                    # the gathered view (zG += dacc @ P[rows_s, rows_all]).
                    if s0 < n_sub - 1:
                        dacc = jnp.where(a_sub[..., None] & dok, dl, 0.0)
                        zG = zG + (dacc.reshape(C, -1)
                                   @ Pblk[lo * kd:hi_ * kd])

            # --- apply ---
            accept = accept & valid
            if is_branch:
                r = r.at[:, node].set(jnp.where(accept, r_new, r[:, node]))
                batch = batch.replace(rates=r)
            else:
                h = h.at[:, node].set(jnp.where(accept, h_upd, h[:, node]))
                batch = batch.replace(heights=h)
            terms = terms.at[:, t_safe].set(
                jnp.where(accept[..., None] & t_ok, tn, told)
            )
            if use_lik:
                # Single add-form writeback of all accepted deltas: tickets
                # in a step touch provably disjoint rows, and pad slots are
                # all-zero in OHB, so scatter-add is exact.
                dacc_all = jnp.where(accept[..., None] & d_ok, delta, 0.0)
                dacc_flat = dacc_all.reshape(C, B * kd)
                d = d + dacc_flat @ OHB
                z = z + dacc_flat @ Prow
                q = q + jnp.sum(jnp.where(accept, dq_all, 0.0), axis=-1)
            else:
                d = d.at[:, d_safe].set(
                    jnp.where(accept[..., None] & d_ok, d_new, d_old)
                )
            acc = acc.at[:, rows].add(accept.astype(acc.dtype))
            return (batch, terms, d, z, q, tuning, acc, key), None

        return step, nspec


    def _mega_range_contra(self, spec: RangeSpec, dtype, beta_prior=1.0):
        """Sub-block of distance-invariant contrary subtree scales
        (scaleSubTreesAtContrarily, Contrary.hs:268-418).

        Runs in the TRANSPOSED ``[param, chains]`` layout: bulk row
        gathers/scatters of the per-ticket ranges are then contiguous
        (lane dimension = chains), which is what makes range batching
        bandwidth-efficient on TPU.
        """
        model = self.model
        topo = model.topo
        N = topo.n
        is_leaf = jnp.asarray(topo.is_leaf)
        nspec = {
            f.name: jnp.asarray(getattr(spec, f.name))
            for f in dataclasses.fields(spec) if f.name != "kind"
        }

        knr = spec.cal_t_rows.shape[-1]

        def step(carry, xs):
            hT, rT, teT, dT, zT, q, scal, tunT, acc, key = carry
            sx, key_m = xs
            node, par, valid = sx["node"], sx["par"], sx["valid"]
            own, own_par, rows, sd = (sx["own"], sx["own_par"], sx["rows"],
                                      sx["sd"])
            n_inner, n_nodes = sx["n_inner"], sx["n_nodes"]
            C = hT.shape[1]
            birth, death, rvar, _hrm, height_abs = scal
            hi = hT[node]                              # [S, C]
            hp = hT[par]
            tune = tunT[rows]
            k1, k2 = jax.random.split(key_m)
            if self.bold_p > 0:
                # Occasional-bold mixture (round 4): with probability
                # bold_p a ticket uses a bold_factor-times-wider kernel.
                # The GOE flagship showed the deep backbone's
                # distance-invariant direction is a barrier-free but
                # extremely SLOW valley (PERF.md "GOE deep-backbone
                # bimodality"; tools/goe_modes.py): tuned steps diffuse
                # ~60 My per 20k sweeps where the modes sit 430 My apart.
                # A state-independent mixture of reversible kernels is
                # reversible; forward and reverse densities share the same
                # effective tune inside truncated_normal_sample, so each
                # component's MHG factor is exact.
                k1, kb = jax.random.split(k1)
                bold = jax.random.bernoulli(kb, self.bold_p, hi.shape)
                tune = tune * jnp.where(bold,
                                        jnp.asarray(self.bold_factor, dtype),
                                        jnp.asarray(1.0, dtype))
            hnew, lq = truncated_normal_sample(
                k1, hi, jnp.asarray(sd, dtype)[:, None], tune, 0.0, hp
            )
            xi = hnew / hi
            xi_stem = (hp - hi) / (hp - hnew)
            own_ok = (own >= 0)[..., None]             # [S, RB, 1]
            own_s = jnp.clip(own, min=0)
            is_root = (own == node[:, None])[..., None]
            h_own = hT[own_s]                          # [S, RB, C]
            hpar_own = hT[jnp.clip(own_par, min=0)]
            r_own = rT[own_s]
            xi_e = xi[:, None, :]
            h_new = xi_e * h_own
            hpar_new = jnp.where(is_root, hpar_own, xi_e * hpar_own)
            r_new = jnp.where(
                is_root, r_own * xi_stem[:, None, :], r_own / xi_e
            )
            la = birth[None, None, :]
            mu_ = death[None, None, :]
            var = rvar[None, None, :]
            leaf_own = is_leaf[own_s][..., None]
            bd_new = bd_term_local(h_new, hpar_new, leaf_own, la, mu_)
            ck_new = clock_term_local(
                model.clock, r_new, hpar_new - h_new, var
            )
            t_bd = 4 + own_s
            t_ck = 4 + (N + 1) + own_s
            bd_old = teT[t_bd]
            ck_old = teT[t_ck]
            diff = jnp.where(own_ok, (bd_new - bd_old) + (ck_new - ck_old),
                             0.0)
            d_pr = jnp.sum(jnp.where(jnp.isnan(diff), 0.0, diff), axis=1)
            invalid = jnp.any(
                own_ok & (jnp.isnan(bd_new) | jnp.isneginf(bd_new)
                          | jnp.isnan(ck_new) | jnp.isneginf(ck_new)),
                axis=1,
            )
            if knr:
                cal_ok = (sx["cal_t_rows"] >= 0)[..., None]   # [S, KN, 1]
                cal_safe = jnp.clip(sx["cal_t_rows"], min=0)
                h_src = hT[jnp.clip(sx["cal_hsrc"], min=0)]   # [S, KN, C]
                cal_new = _cal_terms_local(
                    xi[:, None, :] * h_src, height_abs[None, None, :],
                    sx["cal_lo"][..., None], sx["cal_lo_s"][..., None],
                    sx["cal_hi"][..., None], sx["cal_hi_s"][..., None],
                    dtype,
                )
                cal_old = teT[cal_safe]
                diffc = jnp.where(cal_ok, cal_new - cal_old, 0.0)
                d_pr = d_pr + jnp.sum(
                    jnp.where(jnp.isnan(diffc), 0.0, diffc), axis=1
                )
                invalid = invalid | jnp.any(
                    cal_ok & (jnp.isnan(cal_new) | jnp.isneginf(cal_new)),
                    axis=1,
                )
            log_jac = ((n_inner - n_nodes)[:, None] * jnp.log(xi)
                       + jnp.log(xi_stem))
            bp = jnp.broadcast_to(jnp.asarray(beta_prior, dtype), (C,))
            log_alpha = bp[None, :] * d_pr + lq + log_jac
            log_alpha = jnp.where(
                invalid | ~valid[:, None] | jnp.isnan(log_alpha),
                -jnp.inf, log_alpha,
            )
            u = jax.random.uniform(k2, log_alpha.shape, dtype)
            accept = (jnp.log(u) < log_alpha) & valid[:, None]   # [S, C]
            am = accept[:, None, :] & own_ok
            hT = hT.at[own_s].set(jnp.where(am, h_new, h_own))
            rT = rT.at[own_s].set(jnp.where(am, r_new, r_own))
            teT = teT.at[t_bd].set(jnp.where(am, bd_new, bd_old))
            teT = teT.at[t_ck].set(jnp.where(am, ck_new, ck_old))
            if knr:
                amc = accept[:, None, :] & cal_ok
                teT = teT.at[cal_safe].set(jnp.where(amc, cal_new, cal_old))
            acc = acc.at[:, rows].add(accept.T.astype(acc.dtype))
            return (hT, rT, teT, dT, zT, q, scal, tunT, acc, key), None

        return step, nspec

    def _mega_range_lik(self, spec: RangeSpec, dtype, beta=1.0,
                        beta_prior=1.0):
        """Sub-block of likelihood-coupled subtree scales: ultrametric
        (Ultrametric.hs:126-188) or rate-tree (Unconstrained.hs:95-137),
        in the transposed ``[param, chains]`` layout.

        Each ticket's distance delta is rank-1: ``delta_b = (f_b - 1) g_b``
        with g the current distance rows (and, for the ultrametric kind, a
        sign-flipped boundary row), so pairwise cross terms reduce to
        quadratics in gathered P blocks; a sequential accept scan applies
        the exact corrections.
        """
        model = self.model
        topo = model.topo
        N = topo.n
        is_rate = spec.kind == P.K_SCALE_SUBTREE_RATE
        use_lik = self.use_lik
        is_leaf = jnp.asarray(topo.is_leaf)
        pos = jnp.asarray(np.asarray(topo.internal_pos))
        nspec = {
            f.name: jnp.asarray(getattr(spec, f.name))
            for f in dataclasses.fields(spec) if f.name != "kind"
        }
        S_n = spec.rows.shape[1]
        rb = spec.own.shape[-1]

        knr = 0 if is_rate else spec.cal_t_rows.shape[-1]

        def step(carry, xs):
            hT, rT, teT, dT, zT, q, scal, tunT, acc, key = carry
            sx, key_m = xs
            node, par, valid = sx["node"], sx["par"], sx["valid"]
            own, own_par, rows, sd = (sx["own"], sx["own_par"], sx["rows"],
                                      sx["sd"])
            n_inner, n_nodes = sx["n_inner"], sx["n_nodes"]
            C = hT.shape[1]
            birth, death, rvar, height_rm, height_abs = scal
            tune = tunT[rows]
            k1, k2 = jax.random.split(key_m)
            own_okb = own >= 0                          # [S, RB]
            own_ok = own_okb[..., None]
            own_s = jnp.clip(own, min=0)
            is_root = (own == node[:, None])[..., None]
            r_own = rT[own_s]                           # [S, RB, C]
            h_own = hT[own_s]
            hpar_own = hT[jnp.clip(own_par, min=0)]
            d_own = jnp.where(own_okb, pos[own_s], 0)   # [S, RB]
            if use_lik:
                D = self._dim
                d_flat0 = d_own.reshape(-1)
                iota_d0 = jax.lax.broadcasted_iota(
                    jnp.int32, (S_n * rb, D), 1
                )
                OHD0 = ((d_flat0[:, None] == iota_d0)
                        & own_okb.reshape(-1)[:, None]).astype(dtype)
                d_old_g = (OHD0 @ dT).reshape(S_n, rb, C)
            else:
                d_old_g = dT[d_own]                     # [S, RB, C]
            var = rvar[None, None, :]

            if is_rate:
                u0, base, logu = gamma_scale_sample(
                    k1, jnp.asarray(sd, dtype)[:, None], tune
                )
                f = u0                                   # [S, C]
                lq = base + n_nodes[:, None] * logu
                r_new = r_own * f[:, None, :]
                ck_new = clock_term_local(
                    model.clock, r_new, hpar_own - h_own, var
                )
                t_rows_all = (4 + (N + 1) + own_s,)
                t_news = (ck_new,)
                g = jnp.where(own_ok, d_old_g, 0.0)
                h_new = None
            else:
                hi = hT[node]
                hp = hT[par]
                hnew, lq = truncated_normal_sample(
                    k1, hi, jnp.asarray(sd, dtype)[:, None], tune, 0.0, hp
                )
                f = hnew / hi                            # xi  [S, C]
                lq = lq + (n_inner - 1)[:, None] * jnp.log(f)
                xi_e = f[:, None, :]
                h_new = xi_e * h_own
                hpar_new = jnp.where(is_root, hpar_own, xi_e * hpar_own)
                la = birth[None, None, :]
                mu_ = death[None, None, :]
                leaf_own = is_leaf[own_s][..., None]
                bd_new = bd_term_local(h_new, hpar_new, leaf_own, la, mu_)
                ck_new = clock_term_local(
                    model.clock, r_own, hpar_new - h_new, var
                )
                t_rows_all = (4 + own_s, 4 + (N + 1) + own_s)
                t_news = (bd_new, ck_new)
                g = jnp.where(
                    is_root, -height_rm[None, None, :] * r_own * h_own,
                    d_old_g,
                )
                g = jnp.where(own_ok, g, 0.0)

            d_pr = jnp.zeros((S_n, C), dtype)
            invalid = jnp.zeros((S_n, C), bool)
            for t_rows_k, tn_k in zip(t_rows_all, t_news):
                told_k = teT[t_rows_k]
                diff = jnp.where(own_ok, tn_k - told_k, 0.0)
                d_pr = d_pr + jnp.sum(
                    jnp.where(jnp.isnan(diff), 0.0, diff), axis=1
                )
                invalid = invalid | jnp.any(
                    own_ok & (jnp.isnan(tn_k) | jnp.isneginf(tn_k)), axis=1
                )
            if knr:
                # Calibrated nodes inside the range: their heights scale
                # by the ticket's xi; the term is elementwise.
                cal_ok = (sx["cal_t_rows"] >= 0)[..., None]   # [S, KN, 1]
                cal_safe = jnp.clip(sx["cal_t_rows"], min=0)
                h_src = hT[jnp.clip(sx["cal_hsrc"], min=0)]   # [S, KN, C]
                cal_new = _cal_terms_local(
                    f[:, None, :] * h_src, height_abs[None, None, :],
                    sx["cal_lo"][..., None], sx["cal_lo_s"][..., None],
                    sx["cal_hi"][..., None], sx["cal_hi_s"][..., None],
                    dtype,
                )
                cal_old = teT[cal_safe]
                diffc = jnp.where(cal_ok, cal_new - cal_old, 0.0)
                d_pr = d_pr + jnp.sum(
                    jnp.where(jnp.isnan(diffc), 0.0, diffc), axis=1
                )
                invalid = invalid | jnp.any(
                    cal_ok & (jnp.isnan(cal_new) | jnp.isneginf(cal_new)),
                    axis=1,
                )
            lmhg = jnp.where(invalid | ~valid[:, None], -jnp.inf, lq)
            bl_c = jnp.broadcast_to(jnp.asarray(beta, dtype), (C,))
            bp_c = jnp.broadcast_to(jnp.asarray(beta_prior, dtype), (C,))
            u_acc = jax.random.uniform(k2, (S_n, C), dtype)
            coef = f - 1.0                              # [S, C]

            if not use_lik:
                log_alpha = bp_c[None, :] * d_pr + lmhg
                accept = jnp.log(u_acc) < jnp.where(
                    jnp.isnan(log_alpha), -jnp.inf, log_alpha
                )
                dq_all = jnp.zeros((S_n, C), dtype)
            else:
                # All P/z/d row accesses go through a one-hot selector on
                # the MXU: advanced-index gathers cost ~5 ms flat on this
                # backend, the matmul form ~0.5 ms.
                OHD = OHD0
                zg = (OHD @ zT).reshape(S_n, rb, C)
                v = jnp.sum(g * zg, axis=1)             # [S, C]
                Prow = self._x_P(OHD, dtype)             # [S*rb, D]
                Q = (Prow @ OHD.T).reshape(S_n, rb, S_n, rb)
                # G[a, b, c] = g_a' P g_b per chain; the diagonal is the
                # self term gamma_b = g_b' P g_b.
                G = jnp.einsum("aic,aibj,bjc->abc", g, Q, g)
                eyeS = jnp.eye(S_n, dtype=dtype)
                gamma_ = jnp.sum(G * eyeS[:, :, None], axis=1)
                dq0 = 2.0 * coef * v + coef * coef * gamma_
                X = coef[:, None, :] * G * coef[None, :, :]

                def body(accm, xs_t):
                    dq0_t, dpr_t, lmhg_t, u_t, Xt, onehot = xs_t
                    corr = 2.0 * jnp.sum(accm * Xt, axis=0)   # [C]
                    dq_t = dq0_t + corr
                    la_t = bp_c * dpr_t - 0.5 * bl_c * dq_t + lmhg_t
                    la_t = jnp.where(jnp.isnan(la_t), -jnp.inf, la_t)
                    a_t = jnp.log(u_t) < la_t
                    accm = accm + a_t[None, :].astype(dtype) * onehot[:, None]
                    return accm, (a_t, dq_t)

                eye = jnp.eye(S_n, dtype=dtype)
                accm0 = jnp.zeros((S_n, C), dtype)
                _, (a_seq, dq_seq) = jax.lax.scan(
                    body, accm0,
                    (dq0, d_pr, lmhg, u_acc, jnp.moveaxis(X, 1, 0), eye),
                    unroll=8,
                )
                accept = a_seq                           # [S, C]
                dq_all = dq_seq

            accept = accept & valid[:, None]
            am = accept[:, None, :] & own_ok
            if is_rate:
                rT = rT.at[own_s].set(jnp.where(am, r_new, r_own))
                teT = teT.at[t_rows_all[0]].set(
                    jnp.where(am, t_news[0], teT[t_rows_all[0]])
                )
            else:
                hT = hT.at[own_s].set(jnp.where(am, h_new, h_own))
                for t_rows_k, tn_k in zip(t_rows_all, t_news):
                    teT = teT.at[t_rows_k].set(
                        jnp.where(am, tn_k, teT[t_rows_k])
                    )
                if knr:
                    amc = accept[:, None, :] & cal_ok
                    teT = teT.at[cal_safe].set(
                        jnp.where(amc, cal_new, cal_old)
                    )
            delta = coef[:, None, :] * g
            dacc = jnp.where(am, delta, 0.0)
            if use_lik:
                # Add-form write-backs through the same selector (pad rows
                # are all-zero in OHD, so they contribute nothing).
                dT = dT + OHD.T @ dacc.reshape(S_n * rb, C)
                zT = zT + Prow.T @ dacc.reshape(S_n * rb, C)
                q = q + jnp.sum(jnp.where(accept, dq_all, 0.0), axis=0)
            else:
                dT = dT.at[d_own].set(
                    jnp.where(am, d_old_g + delta, d_old_g)
                )
            acc = acc.at[:, rows].add(accept.T.astype(acc.dtype))
            return (hT, rT, teT, dT, zT, q, scal, tunT, acc, key), None

        return step, nspec

    # -- the sweep driver ----------------------------------------------

    # NOTE (round 5, measured negative): a cross-chain fiber height-SWAP —
    # pairs of chains exchanging whole height vectors with every branch
    # rate rescaled to hold time*rate constant (likelihood-invariant
    # involution, accepted on the prior ratio) — was designed and measured
    # first.  Its acceptance is the prior ratio over ALL ~2N rescaled rate
    # terms, and collapses even at 10 leaves (measured 2e-4); the per-node
    # slide below keeps the same fiber geometry with only ~3 touched terms
    # per accept and replaces it.  Recorded in PERF.md.

    def _fiber_slide_plan(self):
        """Host-side plan for the fiber node-slide phase: color classes of
        internal non-root nodes plus per-class term-ownership maps.

        Two nodes conflict (must not move in the same class) when they are
        tree-adjacent (they share a branch whose rate is rescaled, and the
        slide interval of one is bounded by the other) or co-occur in a
        constraint/brace term (per-node acceptance needs each term's delta
        to depend on ONE moved node).  A greedy coloring of this graph gives
        2-4 classes in practice (trees are bipartite by level)."""
        model = self.model
        topo = model.topo
        N = topo.n
        parent = np.asarray(topo.parent)
        is_leaf = np.asarray(topo.is_leaf)
        movable = [i for i in range(1, N) if not is_leaf[i]]
        mov = set(movable)
        adj = {i: set() for i in movable}

        def edge(a, b):
            if a in mov and b in mov and a != b:
                adj[a].add(b)
                adj[b].add(a)

        for i in movable:
            edge(i, int(parent[i]))
        con, br, cal = model.constraints, model.braces, model.calibrations
        if con.n:
            for yy, oo in zip(np.asarray(con.young), np.asarray(con.old)):
                edge(int(yy), int(oo))
        if br.n:
            for row in np.asarray(br.node):
                real = [int(x) for x in row if x >= 0]
                for a in range(len(real)):
                    for b in range(a + 1, len(real)):
                        edge(real[a], real[b])
        order = sorted(movable, key=lambda i: -len(adj[i]))
        color: Dict[int, int] = {}
        for i in order:
            used = {color[j] for j in adj[i] if j in color}
            c = 0
            while c in used:
                c += 1
            color[i] = c
        n_colors = 1 + max(color.values(), default=-1)
        T = 4 + 2 * (N + 1) + (cal.n + con.n + br.n)
        children = np.asarray(topo.children)
        classes = []
        for c in range(n_colors):
            idx = np.asarray(
                sorted(i for i in movable if color[i] == c), np.int32
            )
            m = len(idx)
            pos = {int(v): j for j, v in enumerate(idx)}
            owner = np.full(T, m, np.int32)
            # Birth-death term i depends on (h_i, h_parent(i)); clock term i
            # on (r_i, tl_i) — both touched iff i or parent(i) moves.
            for i in range(1, N):
                own = pos.get(i, pos.get(int(parent[i])))
                if own is not None:
                    owner[4 + i] = own
                    owner[4 + (N + 1) + i] = own
            off = 4 + 2 * (N + 1)
            if cal.n:
                for nd in np.asarray(cal.node):
                    if int(nd) in pos:
                        owner[off] = pos[int(nd)]
                    off += 1
            if con.n:
                for yy, oo in zip(np.asarray(con.young), np.asarray(con.old)):
                    own = pos.get(int(yy), pos.get(int(oo)))
                    if own is not None:
                        owner[off] = own
                    off += 1
            if br.n:
                for row in np.asarray(br.node):
                    for x in row:
                        if int(x) in pos:
                            owner[off] = pos[int(x)]
                            break
                    off += 1
            ch = children[idx]  # [m, max_c], -1 padding
            pj, pc = np.nonzero(ch >= 0)
            classes.append(dict(
                idx=idx,
                par=parent[idx].astype(np.int32),
                ch=ch.astype(np.int32),
                ch_row=pj.astype(np.int32),
                ch_col=pc.astype(np.int32),
                ch_idx=ch[pj, pc].astype(np.int32),
                owner=owner,
            ))
        return classes

    def _fiber_slide_move(self, dtype, beta_prior=1.0):
        """Within-chain fiber node-slide: a likelihood-invariant node-height
        Gibbs-style kernel for the slow deep-backbone valley.

        tools/goe_fiber_probe.py showed the GOE deep-backbone modes connect
        along the likelihood FIBER — move node heights, rescale branch rates
        to hold every time*rate product constant, and the likelihood is
        exactly invariant with no posterior barrier; ordinary height kernels
        crawl along it because any uncompensated height move pays a
        likelihood penalty, and the round-4/5 bold contrary mixture measured
        ZERO effect (PERF.md).  This kernel moves ALONG the fiber directly,
        one node at a time: for internal non-root node v propose

            h_v' ~ Uniform(max_c h_child, h_parent)          (the full
                                                              valid interval)
            r_b' = r_b * dt_b / dt_b'   for b in {v} + children(v),

        so the three (at binary nodes) touched branch distances are exactly
        unchanged — the carried d/z/q/y stay valid.  MH acceptance is the
        PRIOR term-delta over the touched terms (birth-death of v and its
        children, clock of the rescaled branches, node priors naming v)
        plus the rate-map Jacobian  sum_b log(dt_b / dt_b');  the uniform
        proposal over a fixed interval (parent and children pinned within a
        class) is symmetric and cancels.  Nodes are batched over the color
        classes of :meth:`_fiber_slide_plan`; within a class the touched
        term sets are disjoint, so per-node accepts compose exactly.

        The reference has no analog — its node slides pay the likelihood
        (mcmc's slide + Mcmc.Tree.Proposal.Ultrametric); this is the
        TPU-batched "jump along the fiber" kernel the round-4 valley
        diagnosis called for."""
        model = self.model
        classes = self._fiber_slide_plan()
        bprior = jnp.asarray(beta_prior, dtype)
        n_nodes = sum(int(c["idx"].shape[0]) for c in classes)

        def move(batch, terms, key):
            C = batch.heights.shape[0]
            acc_frac = jnp.asarray(0.0, dtype)
            for cls in classes:
                idx = jnp.asarray(cls["idx"])
                par = jnp.asarray(cls["par"])
                ch = jnp.asarray(cls["ch"])
                chm = ch >= 0
                chc = jnp.clip(ch, min=0)
                ch_row = jnp.asarray(cls["ch_row"])
                ch_col = jnp.asarray(cls["ch_col"])
                ch_idx = jnp.asarray(cls["ch_idx"])
                owner = jnp.asarray(cls["owner"])
                m = int(cls["idx"].shape[0])
                key, k_u, k_a = jax.random.split(key, 3)
                h, r = batch.heights, batch.rates
                hv = h[:, idx]  # [C, m]
                hp = h[:, par]
                hch = h[:, chc]  # [C, m, max_c]
                lo = jnp.max(jnp.where(chm, hch, 0.0), axis=-1)
                u = jax.random.uniform(
                    k_u, hv.shape, dtype, minval=1e-6, maxval=1.0
                )
                hn = lo + u * (hp - lo)
                f_s = (hp - hv) / (hp - hn)
                dt_c_new = hn[:, :, None] - hch
                f_c = jnp.where(chm, (hv[:, :, None] - hch) / dt_c_new, 1.0)
                log_jac = jnp.log(f_s) + jnp.sum(
                    jnp.where(chm, jnp.log(jnp.where(chm, f_c, 1.0)), 0.0),
                    axis=-1,
                )
                f_ce = f_c[:, ch_row, ch_col]  # [C, E]
                bn = batch.replace(
                    heights=h.at[:, idx].set(hn),
                    rates=r.at[:, idx].multiply(f_s)
                         .at[:, ch_idx].multiply(f_ce),
                )
                terms_n = jax.vmap(model.log_prior_terms)(bn)
                dterm = terms_n - terms
                dsum = jnp.zeros((C, m + 1), dtype).at[:, owner].add(
                    jnp.where(jnp.isnan(dterm), -jnp.inf, dterm)
                )
                la = bprior * dsum[:, :m] + log_jac
                lu = jnp.log(jax.random.uniform(k_a, (C, m), dtype))
                ok = lu < la  # NaN-safe: NaN compares False -> reject
                batch = batch.replace(
                    heights=h.at[:, idx].set(jnp.where(ok, hn, hv)),
                    rates=r.at[:, idx]
                          .multiply(jnp.where(ok, f_s, 1.0))
                          .at[:, ch_idx]
                          .multiply(jnp.where(ok[:, ch_row], f_ce, 1.0)),
                )
                ok_pad = jnp.concatenate(
                    [ok, jnp.zeros((C, 1), bool)], axis=1
                )
                terms = jnp.where(ok_pad[:, owner], terms_n, terms)
                acc_frac = acc_frac + jnp.sum(ok.astype(dtype)) / (
                    C * n_nodes
                )
            return batch, terms, acc_frac

        return move

    def sweeps(
        self,
        batch: State,
        tuning,
        key,
        n: int,
        beta=1.0,
        beta_prior=1.0,
        collect=None,
        nuts_move=None,
        nuts_eps=None,
        nuts_inv_mass=None,
    ):
        """Same contract as ``MHKernel.sweeps``.

        Each sweep runs: the sequential leftover phase (y-carry, exactly the
        MHKernel step), then the batched phases (z/q-carry).  Phase grouping
        replaces the reference's global ticket shuffle — a fixed composition
        of pi-invariant kernels, equally valid (the seq phase still shuffles
        its own tickets; mega-steps run in stacked order)."""
        from ..ops import heights as Hops

        model = self.model
        C = batch.heights.shape[0]
        dtype = batch.heights.dtype
        kernels = P.make_kernel_switch(model.topo, model.braces)
        seq_step = self.seq_kern._ticket_step(kernels, beta, dtype, beta_prior)
        seq_tickets = jnp.asarray(self.plan.seq_table.tickets)
        seq_rows = jnp.asarray(self.plan.seq_rows)
        P_orig = self.table.n_proposals
        P_seq = self.plan.seq_table.n_proposals

        mega_steps = []
        for k, spec in self.plan.specs.items():
            if k == P.K_SLIDE_NODES_CONTRA:
                mega_steps.append(
                    ("contra",) + self._mega_contra_slide(spec, dtype,
                                                          beta_prior)
                )
            else:
                step, nspec = self._mega_point_lik(
                    spec, dtype, beta, beta_prior
                )
                mega_steps.append(("lik", step, nspec))
        # Range steps run in the transposed [param, chains] layout.
        range_steps = []
        for k, spec in self.plan.range_specs.items():
            if spec.kind == P.K_SCALE_SUBTREES_CONTRA:
                range_steps.append(
                    self._mega_range_contra(spec, dtype, beta_prior)
                )
            else:
                step, nspec = self._mega_range_lik(
                    spec, dtype, beta, beta_prior
                )
                range_steps.append((step, nspec))
        # Global-move families (specialized scans; see GlobGroup).
        glob_steps = []
        for tag, grp in self.plan.glob_groups.items():
            sxs = {
                "sd": jnp.asarray(grp.sd, dtype),
                "aux": jnp.asarray(grp.aux),
                "lo": jnp.asarray(grp.lo),
                "hi": jnp.asarray(grp.hi),
                "n_inner": jnp.asarray(grp.n_inner),
                "n_nodes": jnp.asarray(grp.n_nodes),
                "rj": jnp.asarray(grp.rj),
            }
            glob_steps.append(
                (self._glob_step(tag, dtype, beta, beta_prior),
                 sxs, jnp.asarray(grp.rows), grp.n_tickets)
            )

        terms = jax.vmap(model.log_prior_terms)(batch)
        d0 = jax.vmap(lambda s: Hops.distances_internal(s, model.topo))(batch)
        y = jax.vmap(model.whitened_residual_internal)(batch)
        lik_const = jnp.asarray(model.log_lik_const, dtype)
        acc = jnp.zeros((C, P_orig), jnp.int32)
        tot = jnp.broadcast_to(
            jnp.asarray(self.table.weight, jnp.int32) * n, (C, P_orig)
        )
        key, k_chains = jax.random.split(key)
        chain_keys = jax.random.split(k_chains, C)

        def lp_of(terms, y):
            return (jnp.sum(terms, axis=-1),
                    lik_const - 0.5 * jnp.sum(y * y, axis=-1))

        slide_move = (self._fiber_slide_move(dtype, beta_prior)
                      if self.fiber_slide_p > 0 else None)

        def one_sweep(carry, key_s):
            batch, terms, d, y, tuning, acc, chain_keys = carry
            k_seq, k_perm, k_mega, k_nuts, k_slide = jax.random.split(
                key_s, 5
            )

            # --- sequential leftover phase (shuffled, y-carry) ---
            if len(self.plan.seq_table.tickets):
                perm = jax.random.permutation(k_perm, seq_tickets)
                tun_seq = tuning[:, seq_rows]
                acc_seq = jnp.zeros((C, P_seq), jnp.int32)
                c = (batch, terms, d, y, tun_seq, acc_seq, chain_keys)
                c, _ = jax.lax.scan(seq_step, c, perm)
                batch, terms, d, y, _, acc_seq, chain_keys = c
                acc = acc.at[:, seq_rows].add(acc_seq)

            # --- batched phases (z/q-carry) ---
            if mega_steps or range_steps or glob_steps:
                z, q = self._zq_from_y(y, dtype)
                keys_m = jax.random.split(
                    k_mega,
                    len(mega_steps) + len(range_steps) + len(glob_steps),
                )
                for gi, (gstep, sxs, grows, ng) in enumerate(glob_steps):
                    kg = keys_m[len(mega_steps) + len(range_steps) + gi]
                    tkeys = jax.random.split(kg, ng)
                    tun_g = tuning[:, grows].T          # [n_tickets, C]
                    carry_g = (batch, terms, d, z, q)
                    carry_g, accepts = jax.lax.scan(
                        gstep, carry_g, (sxs, tkeys, tun_g)
                    )
                    batch, terms, d, z, q = carry_g
                    acc = acc.at[:, grows].add(accepts.T.astype(acc.dtype))
                for mi, ms in enumerate(mega_steps):
                    tag, step, nspec = ms
                    nm = nspec["rows"].shape[0]
                    mkeys = jax.random.split(keys_m[mi], nm)
                    if tag == "contra":
                        carry_m = (batch, terms, tuning, acc, keys_m[mi])
                        carry_m, _ = jax.lax.scan(
                            step, carry_m, (nspec, mkeys)
                        )
                        batch, terms, _, acc, _ = carry_m
                    else:
                        carry_m = (batch, terms, d, z, q, tuning, acc,
                                   keys_m[mi])
                        carry_m, _ = jax.lax.scan(
                            step, carry_m, (nspec, mkeys)
                        )
                        batch, terms, d, z, q, _, acc, _ = carry_m
                if range_steps:
                    # Transpose the hot arrays once: bulk row gathers of
                    # ticket ranges are then contiguous (lanes = chains).
                    hT, rT = batch.heights.T, batch.rates.T
                    teT, dT, zT = terms.T, d.T, z.T
                    tunT = tuning.T
                    scal = (batch.birth, batch.death, batch.rate_var,
                            batch.height * batch.rate_mean, batch.height)
                    for ri, (step, nspec) in enumerate(range_steps):
                        km = keys_m[len(mega_steps) + ri]
                        nm = nspec["rows"].shape[0]
                        mkeys = jax.random.split(km, nm)
                        carry_r = (hT, rT, teT, dT, zT, q, scal, tunT, acc,
                                   km)
                        carry_r, _ = jax.lax.scan(
                            step, carry_r, (nspec, mkeys)
                        )
                        hT, rT, teT, dT, zT, q, _, _, acc, _ = carry_r
                    batch = batch.replace(heights=hT.T, rates=rT.T)
                    terms, d, z = teT.T, dT.T, zT.T
                y = self._y_from_d(d, dtype)

            if slide_move is not None:
                # Fiber node-slide phase (likelihood-invariant per-node
                # kernel; carried d/z/q/y stay exact).  fiber_slide_p < 1
                # thins the phase by a state-independent coin.
                k_do2, k_mv2 = jax.random.split(k_slide)
                batch_s, terms_s, sl_a = slide_move(batch, terms, k_mv2)
                do2 = jax.random.bernoulli(k_do2, min(self.fiber_slide_p, 1.0))
                batch = jax.tree.map(
                    lambda nw, od: jnp.where(do2, nw, od), batch_s, batch
                )
                terms = jnp.where(do2, terms_s, terms)
                sl_a = jnp.where(do2, sl_a, jnp.nan)
            else:
                sl_a = jnp.asarray(jnp.nan, dtype)

            if nuts_move is not None:
                batch, astat = nuts_move(
                    batch, k_nuts, nuts_eps, nuts_inv_mass, beta, beta_prior
                )
                terms = jax.vmap(model.log_prior_terms)(batch)
                d = jax.vmap(
                    lambda s: Hops.distances_internal(s, model.topo)
                )(batch)
                y = jax.vmap(model.whitened_residual_internal)(batch)
            else:
                astat = jnp.zeros(C, dtype)

            if collect is not None:
                lp_pr, lp_lik = lp_of(terms, y)
                out = jax.vmap(collect)(batch, lp_pr, lp_lik)
            else:
                out = None
            return (batch, terms, d, y, tuning, acc, chain_keys), (
                out, astat, sl_a
            )

        sweep_keys = jax.random.split(key, n)
        carry = (batch, terms, d0, y, tuning, acc, chain_keys)
        carry, (outs, astats, slide_accs) = jax.lax.scan(
            one_sweep, carry, sweep_keys
        )
        batch, terms, d, y, tuning, acc, chain_keys = carry
        lp_pr, lp_lik = lp_of(terms, y)
        # The slide-phase acceptance ([n], NaN on thinned sweeps) is only
        # appended when the phase is on, so mc3/stepping-stone callers keep
        # the plain signature.
        ret = (batch, lp_pr, lp_lik, acc, tot, outs)
        if nuts_move is not None:
            ret = ret + (astats,)
        if slide_move is not None:
            ret = ret + (slide_accs,)
        return ret


# NOTE: stage-2 (subtree-range batching) extends this module; see PERF.md.
