"""Metropolis-Hastings-Green sampler: jitted sweeps, auto-tuning, burn-in.

Replaces the reference's external ``mcmc`` engine loop (SURVEY.md §2.4): per
iteration, execute the weight-expanded proposal tickets in random order; the
acceptance ratio is ``prior' * lik'^beta * q * J / (prior * lik^beta)``
with the current posterior carried, so each proposal costs one posterior
evaluation.  Chains are a mandatory leading batch axis.

TPU-critical design point: the ticket order is shuffled per sweep but SHARED
across chains, so the ``lax.switch`` over proposal kinds has a scalar index
and vmapping the kernels stays a single-branch program.  A per-chain shuffle
would force XLA to evaluate all kinds for every ticket (measured: compile
and runtime blow up by the number of kinds).  Chains remain independent:
conditional on the (random) order sequence, each chain's kernel is a valid
MCMC kernel for the target, and the order does not depend on any chain
state.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.dating import DatingModel
from ..models.state import State
from ..ops.heights import log_jacobian_root_branch
from . import proposals as props

# Tuning parameter bounds.  The reference engine also clamps its per-proposal
# tuning parameters; unbounded tuning is pathological for gamma-kernel scale
# proposals (shape/t -> 0 makes the kernel spiky at 0/inf while acceptance
# stays near 1/2, so t grows without limit).
TUNE_MIN = 1e-3
TUNE_MAX = 1e2


@dataclass(frozen=True)
class MHKernel:
    """Sweep kernel for a model + proposal table.

    All public entry points take a chain-batched state (leading axis C),
    per-chain tuning ``[C, P]``, and per-chain acceptance counters.
    """

    model: DatingModel
    table: props.ProposalTable

    def _ticket_step(self, kernels, beta, dtype, beta_prior=1.0):
        from ..ops import heights as Hops
        from ..ops import mvn as mvn_mod
        from . import proposals as P

        topo = self.model.topo
        node = jnp.asarray(self.table.node)
        aux = jnp.asarray(self.table.aux)
        par = jnp.asarray(self.table.par, dtype)
        root_jac = jnp.asarray(self.table.root_jac)

        use_lik = self.model.likelihood.kind != mvn_mod.NONE
        diag_lik = self.model.likelihood.kind == mvn_mod.UNIVARIATE
        band_lik = self.model.likelihood.kind == mvn_mod.BANDED
        if use_lik:
            D = self.model.likelihood.dim
            PAD = 1025
            mu_int = jnp.asarray(self.model.mu_internal, dtype)
            if diag_lik:
                inv_sd = jnp.asarray(self.model.inv_sd_internal, dtype)
            elif band_lik:
                # Banded L: a full O(D w) block-banded recompute is cheaper
                # than gather-based incremental classes (ops/banded.py),
                # so every likelihood class collapses to one expression.
                from ..ops import banded as banded_mod

                L3 = jnp.asarray(self.model.band_L3_internal, dtype)
            else:
                L = jnp.asarray(self.model.chol_internal, dtype)
                L_pad = jnp.concatenate([L, jnp.zeros((PAD, D), dtype)], axis=0)
            if self.table.d_class is not None:
                d_class = jnp.asarray(self.table.d_class)
                d_lo = jnp.asarray(self.table.d_lo)
                didx = jnp.asarray(self.table.didx)
            else:  # hand-built tables: recompute fully everywhere
                Pn = self.table.n_proposals
                d_class = jnp.full(Pn, P.DC_FULL, jnp.int32)
                d_lo = jnp.ones(Pn, jnp.int32)
                didx = jnp.full((Pn, 1), D, jnp.int32)

        def apply_one(state, key, tune, pidx):
            """Single-chain proposal application; vmapped over chains with a
            SCALAR pidx so the switch stays one branch."""
            return jax.lax.switch(
                jnp.asarray(self.table.kind)[pidx],
                kernels,
                state,
                key,
                tune,
                node[pidx],
                aux[pidx],
                par[pidx],
            )

        def step(carry, pidx):
            batch, terms, d, y, tuning, acc, keys = carry
            keys2 = jax.vmap(lambda k: jax.random.split(k, 3))(keys)
            keys = keys2[:, 0]
            k_prop = keys2[:, 1]
            k_acc = keys2[:, 2]
            t = tuning[:, pidx]
            state_new, log_mhg = jax.vmap(
                lambda s, k, tu: apply_one(s, k, tu, pidx)
            )(batch, k_prop, t)
            # NOTE: recomputing only the prior blocks a proposal can change
            # (table.prior_class) was measured SLOWER at 1k taxa — the sweep
            # is HBM-bound and splicing carried slices copies as many bytes
            # as recomputing.  Full recomputation keeps the step simple.
            terms2 = jax.vmap(self.model.log_prior_terms)(state_new)
            # Per-term deltas: contributions untouched by the proposal are
            # bitwise identical and cancel exactly (f32-safe acceptance).
            d_terms = terms2 - terms
            d_pr = jnp.sum(jnp.where(jnp.isnan(d_terms), 0.0, d_terms), axis=-1)
            invalid_new = jnp.any(
                ~jnp.isfinite(terms2) & ~jnp.isposinf(terms2), axis=-1
            )
            d_pr = jnp.where(invalid_new, -jnp.inf, d_pr)

            if use_lik:
                # Incremental whitened-residual update by the proposal's
                # static likelihood class (see proposals.DC_*).
                d2 = jax.vmap(
                    lambda s: Hops.distances_internal(s, topo)
                )(state_new)
                delta = d2 - d
                if diag_lik:
                    # Diagonal model: the whitening is elementwise, O(N) —
                    # no Cholesky, no matmul (Probability.hs:186-193).
                    # ``delta`` is already zero outside touched entries, so
                    # every likelihood class collapses to one expression.
                    dy = delta * inv_sd
                    d_new = d2
                elif band_lik:
                    dy = banded_mod.block_tridiag_matmul(delta, L3, D)
                    d_new = d2
                else:
                    C = delta.shape[0]
                    delta_pad = jnp.pad(delta, ((0, 0), (0, PAD)))

                    def br_inv(_):
                        return jnp.zeros_like(y), d

                    def br_full(_):
                        y2 = (d2 - mu_int) @ L
                        return y2 - y, d2

                    def br_gather(_):
                        idx = didx[pidx]
                        dy = delta_pad[:, idx] @ L_pad[idx, :]
                        return dy, d2

                    def mk_range(B):
                        def br(_):
                            lo = d_lo[pidx]
                            zero = jnp.zeros((), lo.dtype)
                            sl = jax.lax.dynamic_slice(delta_pad, (zero, lo), (C, B))
                            Lr = jax.lax.dynamic_slice(L_pad, (lo, zero), (B, D))
                            dy = sl @ Lr + delta[:, 0:1] @ L[0:1, :]
                            return dy, d2

                        return br

                    dy, d_new = jax.lax.switch(
                        d_class[pidx],
                        [br_inv, br_full, br_gather,
                         mk_range(64), mk_range(256), mk_range(1024)],
                        None,
                    )
                d_lik = -0.5 * jnp.sum(dy * (2.0 * y + dy), axis=-1)
            else:
                dy = jnp.zeros_like(y)
                d_new = d
                d_lik = jnp.zeros_like(d_pr)

            # jacobianRootBranch ratio for root-adjacent proposals
            # (app/Probability.hs:408-410; liftProposalWith semantics).
            lj = jnp.where(
                root_jac[pidx],
                jax.vmap(lambda s: log_jacobian_root_branch(s, topo))(state_new)
                - jax.vmap(lambda s: log_jacobian_root_branch(s, topo))(batch),
                0.0,
            )
            log_alpha = beta_prior * d_pr + beta * d_lik + log_mhg + lj
            log_alpha = jnp.where(jnp.isnan(log_alpha), -jnp.inf, log_alpha)
            u = jax.vmap(lambda k: jax.random.uniform(k, dtype=dtype))(k_acc)
            accept = jnp.log(u) < log_alpha

            def sel(a, b):
                acc_b = accept.reshape(accept.shape + (1,) * (a.ndim - 1))
                return jnp.where(acc_b, a, b)

            batch = jax.tree.map(sel, state_new, batch)
            terms = sel(terms2, terms)
            d = sel(d_new, d)
            y = sel(y + dy, y)
            acc = acc.at[:, pidx].add(accept.astype(acc.dtype))
            return (batch, terms, d, y, tuning, acc, keys), None

        return step

    def sweeps(
        self,
        batch: State,
        tuning,
        key,
        n: int,
        beta=1.0,
        beta_prior=1.0,
        collect: Optional[Callable] = None,
        nuts_move: Optional[Callable] = None,
        nuts_eps=None,
        nuts_inv_mass=None,
    ):
        """``n`` sweeps under one jit for a chain batch.

        ``key`` is a single PRNG key; per-chain streams are derived from it.
        ``beta`` tempers the likelihood (scalar or per-chain vector; used by
        stepping-stone sampling); ``beta_prior`` additionally tempers the
        prior (MC3 heats the whole posterior).  ``collect(state, lp_pr,
        lp_lik) -> pytree`` (single-chain) is vmapped and stacked per sweep.
        Returns ``(batch, lp_pr, lp_lik, acc, tot, outs)``.

        ``nuts_move`` (from :func:`..hmc.make_in_cycle_move`) adds NUTS as a
        weight-1 in-cycle move, fired once per sweep after the shuffled
        tickets (Definitions.hs:274-278) with step size ``nuts_eps`` and
        diagonal ``nuts_inv_mass`` passed as device arrays.  The carried
        incremental quantities are refreshed after the move (one full
        recomputation per sweep).  With ``nuts_move`` the return gains a
        seventh element: per-sweep NUTS acceptance statistics ``[n, C]``.
        """
        from ..ops import heights as Hops

        C = batch.heights.shape[0]
        dtype = batch.heights.dtype
        kernels = props.make_kernel_switch(self.model.topo, self.model.braces)
        step = self._ticket_step(kernels, beta, dtype, beta_prior)
        tickets = jnp.asarray(self.table.tickets)
        terms = jax.vmap(self.model.log_prior_terms)(batch)
        y = jax.vmap(self.model.whitened_residual_internal)(batch)
        d0 = jax.vmap(lambda s: Hops.distances_internal(s, self.model.topo))(batch)
        lik_const = jnp.asarray(self.model.log_lik_const, dtype)
        acc = jnp.zeros((C, self.table.n_proposals), jnp.int32)
        # Attempts are deterministic: every ticket runs once per sweep.
        tot = jnp.broadcast_to(
            jnp.asarray(self.table.weight, jnp.int32) * n,
            (C, self.table.n_proposals),
        )
        key, k_chains = jax.random.split(key)
        chain_keys = jax.random.split(k_chains, C)

        def lp_of(terms, y):
            lp_pr = jnp.sum(terms, axis=-1)
            lp_lik = lik_const - 0.5 * jnp.sum(y * y, axis=-1)
            return lp_pr, lp_lik

        def one_sweep(carry, key_s):
            batch, terms, d, y, tuning, acc, chain_keys = carry
            perm = jax.random.permutation(key_s, tickets)
            c = (batch, terms, d, y, tuning, acc, chain_keys)
            c, _ = jax.lax.scan(step, c, perm)
            batch, terms, d, y, tuning, acc, chain_keys = c
            if nuts_move is not None:
                k_nuts = jax.random.fold_in(key_s, 7)
                batch, astat = nuts_move(
                    batch, k_nuts, nuts_eps, nuts_inv_mass, beta, beta_prior
                )
                # NUTS moved most coordinates: refresh the carried
                # incremental quantities (one full recompute per sweep).
                terms = jax.vmap(self.model.log_prior_terms)(batch)
                d = jax.vmap(
                    lambda s: Hops.distances_internal(s, self.model.topo)
                )(batch)
                y = jax.vmap(self.model.whitened_residual_internal)(batch)
            else:
                astat = jnp.zeros(batch.heights.shape[0], dtype)
            if collect is not None:
                lp_pr, lp_lik = lp_of(terms, y)
                out = jax.vmap(collect, in_axes=(0, 0, 0))(batch, lp_pr, lp_lik)
            else:
                out = None
            return (batch, terms, d, y, tuning, acc, chain_keys), (out, astat)

        sweep_keys = jax.random.split(key, n)
        carry = (batch, terms, d0, y, tuning, acc, chain_keys)
        carry, (outs, astats) = jax.lax.scan(one_sweep, carry, sweep_keys)
        batch, terms, d, y, tuning, acc, chain_keys = carry
        lp_pr, lp_lik = lp_of(terms, y)
        if nuts_move is None:
            return batch, lp_pr, lp_lik, acc, tot, outs
        return batch, lp_pr, lp_lik, acc, tot, outs, astats


def tune_step(tuning, acc, tot, targets, rate=1.0, tune_max=None):
    """Per-proposal tuning update after a burn-in window.

    Multiplicative update toward the dimension-dependent optimal acceptance
    rate (the reference engine auto-tunes per proposal during burn-in with
    custom windows; we use the standard stochastic-approximation update
    ``t <- t * exp(rate * (acc_rate - target))``).  Works on ``[C, P]`` or
    ``[P]`` arrays alike.

    ``tune_max`` is a per-proposal upper bound.  For gamma-kernel scale
    proposals the effective shape is ``par / t``; allowing ``t`` beyond
    ``par / 2`` makes the kernel heavier-tailed than shape-2 where the
    Hastings factor grows like ``exp(u)`` — large, rarely-accepted jumps
    whose acceptance statistics are badly estimated in f32, observed to
    bias spread-type proposals.  Use :meth:`ProposalTable.tune_max`.
    """
    observed = acc / jnp.maximum(tot, 1)
    new = tuning * jnp.exp(rate * (observed - targets))
    hi = TUNE_MAX if tune_max is None else tune_max
    return jnp.clip(new, TUNE_MIN, hi)


# Burn-in schedules (app/Definitions.hs:420-437).
BURN_IN_FAST = [10, 10] + list(range(10, 131, 10))
BURN_IN_SLOW = list(range(100, 401, 20))
BURN_IN_INFORMED_SLOW = [100, 100, 100, 200, 300, 400, 400]
BURN_IN_PROF_FAST = [10, 10]
BURN_IN_PROF_SLOW = [20, 20]
ITERATIONS = 8000
ITERATIONS_PROF = 50


@dataclass
class BurnInSettings:
    fast: List[int]
    slow: List[int]

    @staticmethod
    def default() -> "BurnInSettings":
        return BurnInSettings(list(BURN_IN_FAST), list(BURN_IN_SLOW))

    @staticmethod
    def informed() -> "BurnInSettings":
        return BurnInSettings([], list(BURN_IN_INFORMED_SLOW))

    @staticmethod
    def profiling() -> "BurnInSettings":
        return BurnInSettings(list(BURN_IN_PROF_FAST), list(BURN_IN_PROF_SLOW))

    @property
    def total(self) -> int:
        return sum(self.fast) + sum(self.slow)
