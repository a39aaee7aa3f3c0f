"""Metropolis-Hastings-Green sampler: jitted sweeps, auto-tuning, burn-in.

Replaces the reference's external ``mcmc`` engine loop (SURVEY.md §2.4): per
iteration, execute the weight-expanded proposal tickets in random order; the
acceptance ratio is ``prior' * lik'^beta * q * J / (prior * lik^beta)``
with the current posterior carried, so each proposal costs one posterior
evaluation.  The whole sweep is a ``lax.scan`` over tickets with a
``lax.switch`` over proposal kinds; chains vmap; burn-in runs windows with
per-proposal acceptance-rate tuning between windows
(BurnInWithCustomAutoTuning, app/Definitions.hs:420-430).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.dating import DatingModel
from ..models.state import State
from ..ops.heights import log_jacobian_root_branch
from . import proposals as props

TUNE_MIN = 1e-6
TUNE_MAX = 1e6


@dataclass(frozen=True)
class MHKernel:
    """Compiled-once sweep kernel for a model + proposal table."""

    model: DatingModel
    table: props.ProposalTable

    def _ticket_step(self, kernels, beta, dtype):
        topo = self.model.topo
        kind = jnp.asarray(self.table.kind)
        node = jnp.asarray(self.table.node)
        aux = jnp.asarray(self.table.aux)
        par = jnp.asarray(self.table.par, dtype)
        root_jac = jnp.asarray(self.table.root_jac)

        def step(carry, pidx):
            state, lp_pr, lp_lik, tuning, acc, tot, key = carry
            key, k_prop, k_acc = jax.random.split(key, 3)
            t = tuning[pidx]
            state_new, log_mhg = jax.lax.switch(
                kind[pidx],
                kernels,
                state,
                k_prop,
                t,
                node[pidx],
                aux[pidx],
                par[pidx],
            )
            lp_pr2 = self.model.log_prior(state_new)
            lp_lik2 = self.model.log_likelihood(state_new)
            # jacobianRootBranch ratio for root-adjacent proposals
            # (app/Probability.hs:408-410; liftProposalWith semantics).
            lj = jnp.where(
                root_jac[pidx],
                log_jacobian_root_branch(state_new, topo)
                - log_jacobian_root_branch(state, topo),
                0.0,
            )
            log_alpha = (lp_pr2 - lp_pr) + beta * (lp_lik2 - lp_lik) + log_mhg + lj
            log_alpha = jnp.where(jnp.isnan(log_alpha), -jnp.inf, log_alpha)
            u = jax.random.uniform(k_acc, dtype=lp_pr.dtype)
            accept = jnp.log(u) < log_alpha
            state = jax.tree.map(
                lambda a, b: jnp.where(accept, a, b), state_new, state
            )
            lp_pr = jnp.where(accept, lp_pr2, lp_pr)
            lp_lik = jnp.where(accept, lp_lik2, lp_lik)
            acc = acc.at[pidx].add(accept.astype(acc.dtype))
            tot = tot.at[pidx].add(1)
            return (state, lp_pr, lp_lik, tuning, acc, tot, key), None

        return step

    def sweep(self, state: State, tuning, acc, tot, key, beta=1.0):
        """One full sweep: all tickets in random order."""
        kernels = props.make_kernel_switch(self.model.topo, self.model.braces)
        step = self._ticket_step(kernels, beta, state.heights.dtype)
        key, k_perm, k_scan = jax.random.split(key, 3)
        tickets = jax.random.permutation(k_perm, jnp.asarray(self.table.tickets))
        lp_pr = self.model.log_prior(state)
        lp_lik = self.model.log_likelihood(state)
        carry = (state, lp_pr, lp_lik, tuning, acc, tot, k_scan)
        carry, _ = jax.lax.scan(step, carry, tickets)
        state, lp_pr, lp_lik, _, acc, tot, _ = carry
        return state, lp_pr, lp_lik, acc, tot

    def sweeps(self, state: State, tuning, key, n: int, beta=1.0, collect=None):
        """``n`` sweeps under one jit; returns final state, acceptance
        counters, and optionally per-sweep collected values.

        ``collect(state, lp_pr, lp_lik) -> pytree`` is stacked per sweep.
        """
        kernels = props.make_kernel_switch(self.model.topo, self.model.braces)
        step = self._ticket_step(kernels, beta, state.heights.dtype)
        tickets = jnp.asarray(self.table.tickets)
        lp_pr = self.model.log_prior(state)
        lp_lik = self.model.log_likelihood(state)
        acc = jnp.zeros(self.table.n_proposals, jnp.int32)
        tot = jnp.zeros(self.table.n_proposals, jnp.int32)

        def one_sweep(carry, key_s):
            state, lp_pr, lp_lik, tuning, acc, tot = carry
            k_perm, k_scan = jax.random.split(key_s)
            perm = jax.random.permutation(k_perm, tickets)
            c = (state, lp_pr, lp_lik, tuning, acc, tot, k_scan)
            c, _ = jax.lax.scan(step, c, perm)
            state, lp_pr, lp_lik, tuning, acc, tot, _ = c
            out = collect(state, lp_pr, lp_lik) if collect is not None else None
            return (state, lp_pr, lp_lik, tuning, acc, tot), out

        keys = jax.random.split(key, n)
        carry = (state, lp_pr, lp_lik, tuning, acc, tot)
        carry, outs = jax.lax.scan(one_sweep, carry, keys)
        state, lp_pr, lp_lik, tuning, acc, tot = carry
        return state, lp_pr, lp_lik, acc, tot, outs


def tune_step(tuning, acc, tot, targets, rate=1.0):
    """Per-proposal tuning update after a burn-in window.

    Multiplicative update toward the dimension-dependent optimal acceptance
    rate (the reference engine auto-tunes per proposal during burn-in with
    custom windows; we use the standard stochastic-approximation update
    ``t <- t * exp(rate * (acc_rate - target))``).
    """
    observed = acc / jnp.maximum(tot, 1)
    new = tuning * jnp.exp(rate * (observed - targets))
    return jnp.clip(new, TUNE_MIN, TUNE_MAX)


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
