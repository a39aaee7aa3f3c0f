"""The dating model: prior, likelihood, and posterior composition.

TPU-native analog of app/Probability.hs: every term is a pure jittable log
density on the flat state; the composed posterior vmaps over chains.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import cached_property
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..ops import birth_death, clocks, heights as H, mvn, node_priors
from ..ops.dists import exponential_logpdf, gamma_logpdf
from ..tree.flat import FlatTopology
from .state import State


@dataclass(frozen=True)
class DatingModel:
    """Static model description closed over by the jitted densities.

    Mirrors the data assembled by ``getMcmcProps`` (app/Main.hs:370-457).
    """

    topo: FlatTopology
    likelihood: mvn.LikelihoodData
    clock: str = clocks.UNCORRELATED_GAMMA
    calibrations: node_priors.CalibrationSet = field(
        default_factory=node_priors.CalibrationSet.empty
    )
    constraints: node_priors.ConstraintSet = field(
        default_factory=node_priors.ConstraintSet.empty
    )
    braces: node_priors.BraceSet = field(default_factory=node_priors.BraceSet.empty)
    # Initial, constant, approximate absolute tree height; mean of the root
    # calibration when present, else 1 (app/Main.hs:394).
    mean_root_height: float = 1.0

    @property
    def calibrations_available(self) -> bool:
        return self.calibrations.n > 0

    # -- prior components (each mirrors a monitor column, app/Monitor.hs) --

    def log_prior_cal_con_brace(self, state: State):
        return node_priors.calibrate_constrain_brace_log(
            self.calibrations, self.constraints, self.braces, state.heights, state.height
        )

    def log_prior_birth_death(self, state: State):
        """Birth-death on the relative time tree with Exp(1) hyper-priors on
        the birth and death rates (app/Probability.hs:66-85)."""
        lp_rates = exponential_logpdf(1.0, state.birth) + exponential_logpdf(
            1.0, state.death
        )
        lp_tree = birth_death.birth_death_log(
            state.heights,
            jnp.asarray(self.topo.parent),
            jnp.asarray(self.topo.is_leaf),
            state.birth,
            state.death,
            1.0,
        )
        return lp_rates + lp_tree

    def log_prior_relaxed_clock(self, state: State):
        """Relaxed clock on the rate tree: Exp(mean_root_height) prior on the
        rate mean, Gamma(3/2, 1/6) on the rate variance
        (app/Probability.hs:96-124)."""
        lp_mean = exponential_logpdf(self.mean_root_height, state.rate_mean)
        lp_var = gamma_logpdf(1.5, 1.0 / 6.0, state.rate_var)
        tl = H.branch_lengths(state.heights, jnp.asarray(self.topo.parent))
        non_root = jnp.asarray(self.topo.parent >= 0)
        lp_tree = clocks.relaxed_clock_log(
            self.clock, state.rates, tl, non_root, 1.0, state.rate_var
        )
        return lp_mean + lp_var + lp_tree

    def log_prior(self, state: State):
        return (
            self.log_prior_cal_con_brace(state)
            + self.log_prior_birth_death(state)
            + self.log_prior_relaxed_clock(state)
        )

    # -- prior term blocks ----------------------------------------------
    # The flat term vector is [scalars(4), bd(N+1), clock(N+1), nodes(nn)];
    # the sampler recomputes only the blocks a proposal can change.

    def term_scalars(self, state: State):
        return jnp.stack(
            [
                exponential_logpdf(1.0, state.birth),
                exponential_logpdf(1.0, state.death),
                exponential_logpdf(self.mean_root_height, state.rate_mean),
                gamma_logpdf(1.5, 1.0 / 6.0, state.rate_var),
            ]
        )

    def term_bd(self, state: State):
        return birth_death.birth_death_terms(
            state.heights, jnp.asarray(self.topo.parent),
            jnp.asarray(self.topo.is_leaf), state.birth, state.death, 1.0,
        )

    def term_clock(self, state: State):
        parent = jnp.asarray(self.topo.parent)
        tl = H.branch_lengths(state.heights, parent)
        return clocks.relaxed_clock_terms(
            self.clock, state.rates, tl, parent >= 0, 1.0, state.rate_var
        )

    def term_nodes(self, state: State):
        return node_priors.calibrate_constrain_brace_terms(
            self.calibrations, self.constraints, self.braces,
            state.heights, state.height,
        )

    @property
    def term_block_sizes(self):
        n = self.topo.n
        nn = (
            self.calibrations.n + self.constraints.n + self.braces.n
        )
        return (4, n + 1, n + 1, nn)

    def log_prior_terms(self, state: State):
        """Flat vector of log prior terms; ``sum == log_prior``.

        Acceptance ratios are computed term-by-term
        (``sum(terms(x') - terms(x))``): contributions untouched by a
        proposal are bitwise identical and cancel exactly, which keeps f32
        acceptance deltas accurate even when individual terms are huge.
        """
        return jnp.concatenate(
            [
                self.term_scalars(state),
                self.term_bd(state),
                self.term_clock(state),
                self.term_nodes(state),
            ]
        )

    # -- likelihood ----------------------------------------------------

    def log_likelihood(self, state: State):
        if self.likelihood.kind == mvn.NONE:
            return jnp.zeros(jnp.shape(state.height), state.height.dtype)
        d = H.distances_from_state(state, self.topo)
        f = mvn.make_log_likelihood(self.likelihood, dtype=state.heights.dtype)
        return f(d)

    # Internal (pre-order) likelihood layout: mu and the precision factor
    # permuted once on the host so that sub-tree proposals touch entry 0
    # plus one contiguous distance range (incremental updates).
    @cached_property
    def mu_internal(self) -> Optional[np.ndarray]:
        if self.likelihood.kind == mvn.NONE:
            return None
        return self.likelihood.mu[self.topo.ref_to_internal_perm]

    @cached_property
    def chol_internal(self) -> Optional[np.ndarray]:
        """Lower Cholesky of the internally-permuted precision, recomputed
        in f64.  ``None`` for the univariate/none kinds — the univariate
        model is diagonal and must never materialize an O(N^2) matrix
        (the reference evaluates it in O(N), Probability.hs:186-193); use
        :attr:`inv_sd_internal` instead."""
        if self.likelihood.kind in (mvn.NONE, mvn.UNIVARIATE, mvn.BANDED):
            return None
        perm = self.topo.ref_to_internal_perm
        prec = self.likelihood.precision[np.ix_(perm, perm)]
        return np.linalg.cholesky(prec)

    @cached_property
    def band_L3_internal(self) -> Optional[np.ndarray]:
        """Banded kind: block-tridiagonal form of the upper-banded ``L``
        (``P_internal = L L'``), shared by the sweep kernels and the
        whitened-residual paths.  The band is estimated in the internal
        layout at prepare time (ops/banded.py); assert the stored
        permutation matches this topology's."""
        if self.likelihood.kind != mvn.BANDED:
            return None
        from ..ops import banded as banded_mod

        stored = np.asarray(self.likelihood.band_perm)
        if not np.array_equal(stored, self.topo.ref_to_internal_perm):
            raise ValueError(
                "banded likelihood data was prepared for a different "
                "topology (internal permutation mismatch)"
            )
        wb = banded_mod.default_block_size(int(self.likelihood.bandwidth))
        return banded_mod.blocks_from_upper_band(
            self.likelihood.band_chol, wb
        )

    @cached_property
    def inv_sd_internal(self) -> Optional[np.ndarray]:
        """Univariate kind: per-distance ``1/sd`` in the internal layout."""
        if self.likelihood.kind != mvn.UNIVARIATE:
            return None
        perm = self.topo.ref_to_internal_perm
        return 1.0 / np.sqrt(self.likelihood.variances[perm])

    def whitened_residual_internal(self, state: State):
        """Internal-layout residual ``y``; same ||y||^2 as
        :meth:`whitened_residual` (permutation preserves the quadratic
        form)."""
        dtype = state.heights.dtype
        if self.likelihood.kind == mvn.NONE:
            return jnp.zeros(0, dtype)
        d = H.distances_internal(state, self.topo)
        mu = jnp.asarray(self.mu_internal, dtype)
        if self.likelihood.kind == mvn.UNIVARIATE:
            return (d - mu) * jnp.asarray(self.inv_sd_internal, dtype)
        if self.likelihood.kind == mvn.BANDED:
            from ..ops import banded as banded_mod

            return banded_mod.block_tridiag_matmul(
                d - mu, jnp.asarray(self.band_L3_internal, dtype),
                self.likelihood.dim,
            )
        return (d - mu) @ jnp.asarray(self.chol_internal, dtype)

    def whitened_residual(self, state: State):
        """``y`` such that ``log_lik = const - 0.5 (||y||^2 + log det)``.

        For the MVN kinds ``y = (d - mu) @ L`` with ``L`` the precision
        Cholesky factor; for univariate ``y_i = (d_i - mu_i)/sd_i``; empty
        for no-likelihood.  Carrying ``y`` lets the sampler compute
        likelihood deltas as ``sum((y' - y) * (y' + y))`` — a
        cancellation-resistant form for f32 acceptance.
        """
        dtype = state.heights.dtype
        if self.likelihood.kind == mvn.NONE:
            return jnp.zeros(0, dtype)
        if self.likelihood.kind == mvn.BANDED:
            # The band only exists in the internal layout; the internal
            # residual has the same norm (permutation-invariant quad form).
            return self.whitened_residual_internal(state)
        d = H.distances_from_state(state, self.topo)
        mu = jnp.asarray(self.likelihood.mu, dtype)
        if self.likelihood.kind == mvn.UNIVARIATE:
            sd = jnp.sqrt(jnp.asarray(self.likelihood.variances, dtype))
            return (d - mu) / sd
        chol = jnp.asarray(self.likelihood.chol_precision, dtype)
        return (d - mu) @ chol

    @property
    def log_lik_const(self) -> float:
        """Constant part of the log likelihood (normalization)."""
        import math

        if self.likelihood.kind == mvn.NONE:
            return 0.0
        k = self.likelihood.dim
        c = -0.9189385332046727 * k
        if self.likelihood.kind == mvn.UNIVARIATE:
            return c - 0.5 * float(np.sum(np.log(self.likelihood.variances)))
        return c - 0.5 * float(self.likelihood.log_det_sigma)

    # -- posterior -----------------------------------------------------

    def log_posterior(self, state: State, beta=1.0):
        """Tempered log posterior; ``beta`` powers the likelihood (MC3 /
        stepping-stone)."""
        lp = self.log_prior(state)
        ll = self.log_likelihood(state)
        out = lp + beta * ll
        return jnp.where(jnp.isnan(out), -jnp.inf, out)

    def log_posterior_parts(self, state: State):
        return self.log_prior(state), self.log_likelihood(state)
