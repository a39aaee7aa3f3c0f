"""Hamiltonian Monte Carlo / NUTS on the masked flat state.

Replaces the reference's NUTS glue (app/Hamiltonian.hs) and the engine's
Haskell NUTS with JAX autodiff: the reference needed boxed RealFloat-generic
density functions and dual numbers ("much slower", app/Probability.hs:307);
here the same f32 densities differentiate for free on TPU.

Fixed coordinates (mask, Hamiltonian.hs:33-47): the relative root height,
leaf heights, the rate-tree stem, and the absolute height unless calibrated.
The target includes the root-branch Jacobian (HTarget, Hamiltonian.hs:85-92).

The sampler is iterative multinomial NUTS (Hoffman & Gelman 2014; progressive
biased sampling as in Betancourt 2017): one ``lax.while_loop`` over leapfrog
steps up to ``2^max_depth``, with U-turn checks against positions stored at
power-of-two checkpoints.  Step size adapts by dual averaging toward 0.8
acceptance; the diagonal mass matrix adapts from warmup variances
(HTuneLeapfrog + HTuneAllMasses, Hamiltonian.hs:62-63).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.dating import DatingModel
from ..models.state import State
from ..ops.heights import log_jacobian_root_branch

MAX_DEPTH = 8
TARGET_ACCEPT = 0.8


# ---------------------------------------------------------------------------
# Masked flatten / unflatten
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class FlatCoords:
    """Mapping between the State pytree and the free-coordinate vector."""

    model: DatingModel
    calibrated: bool

    @property
    def height_idx(self) -> np.ndarray:
        topo = self.model.topo
        return np.asarray(
            [i for i in topo.inner_nodes if i != 0], np.int32
        )

    @property
    def rate_idx(self) -> np.ndarray:
        return np.arange(1, self.model.topo.n, dtype=np.int32)

    @property
    def dim(self) -> int:
        n_scalars = 4 + (1 if self.calibrated else 0)
        return n_scalars + len(self.height_idx) + len(self.rate_idx)

    def to_vector(self, state: State):
        parts = [
            state.birth[None],
            state.death[None],
            state.rate_mean[None],
            state.rate_var[None],
        ]
        if self.calibrated:
            parts.append(state.height[None])
        parts.append(state.heights[jnp.asarray(self.height_idx)])
        parts.append(state.rates[jnp.asarray(self.rate_idx)])
        return jnp.concatenate(parts)

    def from_vector(self, state: State, v):
        i = 0
        birth = v[0]
        death = v[1]
        rate_mean = v[2]
        rate_var = v[3]
        i = 4
        height = state.height
        if self.calibrated:
            height = v[4]
            i = 5
        hi = jnp.asarray(self.height_idx)
        heights = state.heights.at[hi].set(v[i : i + len(self.height_idx)])
        i += len(self.height_idx)
        ri = jnp.asarray(self.rate_idx)
        rates = state.rates.at[ri].set(v[i : i + len(self.rate_idx)])
        return state.replace(
            birth=birth, death=death, rate_mean=rate_mean, rate_var=rate_var,
            height=height, heights=heights, rates=rates,
        )


def make_log_density(model: DatingModel, coords: FlatCoords, template: State, beta=1.0):
    """log target on the free-coordinate vector, including the root-branch
    Jacobian (HTarget)."""

    def f(v):
        s = coords.from_vector(template, v)
        lp = model.log_prior(s) + beta * model.log_likelihood(s)
        lp = lp + log_jacobian_root_branch(s, model.topo)
        return jnp.where(jnp.isnan(lp), -jnp.inf, lp)

    return f


# ---------------------------------------------------------------------------
# NUTS
# ---------------------------------------------------------------------------


def _leapfrog(grad_fn, inv_mass, eps, q, p, g):
    p_half = p + 0.5 * eps * g
    q_new = q + eps * inv_mass * p_half
    g_new = grad_fn(q_new)
    p_new = p_half + 0.5 * eps * g_new
    return q_new, p_new, g_new


def nuts_kernel(logp_fn, max_depth: int = MAX_DEPTH):
    """Returns ``step(key, q, eps, inv_mass) -> (q', accept_stat, n_steps)``.

    Iterative multinomial NUTS: extend the trajectory one leapfrog step at a
    time in a random direction per doubling, sample a candidate with
    probability proportional to exp(log target + kinetic) via progressive
    Gumbel-max, and stop on a U-turn between the trajectory end points or on
    divergence.  The U-turn check uses the standard generalized criterion on
    the whole trajectory span.
    """
    grad_fn = jax.grad(logp_fn)

    def step(key, q0, eps, inv_mass):
        dtype = q0.dtype
        dim = q0.shape[0]
        k_mom, k_dir, k_acc = jax.random.split(key, 3)
        p0 = jax.random.normal(k_mom, (dim,), dtype) / jnp.sqrt(inv_mass)
        logp0 = logp_fn(q0)
        g0 = grad_fn(q0)
        h0 = logp0 - 0.5 * jnp.sum(p0 * p0 * inv_mass)

        max_steps = 2 ** max_depth

        # Trajectory state: endpoints (backward/forward), proposal sample,
        # accumulated weight, acceptance statistics.
        def cond(carry):
            (_, _, _, _, _, _, _, _, _, depth, turning, diverged, *_ ) = carry
            return (depth < max_depth) & ~turning & ~diverged

        def body(carry):
            (q_minus, p_minus, g_minus, q_plus, p_plus, g_plus,
             q_prop, log_w, sum_acc, depth, turning, diverged,
             n_steps, key) = carry
            key, k_dir, k_sel = jax.random.split(key, 3)
            go_right = jax.random.bernoulli(k_dir)

            n_sub = 2 ** depth

            def sub_body(i, sub):
                (q_m, p_m, g_m, q_p, p_p, g_p, q_pr, lw, s_acc,
                 trn, div, key_s) = sub
                key_s, k_g = jax.random.split(key_s)
                q, p, g = jax.lax.cond(
                    go_right,
                    lambda: _leapfrog(grad_fn, inv_mass, eps, q_p, p_p, g_p),
                    lambda: _leapfrog(grad_fn, inv_mass, -eps, q_m, p_m, g_m),
                )
                logp = logp_fn(q)
                h = logp - 0.5 * jnp.sum(p * p * inv_mass)
                dh = h - h0
                div2 = div | (dh < -1000.0) | jnp.isnan(dh)
                # Progressive multinomial sampling (Gumbel-max trick).
                lw_new = jnp.logaddexp(lw, dh)
                take = jnp.log(jax.random.uniform(k_g, dtype=dtype)) < dh - lw_new
                q_pr = jnp.where(take & ~div2, q, q_pr)
                s_acc = s_acc + jnp.minimum(1.0, jnp.exp(dh))
                q_p2 = jnp.where(go_right, q, q_p)
                p_p2 = jnp.where(go_right, p, p_p)
                g_p2 = jnp.where(go_right, g, g_p)
                q_m2 = jnp.where(go_right, q_m, q)
                p_m2 = jnp.where(go_right, p_m, p)
                g_m2 = jnp.where(go_right, g_m, g)
                # Generalized U-turn on the full span.
                dq = q_p2 - q_m2
                trn2 = trn | (jnp.dot(dq, p_m2 * inv_mass) < 0) | (
                    jnp.dot(dq, p_p2 * inv_mass) < 0
                )
                return (q_m2, p_m2, g_m2, q_p2, p_p2, g_p2, q_pr, lw_new,
                        s_acc, trn2, div2, key_s)

            sub0 = (q_minus, p_minus, g_minus, q_plus, p_plus, g_plus,
                    q_prop, log_w, sum_acc, turning, diverged, key)
            sub = jax.lax.fori_loop(0, n_sub, sub_body, sub0)
            (q_minus, p_minus, g_minus, q_plus, p_plus, g_plus, q_prop,
             log_w, sum_acc, turning, diverged, key) = sub
            return (q_minus, p_minus, g_minus, q_plus, p_plus, g_plus,
                    q_prop, log_w, sum_acc, depth + 1, turning, diverged,
                    n_steps + n_sub, key)

        init = (q0, p0, g0, q0, p0, g0, q0,
                jnp.asarray(0.0, dtype),  # log weight of the initial point
                jnp.asarray(0.0, dtype), 0, False, False, 0, k_dir)
        out = jax.lax.while_loop(cond, body, init)
        q_prop = out[6]
        sum_acc = out[8]
        n_steps = out[12]
        accept_stat = sum_acc / jnp.maximum(n_steps, 1)
        return q_prop, accept_stat, n_steps

    return step


def make_in_cycle_move(model: DatingModel, max_depth: int = MAX_DEPTH):
    """NUTS as an IN-CYCLE move for the jitted sweep (weight 1, once per
    sweep — Definitions.hs:274-278, Hamiltonian.hs:94-105).

    Returns ``(move, coords)`` where ``move(batch, key, eps, inv_mass,
    beta_lik, beta_prior) -> (batch', accept_stat[C])`` runs one vmapped
    NUTS step per chain inside the sweep program.  ``beta_lik`` /
    ``beta_prior`` may be scalars or per-chain vectors (MC3 heats the whole
    posterior, stepping-stone only the likelihood); the target includes the
    root-branch Jacobian, untempered (HTarget, Hamiltonian.hs:85-92).
    """
    coords = FlatCoords(model, model.calibrations_available)
    topo = model.topo

    def move(batch, key, eps, inv_mass, beta_lik=1.0, beta_prior=1.0):
        C = batch.heights.shape[0]
        dtype = batch.heights.dtype
        keys = jax.random.split(key, C)
        bl = jnp.broadcast_to(jnp.asarray(beta_lik, dtype), (C,))
        bp = jnp.broadcast_to(jnp.asarray(beta_prior, dtype), (C,))

        def one(s, k, bl1, bp1):
            def logp(v):
                st = coords.from_vector(s, v)
                lp = bp1 * model.log_prior(st) + bl1 * model.log_likelihood(st)
                lp = lp + log_jacobian_root_branch(st, topo)
                return jnp.where(jnp.isnan(lp), -jnp.inf, lp)

            kern = nuts_kernel(logp, max_depth)
            q = coords.to_vector(s)
            q2, astat, _ = kern(k, q, eps, inv_mass)
            return coords.from_vector(s, q2), astat

        return jax.vmap(one)(batch, keys, bl, bp)

    return move, coords


# ---------------------------------------------------------------------------
# Adaptation
# ---------------------------------------------------------------------------


@dataclass
class DualAveraging:
    """Nesterov dual averaging of log step size (Hoffman & Gelman 2014)."""

    mu: float
    log_eps_bar: float = 0.0
    h_bar: float = 0.0
    count: int = 0
    gamma: float = 0.05
    t0: float = 10.0
    kappa: float = 0.75

    @staticmethod
    def init(eps0: float) -> "DualAveraging":
        return DualAveraging(mu=float(np.log(10.0 * eps0)))

    def update(self, accept_stat: float) -> Tuple[float, "DualAveraging"]:
        c = self.count + 1
        eta = 1.0 / (c + self.t0)
        h_bar = (1 - eta) * self.h_bar + eta * (TARGET_ACCEPT - accept_stat)
        log_eps = self.mu - np.sqrt(c) / self.gamma * h_bar
        w = c ** (-self.kappa)
        log_eps_bar = w * log_eps + (1 - w) * self.log_eps_bar
        new = DualAveraging(self.mu, log_eps_bar, h_bar, c,
                            self.gamma, self.t0, self.kappa)
        return float(np.exp(log_eps)), new

    @property
    def final_eps(self) -> float:
        return float(np.exp(self.log_eps_bar))


class NutsInCycle:
    """Host-side adaptation wrapper around :func:`make_in_cycle_move`.

    The move itself runs inside the jitted sweep; ``eps`` and ``inv_mass``
    are passed as device arrays so adaptation never recompiles.  Step size
    adapts by dual averaging toward 0.8 acceptance during burn-in windows;
    the diagonal mass matrix from cross-chain coordinate variances
    (HTuneLeapfrog + HTuneAllMasses, Hamiltonian.hs:62-63).
    """

    def __init__(self, model: DatingModel, dtype=jnp.float32):
        self.model = model
        self.move, self.coords = make_in_cycle_move(model)
        self.dtype = dtype
        self.eps = 0.01
        self.da = DualAveraging.init(self.eps)
        self.inv_mass = np.ones(self.coords.dim)

    def params(self):
        return (
            jnp.asarray(self.eps, self.dtype),
            jnp.asarray(self.inv_mass, self.dtype),
        )

    def adapt(self, accept_stat: float, warmup_vectors=None):
        self.eps, self.da = self.da.update(accept_stat)
        if warmup_vectors is not None and len(warmup_vectors) >= 4:
            var = np.var(np.asarray(warmup_vectors), axis=0) + 1e-6
            self.inv_mass = var

    def finalize_adaptation(self):
        self.eps = self.da.final_eps

    # -- checkpoint plumbing -------------------------------------------

    def state_arrays(self) -> dict:
        return {
            "nuts_eps": np.asarray(self.eps),
            "nuts_inv_mass": np.asarray(self.inv_mass),
        }

    def restore(self, arrays: dict):
        if "nuts_eps" in arrays:
            self.eps = float(arrays["nuts_eps"])
            self.da = DualAveraging.init(self.eps)
        if "nuts_inv_mass" in arrays:
            self.inv_mass = np.asarray(arrays["nuts_inv_mass"])


class NUTSProposal:
    """NUTS as an extra move in the sampling loop (weight 1 in the cycle,
    Definitions.hs:276-278)."""

    def __init__(self, model: DatingModel, settings, beta=1.0):
        self.model = model
        self.coords = FlatCoords(model, model.calibrations_available)
        self.beta = beta
        self.eps = 0.01
        self.da = DualAveraging.init(self.eps)
        self.inv_mass = None  # set lazily from dim
        self._step = None

    def build(self, template: State):
        dtype = template.heights.dtype
        logp = make_log_density(self.model, self.coords, template, self.beta)
        kernel = nuts_kernel(logp)
        if self.inv_mass is None:
            self.inv_mass = jnp.ones(self.coords.dim, dtype)

        def move(batch, key, eps, inv_mass):
            def one(s, k):
                q = self.coords.to_vector(s)
                q2, astat, nsteps = kernel(k, q, eps, inv_mass)
                return self.coords.from_vector(s, q2), astat

            C = batch.heights.shape[0]
            keys = jax.random.split(key, C)
            return jax.vmap(one)(batch, keys)

        self._step = jax.jit(move)
        return self

    def step(self, batch, key):
        new_batch, astat = self._step(
            batch, key, jnp.asarray(self.eps, batch.heights.dtype), self.inv_mass
        )
        return new_batch, float(jnp.mean(astat))

    def adapt(self, accept_stat: float, warmup_vectors=None):
        self.eps, self.da = self.da.update(accept_stat)
        if warmup_vectors is not None and len(warmup_vectors) >= 4:
            var = np.var(np.asarray(warmup_vectors), axis=0) + 1e-6
            self.inv_mass = jnp.asarray(var, self.inv_mass.dtype)

    def finalize_adaptation(self):
        self.eps = self.da.final_eps
