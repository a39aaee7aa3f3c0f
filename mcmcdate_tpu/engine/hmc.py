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

    Iterative multinomial NUTS (Hoffman & Gelman 2014; progressive biased
    sampling per Betancourt 2017), with the full binary-tree stopping rule:

    - Each doubling builds a new subtree of ``2^depth`` leapfrog steps in a
      random direction.  Within the subtree, positions/momenta of even
      leaves are stored at power-of-two checkpoint slots (slot =
      popcount(leaf)); when leaf ``i`` completes a sub-subtree of size
      ``2^j`` (its ``j`` low bits are ones), the generalized U-turn
      criterion is checked between leaf ``i`` and the stored leaf
      ``i+1-2^j`` — every internal node of the new subtree is checked,
      exactly as in the recursive formulation.
    - A subtree containing a U-turn or divergence is discarded WHOLE: no
      state from it is selectable, and the trajectory stops with the
      previous doubling's proposal (the recursive algorithm's rejection of
      an invalid subtree).
    - Otherwise the subtree's multinomial candidate replaces the running
      proposal with probability ``min(1, w_subtree / w_before)`` (biased
      progressive sampling), the weights merge, and the full-span U-turn
      check decides whether to extend further.
    """
    grad_fn = jax.grad(logp_fn)

    def step(key, q0, eps, inv_mass):
        dtype = q0.dtype
        dim = q0.shape[0]
        k_mom, k_loop = jax.random.split(key)
        p0 = jax.random.normal(k_mom, (dim,), dtype) / jnp.sqrt(inv_mass)
        logp0 = logp_fn(q0)
        g0 = grad_fn(q0)
        h0 = logp0 - 0.5 * jnp.sum(p0 * p0 * inv_mass)

        def uturn(dq, p_a, p_b):
            return (jnp.dot(dq, p_a * inv_mass) < 0) | (
                jnp.dot(dq, p_b * inv_mass) < 0
            )

        # Power-of-two checkpoint buffers for the in-subtree U-turn checks.
        q_ck0 = jnp.zeros((max_depth, dim), dtype)
        p_ck0 = jnp.zeros((max_depth, dim), dtype)

        def cond(carry):
            return (carry["depth"] < max_depth) & ~carry["stop"]

        def body(carry):
            key, k_dir = jax.random.split(carry["key"])
            go_right = jax.random.bernoulli(k_dir)
            sgn = jnp.where(go_right, 1.0, -1.0).astype(dtype)
            n_sub = 2 ** carry["depth"]

            # The moving end of the trajectory: the subtree grows from it.
            q_e = jnp.where(go_right, carry["q_plus"], carry["q_minus"])
            p_e = jnp.where(go_right, carry["p_plus"], carry["p_minus"])
            g_e = jnp.where(go_right, carry["g_plus"], carry["g_minus"])

            def sub_body(i, sub):
                (q_e, p_e, g_e, q_ck, p_ck, q_sub, lw_sub, s_acc, n_steps,
                 trn, div, key_s) = sub
                done = trn | div
                key_s, k_g = jax.random.split(key_s)
                q, p, g = _leapfrog(grad_fn, inv_mass, sgn * eps, q_e, p_e, g_e)
                logp = logp_fn(q)
                h = logp - 0.5 * jnp.sum(p * p * inv_mass)
                dh = h - h0
                div_new = ~done & ((dh < -1000.0) | jnp.isnan(dh))
                dh_s = jnp.where(jnp.isnan(dh), -jnp.inf, dh)
                # Progressive multinomial sampling within the subtree.
                lw_new = jnp.where(done | div_new, lw_sub,
                                   jnp.logaddexp(lw_sub, dh_s))
                take = (~done & ~div_new
                        & (jnp.log(jax.random.uniform(k_g, dtype=dtype))
                           < dh_s - lw_new))
                q_sub = jnp.where(take, q, q_sub)
                s_acc = s_acc + jnp.where(
                    done, 0.0, jnp.minimum(1.0, jnp.exp(dh_s)))
                n_steps = n_steps + jnp.where(done, 0, 1)
                # Checkpoint stores: even leaves at slot popcount(i).
                slot = jax.lax.population_count(i)
                store = (i % 2 == 0) & ~done
                q_ck = jnp.where(
                    store,
                    jax.lax.dynamic_update_index_in_dim(q_ck, q, slot, 0),
                    q_ck,
                )
                p_ck = jnp.where(
                    store,
                    jax.lax.dynamic_update_index_in_dim(p_ck, p, slot, 0),
                    p_ck,
                )
                # Sub-subtree U-turn checks: leaf i completes a subtree of
                # size 2^j iff its j low bits are all ones
                # (t = popcount(i ^ (i+1)) - 1 trailing ones).
                t = jax.lax.population_count(i ^ (i + 1)) - 1
                trn_sub = jnp.asarray(False)
                for j in range(1, max_depth + 1):
                    live = (j <= t) & ~done & ~div_new
                    a = i + 1 - 2 ** j
                    slot_a = jax.lax.population_count(jnp.maximum(a, 0))
                    q_a = jax.lax.dynamic_index_in_dim(
                        q_ck, slot_a, 0, keepdims=False)
                    p_a = jax.lax.dynamic_index_in_dim(
                        p_ck, slot_a, 0, keepdims=False)
                    trn_sub = trn_sub | (live & uturn(sgn * (q - q_a), p_a, p))
                trn = trn | trn_sub
                div = div | div_new
                frz = done | div_new
                q_e = jnp.where(frz, q_e, q)
                p_e = jnp.where(frz, p_e, p)
                g_e = jnp.where(frz, g_e, g)
                return (q_e, p_e, g_e, q_ck, p_ck, q_sub, lw_new,
                        s_acc, n_steps, trn, div, key_s)

            sub0 = (q_e, p_e, g_e, q_ck0, p_ck0, q_e,
                    jnp.asarray(-jnp.inf, dtype), carry["sum_acc"],
                    carry["n_steps"], False, False, key)
            (q_e, p_e, g_e, _, _, q_sub, lw_sub, sum_acc, n_steps,
             trn_sub, div_sub, key) = jax.lax.fori_loop(0, n_sub, sub_body, sub0)

            bad = trn_sub | div_sub
            # Biased progressive merge: the subtree candidate replaces the
            # running proposal with probability min(1, w_sub / w_old);
            # a bad subtree is discarded whole.
            key, k_m = jax.random.split(key)
            replace = (~bad
                       & (jnp.log(jax.random.uniform(k_m, dtype=dtype))
                          < lw_sub - carry["log_w"]))
            q_prop = jnp.where(replace, q_sub, carry["q_prop"])
            log_w = jnp.where(bad, carry["log_w"],
                              jnp.logaddexp(carry["log_w"], lw_sub))
            # Merge endpoints (only meaningful when the subtree is kept).
            q_plus = jnp.where(go_right & ~bad, q_e, carry["q_plus"])
            p_plus = jnp.where(go_right & ~bad, p_e, carry["p_plus"])
            g_plus = jnp.where(go_right & ~bad, g_e, carry["g_plus"])
            q_minus = jnp.where(~go_right & ~bad, q_e, carry["q_minus"])
            p_minus = jnp.where(~go_right & ~bad, p_e, carry["p_minus"])
            g_minus = jnp.where(~go_right & ~bad, g_e, carry["g_minus"])
            # Full-span U-turn decides whether to extend further (the
            # merged proposal is kept either way).
            turning = uturn(q_plus - q_minus, p_minus, p_plus)
            return dict(
                q_minus=q_minus, p_minus=p_minus, g_minus=g_minus,
                q_plus=q_plus, p_plus=p_plus, g_plus=g_plus,
                q_prop=q_prop, log_w=log_w, sum_acc=sum_acc,
                n_steps=n_steps, depth=carry["depth"] + 1,
                stop=bad | turning, key=key,
            )

        init = dict(
            q_minus=q0, p_minus=p0, g_minus=g0,
            q_plus=q0, p_plus=p0, g_plus=g0,
            q_prop=q0, log_w=jnp.asarray(0.0, dtype),
            sum_acc=jnp.asarray(0.0, dtype),
            n_steps=jnp.asarray(0, jnp.int32),
            depth=jnp.asarray(0, jnp.int32),
            stop=jnp.asarray(False), key=k_loop,
        )
        out = jax.lax.while_loop(cond, body, init)
        accept_stat = out["sum_acc"] / jnp.maximum(out["n_steps"], 1)
        return out["q_prop"], accept_stat, out["n_steps"]

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
