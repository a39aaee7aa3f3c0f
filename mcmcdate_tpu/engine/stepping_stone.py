"""Marginal likelihood by stepping-stone sampling.

Reference: ``marginalLikelihood`` with ``SteppingStoneSampling``, 128 points,
4000 iterations per point, repetitive burn-in (app/Main.hs:511-543,
app/Definitions.hs:447-472) — run SEQUENTIALLY there (≈4 days for the
tutorial dataset).

TPU-native design: the beta ladder is one more vmapped batch axis — all
K points run SIMULTANEOUSLY as a chain batch with per-chain likelihood
tempering.  The wall-clock is that of a single chain.  The ladder follows
Xie et al. (2011): ``beta_k = (k / (K-1))^(1/alpha)`` with ``alpha = 0.3``,
so points concentrate near the prior.  The estimator telescopes

    log Z = sum_k log (1/n) sum_iters exp((beta_{k+1} - beta_k) * loglik_k)

computed stably with log-sum-exp per point.

The reference additionally ANNEALS along the path — each stone starts from
the previous stone's state (app/Main.hs:525-543, Definitions.hs:447-472).
With all stones in flight that sequential dependency is reproduced by a
short cascade before the parallel burn-in: stone k+1's chain is re-seeded
from stone k's state after a few sweeps at each rung (``annealed_init``,
default on).  On a posterior whose beta~1 basin is only reachable by
annealing, naive parallel burn-in converges to the wrong stone
distributions with no warning; the cascade restores the reference's
initialization semantics at ~(K-1) * ``CASCADE_SWEEPS`` extra sweeps
(seconds at the tutorial scale — wall-clock is effectively unchanged).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.dating import DatingModel
from ..models.state import State
from . import proposals as props
from .chains import CHUNK, ChainRunner, RunSettings
from .mh import BurnInSettings, tune_step

N_POINTS = 128
N_POINTS_PROF = 12
ITERATIONS_ML = 4000
ALPHA = 0.3
CASCADE_SWEEPS = 3  # sweeps per rung in the annealed-init cascade

REPETITIVE_BURN_IN = BurnInSettings([20, 40, 60, 80], [100] * 6)
REPETITIVE_BURN_IN_PROF = BurnInSettings([10, 20], [30, 40])


def beta_ladder(k: int = N_POINTS, alpha: float = ALPHA) -> np.ndarray:
    return (np.arange(k) / (k - 1)) ** (1.0 / alpha)


@dataclass
class MarginalLikelihoodResult:
    log_marginal_likelihood: float
    betas: np.ndarray
    mean_log_lik_per_point: np.ndarray


def annealed_cascade(sweeps_fn, batch, tuning, key, betas, n_points,
                     cascade_sweeps: int = CASCADE_SWEEPS):
    """Annealed-init cascade (Main.hs:525-543 semantics): after a few
    sweeps, stone k+1's chain is re-seeded from stone k's state, so every
    stone starts from a state reached by annealing up the beta path rather
    than from the naive init.  All stones keep sweeping at their own beta
    throughout (the extra sweeps on already-seeded stones are free
    burn-in).  The K-1 sequential rungs run as ONE ``lax.scan`` — a single
    jitted dispatch instead of K-1 host round-trips, each of which would
    pay the per-dispatch tunnel overhead the fast sweep exists to avoid.

    ``sweeps_fn(batch, tuning, key, n_sweeps, beta=betas)`` must return a
    tuple whose first element is the swept batch (the ``FastSweeps.sweeps``
    contract); factored out of :func:`run_marginal_likelihood` so the
    seeding order is unit-testable (test_engine.py).
    """
    def _rung(b, xs):
        j, k = xs
        nb = sweeps_fn(b, tuning, k, cascade_sweeps, beta=betas)[0]
        nb = jax.tree.map(lambda x: x.at[j + 1].set(x[j]), nb)
        return nb, None

    rung_keys = jax.random.split(key, n_points - 1)
    out, _ = jax.jit(
        lambda b: jax.lax.scan(
            _rung, b, (jnp.arange(n_points - 1), rung_keys)
        )
    )(batch)
    return out


def run_marginal_likelihood(
    model: DatingModel,
    init: State,
    settings: RunSettings,
    *,
    profile: bool = False,
    hamiltonian: bool = False,
    annealed_init: bool = True,
    log=print,
) -> MarginalLikelihoodResult:
    table = props.build_proposal_table(
        model.topo, model.braces, model.calibrations_available
    )
    n_points = N_POINTS_PROF if profile else N_POINTS
    iters = settings.iterations if settings.iterations else ITERATIONS_ML
    inner = RunSettings(**{**settings.__dict__, "n_chains": n_points})
    runner = ChainRunner(model, table, inner, log=log)
    dtype = runner.dtype
    betas = jnp.asarray(beta_ladder(n_points), dtype)

    batch, tuning = runner.init_chains(init)
    batch, tuning = runner.maybe_shard(batch, tuning)
    key = jax.random.PRNGKey(settings.seed if settings.seed is not None else 42)
    kern = runner.kern

    nuts = None
    chunk_nuts = None
    if hamiltonian:
        # NUTS per stone: target = prior + beta_k * likelihood.
        from .hmc import NutsInCycle

        nuts = NutsInCycle(model, dtype=dtype)
        move = nuts.move
        chunk_nuts = jax.jit(
            lambda b, tu, k, eps, im: kern.sweeps(
                b, tu, k, CHUNK, beta=betas,
                nuts_move=move, nuts_eps=eps, nuts_inv_mass=im,
            )
        )
        chunk_ll = jax.jit(
            lambda b, tu, k, eps, im: kern.sweeps(
                b, tu, k, CHUNK, beta=betas,
                collect=lambda s, lp_pr, lp_lik: lp_lik,
                nuts_move=move, nuts_eps=eps, nuts_inv_mass=im,
            )
        )
    else:
        chunk_ll = jax.jit(
            lambda b, tu, k: kern.sweeps(
                b, tu, k, CHUNK, beta=betas,
                collect=lambda s, lp_pr, lp_lik: lp_lik,
            )
        )
    # The plain (no-NUTS) chunk always exists: fast burn-in windows
    # exclude the NUTS move, matching the MHG policy (chains.py burn_in).
    chunk_plain = jax.jit(
        lambda b, tu, k: kern.sweeps(b, tu, k, CHUNK, beta=betas)
    )

    if annealed_init and n_points > 1:
        import time as _time

        t0 = _time.time()
        key, k_casc = jax.random.split(key)
        batch = annealed_cascade(
            kern.sweeps, batch, tuning, k_casc, betas, n_points
        )
        jax.block_until_ready(batch.heights)
        log(f"annealed-init cascade: {n_points - 1} rungs x "
            f"{CASCADE_SWEEPS} sweeps in {_time.time() - t0:.1f}s "
            f"(one scanned dispatch)")

    targets = jnp.asarray(table.target_rates(), dtype)
    burn = (REPETITIVE_BURN_IN_PROF if profile else REPETITIVE_BURN_IN)
    # Initial burn-in (the reference anneals along the path with repetitive
    # burn-in per point; with all points in flight we burn in each point's
    # chain at its own beta, same windows).
    bi = BurnInSettings.profiling() if profile else settings.burn_in
    log(f"stepping stones: {n_points} points x {iters} iterations, "
        f"burn-in {bi.total} + repetitive {burn.total}")
    done = 0
    tmax = jnp.asarray(table.tune_max(), dtype)
    schedule = ([("fast", w) for w in bi.fast] + [("slow", w) for w in bi.slow]
                + [("fast", w) for w in burn.fast]
                + [("slow", w) for w in burn.slow])
    for kind, w in schedule:
        n_chunks = max(1, w // CHUNK)
        acc_s = tot_s = 0
        astats = []
        with_nuts = nuts is not None and kind == "slow"
        for _ in range(n_chunks):
            key, k = jax.random.split(key)
            if with_nuts:
                out = chunk_nuts(batch, tuning, k, *nuts.params())
                batch, lp_pr, lp_lik, acc, tot = out[:5]
                astats.append(float(jnp.mean(out[6])))
            else:
                # Slice (not unpack): sweeps appends trailing stat arrays
                # when optional phases (NUTS, fiber slide) are on.
                out = chunk_plain(batch, tuning, k)
                batch, lp_pr, lp_lik, acc, tot = out[:5]
            acc_s = acc_s + acc
            tot_s = tot_s + tot
        tuning = tune_step(
            tuning, acc_s.astype(dtype), tot_s.astype(dtype), targets,
            tune_max=tmax,
        )
        if with_nuts and astats:
            vecs = np.asarray(jax.vmap(nuts.coords.to_vector)(batch))
            nuts.adapt(float(np.mean(astats)), vecs)
        done += w
    if nuts is not None:
        nuts.finalize_adaptation()
        im = np.asarray(nuts.inv_mass)
        log(f"NUTS adaptation: eps {nuts.eps:.5f}, "
            f"inv_mass [{im.min():.3g}, {im.max():.3g}]")

    # Sampling: collect per-point log likelihoods.
    lls = []
    it = 0
    while it < iters:
        key, k = jax.random.split(key)
        if nuts is not None:
            ret = chunk_ll(batch, tuning, k, *nuts.params())
        else:
            ret = chunk_ll(batch, tuning, k)
        batch, out = ret[0], ret[5]
        lls.append(np.asarray(out))  # [CHUNK, n_points]
        it += CHUNK
    ll = np.concatenate(lls, axis=0)  # [iters, n_points]

    b = np.asarray(betas)
    dbeta = b[1:] - b[:-1]  # K-1 increments
    # Stepping stone: point k uses samples at beta_k to bridge to beta_{k+1}.
    x = ll[:, :-1] * dbeta[None, :]
    m = x.max(axis=0)
    log_ratios = m + np.log(np.mean(np.exp(x - m), axis=0))
    log_z = float(log_ratios.sum())
    log(f"log marginal likelihood (stepping stone): {log_z:.4f}")
    return MarginalLikelihoodResult(
        log_marginal_likelihood=log_z,
        betas=b,
        mean_log_lik_per_point=ll.mean(axis=0),
    )
