"""MC3 (Metropolis-coupled MCMC, parallel tempering).

Reference: ``mc3 (MC3Settings (NChains 4) (SwapPeriod 2) (NSwaps 3))``
(app/Main.hs:476-479).  TPU-native design: temperatures are one more vmapped
batch axis — the chain batch is ``[groups * n_temps]`` where each group is
an independent MC3 system of 4 chains at reciprocal temperatures
``beta_k = 1 / (1 + dt * k)``; swaps are on-device permutations of the
batch axis, so the whole run (sweeps + swaps) stays jitted.  Only the cold
chain of each group is monitored.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.dating import DatingModel
from ..models.state import State
from . import checkpoint as ckpt
from . import proposals as props
from .chains import ChainRunner, RunSettings
from .mh import tune_step
from .monitor import MonitorWriter

N_TEMPS = 4
SWAP_PERIOD = 2
N_SWAPS = 3
DELTA_T = 0.1  # beta_k = 1 / (1 + DELTA_T * k)


def temperature_ladder(n_temps: int = N_TEMPS, dt: float = DELTA_T) -> np.ndarray:
    return 1.0 / (1.0 + dt * np.arange(n_temps))


def make_swap_fn(model: DatingModel, n_groups: int, n_temps: int, dtype):
    """Jitted swap move: ``n_swaps`` random adjacent-pair exchanges per group.

    The batch is laid out ``[g * n_temps + k]``.  A swap between temperature
    slots i and j of a group exchanges the STATES, i.e. applies a
    permutation of the batch axis; acceptance is
    ``min(1, exp((beta_i - beta_j) (U_j - U_i)))`` with U the untempered log
    posterior.
    """
    betas = jnp.asarray(temperature_ladder(n_temps), dtype)

    def swap(batch, key):
        U = jax.vmap(lambda s: model.log_posterior(s))(batch)  # untempered
        U = U.reshape(n_groups, n_temps)
        perm = jnp.broadcast_to(
            jnp.arange(n_temps), (n_groups, n_temps)
        )

        def body(carry, key_s):
            perm, U = carry
            k_pair, k_acc = jax.random.split(key_s)
            # One random adjacent pair per group.
            p = jax.random.randint(k_pair, (n_groups,), 0, n_temps - 1)
            gi = jnp.arange(n_groups)
            Ui = U[gi, p]
            Uj = U[gi, p + 1]
            log_alpha = (betas[p] - betas[p + 1]) * (Uj - Ui)
            u = jax.random.uniform(k_acc, (n_groups,), dtype=dtype)
            accept = jnp.log(u) < log_alpha
            # Swap entries p and p+1 where accepted.
            pi = perm[gi, p]
            pj = perm[gi, p + 1]
            perm = perm.at[gi, p].set(jnp.where(accept, pj, pi))
            perm = perm.at[gi, p + 1].set(jnp.where(accept, pi, pj))
            U = U.at[gi, p].set(jnp.where(accept, Uj, Ui))
            U = U.at[gi, p + 1].set(jnp.where(accept, Ui, Uj))
            return (perm, U), accept

        (perm, U), accepts = jax.lax.scan(
            body, (perm, U), jax.random.split(key, N_SWAPS)
        )
        flat = (jnp.arange(n_groups)[:, None] * n_temps + perm).reshape(-1)
        batch = jax.tree.map(lambda x: x[flat], batch)
        return batch, jnp.mean(accepts.astype(dtype))

    return jax.jit(swap)


def run_mc3(
    model: DatingModel,
    init: State,
    settings: RunSettings,
    *,
    hamiltonian: bool = False,
    continue_from=None,
    log=print,
):
    """Full MC3 run: burn-in with tuning, then sampling with swaps.

    ``settings.n_chains`` is the number of independent MC3 GROUPS; the total
    vmapped batch is ``n_chains * 4``.  ``continue_from = (state, tuning,
    key, iteration)`` resumes a previous MC3 save (the reference's
    ``mc3Load`` path, app/Main.hs:505-509): burn-in is skipped and monitors
    append.
    """
    table = props.build_proposal_table(
        model.topo, model.braces, model.calibrations_available
    )
    n_groups = settings.n_chains
    total = n_groups * N_TEMPS
    inner = RunSettings(**{**settings.__dict__, "n_chains": total})
    runner = ChainRunner(model, table, inner, log=log)
    dtype = runner.dtype
    betas_flat = jnp.asarray(
        np.tile(temperature_ladder(), n_groups), dtype
    )
    runner.beta_lik = betas_flat
    runner.beta_prior = betas_flat

    if continue_from is not None:
        state0, tuning0, key0, start_it = continue_from
        batch = jax.tree.map(lambda x: jnp.asarray(x, dtype), state0)
        if batch.heights.shape[0] != total:
            raise SystemExit(
                f"MC3 continue: saved batch has {batch.heights.shape[0]} "
                f"chains, expected {total} ({n_groups} groups x {N_TEMPS})"
            )
        tuning = jnp.asarray(tuning0, dtype)
        key = jnp.asarray(key0)
    else:
        start_it = 0
        batch, tuning = runner.init_chains(init)
        key = jax.random.PRNGKey(
            settings.seed if settings.seed is not None else 42
        )
    batch, tuning = runner.maybe_shard(batch, tuning)
    swap_fn = make_swap_fn(model, n_groups, N_TEMPS, dtype)
    tune_max = jnp.asarray(table.tune_max(), dtype)

    kern = runner.kern
    nuts = None
    if hamiltonian:
        # NUTS rides in the cycle of every heated chain; the target of
        # chain k is beta_k * (prior + likelihood) + root Jacobian.
        from .hmc import NutsInCycle

        nuts = NutsInCycle(model, dtype=dtype)
        if continue_from is not None:
            nuts.restore(ckpt.load_arrays(
                settings.analysis_name, ("nuts_eps", "nuts_inv_mass"),
                in_dir=settings.out_dir,
            ))
        move = nuts.move
        chunk = jax.jit(
            lambda b, tu, k, eps, im: kern.sweeps(
                b, tu, k, SWAP_PERIOD, beta=betas_flat, beta_prior=betas_flat,
                collect=runner._collect,
                nuts_move=move, nuts_eps=eps, nuts_inv_mass=im,
            )
        )
    else:
        chunk = jax.jit(
            lambda b, tu, k: kern.sweeps(
                b, tu, k, SWAP_PERIOD, beta=betas_flat, beta_prior=betas_flat,
                collect=runner._collect,
            )
        )

    monitor = MonitorWriter(
        model, settings.analysis_name, settings.out_dir,
        period=settings.monitor_period, log=log,
    ).open(mode="a" if continue_from is not None else "w")

    mc3_meta = {"mc3": True, "n_groups": n_groups, "n_temps": N_TEMPS}
    if hamiltonian:
        mc3_meta["hamiltonian"] = True

    def do_checkpoint(it):
        ckpt.save(
            settings.analysis_name, batch, tuning, key, it,
            table.n_proposals, out_dir=settings.out_dir, extra=mc3_meta,
            extra_arrays=nuts.state_arrays() if nuts is not None else None,
        )

    def phase(n_iters, tune_every, collect_monitor, start_it):
        nonlocal batch, tuning, key
        it = start_it
        next_save = it + settings.save_period
        acc_sum = jnp.zeros((total, table.n_proposals), jnp.int32)
        tot_sum = jnp.zeros((total, table.n_proposals), jnp.int32)
        swap_rates = []
        astats = []
        while it < start_it + n_iters:
            key, k1, k2 = jax.random.split(key, 3)
            if nuts is not None:
                eps, im = nuts.params()
                batch, lp_pr, lp_lik, acc, tot, outs, ast = chunk(
                    batch, tuning, k1, eps, im
                )
                astats.append(float(jnp.mean(ast)))
            else:
                batch, lp_pr, lp_lik, acc, tot, outs = chunk(batch, tuning, k1)
            batch, srate = swap_fn(batch, k2)
            swap_rates.append(float(srate))
            acc_sum += acc
            tot_sum += tot
            if collect_monitor:
                rows = jax.tree.map(lambda x: np.asarray(x[:, 0]), outs)
                monitor.write_rows(it, rows)
            it += SWAP_PERIOD
            if tune_every and (it - start_it) % tune_every == 0:
                tuning = tune_step(
                    tuning,
                    acc_sum.astype(dtype),
                    tot_sum.astype(dtype),
                    jnp.asarray(table.target_rates(), dtype),
                    tune_max=tune_max,
                )
                acc_sum = jnp.zeros_like(acc_sum)
                tot_sum = jnp.zeros_like(tot_sum)
                if nuts is not None and astats:
                    nuts.adapt(float(np.mean(astats)))
                    astats = []
            if collect_monitor and it >= next_save:
                do_checkpoint(it)
                next_save = it + settings.save_period
        return float(np.mean(swap_rates)) if swap_rates else 0.0

    log(f"MC3: {n_groups} groups x {N_TEMPS} temperatures "
        f"(betas {temperature_ladder().round(3).tolist()})")
    if continue_from is None:
        log(f"burn-in: {settings.burn_in.total} iterations")
        done = 0
        for w in settings.burn_in.fast + settings.burn_in.slow:
            sr = phase(w, tune_every=w, collect_monitor=False, start_it=done)
            done += w
            log(f"burn-in window {w}: {done}/{settings.burn_in.total}, "
                f"swap rate {sr:.2f}")
        if nuts is not None:
            nuts.finalize_adaptation()
            log(f"NUTS adaptation: eps {nuts.eps:.5f}")
    else:
        log(f"Continuing MC3 from iteration {start_it}.")
    sr = phase(settings.iterations, tune_every=0, collect_monitor=True,
               start_it=start_it)
    log(f"sampling done; swap acceptance rate {sr:.2f}")
    do_checkpoint(start_it + settings.iterations)
    monitor.close()
