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
from .chains import ChainRunner, RunSettings, _slim_outs
from .mh import tune_step
from .monitor import MonitorWriter

N_TEMPS = 4
SWAP_PERIOD = 2
N_SWAPS = 3
DELTA_T = 0.1  # beta_k = 1 / (1 + DELTA_T * k); auto-tuned during burn-in
SWAP_TARGET = 0.3  # target per-attempt swap acceptance for dt tuning


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
    def swap(batch, key, betas):
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
            # Per-temperature-pair bookkeeping (which adjacent pair was
            # proposed, whether it swapped) for the swap-acceptance log.
            oh = (p[:, None] == jnp.arange(n_temps - 1)[None, :])
            acc_pair = (oh & accept[:, None]).astype(dtype).sum(axis=0)
            tot_pair = oh.astype(dtype).sum(axis=0)
            return (perm, U), (accept, acc_pair, tot_pair)

        (perm, U), (accepts, acc_pairs, tot_pairs) = jax.lax.scan(
            body, (perm, U), jax.random.split(key, N_SWAPS)
        )
        flat = (jnp.arange(n_groups)[:, None] * n_temps + perm).reshape(-1)
        batch = jax.tree.map(lambda x: x[flat], batch)
        return (batch, jnp.mean(accepts.astype(dtype)),
                acc_pairs.sum(axis=0), tot_pairs.sum(axis=0))

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
    # Per-rung ladder spacing: beta_0 = 1, beta_{k+1} = beta_k / (1 + dt_k),
    # with each gap dt_k tuned from ITS OWN pair's swap acceptance during
    # burn-in (the reference's ladder is static, app/Main.hs:476-479).
    dt_ladder = np.full(N_TEMPS - 1, DELTA_T)
    if continue_from is not None:
        saved = ckpt.load_arrays(settings.analysis_name, ("mc3_dt",),
                                 in_dir=settings.out_dir)
        if "mc3_dt" in saved:
            dt_saved = np.asarray(saved["mc3_dt"])
            dt_ladder = (np.full(N_TEMPS - 1, float(dt_saved))
                         if dt_saved.ndim == 0 else dt_saved)

    def betas_of(dts):
        ladder = np.concatenate([[1.0], 1.0 / np.cumprod(1.0 + dts)])
        return jnp.asarray(np.tile(ladder, n_groups), dtype)

    betas_flat = betas_of(dt_ladder)

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
    chunk_nuts = None
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

        def _chunk_nuts(b, tu, k, bf, eps, im):
            out = kern.sweeps(
                b, tu, k, SWAP_PERIOD, beta=bf, beta_prior=bf,
                collect=runner._collect,
                nuts_move=move, nuts_eps=eps, nuts_inv_mass=im,
            )
            # Fixed 7-tuple: any trailing stat past the NUTS acceptance
            # (e.g. the fiber-slide acceptance) is dropped here.
            return out[:5] + (_slim_outs(out[5]), out[6])

        chunk_nuts = jax.jit(_chunk_nuts)
    # Plain chunk is always built: fast burn-in windows exclude the (slow)
    # NUTS move, matching the MHG policy (chains.py burn_in).

    def _chunk(b, tu, k, bf):
        out = kern.sweeps(
            b, tu, k, SWAP_PERIOD, beta=bf, beta_prior=bf,
            collect=runner._collect,
        )
        return out[:5] + (_slim_outs(out[5]),)

    chunk = jax.jit(_chunk)

    monitor = MonitorWriter(
        model, settings.analysis_name, settings.out_dir,
        period=settings.monitor_period, log=log,
    ).open(mode="a" if continue_from is not None else "w")

    mc3_meta = {"mc3": True, "n_groups": n_groups, "n_temps": N_TEMPS}
    if hamiltonian:
        mc3_meta["hamiltonian"] = True

    def do_checkpoint(it):
        arrays = dict(nuts.state_arrays()) if nuts is not None else {}
        arrays["mc3_dt"] = np.asarray(dt_ladder)
        ckpt.save(
            settings.analysis_name, batch, tuning, key, it,
            table.n_proposals, out_dir=settings.out_dir, extra=mc3_meta,
            extra_arrays=arrays,
        )
        trace = {k2: np.concatenate(v, axis=0)
                 for k2, v in cold_draws.items() if v}
        if trace:
            ckpt.save_trace(settings.analysis_name, trace,
                            out_dir=settings.out_dir)

    cold_idx = np.arange(n_groups) * N_TEMPS
    scalar_names = ("birth", "death", "height", "rate_mean", "rate_var",
                    "lp_post")
    cold_draws = {k: [] for k in scalar_names}
    if continue_from is not None:
        # Preload the saved cold-chain trace so the final diagnostics cover
        # the whole run (the reference's Save serializes the trace with the
        # chain, app/Main.hs:453).
        saved_trace = ckpt.load_trace(settings.analysis_name,
                                      in_dir=settings.out_dir)
        for k2, arr in (saved_trace or {}).items():
            arr = np.asarray(arr)
            if arr.ndim == 2 and arr.shape[1] == n_groups:
                cold_draws.setdefault(k2, []).append(arr)
    pair_acc = np.zeros(N_TEMPS - 1)
    pair_tot = np.zeros(N_TEMPS - 1)

    def phase(n_iters, tune_every, collect_monitor, start_it, use_nuts=True):
        nonlocal batch, tuning, key, betas_flat
        it = start_it
        next_save = it + settings.save_period
        acc_sum = jnp.zeros((total, table.n_proposals), jnp.int32)
        tot_sum = jnp.zeros((total, table.n_proposals), jnp.int32)
        pair_acc0, pair_tot0 = pair_acc.copy(), pair_tot.copy()
        swap_rates = []
        astats = []
        with_nuts = nuts is not None and use_nuts
        while it < start_it + n_iters:
            key, k1, k2 = jax.random.split(key, 3)
            if with_nuts:
                eps, im = nuts.params()
                batch, lp_pr, lp_lik, acc, tot, outs, ast = chunk_nuts(
                    batch, tuning, k1, betas_flat, eps, im
                )
                astats.append(float(jnp.mean(ast)))
            else:
                batch, lp_pr, lp_lik, acc, tot, outs = chunk(
                    batch, tuning, k1, betas_flat
                )
            batch, srate, ap, tp = swap_fn(batch, k2, betas_flat[:N_TEMPS])
            swap_rates.append(float(srate))
            pair_acc[:] += np.asarray(ap)
            pair_tot[:] += np.asarray(tp)
            acc_sum += acc
            tot_sum += tot
            if collect_monitor:
                rows = jax.tree.map(lambda x: np.asarray(x[:, 0]), outs)
                monitor.write_rows(it, rows)
                # Pooled cold chains (slot 0 of every group) are a perfect
                # R-hat ensemble: collect their scalars for diagnostics.
                for nm in scalar_names:
                    cold_draws[nm].append(np.asarray(outs[nm])[:, cold_idx])
                ages = np.asarray(outs["ages_diag"])[:, cold_idx]
                for j, lbl in enumerate(runner.diag_labels):
                    cold_draws.setdefault(f"age[{lbl}]", []).append(
                        ages[:, :, j]
                    )
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
                if with_nuts and astats:
                    vecs = np.asarray(jax.vmap(nuts.coords.to_vector)(batch))
                    nuts.adapt(float(np.mean(astats)), vecs)
                    astats = []
            if collect_monitor and it >= next_save:
                do_checkpoint(it)
                next_save = it + settings.save_period
        with np.errstate(invalid="ignore", divide="ignore"):
            window_pair_rates = (pair_acc - pair_acc0) / np.maximum(
                pair_tot - pair_tot0, 1.0
            )
        return (float(np.mean(swap_rates)) if swap_rates else 0.0,
                window_pair_rates)

    ladder0 = np.asarray(betas_of(dt_ladder))[:N_TEMPS]
    log(f"MC3: {n_groups} groups x {N_TEMPS} temperatures "
        f"(betas {ladder0.round(3).tolist()})")
    if continue_from is None:
        log(f"burn-in: {settings.burn_in.total} iterations")
        done = 0
        # Fast windows exclude the NUTS move (MHG policy, chains.py:203-210).
        for kind, windows in (("fast", settings.burn_in.fast),
                              ("slow", settings.burn_in.slow)):
            for w in windows:
                sr, pr = phase(w, tune_every=w, collect_monitor=False,
                               start_it=done, use_nuts=(kind == "slow"))
                done += w
                # Temperature-ladder auto-tuning, PER RUNG: each gap dt_k
                # widens when its own pair swaps too easily and shrinks
                # when it stalls (target ~0.3; betas are traced arguments,
                # so retuning never recompiles).  The reference's ladder
                # is static (MC3Settings, app/Main.hs:476-479).
                dt_ladder = np.clip(
                    dt_ladder * np.exp(0.5 * (pr - SWAP_TARGET)),
                    0.01, 2.0,
                )
                betas_flat = betas_of(dt_ladder)
                log(f"burn-in [{kind}] window {w}: "
                    f"{done}/{settings.burn_in.total}, swap rate {sr:.2f}, "
                    f"dt {np.round(dt_ladder, 3).tolist()}")
        if nuts is not None:
            nuts.finalize_adaptation()
            im = np.asarray(nuts.inv_mass)
            log(f"NUTS adaptation: eps {nuts.eps:.5f}, "
                f"inv_mass [{im.min():.3g}, {im.max():.3g}]")
    else:
        log(f"Continuing MC3 from iteration {start_it}.")
    sr, _ = phase(settings.iterations, tune_every=0, collect_monitor=True,
                  start_it=start_it)
    with np.errstate(invalid="ignore", divide="ignore"):
        rates = pair_acc / np.maximum(pair_tot, 1.0)
    pairs = " ".join(
        f"{i}<->{i + 1}: {rates[i]:.2f}" for i in range(N_TEMPS - 1)
    )
    log(f"sampling done; swap acceptance rate {sr:.2f} "
        f"(per temperature pair: {pairs})")
    do_checkpoint(start_it + settings.iterations)
    monitor.close()
    # Pooled cross-group cold-chain convergence diagnostics
    # (bench/comparison_with_mcmctree/README.md:265-269).
    if any(v for v in cold_draws.values()):
        runner._write_diagnostics(cold_draws)
