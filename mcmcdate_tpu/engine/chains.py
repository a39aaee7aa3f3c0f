"""High-level MCMC orchestration: burn-in, sampling, monitors, checkpoints.

The TPU-native equivalent of the reference engine's ``mcmc``/``mcmcContinue``
run loop (app/Main.hs:460-509): chains are a vmapped batch; sweeps run in
jitted chunks; the host streams monitor rows and periodically checkpoints.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.dating import DatingModel
from ..models.state import State
from ..ops import heights as H
from . import checkpoint as ckpt
from . import proposals as props
from .mh import BurnInSettings, MHKernel, tune_step
from .monitor import MonitorWriter

CHUNK = 10  # sweeps per jitted call; all reference schedules are multiples


@dataclass
class RunSettings:
    """Mirrors the reference ``Settings`` (app/Main.hs:444-456)."""

    analysis_name: str
    burn_in: BurnInSettings = field(default_factory=BurnInSettings.default)
    iterations: int = 8000
    n_chains: int = 4  # vmapped independent chains (reference runs 1)
    monitor_period: int = 2
    save_period: int = 1000  # checkpoint every this many iterations
    out_dir: str = "."
    seed: Optional[int] = None
    dtype: str = "float32"
    beta: float = 1.0  # likelihood tempering (stepping stone / MC3)


class ChainRunner:
    """Holds the compiled sweep programs for one model + proposal table."""

    def __init__(self, model: DatingModel, table: props.ProposalTable,
                 settings: RunSettings, log=print):
        self.model = model
        self.table = table
        self.s = settings
        self.log = log
        self.kern = MHKernel(model, table)
        self.dtype = jnp.float32 if settings.dtype == "float32" else jnp.float64
        self.targets = jnp.asarray(table.target_rates(), self.dtype)
        self.tune_max = jnp.asarray(table.tune_max(), self.dtype)
        self._chunk_fn = None
        self._chunk_collect_fn = None
        self.nuts = None  # set by run_analysis when --hamiltonian
        self._nuts_astats: list = []

    # -- device programs ----------------------------------------------

    def _collect(self, state, lp_pr, lp_lik):
        m = self.model
        tl = H.branch_lengths(state.heights, jnp.asarray(m.topo.parent))
        return dict(
            birth=state.birth,
            death=state.death,
            height=state.height,
            rate_mean=state.rate_mean,
            rate_var=state.rate_var,
            heights=state.heights,
            rates=state.rates,
            lp_post=lp_pr + self.s.beta * lp_lik,
            lp_prior=lp_pr,
            lp_lik=lp_lik,
            lp_cal=m.log_prior_cal_con_brace(state),
            lp_bd=m.log_prior_birth_death(state),
            lp_clock=m.log_prior_relaxed_clock(state),
        )

    def chunk_fn(self, collect: bool):
        """Jitted: run CHUNK sweeps for the whole chain batch."""
        coll = self._collect if collect else None

        def run(batch, tuning, key):
            return self.kern.sweeps(
                batch, tuning, key, CHUNK, beta=self.s.beta, collect=coll
            )

        return jax.jit(run)

    def _get_chunk(self, collect: bool):
        if collect:
            if self._chunk_collect_fn is None:
                self._chunk_collect_fn = self.chunk_fn(True)
            return self._chunk_collect_fn
        if self._chunk_fn is None:
            self._chunk_fn = self.chunk_fn(False)
        return self._chunk_fn

    # -- phases --------------------------------------------------------

    def init_chains(self, state: State, jitter_rates: bool = True):
        """Broadcast the initial state over chains.

        ``jitter_rates`` draws each chain's initial branch rates from the
        Gamma(mean 1, var 0.2) clock shape instead of the reference's exact
        1.0 (app/Definitions.hs:105): starting every rate on the clock
        prior's density ridge lets early tuning collapse the rate variance
        toward zero (an absorbing trap in finite precision).  Dispersed
        starts also give chains distinct origins for cross-chain R-hat.
        """
        C = self.s.n_chains
        batch = jax.tree.map(lambda x: jnp.broadcast_to(x, (C,) + x.shape), state)
        if jitter_rates:
            rng = np.random.default_rng(self.s.seed or 0)
            r = rng.gamma(5.0, 0.2, size=(C, self.model.topo.n))
            r[:, 0] = 1.0  # stem entry unused
            batch = batch.replace(rates=jnp.asarray(r, self.dtype))
        tuning = jnp.ones((C, self.table.n_proposals), self.dtype)
        return batch, tuning

    def _run_window(self, batch, tuning, key, n_sweeps, collect=False):
        """Run ``n_sweeps`` (multiple of CHUNK, padded up) sweeps; returns
        accumulated per-chain acceptance counts and optional collected rows."""
        C = self.s.n_chains
        fn = self._get_chunk(collect)
        n_chunks = max(1, (n_sweeps + CHUNK - 1) // CHUNK)
        acc_sum = jnp.zeros((C, self.table.n_proposals), jnp.int32)
        tot_sum = jnp.zeros((C, self.table.n_proposals), jnp.int32)
        outs_all = []
        for _ in range(n_chunks):
            key, k = jax.random.split(key)
            batch, lp_pr, lp_lik, acc, tot, outs = fn(batch, tuning, k)
            if self.nuts is not None:
                key, k2 = jax.random.split(key)
                batch, astat = self.nuts.step(batch, k2)
                self._nuts_astats.append(astat)
            acc_sum = acc_sum + acc
            tot_sum = tot_sum + tot
            if collect:
                outs_all.append(outs)
        return batch, key, acc_sum, tot_sum, outs_all

    def burn_in(self, batch, tuning, key):
        """Custom auto-tuning windows (BurnInWithCustomAutoTuning)."""
        bi = self.s.burn_in
        done = 0
        t0 = time.time()
        if self.nuts is not None:
            self.nuts.build(jax.tree.map(lambda x: x[0], batch))
        for kind, windows in (("fast", bi.fast), ("slow", bi.slow)):
            for w in windows:
                # Fast windows run without the (slow) NUTS move, like the
                # engine's fast-proposal-only windows.
                nuts, self.nuts = self.nuts, (self.nuts if kind == "slow" else None)
                batch, key, acc, tot, _ = self._run_window(batch, tuning, key, w)
                self.nuts = nuts
                tuning = jax.vmap(
                    lambda tu, a, to: tune_step(
                        tu, a.astype(self.dtype), to.astype(self.dtype),
                        self.targets, tune_max=self.tune_max,
                    )
                )(tuning, acc, tot)
                if self.nuts is not None and self._nuts_astats:
                    vecs = np.asarray(
                        jax.vmap(self.nuts.coords.to_vector)(batch)
                    )
                    self.nuts.adapt(float(np.mean(self._nuts_astats)), vecs)
                    self._nuts_astats = []
                done += w
                rate = float(acc.sum()) / max(float(tot.sum()), 1.0)
                self.log(
                    f"burn-in [{kind}] window {w}: {done}/{bi.total} iterations, "
                    f"acceptance {rate:.3f}, {time.time() - t0:.1f}s elapsed"
                )
        if self.nuts is not None:
            self.nuts.finalize_adaptation()
        return batch, tuning, key

    def sample(self, batch, tuning, key, iterations, monitor: Optional[MonitorWriter],
               start_iteration: int = 0, on_checkpoint: Optional[Callable] = None):
        """Sampling phase with monitors (chain 0), cross-chain scalar draws
        for convergence diagnostics, and periodic checkpoints."""
        if self.nuts is not None and self.nuts._step is None:
            self.nuts.build(jax.tree.map(lambda x: x[0], batch))
        it = start_iteration
        t0 = time.time()
        next_save = it + self.s.save_period
        scalar_names = ("birth", "death", "height", "rate_mean", "rate_var",
                        "lp_post")
        draws = {k: [] for k in scalar_names}
        while it < start_iteration + iterations:
            n = min(CHUNK, start_iteration + iterations - it)
            batch, key, acc, tot, outs_all = self._run_window(
                batch, tuning, key, n, collect=True
            )
            if monitor is not None:
                for outs in outs_all:
                    # outs leaves are [sweeps, chains, ...]; monitor chain 0.
                    rows = jax.tree.map(lambda x: np.asarray(x[:, 0]), outs)
                    monitor.write_rows(it, rows)
                    for k2 in scalar_names:
                        draws[k2].append(np.asarray(outs[k2]))
            it += n
            if on_checkpoint is not None and it >= next_save:
                on_checkpoint(batch, tuning, key, it)
                next_save = it + self.s.save_period
        if monitor is not None:
            monitor.flush()
        self.log(
            f"sampling: {iterations} iterations x {self.s.n_chains} chains in "
            f"{time.time() - t0:.1f}s"
        )
        self._write_diagnostics(draws)
        return batch, tuning, key

    def _write_diagnostics(self, draws):
        """Cross-chain R-hat / bulk ESS over the scalar parameters; the
        reference delegates this to external R scripts
        (bench/comparison_with_mcmctree/README.md:265-269)."""
        if not draws or not next(iter(draws.values())):
            return
        from .diagnostics import summarize

        samples = {
            k: np.concatenate(v, axis=0) for k, v in draws.items() if v
        }
        self.log("convergence diagnostics (all chains):")
        table = summarize(samples, log=self.log)
        path = f"{self.s.out_dir}/{self.s.analysis_name}.diagnostics.tsv"
        with open(path, "w") as fh:
            fh.write("Parameter\tMean\tSD\tESS\tRhat\n")
            for k, s in table.items():
                fh.write(
                    f"{k}\t{s['mean']:.6g}\t{s['sd']:.6g}\t{s['ess']:.1f}\t"
                    f"{s['rhat']:.4f}\n"
                )


def run_analysis(
    model: DatingModel,
    init: State,
    settings: RunSettings,
    *,
    init_from: Optional[tuple] = None,
    continue_from: Optional[tuple] = None,
    hamiltonian: bool = False,
    log=print,
) -> None:
    """Full ``run`` / ``continue`` entry point.

    ``init_from = (state, tuning, same_cycle)`` warm-starts from a previous
    save (app/Main.hs:420-440); ``continue_from = (state, tuning, key, it)``
    resumes monitors in append mode.
    """
    table = props.build_proposal_table(
        model.topo, model.braces, model.calibrations_available
    )
    runner = ChainRunner(model, table, settings, log=log)
    if hamiltonian:
        from .hmc import NUTSProposal

        runner.nuts = NUTSProposal(model, settings)
    key = jax.random.PRNGKey(settings.seed if settings.seed is not None else 42)

    def do_checkpoint(batch, tuning, k, it):
        ckpt.save(
            settings.analysis_name, batch, tuning, k, it, table.n_proposals,
            out_dir=settings.out_dir,
        )
        log(f"checkpoint at iteration {it}")

    if continue_from is not None:
        batch, tuning, key, start_it = continue_from
        monitor = MonitorWriter(
            model, settings.analysis_name, settings.out_dir,
            period=settings.monitor_period, log=log,
        ).open(mode="a")
        burn_needed = False
    else:
        start_it = 0
        if init_from is not None:
            # Warm start: reuse the saved state batch; reuse tuning and use a
            # reduced burn-in only when the cycle shape matches
            # (app/Main.hs:434-440).
            state0, tuning0, same_cycle = init_from
            _, tuning = runner.init_chains(init)
            batch = jax.tree.map(lambda x: jnp.asarray(x, runner.dtype), state0)
            if batch.heights.ndim == 1:  # single saved chain -> broadcast
                batch = jax.tree.map(
                    lambda x: jnp.broadcast_to(x, (settings.n_chains,) + x.shape),
                    batch,
                )
            if same_cycle and tuning0 is not None:
                tuning = jnp.asarray(tuning0, runner.dtype)
                if tuning.ndim == 1:
                    tuning = jnp.broadcast_to(
                        tuning, (settings.n_chains,) + tuning.shape
                    )
                settings.burn_in = BurnInSettings.informed()
        else:
            batch, tuning = runner.init_chains(init)
        monitor = MonitorWriter(
            model, settings.analysis_name, settings.out_dir,
            period=settings.monitor_period, log=log,
        ).open()
        log(f"burn-in: {settings.burn_in.total} iterations")
        batch, tuning, key = runner.burn_in(batch, tuning, key)
        do_checkpoint(batch, tuning, key, 0)

    batch, tuning, key = runner.sample(
        batch, tuning, key, settings.iterations, monitor,
        start_iteration=start_it, on_checkpoint=do_checkpoint,
    )
    do_checkpoint(batch, tuning, key, start_it + settings.iterations)
    monitor.close()
