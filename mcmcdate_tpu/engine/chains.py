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


def _slim_outs(outs):
    """Slice the per-node monitor leaves to chain 0 ON DEVICE before the
    host transfer: only chain 0's heights/rates are ever written to the
    tree monitors, but shipping the full [sweeps, chains, nodes] arrays
    through the device tunnel dominated monitor overhead (~0.4 s/sweep at
    1k taxa x 1024 chains).  Scalar leaves keep all chains (cross-chain
    diagnostics need them)."""
    if not isinstance(outs, dict):
        return outs
    slim = dict(outs)
    for k in ("heights", "rates"):
        if k in slim:
            slim[k] = slim[k][:, :1]
    return slim


def _diag_node_subset(model: DatingModel, max_nodes: int = 16):
    """Pick the node subset whose ages feed cross-chain diagnostics: the
    root, up to half the budget of evenly-sampled calibrated nodes (named
    by their calibration), and the largest inner subtrees (deep nodes mix
    slowest, so they bound convergence)."""
    topo = model.topo
    labels = {0: "root"}
    take = [0]
    cal = model.calibrations
    if cal.n:
        for i in np.linspace(0, cal.n - 1, min(cal.n, max_nodes // 2)).astype(int):
            nd = int(np.asarray(cal.node)[i])
            if nd not in labels:
                labels[nd] = (cal.names[i] if cal.names else f"node{nd}")
                take.append(nd)
    sizes = np.asarray(topo.n_nodes_subtree)
    inner = [int(i) for i in np.asarray(topo.inner_nodes) if i != 0]
    for i in sorted(inner, key=lambda j: -int(sizes[j])):
        if len(take) >= max_nodes:
            break
        if i not in labels:
            labels[i] = f"node{i}"
            take.append(i)
    return np.asarray(take, np.int32), [labels[i] for i in take]


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
    fast_sweep: bool = True  # ticket-batched sweep (engine/fast_sweep.py)
    # Occasional-bold contrary kernels (--bold-contra): with probability
    # bold_contra each distance-invariant contrary subtree-scale ticket uses
    # a bold_factor-times-wider kernel — the mixture that crosses the slow
    # deep-backbone valley at GOE scale (PERF.md).  None = the
    # MCMCDATE_BOLD_* env defaults (off).
    bold_contra: Optional[float] = None
    bold_factor: Optional[float] = None
    # Within-chain fiber node-slide (--fiber-slide): probability per sweep of
    # the likelihood-invariant per-node slide phase — each internal node's
    # height is redrawn uniformly over its valid interval with the three
    # touched branch rates rescaled to hold time*rate constant, so the
    # kernel walks ALONG the slow deep-backbone valley instead of across it
    # (fast_sweep.FastSweeps._fiber_slide_move).  None = MCMCDATE_FIBER_SLIDE
    # env default (off).
    fiber_slide: Optional[float] = None
    # Cross-chain fiber-DE rounds per sweep chunk (--fiber-de): each round
    # is a red-black differential-evolution move ALONG the likelihood fiber
    # (engine/ensemble.py) — the collective kernel that can transport a
    # chain across the deep-backbone mode gap in one step when its donor
    # pair straddles the modes.  Values >= 1 run round(N) rounds per chunk;
    # 0 < N < 1 runs one round with probability N.  None = the
    # MCMCDATE_FIBER_DE env default (off).
    fiber_de: Optional[float] = None


class ChainRunner:
    """Holds the compiled sweep programs for one model + proposal table."""

    def __init__(self, model: DatingModel, table: props.ProposalTable,
                 settings: RunSettings, log=print):
        self.model = model
        self.table = table
        self.s = settings
        self.log = log
        from ..ops import mvn as _mvn

        from .fast_sweep import UNIVARIATE_DENSE_MAX, FastSweeps

        univariate_too_big = (
            model.likelihood.kind == _mvn.UNIVARIATE
            and model.likelihood.dim > UNIVARIATE_DENSE_MAX
        )
        if settings.fast_sweep and not univariate_too_big:
            # Ticket-batched sweep (fast_sweep.py).  The univariate kind
            # rides it as a dense diagonal up to UNIVARIATE_DENSE_MAX dims
            # (sweep cost is per-HLO overhead, not arithmetic); beyond
            # that the O(N) sequential path avoids the O(N^2) diagonal.
            self.kern = FastSweeps(model, table,
                                   bold_p=settings.bold_contra,
                                   bold_factor=settings.bold_factor,
                                   fiber_slide=settings.fiber_slide)
            if self.kern.bold_p > 0:
                log(f"bold contrary kernels: p={self.kern.bold_p:g}, "
                    f"factor={self.kern.bold_factor:g}")
            if self.kern.fiber_slide_p > 0:
                log(f"fiber node-slide phase: p={self.kern.fiber_slide_p:g}")
        else:
            self.kern = MHKernel(model, table)
        # Optional trailing per-sweep stats of kern.sweeps, in its append
        # order (NaN entries = thinned sweeps).
        self._extra_names = []
        if getattr(self.kern, "fiber_slide_p", 0.0) > 0:
            self._extra_names.append("fiber node-slide")
        import os as _os

        fde = settings.fiber_de
        if fde is None:
            fde = float(_os.environ.get("MCMCDATE_FIBER_DE", "0"))
        self.fiber_de = float(fde)
        self._fiber_de_move = None
        if self.fiber_de > 0 and settings.n_chains >= 4:
            from .ensemble import make_fiber_de

            dt = jnp.float32 if settings.dtype == "float32" else jnp.float64
            self._fiber_de_move = make_fiber_de(model, dt)
            self._extra_names.append("fiber DE")
            log(f"fiber-DE ensemble phase: {self.fiber_de:g} "
                f"round(s)/chunk over {settings.n_chains} chains")
        self._extra_accs = {nm: [] for nm in self._extra_names}
        self.dtype = jnp.float32 if settings.dtype == "float32" else jnp.float64
        self.targets = jnp.asarray(table.target_rates(), self.dtype)
        self.tune_max = jnp.asarray(table.tune_max(), self.dtype)
        self._chunk_fn = None
        self._chunk_collect_fn = None
        self.nuts = None  # set by run_analysis when --hamiltonian
        self._nuts_astats: list = []
        # Chain-data-parallel mesh over all local devices (SURVEY.md §2.5):
        # the sweep program is pure data-parallel over chains, so sharding
        # the batch's leading axis partitions it with zero communication;
        # only MC3 swaps and pooled diagnostics cross shards.
        self.mesh = None
        n_dev = len(jax.devices())
        if n_dev > 1 and settings.n_chains % n_dev == 0:
            from ..parallel.mesh import chain_mesh

            self.mesh = chain_mesh(n_dev)
            log(f"sharding {settings.n_chains} chains over {n_dev} devices")
        # Cross-chain node-age diagnostics: a small static node subset whose
        # absolute ages are collected for ALL chains, so R-hat/ESS cover the
        # quantities users consume (node ages), not just the 6 scalars.
        self.diag_idx, self.diag_labels = _diag_node_subset(model)
        self._diag_idx_dev = jnp.asarray(self.diag_idx)
        # Full-history cross-chain draws ({name: [arrays of [T, chains]]}),
        # persisted as the trace sidecar at every checkpoint and preloaded on
        # ``continue`` (the reference's Save serializes the trace with the
        # chain, app/Main.hs:453).
        self._draws_hist: dict = {}

    def maybe_shard(self, batch, tuning):
        """Shard the chain batch + tuning over the local device mesh."""
        if self.mesh is None:
            return batch, tuning
        from ..parallel.mesh import shard_chains

        return shard_chains(batch, self.mesh), shard_chains(tuning, self.mesh)

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
            # Absolute ages of the diagnostic node subset, kept for ALL
            # chains (scalar-sized: K <= 16 entries per chain per sweep).
            ages_diag=state.heights[self._diag_idx_dev] * state.height,
        )

    def _fiber_de_phase(self, batch, key):
        """Apply the configured fiber-DE rounds after a sweep chunk; returns
        ``(batch, rates)`` with ``rates`` a [rounds] acceptance array (a NaN
        entry = the Bernoulli gate skipped this chunk)."""
        move = self._fiber_de_move
        p = self.fiber_de
        if p >= 1:
            rates = []
            for r in range(int(round(p))):
                batch, rate = move(batch, jax.random.fold_in(key, r))
                rates.append(rate)
            return batch, jnp.stack(rates)
        k_gate, k_mv = jax.random.split(key)

        def do(b):
            return move(b, k_mv)

        def skip(b):
            return b, jnp.asarray(jnp.nan, self.dtype)

        batch, rate = jax.lax.cond(
            jax.random.bernoulli(k_gate, p), do, skip, batch
        )
        return batch, rate[None]

    def chunk_fn(self, collect: bool, with_nuts: bool = False):
        """Jitted: run CHUNK sweeps for the whole chain batch.  With NUTS,
        ``eps`` / ``inv_mass`` are traced arguments so per-window adaptation
        never recompiles."""
        coll = self._collect if collect else None
        with_de = self._fiber_de_move is not None

        if with_nuts:
            move = self.nuts.move

            def run_nuts(batch, tuning, key, eps, inv_mass):
                if with_de:
                    key, k_de = jax.random.split(key)
                out = self.kern.sweeps(
                    batch, tuning, key, CHUNK, beta=self.s.beta, collect=coll,
                    nuts_move=move, nuts_eps=eps, nuts_inv_mass=inv_mass,
                )
                b, lp_pr, lp_lik, acc, tot, outs = out[:6]
                extras = out[6:]
                if with_de:
                    b, de = self._fiber_de_phase(b, k_de)
                    extras = extras + (de,)
                return (b, lp_pr, lp_lik, acc, tot,
                        _slim_outs(outs)) + extras

            return jax.jit(run_nuts)

        def run(batch, tuning, key):
            if with_de:
                key, k_de = jax.random.split(key)
            out = self.kern.sweeps(
                batch, tuning, key, CHUNK, beta=self.s.beta, collect=coll
            )
            b, lp_pr, lp_lik, acc, tot, outs = out[:6]
            extras = out[6:]
            if with_de:
                b, de = self._fiber_de_phase(b, k_de)
                extras = extras + (de,)
            return (b, lp_pr, lp_lik, acc, tot, _slim_outs(outs)) + extras

        return jax.jit(run)

    def _get_chunk(self, collect: bool, with_nuts: bool = False):
        key = (collect, with_nuts)
        if not hasattr(self, "_chunk_cache"):
            self._chunk_cache = {}
        if key not in self._chunk_cache:
            self._chunk_cache[key] = self.chunk_fn(collect, with_nuts)
        return self._chunk_cache[key]

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

    def _run_window(self, batch, tuning, key, n_sweeps, collect=False,
                    use_nuts=None):
        """Run ``n_sweeps`` (multiple of CHUNK, padded up) sweeps; returns
        accumulated per-chain acceptance counts and optional collected rows.

        ``use_nuts`` overrides whether the NUTS in-cycle move fires (fast
        burn-in windows exclude it, like the engine's fast-only windows)."""
        C = self.s.n_chains
        with_nuts = self.nuts is not None if use_nuts is None else use_nuts
        fn = self._get_chunk(collect, with_nuts)
        n_chunks = max(1, (n_sweeps + CHUNK - 1) // CHUNK)
        acc_sum = jnp.zeros((C, self.table.n_proposals), jnp.int32)
        tot_sum = jnp.zeros((C, self.table.n_proposals), jnp.int32)
        outs_all = []
        for _ in range(n_chunks):
            key, k = jax.random.split(key)
            if with_nuts:
                eps, im = self.nuts.params()
                out = fn(batch, tuning, k, eps, im)
                batch, lp_pr, lp_lik, acc, tot, outs = out[:6]
                self._nuts_astats.append(float(jnp.mean(out[6])))
                rest = out[7:]
            else:
                out = fn(batch, tuning, k)
                batch, lp_pr, lp_lik, acc, tot, outs = out[:6]
                rest = out[6:]
            for nm, arr in zip(self._extra_names, rest):
                # Per-sweep fiber-phase acceptances (NaN = thinned sweep).
                a = np.asarray(arr, np.float64)
                self._extra_accs[nm].extend(a[~np.isnan(a)].tolist())
            acc_sum = acc_sum + acc
            tot_sum = tot_sum + tot
            if collect:
                outs_all.append(outs)
        return batch, key, acc_sum, tot_sum, outs_all

    def burn_in(self, batch, tuning, key):
        """Custom auto-tuning windows (BurnInWithCustomAutoTuning)."""
        batch, tuning = self.maybe_shard(batch, tuning)
        bi = self.s.burn_in
        done = 0
        t0 = time.time()
        for kind, windows in (("fast", bi.fast), ("slow", bi.slow)):
            for w in windows:
                # Fast windows run without the (slow) NUTS move, like the
                # engine's fast-proposal-only windows.
                batch, key, acc, tot, _ = self._run_window(
                    batch, tuning, key, w,
                    use_nuts=(self.nuts is not None and kind == "slow"),
                )
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
                # Sum in f32: int32 overflows past ~2e9 total tickets
                # (256 chains x 30k tickets x 300-iteration windows).
                rate = float(jnp.sum(acc.astype(self.dtype))) / max(
                    float(jnp.sum(tot.astype(self.dtype))), 1.0
                )
                self.log(
                    f"burn-in [{kind}] window {w}: {done}/{bi.total} iterations, "
                    f"acceptance {rate:.3f}, {time.time() - t0:.1f}s elapsed"
                )
        if self.nuts is not None:
            self.nuts.finalize_adaptation()
            im = np.asarray(self.nuts.inv_mass)
            self.log(
                f"NUTS adaptation: eps {self.nuts.eps:.5f}, "
                f"inv_mass [{im.min():.3g}, {im.max():.3g}]"
            )
        return batch, tuning, key

    def sample(self, batch, tuning, key, iterations, monitor: Optional[MonitorWriter],
               start_iteration: int = 0, on_checkpoint: Optional[Callable] = None):
        """Sampling phase with monitors (chain 0), cross-chain scalar draws
        for convergence diagnostics, and periodic checkpoints."""
        batch, tuning = self.maybe_shard(batch, tuning)
        it = start_iteration
        t0 = time.time()
        next_save = it + self.s.save_period
        scalar_names = ("birth", "death", "height", "rate_mean", "rate_var",
                        "lp_post")
        draws = self._draws_hist
        for k in scalar_names:
            draws.setdefault(k, [])
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
                    ages = np.asarray(outs["ages_diag"])  # [T, chains, K]
                    for j, lbl in enumerate(self.diag_labels):
                        draws.setdefault(f"age[{lbl}]", []).append(
                            ages[:, :, j]
                        )
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
        if self.nuts is not None and self._nuts_astats:
            self.log(
                f"NUTS in-cycle move: mean acceptance statistic "
                f"{float(np.mean(self._nuts_astats)):.3f} over "
                f"{len(self._nuts_astats)} chunks (eps {self.nuts.eps:.5f})"
            )
            self._nuts_astats = []
        for nm, accs in self._extra_accs.items():
            if accs:
                self.log(
                    f"{nm}: mean acceptance {float(np.mean(accs)):.3f} "
                    f"over {len(accs)} phase sweeps"
                )
                self._extra_accs[nm] = []
        self._write_diagnostics(draws)
        return batch, tuning, key

    def trace_arrays(self) -> dict:
        """Full cross-chain draw history as ``{name: [draws, chains]}``."""
        return {
            k: np.concatenate(v, axis=0)
            for k, v in self._draws_hist.items() if v
        }

    def preload_trace(self, trace: Optional[dict]):
        """Seed the draw history from a saved trace (``continue``): the final
        diagnostics then cover the whole run, not just post-continue draws."""
        if not trace:
            return
        C = self.s.n_chains
        for k, arr in trace.items():
            arr = np.asarray(arr)
            if arr.ndim == 2 and arr.shape[1] == C:
                self._draws_hist.setdefault(k, []).append(arr)
            else:
                self.log(
                    f"trace: dropping {k} (saved chains {arr.shape} do not "
                    f"match the current {C}-chain run)"
                )

    # Fraction of the sampling draws dropped before computing R-hat/ESS:
    # the reference's validation workflow also discards an initial segment
    # in R before diagnosing (comparison README:241-269); without it,
    # residual post-burn-in drift dominates split R-hat on long runs.
    DIAG_DROP_FRACTION = 0.25

    def _write_diagnostics(self, draws):
        """Cross-chain R-hat / bulk+tail ESS over the scalar parameters and
        the diagnostic node ages; the reference delegates this to external
        R scripts (bench/comparison_with_mcmctree/README.md:265-269)."""
        if not draws or not next(iter(draws.values())):
            return
        from .diagnostics import summarize

        samples = {
            k: np.concatenate(v, axis=0) for k, v in draws.items() if v
        }
        drop = int(next(iter(samples.values())).shape[0]
                   * self.DIAG_DROP_FRACTION)
        samples = {k: v[drop:] for k, v in samples.items()}
        if drop:
            self.log(f"diagnostics: dropping the first {drop} draws "
                     f"({self.DIAG_DROP_FRACTION:.0%}) as residual warmup")
        self.log("convergence diagnostics (all chains):")
        table = summarize(samples, log=self.log)
        path = f"{self.s.out_dir}/{self.s.analysis_name}.diagnostics.tsv"
        with open(path, "w") as fh:
            fh.write("Parameter\tMean\tSD\tESS\tTailESS\tRhat\n")
            for k, s in table.items():
                fh.write(
                    f"{k}\t{s['mean']:.6g}\t{s['sd']:.6g}\t{s['ess']:.1f}\t"
                    f"{s['ess_tail']:.1f}\t{s['rhat']:.4f}\n"
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
        from .hmc import NutsInCycle

        runner.nuts = NutsInCycle(model, dtype=runner.dtype)
    key = jax.random.PRNGKey(settings.seed if settings.seed is not None else 42)

    def do_checkpoint(batch, tuning, k, it):
        ckpt.save(
            settings.analysis_name, batch, tuning, k, it, table.n_proposals,
            out_dir=settings.out_dir,
            extra={"hamiltonian": True} if runner.nuts is not None else None,
            extra_arrays=(
                runner.nuts.state_arrays() if runner.nuts is not None else None
            ),
        )
        trace = runner.trace_arrays()
        if trace:
            ckpt.save_trace(settings.analysis_name, trace,
                            out_dir=settings.out_dir)
        log(f"checkpoint at iteration {it}")

    if continue_from is not None:
        batch, tuning, key, start_it = continue_from
        runner.preload_trace(
            ckpt.load_trace(settings.analysis_name, in_dir=settings.out_dir)
        )
        if runner.nuts is not None:
            runner.nuts.restore(ckpt.load_arrays(
                settings.analysis_name, ("nuts_eps", "nuts_inv_mass"),
                in_dir=settings.out_dir,
            ))
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
