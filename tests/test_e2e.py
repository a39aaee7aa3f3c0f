"""End-to-end: simulate -> prepare -> run -> posterior recovers the truth.

The TPU analog of the reference's tests/06-leaves-constant-rate scenario
(SURVEY.md §4): a simulated branch-length posterior around a known time
tree; after prepare + run, posterior node ages must recover the simulation
truth.  Also exercises the CLI surface, monitor files, checkpoint/continue,
and the analyze utilities.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from mcmcdate_tpu import analyze
from mcmcdate_tpu.utils.simulate import simulate, write_fixture

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cli(args, cwd):
    env = dict(os.environ)
    # Append, don't clobber: the environment may route its JAX backend
    # through a sitecustomize on the existing PYTHONPATH.
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
    r = subprocess.run(
        [sys.executable, "-m", "mcmcdate_tpu"] + args,
        cwd=cwd, env=env, capture_output=True, text=True, timeout=1500,
    )
    assert r.returncode == 0, f"CLI failed: {args}\n{r.stdout}\n{r.stderr}"
    return r


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    sim = simulate(n_leaves=6, n_trees=300, seed=12, noise=0.04)
    write_fixture(sim, str(d / "data"))
    _cli(
        ["prepare", "-a", "an", "--rooted-tree", "data/time.tree",
         "--trees", "data/trees.nwk", "--likelihood-spec", "full"],
        cwd=str(d),
    )
    return d, sim


def test_prepare_cli(workdir):
    d, sim = workdir
    assert (d / "an.data").exists()
    assert (d / "an.meantree").exists()
    assert (d / "an.prepare.log").exists()


def test_run_cli_and_posterior(workdir):
    d, sim = workdir
    _cli(
        ["run", "-a", "an", "--likelihood-spec", "full",
         "--relaxed-molecular-clock", "UncorrelatedGamma",
         "--profile", "--iterations", "2000", "--chains", "4", "--seed", "1"],
        cwd=str(d),
    )
    for suffix in ("params", "timetree", "ratetree", "prior"):
        assert (d / f"an.{suffix}.monitor").exists()
    assert (d / "an.mcmc.npz").exists()

    # Posterior node ages recover the simulation truth (relative scale: the
    # uncalibrated model infers relative ages times height 1).
    ages = analyze.node_age_summary(str(d / "an.timetree.monitor"),
                                    burn_in_fraction=0.3)
    # Truth: relative heights of inner nodes.
    topo = sim.topo
    names = [topo.names[i] or str(i) for i in np.asarray(topo.inner_nodes)]
    true_h = {
        (topo.names[i] or str(i)): sim.true_heights[i]
        for i in np.asarray(topo.inner_nodes)
    }
    # Monitor trees are labeled by assign_indices of the mean tree; match by
    # sorted height order instead of names to stay label-agnostic.
    est = sorted(v["mean"] for v in ages.values())
    want = sorted(true_h.values())
    est = np.asarray(est) / max(est)  # relative
    want = np.asarray(want) / max(want)
    # Under a relaxed clock on strict-clock data, heights and rates trade
    # off per branch, so the posterior means genuinely shrink relative to
    # the simulation truth; require agreement within posterior-scale
    # tolerance and matching node order.
    assert np.allclose(est, want, atol=0.16), f"est {est} vs true {want}"
    assert np.all(np.argsort(est) == np.argsort(want))


def test_params_monitor_format(workdir):
    d, _ = workdir
    with open(d / "an.params.monitor") as fh:
        header = fh.readline().strip().split("\t")
        row = fh.readline().strip().split("\t")
    assert header[:6] == [
        "Iteration", "TimeBirthRate", "TimeDeathRate", "TimeHeight",
        "RateMean", "RateVariance",
    ]
    assert len(row) == len(header)
    float(row[1])  # parses


def test_continue_cli(workdir):
    d, _ = workdir
    n_before = sum(1 for _ in open(d / "an.timetree.monitor"))
    _cli(
        ["continue", "-a", "an", "--likelihood-spec", "full",
         "--relaxed-molecular-clock", "UncorrelatedGamma",
         "--profile", "--iterations", "100", "--chains", "4"],
        cwd=str(d),
    )
    n_after = sum(1 for _ in open(d / "an.timetree.monitor"))
    assert n_after > n_before


def test_analyze_utilities(workdir):
    d, _ = workdir
    mon = str(d / "an.timetree.monitor")
    summ = analyze.summarize_trees(mon, burn_in_fraction=0.25)
    assert "mean" in summ and summ["mean"].endswith(";")
    n = analyze.to_nexus(mon, str(d / "an.timetree.nexus"))
    assert n > 0
    assert open(d / "an.timetree.nexus").readline().startswith("#NEXUS")
    k = analyze.thin(mon, str(d / "an.timetree.thinned"), 5)
    assert k > 0


def test_mc3_cli(workdir):
    d, _ = workdir
    _cli(
        ["run", "-a", "mc3run", "--preparation-name", "an",
         "--likelihood-spec", "full", "--mc3",
         "--profile", "--iterations", "200", "--chains", "2", "--seed", "2"],
        cwd=str(d),
    )
    assert (d / "mc3run.params.monitor").exists()
    # Cold-chain monitor rows written.
    n = sum(1 for _ in open(d / "mc3run.params.monitor"))
    assert n > 50
    with open(d / "mc3run.run.log") as fh:
        log = fh.read()
    assert "MC3" in log and "swap" in log
    # Per-temperature-pair swap acceptance is logged.
    assert "per temperature pair" in log and "0<->1" in log
    # Temperature-ladder auto-tuning runs during burn-in.
    assert ", dt " in log
    # Pooled cross-group cold-chain diagnostics are written.
    diag = (d / "mc3run.diagnostics.tsv").read_text().splitlines()
    assert diag[0].startswith("Parameter\t")
    names = {ln.split("\t")[0] for ln in diag[1:]}
    assert {"birth", "height", "lp_post"} <= names


def test_marginal_likelihood_cli(workdir):
    d, _ = workdir
    # Prior-only data: log marginal likelihood is exactly 0.
    _cli(
        ["prepare", "-a", "nolik", "--rooted-tree", "data/time.tree",
         "--trees", "data/trees.nwk", "--likelihood-spec", "none"],
        cwd=str(d),
    )
    _cli(
        ["marginal-likelihood", "-a", "nolik", "--likelihood-spec", "none",
         "--profile", "--iterations", "50", "--chains", "2", "--seed", "3"],
        cwd=str(d),
    )
    with open(d / "nolik.mlh.log") as fh:
        log = fh.read()
    assert "log marginal likelihood" in log
    val = float(log.rsplit("stepping stone):", 1)[1].split()[0])
    assert abs(val) < 1e-5


def test_init_from_save_cli(workdir):
    d, _ = workdir
    if not (d / "an.mcmc.npz").exists():  # independent of test order
        _cli(
            ["run", "-a", "an", "--likelihood-spec", "full",
             "--profile", "--iterations", "50", "--chains", "4", "--seed", "1"],
            cwd=str(d),
        )
    _cli(
        ["run", "-a", "warm", "--preparation-name", "an",
         "--likelihood-spec", "full", "--init-from-save", "an",
         "--profile", "--iterations", "50", "--chains", "4", "--seed", "5"],
        cwd=str(d),
    )
    with open(d / "warm.run.log") as fh:
        log = fh.read()
    assert "Using tuning parameters from save." in log


def test_hamiltonian_cli(workdir):
    d, _ = workdir
    _cli(
        ["run", "-a", "ham", "--preparation-name", "an",
         "--likelihood-spec", "full", "--hamiltonian",
         "--profile", "--iterations", "60", "--chains", "2", "--seed", "9"],
        cwd=str(d),
    )
    assert (d / "ham.params.monitor").exists()
    n = sum(1 for _ in open(d / "ham.params.monitor"))
    assert n > 10
    with open(d / "ham.run.log") as fh:
        log = fh.read()
    # The in-cycle NUTS move reports per-run acceptance statistics.
    assert "NUTS in-cycle move: mean acceptance" in log


def test_mc3_hamiltonian_cli(workdir):
    """--hamiltonian rides inside MC3's heated chains (round 1 silently
    ignored it; the NUTS target of chain k is beta_k * posterior)."""
    d, _ = workdir
    _cli(
        ["run", "-a", "mc3ham", "--preparation-name", "an",
         "--likelihood-spec", "full", "--mc3", "--hamiltonian",
         "--profile", "--iterations", "100", "--chains", "2", "--seed", "6"],
        cwd=str(d),
    )
    with open(d / "mc3ham.run.log") as fh:
        log = fh.read()
    assert "MC3" in log and "NUTS adaptation: eps" in log
    n = sum(1 for _ in open(d / "mc3ham.params.monitor"))
    assert n > 20
    # The mass matrix actually adapts in the MC3 path (round-2 weakness:
    # adapt() was called without warmup vectors, leaving inv_mass = 1).
    ck = np.load(d / "mc3ham.mcmc.npz")
    im = np.asarray(ck["nuts_inv_mass"])
    assert not np.allclose(im, 1.0)
    # Continue must resume as MC3 *with* the NUTS move (meta sidecar).
    _cli(
        ["continue", "-a", "mc3ham", "--preparation-name", "an",
         "--likelihood-spec", "full",
         "--profile", "--iterations", "40", "--chains", "2"],
        cwd=str(d),
    )
    with open(d / "mc3ham.continue.log") as fh:
        clog = fh.read()
    assert "continuing with mc3" in clog.lower()


def test_marginal_likelihood_hamiltonian_cli(workdir):
    d, _ = workdir
    if not (d / "nolik.data").exists():  # independent of test order
        _cli(
            ["prepare", "-a", "nolik", "--rooted-tree", "data/time.tree",
             "--trees", "data/trees.nwk", "--likelihood-spec", "none"],
            cwd=str(d),
        )
    _cli(
        ["marginal-likelihood", "-a", "nolik2", "--preparation-name", "nolik",
         "--likelihood-spec", "none", "--hamiltonian",
         "--profile", "--iterations", "50", "--chains", "2", "--seed", "8"],
        cwd=str(d),
    )
    with open(d / "nolik2.mlh.log") as fh:
        log = fh.read()
    assert "log marginal likelihood" in log
    assert "NUTS adaptation: eps" in log
    # Mass matrix adapts in the stepping-stone path too.
    spread = log.rsplit("inv_mass [", 1)[1].split("]")[0]
    lo, hi = (float(x) for x in spread.split(","))
    assert hi > lo
    val = float(log.rsplit("stepping stone):", 1)[1].split()[0])
    assert abs(val) < 1e-5


def test_mismatched_spec_fails(workdir):
    d, _ = workdir
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-m", "mcmcdate_tpu", "run", "-a", "an",
         "--likelihood-spec", "univariate", "--profile", "--iterations", "10"],
        cwd=str(d), env=env, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode != 0
    assert "do not match" in (r.stdout + r.stderr)
