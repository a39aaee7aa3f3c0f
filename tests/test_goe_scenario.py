"""The reference's largest demonstrated analysis: the 1007-taxon GOE tree.

The GOE tutorial (/root/reference/tutorial/goe/tutorial_goe.md:31,77-101)
ships its REAL rooted tree (data/1007_mito_plastid.tree, 1025 leaves after
adding organelles), fossil + XGBoost aerobicity calibrations
(Fossils.csv / XGBoost.csv — note the ``YoungAge,...,OldAge`` CSV header
variant and empty one-sided bounds), and organelle braces (braces.json).
Only the PhyloBayes branch-length treelist is NOT shipped; a simulated
fixed-topology treelist stands in for it
(utils.simulate.simulate_on_topology on the real topology).

This scenario pushes the real data files through prepare -> run at a
shortened schedule and asserts calibration/brace satisfaction plus
convergence bookkeeping.  The full-schedule measured wall-clock lives in
PERF.md (it is a multi-hour run; this test keeps the pipeline honest).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from mcmcdate_tpu import analyze
from mcmcdate_tpu.tree.rose import read_one_newick

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOE = "/root/reference/tutorial/goe/data"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(GOE), reason="GOE data not mounted"),
]

ITERATIONS = 200
CHAINS = 8


def _cli(args, cwd, timeout=3000):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
    r = subprocess.run(
        [sys.executable, "-m", "mcmcdate_tpu"] + args,
        cwd=cwd, env=env, capture_output=True, text=True, timeout=timeout,
    )
    assert r.returncode == 0, f"CLI failed: {args}\n{r.stdout[-3000:]}\n{r.stderr[-3000:]}"
    return r


@pytest.fixture(scope="module")
def goe_run(tmp_path_factory):
    from mcmcdate_tpu.utils.simulate import simulate_on_topology, write_fixture

    d = tmp_path_factory.mktemp("goe")
    tree = read_one_newick(os.path.join(GOE, "1007_mito_plastid.tree"))
    sim = simulate_on_topology(tree, n_trees=120, seed=5, rate_var=0.05,
                               noise=0.05)
    write_fixture(sim, str(d / "data"))
    _cli(
        ["prepare", "-a", "goe",
         "--rooted-tree", os.path.join(GOE, "1007_mito_plastid.tree"),
         "--trees", "data/trees.nwk", "--likelihood-spec", "univariate"],
        cwd=str(d),
    )
    _cli(
        ["run", "-a", "goe", "--likelihood-spec", "univariate",
         "--relaxed-molecular-clock", "UncorrelatedGamma",
         "--calibrations", f"csv {GOE}/XGBoost.csv",
         "--ignore-problematic-calibrations",
         "--braces", os.path.join(GOE, "braces.json"),
         "--profile", "--iterations", str(ITERATIONS),
         "--chains", str(CHAINS), "--seed", "13"],
        cwd=str(d),
    )
    return d


def test_goe_pipeline_outputs(goe_run):
    d = goe_run
    assert (d / "goe.params.monitor").exists()
    assert (d / "goe.timetree.monitor").exists()
    diag = (d / "goe.diagnostics.tsv").read_text().splitlines()
    assert diag[0].startswith("Parameter\t")
    with open(d / "goe.run.log") as fh:
        log = fh.read()
    # The YoungAge/OldAge CSV header variant parsed all 442 calibrations.
    assert "Get calibrations" in log
    assert "Loaded 4 braces" in log


def test_goe_root_age_in_lbca_calibration(goe_run):
    """The LBCA root calibration (Fossils/XGBoost row 1) is [3225, 4520] My;
    the posterior root age must land inside it."""
    d = goe_run
    summary = analyze.summarize_trees_ultrametric(
        str(d / "goe.timetree.monitor"), burn_in_fraction=0.25,
        write_files=False,
    )
    root = next(s for s in summary["ages"].values() if s["index"] == 0)
    assert 3225.0 <= root["mean"] <= 4520.0, root


def _monitor_heights_and_topo(d):
    """Mean node heights in the MONITOR trees' own preorder (prepare may
    reorder subtrees relative to the input rooted tree, so calibrations and
    braces are re-resolved against the monitor topology by leaf MRCA)."""
    from mcmcdate_tpu.tree.flat import FlatTopology

    its, trees = analyze.read_tree_monitor(str(d / "goe.timetree.monitor"))
    trees = trees[len(trees) // 4:]
    base = trees[0]
    topo = FlatTopology.from_tree(base)
    mean_h = analyze._node_heights(trees, topo).mean(axis=0)
    return base, topo, mean_h


def test_goe_braced_nodes_coincide(goe_run):
    """braces.json ties mito/chloro MRCA pairs with sd 1e-4 (relative);
    their posterior mean ages must agree tightly."""
    from mcmcdate_tpu.io.specs import load_braces_json

    d = goe_run
    base, topo, mean_h = _monitor_heights_and_topo(d)
    braces = load_braces_json(os.path.join(GOE, "braces.json"), base, topo,
                              log=lambda *a: None)
    root_age = mean_h[0]
    for name, row in zip(braces.names, np.asarray(braces.node)):
        ages = [mean_h[i] for i in row if i >= 0]
        spread = (max(ages) - min(ages)) / root_age
        assert spread < 0.01, (name, ages, spread)


def test_goe_calibrations_mostly_satisfied(goe_run):
    """Posterior mean ages honor the calibration intervals (soft bounds:
    allow a small tolerance beyond the interval ends)."""
    from mcmcdate_tpu.io.specs import load_calibrations_csv

    d = goe_run
    base, topo, mean_h = _monitor_heights_and_topo(d)
    cal = load_calibrations_csv(
        os.path.join(GOE, "XGBoost.csv"), base, topo,
        ignore_problematic=True, log=lambda *a: None,
    )
    viol = 0
    for i in range(cal.n):
        age = mean_h[int(cal.node[i])]
        lo, hi = cal.lower[i], cal.upper[i]
        span = (hi - lo) if np.isfinite(hi) else lo
        if age < lo - 0.1 * span or (np.isfinite(hi) and age > hi + 0.1 * span):
            viol += 1
    # The 442 XGBoost calibrations overlap heavily; a short schedule won't
    # satisfy every single one, but the posterior must honor nearly all.
    assert viol <= cal.n * 0.05, f"{viol}/{cal.n} calibration violations"
