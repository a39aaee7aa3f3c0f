"""Post-processing utilities: midpoint rooting, densitree prep, checkpoint
precision round-trips.

Covers the L6 tail of the reference workflow (scripts/trees-midpoint-root,
scripts/trees-monitor-densitree) and the checkpoint dtype semantics of
``continue`` (app/Main.hs:494-509 reloads the chain exactly as saved).
"""

import os

import numpy as np
import pytest

from mcmcdate_tpu import analyze
from mcmcdate_tpu.tree.rose import parse_newick, write_newick


def test_midpoint_root_splits_longest_path():
    # Diameter is b..c with length 11; the midpoint falls 0.5 into the edge
    # above the (c,d) clade (1.5 from the clade end).
    t = parse_newick("((a:1,b:2):3,(c:4,d:1):2);")
    r = analyze.midpoint_root(t)
    assert len(r.children) == 2
    h1 = r.children[0].length + r.children[0].root_height()
    h2 = r.children[1].length + r.children[1].root_height()
    assert h1 == pytest.approx(5.5)
    assert h2 == pytest.approx(5.5)
    # Leaf content preserved.
    assert sorted(r.leaf_names()) == ["a", "b", "c", "d"]


def test_midpoint_root_on_edge_interior():
    # Long internal edge: a..b diameter 1+10+1 = 12, midpoint in the middle
    # of the internal edge.
    t = parse_newick("((a:1,x:0.1):10,(b:1,y:0.1):0);")
    r = analyze.midpoint_root(t)
    h1 = r.children[0].length + r.children[0].root_height()
    h2 = r.children[1].length + r.children[1].root_height()
    assert h1 == pytest.approx(6.0)
    assert h2 == pytest.approx(6.0)


def test_midpoint_root_balances_random_trees():
    rng = np.random.default_rng(3)
    from mcmcdate_tpu.utils.simulate import random_ultrametric_tree

    for seed in range(3):
        t = random_ultrametric_tree(np.random.default_rng(seed), 8)
        # Perturb branch lengths so the tree is non-ultrametric.
        for n in t.preorder():
            n.length = float(n.length + rng.uniform(0, 0.5))
        r = analyze.midpoint_root(t)
        h1 = r.children[0].length + r.children[0].root_height()
        h2 = r.children[1].length + r.children[1].root_height()
        assert h1 == pytest.approx(h2, abs=1e-9)


def test_densitree_prep(tmp_path):
    mon = tmp_path / "x.timetree.monitor"
    with open(mon, "w") as fh:
        fh.write("Iteration\tTree\n")
        for i in range(40):
            fh.write(f"{i}\t((a:1,b:1):1,c:2);\n")
    out = tmp_path / "x.nex"
    n = analyze.densitree_prep(str(mon), str(out), thin_by=5)
    assert n == 8
    text = open(out).read()
    assert text.startswith("#NEXUS")
    assert text.count("tree STATE_") == 8


def _root_leaf_depths(t):
    out = []

    def go(n, d):
        if n.is_leaf:
            out.append(d)
        for c in n.children:
            go(c, d + c.length)

    go(t, 0.0)
    return out


def test_summarize_trees_ultrametric(tmp_path):
    """Mean AND quantile summary trees are ultrametric (the
    trees-monitor-summary-ultrametric equivalent, VERDICT round-2 item 7).
    Per-branch quantile trees are provably not; height-space ones are."""
    rng = np.random.default_rng(7)
    mon = tmp_path / "x.timetree.monitor"
    # Ultrametric samples over one topology with jittered node heights:
    # ((a,b),(c,d)); root height ~2, inner nodes below it.
    with open(mon, "w") as fh:
        fh.write("Iteration\tTree\n")
        for i in range(200):
            hr = 2.0 + 0.3 * rng.standard_normal()
            h1 = hr * rng.uniform(0.3, 0.9)
            h2 = hr * rng.uniform(0.3, 0.9)
            fh.write(
                f"{i}\t((a:{h1},b:{h1}):{hr - h1},"
                f"(c:{h2},d:{h2}):{hr - h2});\n"
            )
    out = analyze.summarize_trees_ultrametric(str(mon), burn_in_fraction=0.2)
    for key in ("mean", "q0.025", "q0.5", "q0.975"):
        t = parse_newick(out[key])
        depths = _root_leaf_depths(t)
        assert max(depths) - min(depths) < 1e-9, (key, depths)
    # Quantile trees are ordered: q2.5 root height <= mean <= q97.5.
    r_lo = max(_root_leaf_depths(parse_newick(out["q0.025"])))
    r_me = max(_root_leaf_depths(parse_newick(out["mean"])))
    r_hi = max(_root_leaf_depths(parse_newick(out["q0.975"])))
    assert r_lo < r_me < r_hi
    # Age table covers the root with a sane interval.
    root_row = next(s for s in out["ages"].values() if s["index"] == 0)
    assert root_row["ci_lower"] < root_row["mean"] < root_row["ci_upper"]
    # Files written next to the monitor (reference naming).
    for suffix in (".tree.mean", ".tree.variance", ".tree.combined",
                   ".ages.summary", ".ages.full"):
        assert (tmp_path / ("x.timetree" + suffix)).exists(), suffix
    comb = open(tmp_path / "x.timetree.tree.combined").read()
    assert "age_95%_HPD={" in comb and comb.startswith("#NEXUS")
    # The combined tree's comments are NOT quoted away.
    assert "'" not in comb.split("Tree1 = ")[1]


def test_analyze_cli_subcommand(tmp_path):
    """`mcmcdate-tpu analyze -a NAME` post-processes the monitor files
    (scripts/analyze equivalent): thinned params, ultrametric summary
    trees + age tables, Nexus/DensiTree prep, rate-tree mean."""
    from mcmcdate_tpu import cli

    rng = np.random.default_rng(11)
    with open(tmp_path / "x.params.monitor", "w") as fh:
        fh.write("Iteration\tbirth\n")
        for i in range(100):
            fh.write(f"{i}\t{rng.uniform():.4f}\n")
    for mon in ("x.timetree.monitor", "x.ratetree.monitor"):
        with open(tmp_path / mon, "w") as fh:
            fh.write("Iteration\tTree\n")
            for i in range(60):
                h = 1.0 + 0.1 * rng.standard_normal()
                fh.write(f"{i}\t((a:{h},b:{h}):{h},(c:{2*h},d:{2*h}):0.0);\n")
    cli.main(["analyze", "-a", "x", "--out-dir", str(tmp_path), "--thin", "5"])
    for out in ("x.params.thinned", "x.timetree.tree.mean",
                "x.timetree.ages.summary", "x.timetree.nexus",
                "x.timetree.densitree.nex", "x.ratetree.tree.mean"):
        assert (tmp_path / out).exists(), out


def test_mode_report_bimodal_trace(tmp_path):
    """analyze.mode_report on a synthetic bimodal trace (VERDICT r4 item
    6): a monitored age whose chains split into two tight clusters gets
    per-mode occupancy/mean/interval rows in <an>.ages.modes, a
    well-mixed age is NOT reported, and the analyze CLI prints the
    summary.  Mirrors the measured GOE deep-backbone structure (PERF.md):
    cluster gap ~7 within-chain sds, near-equal lp."""
    from mcmcdate_tpu.engine.checkpoint import save_trace

    rng = np.random.default_rng(3)
    draws, chains = 400, 64
    lo = rng.normal(4055.0, 60.0, size=(draws, 40))
    hi = rng.normal(4481.0, 60.0, size=(draws, 24))
    bimodal = np.concatenate([lo, hi], axis=1)
    good = rng.normal(100.0, 5.0, size=(draws, chains))
    lp = rng.normal(17000.0, 66.0, size=(draws, chains))
    save_trace("y", {"age[node900]": bimodal, "age[node3]": good,
                     "lp_post": lp}, out_dir=str(tmp_path))

    rep = analyze.mode_report("y", str(tmp_path))
    assert set(rep) == {"age[node900]"}
    modes = rep["age[node900]"]["modes"]
    assert len(modes) == 2
    assert modes[0]["chains"] == 40 and modes[1]["chains"] == 24
    assert abs(modes[0]["mean"] - 4055) < 15
    assert abs(modes[1]["mean"] - 4481) < 15
    assert abs(modes[0]["occupancy"] - 40 / 64) < 1e-9
    assert np.isfinite(modes[0]["mean_lp"])
    path = tmp_path / "y.ages.modes"
    assert path.exists()
    body = path.read_text()
    assert "age[node900]" in body and "age[node3]" not in body

    # Threshold respected: nothing reported when the bar is above the
    # bimodal age's R-hat.
    assert analyze.mode_report("y", str(tmp_path),
                               rhat_threshold=50.0) == {}


def test_checkpoint_dtype_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from mcmcdate_tpu.engine import checkpoint as ckpt
    from mcmcdate_tpu.models.state import State

    def mk(dtype):
        z = jnp.zeros((), dtype)
        v = jnp.zeros((5,), dtype)
        return State(birth=z + 1, death=z + 2, height=z + 3, heights=v,
                     rate_mean=z, rate_var=z, rates=v)

    for dt in ("float32", "float64"):
        st = mk(jnp.dtype(dt))
        ckpt.save(f"an_{dt}", st, jnp.ones((3,), jnp.dtype(dt)),
                  jax.random.PRNGKey(0), 7, 3, out_dir=str(tmp_path))
        st2, tuning2, key2, meta = ckpt.load(f"an_{dt}", in_dir=str(tmp_path))
        # dtype restored from the sidecar, not silently downcast
        assert str(st2.heights.dtype) == dt, (dt, st2.heights.dtype)
        assert str(tuning2.dtype) == dt
        assert meta["iteration"] == 7
        assert meta["dtype"] == dt
