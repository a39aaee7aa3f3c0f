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
