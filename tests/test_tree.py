"""Tests for the host tree library (Newick I/O, re-rooting, flat topology)."""

import numpy as np
import pytest

from mcmcdate_tpu.tree import (
    FlatTopology,
    Node,
    assign_indices,
    bipartition,
    duplicate_leaves,
    make_ultrametric,
    mrca_path,
    node_at_path,
    node_heights,
    normalize_height,
    outgroup,
    parse_newick,
    write_newick,
)

SIX = "(((a:0.33,b:0.33):0.33,(c:0.33,d:0.33):0.33):0.34,(e:0.33,f:0.33):0.67):0.0;"


def test_parse_roundtrip():
    t = parse_newick(SIX)
    assert t.leaf_names() == ["a", "b", "c", "d", "e", "f"]
    assert t.n_nodes() == 11
    assert t.n_inner() == 5
    s = write_newick(t)
    t2 = parse_newick(s)
    assert t2.topology_key_ordered() == t.topology_key_ordered()
    for n1, n2 in zip(t.preorder(), t2.preorder()):
        assert n1.length == pytest.approx(n2.length)


def test_parse_quoted_and_comments():
    t = parse_newick("(('a b':1,[comment]c:2)'B(0.8,1.2)':3);")
    leaves = t.leaf_names()
    assert leaves == ["a b", "c"]
    inner = t.children[0]
    assert inner.name == "B(0.8,1.2)"


def test_parse_calibration_tree_fixture_style():
    s = (
        "(((a:0.3,b:0.3):0.3,(c:0.3,d:0.3):0.3):0.3,(e:0.3,f:0.3):0.6)"
        "'B(0.8,1.2,0.025,0.025)':0.0;"
    )
    t = parse_newick(s)
    assert t.name == "B(0.8,1.2,0.025,0.025)"


def test_duplicate_leaves():
    assert not duplicate_leaves(parse_newick("((a:1,b:1):1,c:2);"))
    assert duplicate_leaves(parse_newick("((a:1,a:1):1,c:2);"))


def test_ultrametric_and_heights():
    t = parse_newick(SIX)
    assert t.is_ultrametric(rel_tol=1e-2)
    tu = make_ultrametric(t)
    assert tu.is_ultrametric()
    tn = normalize_height(tu)
    assert tn.root_height() == pytest.approx(1.0)
    hs = node_heights(tn)
    assert hs[0] == pytest.approx(1.0)
    topo = FlatTopology.from_tree(tn)
    hs = np.asarray(hs)
    assert np.all(hs[topo.is_leaf] == pytest.approx(0.0, abs=1e-12))
    # Parent heights strictly above child heights.
    for i in range(1, topo.n):
        assert hs[topo.parent[i]] > hs[i] - 1e-15


def test_bipartition_and_outgroup():
    t = parse_newick(SIX)
    left, right = bipartition(t)
    assert left == frozenset("abcd")
    assert right == frozenset("ef")
    # An unrooted-style tree from a treelist, rooted differently:
    u = parse_newick("((f:0.3,e:0.26):0.19,((d:0.5,c:0.01):0.54,(b:0.3,a:0.26):0.37):0);")
    r = outgroup(u, left)
    l2, r2 = bipartition(r)
    assert l2 == frozenset("abcd")
    assert r2 == frozenset("ef")
    # Total branch length is conserved by re-rooting.
    tot_before = sum(n.length for n in u.preorder())
    tot_after = sum(n.length for n in r.preorder())
    assert tot_after == pytest.approx(tot_before)
    # Leaf-to-leaf path lengths are preserved (a-f crosses the root).
    def dist(tree, x, y):
        # distance via node heights on the path through their MRCA
        def depth_of(tree, name):
            d = {}

            def go(n, acc):
                if n.is_leaf:
                    d[n.name] = acc
                for c in n.children:
                    go(c, acc + c.length)

            go(tree, 0.0)
            return d

        dd = depth_of(tree, None)
        p = mrca_path(tree, [x, y])
        m = node_at_path(tree, p)
        md = 0.0
        node = tree
        for i in p:
            node = node.children[i]
            md += node.length
        return dd[x] + dd[y] - 2 * md

    assert dist(r, "a", "f") == pytest.approx(dist(u, "a", "f"))
    assert dist(r, "c", "d") == pytest.approx(dist(u, "c", "d"))


def test_mrca_path():
    t = parse_newick(SIX)
    assert mrca_path(t, ["a", "b"]) == [0, 0]
    assert mrca_path(t, ["a", "d"]) == [0]
    assert mrca_path(t, ["a", "f"]) == []
    assert mrca_path(t, ["e", "f"]) == [1]
    assert node_at_path(t, mrca_path(t, ["c", "d"])).leaf_names() == ["c", "d"]


def test_assign_indices():
    t = parse_newick(SIX)
    t2 = assign_indices(t)
    names = [n.name for n in t2.preorder()]
    assert names[0] == "0"
    assert "a" in names and "f" in names


def test_flat_topology():
    t = parse_newick(SIX)
    topo = FlatTopology.from_tree(t)
    assert topo.n == 11
    assert topo.n_leaves == 6
    assert topo.parent[0] == -1
    # Pre-order: children come after parents.
    for i in range(1, topo.n):
        assert topo.parent[i] < i
    # Subtree ranges are consistent with descendant relation.
    for i in range(topo.n):
        mask = topo.descendant_mask(i)
        # walk up from each node to check ancestry
        for j in range(topo.n):
            k = j
            is_desc = False
            while k != -1:
                if k == i:
                    is_desc = True
                    break
                k = int(topo.parent[k])
            assert mask[j] == is_desc
    # Depth of the root (elynx convention: leaves depth 1).
    assert topo.depth[0] == 4
    # Inner node counts.
    assert topo.n_inner_subtree[0] == 5
    root_l, root_r = topo.root_children
    assert topo.n_inner_subtree[root_l] == 3
    assert topo.n_inner_subtree[root_r] == 1


def test_ref_branch_order():
    t = parse_newick(SIX)
    topo = FlatTopology.from_tree(t)
    order = topo.ref_branch_order
    # 10 branches (no stem); first two are the root children.
    assert len(order) == 10
    l, r = topo.root_children
    assert order[0] == l and order[1] == r
    # Distance vector has N-2 entries.
    assert len(topo.dist_node_index) == topo.n - 2
    # Every non-root node appears exactly once in the branch order.
    assert sorted(order.tolist()) == list(range(1, topo.n))


def test_paths_roundtrip():
    t = parse_newick(SIX)
    topo = FlatTopology.from_tree(t)
    for i, p in enumerate(topo.paths):
        assert topo.node_of_path(p) == i
