"""Reproduce the 10-leaves-autocorrelated-rate data-limitation analysis.

PARITY.md "Why 10-leaves-autocorrelated-rate recovers truth loosely": the
fixture's committed PhyloBayes branch-length sample deviates from the
simulation truth by 2-3x on the short internal branches, so posterior node
ages CANNOT recover the truth tightly there — the data itself has moved.
This probe prints, per branch (identified by the clade below it):

  * the simulation truth time length (time.alpha.tree),
  * the simulated rate (rate.alpha.tree),
  * their product (scaled: the fixture's substitution tree is
    time x rate / 100),
  * the committed substitution-tree branch length, and
  * the PhyloBayes posterior-mean branch length from test.treelist
    (after the same 500-tree burn-in `prepare` uses).

Usage: python tools/fixture_data_probe.py [FIXTURE_DIR]
(default: /root/reference/tests/10-leaves-autocorrelated-rate/data)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mcmcdate_tpu.tree.rose import parse_newick, read_one_newick

DEFAULT = "/root/reference/tests/10-leaves-autocorrelated-rate/data"


def branch_lengths(tree):
    """{clade leaf-set: branch length above that clade}."""
    out = {}

    def walk(n):
        s = (frozenset({n.name}) if not n.children
             else frozenset().union(*[walk(c) for c in n.children]))
        out[s] = n.length
        return s

    walk(tree)
    return out


def main(d):
    bt = branch_lengths(read_one_newick(os.path.join(d, "time.alpha.tree")))
    br = branch_lengths(read_one_newick(os.path.join(d, "rate.alpha.tree")))
    bs = branch_lengths(
        read_one_newick(os.path.join(d, "substitution.alpha.tree")))
    with open(os.path.join(d, "test.treelist")) as fh:
        lines = fh.readlines()[500:]
    sample = [branch_lengths(parse_newick(l.strip())) for l in lines[::10]]

    print(f"{'branch above clade':>20s} {'time':>8s} {'rate':>6s} "
          f"{'t*r/100':>8s} {'sub.tree':>8s} {'PB mean':>8s} {'PB/sub':>7s}")
    for cl in sorted(bt, key=lambda c: (len(c), sorted(c))):
        t = bt[cl] or 0.0
        r = br[cl]
        s = bs[cl]
        if s is None or r is None:
            continue
        pb = float(np.mean([x[cl] for x in sample if cl in x]))
        ratio = pb / s if s > 0 else float("inf")
        print(f"{','.join(sorted(cl))[:20]:>20s} {t:8.4f} {r:6.2f} "
              f"{t * r / 100:8.4f} {s:8.4f} {pb:8.4f} {ratio:7.2f}")
    print("\nBranches with PB/sub far from 1.0 are where the committed "
          "branch-length sample contradicts the simulation truth; posterior "
          "ages follow the sample, not the truth (PARITY.md).")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else DEFAULT)
