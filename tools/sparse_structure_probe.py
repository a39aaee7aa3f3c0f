"""Probe the glasso precision's sparsity structure on simulated trees.

Decides the TPU sparse-MVN storage format (VERDICT round-3 item 4): for a
simulated ultrametric tree treelist, run the sparse preparation's
graphical lasso and report

- nonzero fraction and its tree-locality (nonzeros vs node tree distance),
- the matrix bandwidth in the engine's pre-order internal layout,
- the bandwidth after Reverse Cuthill-McKee reordering,
- block-sparsity occupancy (fraction of WxW blocks with any nonzero) for
  candidate block sizes,

so the block format (block-tridiagonal after RCM vs general block-sparse)
is chosen from measured structure, not guesswork.  Host-only (NumPy +
SciPy); no TPU needed.

Usage: python tools/sparse_structure_probe.py [--leaves N] [--trees T]
       [--rho R]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scipy.sparse import csr_matrix  # noqa: E402
from scipy.sparse.csgraph import reverse_cuthill_mckee  # noqa: E402

from mcmcdate_tpu.utils import glasso as G  # noqa: E402
from mcmcdate_tpu.utils.simulate import simulate  # noqa: E402


def bandwidth(A):
    i, j = np.nonzero(A)
    return int(np.max(np.abs(i - j))) if len(i) else 0


def block_stats(A, w):
    n = A.shape[0]
    nb = -(-n // w)
    pad = nb * w - n
    Ap = np.pad(np.abs(A) > 0, ((0, pad), (0, pad)))
    occ = Ap.reshape(nb, w, nb, w).any(axis=(1, 3))
    # occupied blocks per block-row, and the block-bandwidth
    per_row = occ.sum(axis=1)
    bi, bj = np.nonzero(occ)
    bbw = int(np.max(np.abs(bi - bj))) if len(bi) else 0
    return occ.mean(), int(per_row.max()), float(per_row.mean()), bbw


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--leaves", type=int, default=200)
    ap.add_argument("--trees", type=int, default=400)
    ap.add_argument("--rho", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    sim = simulate(n_leaves=args.leaves, n_trees=args.trees,
                   seed=args.seed, rate_var=0.05, noise=0.05)
    # Branch-length matrix exactly as the prepare pipeline builds it
    # (prepare.py:197-243): reference branch order, root branches merged,
    # standardized correlation into the glasso.
    from mcmcdate_tpu import prepare as prep
    from mcmcdate_tpu.tree.flat import FlatTopology

    pm_full = prep._branch_matrix_all(sim.trees)
    topo = FlatTopology.from_tree(sim.trees[0])
    pm_r = pm_full[:, topo.ref_branch_order]
    pm_r = np.concatenate([pm_r[:, :1] + pm_r[:, 1:2], pm_r[:, 2:]], axis=1)
    print(f"branch matrix: {pm_r.shape}")
    mu_s, sd, xs_norm = G.scale_data(pm_r)
    corr = np.cov(xs_norm, rowvar=False)
    t0 = time.time()
    _, prec_norm = G.graphical_lasso(corr, args.rho)
    print(f"glasso (host BCD) in {time.time() - t0:.1f}s")
    prec = G.rescale_precision(sd, prec_norm)
    # The sweep evaluates P in the INTERNAL (pre-order) layout
    # (fast_sweep.py FastSweeps.__init__); analyze structure there.
    iperm = topo.ref_to_internal_perm
    prec = prec[np.ix_(iperm, iperm)]
    D = prec.shape[0]
    off = prec.copy()
    np.fill_diagonal(off, 0.0)
    nnz = (np.abs(off) > 0).sum()
    print(f"D={D}  off-diag nnz={nnz} ({nnz / (D * (D - 1)):.4%})  "
          f"nnz/row mean={nnz / D:.1f}")

    # Tree locality: bucket off-diagonal nonzeros by the tree distance
    # between the two branches' child nodes (internal layout index == node
    # pre-order index shifted; use parent pointers for hop counts).
    par = np.asarray(topo.parent)
    n = len(par)

    def hops(a, b):
        seen = {}
        x, dxa = a, 0
        while x >= 0:
            seen[x] = dxa
            x = par[x]
            dxa += 1
        x, dxb = b, 0
        while x not in seen:
            x = par[x]
            dxb += 1
        return seen[x] + dxb

    node_of = np.asarray(topo.internal_dist_index)
    if node_of is not None:
        ii, jj = np.nonzero(np.triu(np.abs(off) > 0, 1))
        dist_counts = {}
        for a, b in zip(node_of[ii], node_of[jj]):
            h = hops(int(a), int(b))
            dist_counts[h] = dist_counts.get(h, 0) + 1
        tot = sum(dist_counts.values())
        cum = 0
        print("off-diag nnz by tree distance (hops):")
        for h in sorted(dist_counts):
            cum += dist_counts[h]
            print(f"  {h:3d}: {dist_counts[h]:6d}  (cum {cum / tot:.1%})")

    print(f"bandwidth (pre-order layout): {bandwidth(prec)}  (D-1={D - 1})")
    S = csr_matrix((np.abs(prec) > 0).astype(np.int8))
    perm = reverse_cuthill_mckee(S, symmetric_mode=True)
    Ar = prec[np.ix_(perm, perm)]
    bw = bandwidth(Ar)
    print(f"bandwidth (RCM): {bw}  ({bw / D:.3f} D)")
    for w in (16, 32, 64, 128):
        occ, mx, mean, bbw = block_stats(Ar, w)
        print(f"  RCM blocks w={w:4d}: occupancy {occ:.3%}, max/row {mx}, "
              f"mean/row {mean:.2f}, block-bandwidth {bbw}")
    for w in (16, 32, 64, 128):
        occ, mx, mean, bbw = block_stats(prec, w)
        print(f"  pre-order blocks w={w:4d}: occupancy {occ:.3%}, "
              f"max/row {mx}, mean/row {mean:.2f}, block-bandwidth {bbw}")


if __name__ == "__main__":
    main()
