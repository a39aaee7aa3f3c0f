"""Analyze deep-backbone bimodality in a GOE-scale run's saved trace.

Round-4 finding (PERF.md "GOE tree"): with 256 parallel chains and
node-age diagnostics, the 1007-taxon GOE posterior shows a REAL bimodal
structure in the deep uncalibrated backbone nodes — chain means for
age[node900] split into two tight clusters ~430 My apart (within-chain
sd ~60), with near-equal posterior mass (delta lp ~ 28 vs within-chain lp
sd ~66) and fast within-mode mixing (lag-10 autocorrelation ~0.04).  A
single-chain sampler (the reference runs ONE chain,
tutorial/main/tutorial.org:442) sits in one mode and cannot detect this;
the node-age R-hats (~1.6) are the honest signal.

This tool reproduces the analysis from a checkpointed trace: per-node
chain-mean clustering, mode occupancy, per-mode posterior levels, and
within-chain autocorrelation.

Usage: python tools/goe_modes.py OUT_DIR ANALYSIS_NAME [NODE ...]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mcmcdate_tpu.engine.checkpoint import load_trace

DROP = 0.25  # initial fraction dropped, as in ChainRunner diagnostics


def autocorr(x, lags=(1, 10, 100, 500)):
    x = x - x.mean()
    d = float(np.dot(x, x))
    return [float(np.dot(x[:-k], x[k:]) / d) for k in lags]


def main(out_dir, an, nodes):
    tr = load_trace(an, in_dir=out_dir)
    if tr is None:
        sys.exit(f"no saved trace for {an} in {out_dir}")
    names = [k for k in tr if k.startswith("age[")]
    if nodes:
        names = [f"age[{n}]" for n in nodes]
    n = np.asarray(next(iter(tr.values()))).shape[0]
    sl = slice(int(n * DROP), None)
    lp = np.asarray(tr["lp_post"])[sl]
    print(f"{n} draws x {lp.shape[1]} chains "
          f"(first {DROP:.0%} dropped)\n")
    for nm in names:
        a = np.asarray(tr[nm])[sl]
        m = a.mean(axis=0)
        w = float(np.median(a.std(axis=0)))
        # Two-cluster split at the widest gap in sorted chain means.
        order = np.sort(m)
        gaps = np.diff(order)
        i = int(np.argmax(gaps))
        split, gap = (order[i] + order[i + 1]) / 2, float(gaps[i])
        hi = m > split
        if gap < 2.0 * w or not 0 < hi.sum() < len(m):
            print(f"{nm:26s} unimodal (max gap {gap:.3g} < 2x "
                  f"within-sd {w:.3g})")
            continue
        print(f"{nm:26s} BIMODAL: {int((~hi).sum())} chains at "
              f"{m[~hi].mean():.4g}, {int(hi.sum())} at {m[hi].mean():.4g} "
              f"(gap {gap:.3g}, within-sd {w:.3g})")
        print(f"{'':26s} lp low-mode {lp[:, ~hi].mean():.6g}  "
              f"high-mode {lp[:, hi].mean():.6g}  "
              f"(within-chain lp sd {np.median(lp.std(axis=0)):.3g})")
        print(f"{'':26s} within-mode autocorr lags 1/10/100/500: "
              f"{[round(v, 3) for v in autocorr(a[:, 0])]}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else "goe",
         sys.argv[3:])
