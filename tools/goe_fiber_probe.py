"""Measure the landscape between the GOE deep-backbone modes.

Round-4 analysis (PERF.md "GOE deep-backbone bimodality"): given a
checkpointed GOE-scale run whose chains cluster into two modes for the
deep node ages (tools/goe_modes.py), this probe evaluates the joint log
posterior along two paths between a low-mode and a high-mode chain state:

1. LINEAR state interpolation — leaves the likelihood's data-constrained
   surface; measured barrier ~120,000 log units at the midpoint.  Any
   tempering scheme flat enough to cross it would sample the prior.
2. The LIKELIHOOD FIBER — interpolate heights (convex combinations of
   valid height vectors stay valid) while rescaling each branch rate to
   keep every branch's time x rate product constant, so the likelihood
   term is exactly constant.  Measured: NO barrier — the joint posterior
   RISES monotonically from the low-mode state to a maximum ~190 units
   above both endpoints at lambda ~0.4, then falls.

Conclusion: the "modes" are positions along a barrier-free but extremely
SLOW valley (the distance-invariant contrary direction): tuned contrary
steps diffuse ~60 My per 20k sweeps where the clusters sit 430 My apart.
Geometric-ladder MC3 cannot help (the auto-tuned ladder at 2,047 dims
compresses to beta >= 0.93); wider occasional-bold contrary kernels can
(fast_sweep.BOLD_P).

Usage: python tools/goe_fiber_probe.py OUT_DIR [ANALYSIS] [NODE_NAME]
(defaults: goe, node900; picks the two chains nearest each mode's mean)
"""

import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mcmcdate_tpu.engine import checkpoint as ckpt
from mcmcdate_tpu.io import lhdata
from mcmcdate_tpu.io.specs import load_braces_json, load_calibrations_csv
from mcmcdate_tpu.models import DatingModel
from mcmcdate_tpu.tree import FlatTopology
from mcmcdate_tpu.tree.rose import read_one_newick

GOE = "/root/reference/tutorial/goe/data"


def main(out_dir, an="goe", node="node900"):
    os.chdir(out_dir)
    tree = read_one_newick(f"{an}.meantree")
    topo = FlatTopology.from_tree(tree)
    cal = load_calibrations_csv(f"{GOE}/XGBoost.csv", tree, topo,
                                ignore_problematic=True, log=lambda *a: None)
    br = load_braces_json(f"{GOE}/braces.json", tree, topo,
                          log=lambda *a: None)
    model = DatingModel(topo=topo, likelihood=lhdata.load_data(f"{an}.data"),
                        calibrations=cal, braces=br,
                        mean_root_height=tree.root_height())

    state, _, _, _ = ckpt.load(an, in_dir=".")
    tr = ckpt.load_trace(an, in_dir=".")
    a = np.asarray(tr[f"age[{node}]"])
    m = a[a.shape[0] // 4:].mean(axis=0)
    order = np.sort(m)
    i = int(np.argmax(np.diff(order)))
    split = (order[i] + order[i + 1]) / 2
    lo_c = int(np.argmin(np.abs(m - m[m <= split].mean())))
    hi_c = int(np.argmin(np.abs(m - m[m > split].mean())))
    print(f"low-mode chain {lo_c} (age {m[lo_c]:.0f}), "
          f"high-mode chain {hi_c} (age {m[hi_c]:.0f})")

    def chain_state(c):
        return jax.tree.map(lambda x: np.asarray(x, np.float64)[c], state)

    sa, sb = chain_state(lo_c), chain_state(hi_c)
    parent = np.asarray(topo.parent)
    ha, ra = np.asarray(sa.heights), np.asarray(sa.rates)
    hb = np.asarray(sb.heights)
    prod_a = (ha[parent] - ha) * ra

    def lp(st):
        stj = jax.tree.map(lambda x: jnp.asarray(np.asarray(x, np.float32)),
                           st)
        return (float(model.log_prior(stj)),
                float(model.log_likelihood(stj)))

    lam = np.linspace(0, 1, 21)
    print("\nlambda   LINEAR joint     FIBER prior    FIBER lik")
    for l in lam:
        lin = jax.tree.map(
            lambda x, y: (1 - l) * np.asarray(x, np.float64)
            + l * np.asarray(y, np.float64), sa, sb)
        pl, ll_lin = lp(lin)
        h = (1 - l) * ha + l * hb
        t = h[parent] - h
        r = np.where(t > 0, prod_a / np.where(t > 0, t, 1.0), ra)
        fib = dataclasses.replace(sa, heights=h, rates=r)
        pf, lf = lp(fib)
        print(f"{l:5.2f} {pl + ll_lin:15.1f} {pf:15.2f} {lf:12.2f}")


if __name__ == "__main__":
    main(sys.argv[1],
         sys.argv[2] if len(sys.argv) > 2 else "goe",
         sys.argv[3] if len(sys.argv) > 3 else "node900")
