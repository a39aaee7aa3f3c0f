"""Numeric feasibility probe: ensemble fiber-DE moves across the GOE modes.

PERF.md "GOE deep-backbone bimodality" measures that (a) the modes sit on
a barrier-free but slow valley along the likelihood fiber, (b) per-node
fiber slides accept 54% but do not transport (the gap is a COLLECTIVE
coordinate), and (c) whole-state fiber swaps between chains accept at
~1e-4 (the prior ratio spans every branch).  The remaining candidate is a
differential-evolution move ALONG the fiber: for chain i, propose

    h' = h_i + gamma (h_a - h_b)        (two other chains a, b)
    r'_j = r_j * t_j / t'_j             (time x rate held constant)

so the likelihood is exactly invariant and the acceptance is the prior
delta plus the rate-map Jacobian sum(log t_j/t'_j).  When a and b sit in
different modes, h_a - h_b is precisely the collective mode-gap vector,
so gamma ~ 1 maps a low-mode chain onto the high mode's region in ONE
step.  This probe measures the acceptance distribution of exactly that
kernel on the saved states of a real flagship run — cross-mode and
within-mode triples separately — to decide whether the kernel is worth
building into the sweep (accept rate >= ~1e-3 at 256 chains transports
within a normal schedule; ~1e-5 does not).

Usage: python tools/goe_de_probe.py OUT_DIR [ANALYSIS] [NODE] [GAMMAS...]
"""

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


def main(out_dir, an="goe", node="node900", gammas=(1.0, 0.5)):
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
    hi_mask = m > split
    print(f"{node}: {int((~hi_mask).sum())} low chains, "
          f"{int(hi_mask.sum())} high chains")

    H = np.asarray(state.heights, np.float64)   # [C, n]
    R = np.asarray(state.rates, np.float64)
    C, n = H.shape
    parent = np.asarray(topo.parent)
    is_leaf = np.asarray(topo.is_leaf)

    lp_prior = jax.jit(jax.vmap(model.log_prior))

    def batch_lp(hs, rs, idx=None):
        """Prior of (hs, rs) trial states; ``idx`` gathers each trial's
        scalar fields (birth/death/height/...) from its source chain."""
        import dataclasses
        sts = jax.tree.map(
            lambda x: jnp.asarray(np.asarray(x, np.float32)), state)
        if idx is not None:
            sts = jax.tree.map(lambda x: x[jnp.asarray(idx)], sts)
        sts = dataclasses.replace(
            sts, heights=jnp.asarray(hs, jnp.float32),
            rates=jnp.asarray(rs, jnp.float32))
        return np.asarray(lp_prior(sts), np.float64)

    lp0_full = batch_lp(H, R)
    rng = np.random.default_rng(0)
    n_trials = 4096

    for gamma in gammas:
        rows = {"cross": [], "within": []}
        ii = rng.integers(0, C, n_trials)
        aa = rng.integers(0, C, n_trials)
        bb = rng.integers(0, C, n_trials)
        ok = (ii != aa) & (ii != bb) & (aa != bb)
        ii, aa, bb = ii[ok], aa[ok], bb[ok]
        hp = H[ii] + gamma * (H[aa] - H[bb])
        t0 = H[ii][:, parent] - H[ii]
        t1 = hp[:, parent] - hp
        # Validity: every non-root branch keeps a positive time span, and
        # leaves stay pinned at height 0 (h_a - h_b is 0 there in every
        # chain, so this holds unless a checkpoint is corrupt).
        valid = (np.all(t1[:, 1:] > 1e-9, axis=1)
                 & np.all(np.abs(hp[:, is_leaf]) < 1e-9, axis=1))
        ratio = np.where(t1 > 0, t0 / np.where(t1 > 0, t1, 1.0), 1.0)
        rp = R[ii] * ratio
        # Jacobian of the diagonal rate rescale: sum over the non-root
        # branches whose rates are free parameters.
        logj = np.where(valid,
                        np.sum(np.log(np.where(t1[:, 1:] > 0,
                                               ratio[:, 1:], 1.0)), axis=1),
                        -np.inf)
        lp1 = batch_lp(hp, rp, ii)
        dlp = np.where(valid, lp1 - lp0_full[ii] + logj, -np.inf)
        cross = hi_mask[aa] != hi_mask[bb]
        for kind, sel in (("cross", cross), ("within", ~cross)):
            d = dlp[sel]
            acc = np.minimum(1.0, np.exp(np.minimum(d, 0.0)))
            rows[kind] = (len(d), float(np.mean(acc)),
                          float(np.median(d[np.isfinite(d)]))
                          if np.isfinite(d).any() else float("nan"),
                          float(np.mean(~np.isfinite(d))))
        for kind, (nn, acc, med, inval) in rows.items():
            print(f"gamma {gamma:4.2f} {kind:6s}: n {nn:5d}  "
                  f"mean acc {acc:.2e}  median dlp {med:9.1f}  "
                  f"invalid {inval:.2f}")


if __name__ == "__main__":
    main(sys.argv[1],
         sys.argv[2] if len(sys.argv) > 2 else "goe",
         sys.argv[3] if len(sys.argv) > 3 else "node900",
         tuple(float(g) for g in sys.argv[4:]) or (1.0, 0.5, 0.25))
