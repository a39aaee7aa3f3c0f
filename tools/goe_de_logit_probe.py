"""Feasibility probe: fiber-DE in ORDER-PRESERVING logit-ratio coords.

tools/goe_de_probe.py measured why raw-height fiber-DE never accepts at
GOE scale: 100% of proposals violate the height ordering at every step
size (gamma 1.0 down to 0.05) — the ensemble difference vector always
flips some tiny branch span among the 2,047.  The geometric fix is to
run DE in coordinates where EVERY point is a valid height vector: the
multiplicative ratios

    u_i = h_i / h_parent(i)  in (0, 1)   (internal non-root nodes)

rebuild heights top-down as products along ancestor paths, so any u in
(0,1)^K is order-valid by construction.  This probe measures the
acceptance of DE in y = logit(u):

    y'  = y_i + gamma (y_a - y_b)        (donors a, b from other chains)
    r'_j = r_j t_j / t'_j                (likelihood exactly invariant)

acceptance = prior delta
           + [sum log h'_par u' (1-u') - sum log h_par u (1-u)]   (y->h)
           + sum log (t_j / t'_j)                                 (rates)

on the saved states of a real flagship run, split into cross-mode and
within-mode donor pairs.  Usage:

  python tools/goe_de_logit_probe.py OUT_DIR [ANALYSIS] [NODE] [GAMMAS...]
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


def main(out_dir, an="goe", node="node900", gammas=(1.0, 0.5, 0.25)):
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
    a_tr = np.asarray(tr[f"age[{node}]"])
    m = a_tr[a_tr.shape[0] // 4:].mean(axis=0)
    order = np.sort(m)
    i_gap = int(np.argmax(np.diff(order)))
    split = (order[i_gap] + order[i_gap + 1]) / 2
    hi_mask = m > split
    print(f"{node}: {int((~hi_mask).sum())} low chains, "
          f"{int(hi_mask.sum())} high chains", flush=True)

    H = np.asarray(state.heights, np.float64)   # [C, n]; root 1, leaves 0
    R = np.asarray(state.rates, np.float64)
    C, n = H.shape
    parent = np.asarray(topo.parent)
    is_leaf = np.asarray(topo.is_leaf)
    free = np.where((~is_leaf) & (np.arange(n) != 0))[0]   # internal non-root

    # logit-ratio coordinates per chain.
    u = H[:, free] / H[:, parent[free]]
    y = np.log(u) - np.log1p(-u)

    def rebuild(y_new):
        """Heights from logit-ratios, top-down in preorder (parent index
        < child index in this layout)."""
        u_new = 1.0 / (1.0 + np.exp(-y_new))
        h = np.zeros((y_new.shape[0], n))
        h[:, 0] = 1.0
        u_full = np.ones((y_new.shape[0], n))
        u_full[:, free] = u_new
        for i in range(1, n):
            if not is_leaf[i]:
                h[:, i] = u_full[:, i] * h[:, parent[i]]
        return h

    lp_prior = jax.jit(jax.vmap(model.log_prior))

    def batch_lp(hs, rs, idx=None):
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

    def logdet_yh(h, u_):
        """log |d h / d y| = sum log h_parent + log u (1-u)."""
        return (np.sum(np.log(h[:, parent[free]]), axis=1)
                + np.sum(np.log(u_) + np.log1p(-u_), axis=1))

    ld0_full = logdet_yh(H, u)

    rng = np.random.default_rng(0)
    n_trials = 4096
    for gamma in gammas:
        ii = rng.integers(0, C, n_trials)
        aa = rng.integers(0, C, n_trials)
        bb = rng.integers(0, C, n_trials)
        ok = (ii != aa) & (ii != bb) & (aa != bb)
        ii, aa, bb = ii[ok], aa[ok], bb[ok]
        yp = y[ii] + gamma * (y[aa] - y[bb])
        hp = rebuild(yp)
        up = 1.0 / (1.0 + np.exp(-yp))

        t0 = H[ii][:, parent] - H[ii]
        t1 = hp[:, parent] - hp
        ratio = np.where(t1 > 0, t0 / np.where(t1 > 0, t1, 1.0), 1.0)
        rp = R[ii] * ratio
        log_rate_jac = np.sum(np.log(ratio[:, 1:]), axis=1)

        lp1 = batch_lp(hp, rp, ii)
        dlp = (lp1 - lp0_full[ii]
               + logdet_yh(hp, up) - ld0_full[ii]
               + log_rate_jac)
        cross = hi_mask[aa] != hi_mask[bb]
        for kind, sel in (("cross", cross), ("within", ~cross)):
            d = dlp[sel]
            fin = np.isfinite(d)
            acc = np.minimum(1.0, np.exp(np.minimum(d, 0.0)))
            print(f"gamma {gamma:4.2f} {kind:6s}: n {len(d):5d}  "
                  f"mean acc {float(np.mean(acc)):.2e}  "
                  f"median dlp {float(np.median(d[fin])) if fin.any() else float('nan'):9.1f}  "
                  f"p(acc>1e-2) {float(np.mean(acc > 1e-2)):.3f}",
                  flush=True)

    # Denoised mode-jump translation (Tjelmeland-Hegstad style): the
    # donor-PAIR difference carries within-mode noise on all coordinates
    # (the fiber rate-rescale turns that into a huge prior penalty, the
    # gamma rows above); the MODE-MEAN difference is the pure collective
    # gap vector.  Propose y +/- Delta with Delta = mean_y(high) -
    # mean_y(low), rates rescaled along the fiber as before.
    d_y = y[hi_mask].mean(axis=0) - y[~hi_mask].mean(axis=0)
    sgn = np.where(hi_mask, -1.0, 1.0)
    for gj in (1.0, 0.9, 1.1):
        yp = y + gj * sgn[:, None] * d_y[None, :]
        hp = rebuild(yp)
        up = 1.0 / (1.0 + np.exp(-yp))
        t0 = H[:, parent] - H
        t1 = hp[:, parent] - hp
        ratio = np.where(t1 > 0, t0 / np.where(t1 > 0, t1, 1.0), 1.0)
        rp = R * ratio
        log_rate_jac = np.sum(np.log(ratio[:, 1:]), axis=1)
        lp1 = batch_lp(hp, rp)
        dlp = (lp1 - lp0_full + logdet_yh(hp, up) - ld0_full
               + log_rate_jac)
        acc = np.minimum(1.0, np.exp(np.minimum(dlp, 0.0)))
        fin = np.isfinite(dlp)
        print(f"mode-jump gamma {gj:4.2f}: mean acc "
              f"{float(np.mean(acc)):.2e}  median dlp "
              f"{float(np.median(dlp[fin])) if fin.any() else float('nan'):9.1f}  "
              f"p(acc>1e-2) {float(np.mean(acc > 1e-2)):.3f}", flush=True)
        if gj == 1.0:
            node_i = int(node[4:]) if node.startswith("node") else 0
            hgt = np.asarray(state.height, np.float64)
            age_new = hp[:, node_i] * hgt
            lo = ~hi_mask
            print(f"  low chains' {node}: median "
                  f"{float(np.median(H[lo, node_i] * hgt[lo])):.0f} -> "
                  f"{float(np.median(age_new[lo])):.0f} (high mode "
                  f"{float(m[hi_mask].mean()):.0f})", flush=True)

    # JOINT mode-jump: translate heights (logit-u) AND log rates by their
    # mode-mean gaps — no fiber constraint, so the likelihood changes and
    # is evaluated (one MVN eval per chain — cheap).  This tests whether
    # the modes' typical sets map onto each other by translation in
    # (y, log r): if the fiber rate map is what rejects (the rows above),
    # the actual high-mode rates are the right target instead.
    lp_post = jax.jit(jax.vmap(model.log_posterior))

    def batch_lpost(hs, rs):
        import dataclasses
        sts = jax.tree.map(
            lambda x: jnp.asarray(np.asarray(x, np.float32)), state)
        sts = dataclasses.replace(
            sts, heights=jnp.asarray(hs, jnp.float32),
            rates=jnp.asarray(rs, jnp.float32))
        return np.asarray(lp_post(sts), np.float64)

    lpost0 = batch_lpost(H, R)
    lr = np.log(np.maximum(R, 1e-300))
    d_lr = lr[hi_mask].mean(axis=0) - lr[~hi_mask].mean(axis=0)
    d_lr[0] = 0.0  # stem entry unused
    for gj in (1.0, 0.9):
        yp = y + gj * sgn[:, None] * d_y[None, :]
        hp = rebuild(yp)
        up = 1.0 / (1.0 + np.exp(-yp))
        rp = np.exp(lr + gj * sgn[:, None] * d_lr[None, :])
        # Jacobians: y->h as before; log-r translation has d r'/d r =
        # prod r'/r.
        log_r_jac = np.sum(np.log(rp[:, 1:]) - np.log(R[:, 1:]), axis=1)
        dlp = (batch_lpost(hp, rp) - lpost0
               + logdet_yh(hp, up) - ld0_full + log_r_jac)
        acc = np.minimum(1.0, np.exp(np.minimum(dlp, 0.0)))
        fin = np.isfinite(dlp)
        by = {}
        for kind, sel in (("lo->hi", ~hi_mask), ("hi->lo", hi_mask)):
            d = dlp[sel]
            by[kind] = (float(np.mean(np.minimum(1.0, np.exp(np.minimum(d, 0.0))))),
                        float(np.median(d[np.isfinite(d)]))
                        if np.isfinite(d).any() else float("nan"))
        print(f"JOINT mode-jump gamma {gj:4.2f}: "
              f"lo->hi acc {by['lo->hi'][0]:.2e} (median dlp "
              f"{by['lo->hi'][1]:9.1f})  hi->lo acc {by['hi->lo'][0]:.2e} "
              f"(median dlp {by['hi->lo'][1]:9.1f})  "
              f"p(acc>1e-2) {float(np.mean(acc > 1e-2)):.3f}", flush=True)

    # Mode-transport check for the best-case jump: does a cross-mode
    # gamma=1 proposal actually LAND in the other mode's age region?
    ii = np.where(~hi_mask)[0]
    if ii.size and hi_mask.sum() >= 2:
        node_i = int(node[4:]) if node.startswith("node") else 0
        lo_ch = np.where(~hi_mask)[0]
        hi_ch = np.where(hi_mask)[0]
        take = min(200, lo_ch.size)
        ii = lo_ch[:take]
        aa = hi_ch[rng.integers(0, hi_ch.size, take)]
        bb = lo_ch[rng.integers(0, lo_ch.size, take)]
        yp = y[ii] + 1.0 * (y[aa] - y[bb])
        hp = rebuild(yp)
        hgt = np.asarray(state.height, np.float64)[ii]
        age_new = hp[:, node_i] * hgt
        age_old = H[ii, node_i] * hgt
        print(f"transport check (low->high, gamma 1): median age "
              f"{float(np.median(age_old)):.0f} -> "
              f"{float(np.median(age_new)):.0f} (high mode at "
              f"{float(m[hi_mask].mean()):.0f})", flush=True)


if __name__ == "__main__":
    main(sys.argv[1],
         sys.argv[2] if len(sys.argv) > 2 else "goe",
         sys.argv[3] if len(sys.argv) > 3 else "node900",
         tuple(float(g) for g in sys.argv[4:]) or (1.0, 0.5, 0.25))
