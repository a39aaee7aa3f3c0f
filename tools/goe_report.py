"""Summarize a GOE-scale run for PERF.md: wall-clock, posterior root age,
calibration/brace satisfaction, and convergence diagnostics.

Usage: python tools/goe_report.py OUT_DIR ANALYSIS_NAME CAL_CSV BRACES_JSON

Resolves calibrations/braces against the monitor trees' own topology (by
leaf MRCA), so it is robust to subtree reordering during prepare.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mcmcdate_tpu import analyze
from mcmcdate_tpu.io.specs import load_braces_json, load_calibrations_csv
from mcmcdate_tpu.tree.flat import FlatTopology


def main(out_dir, an, cal_csv, braces_json):
    mon = os.path.join(out_dir, f"{an}.timetree.monitor")
    its, trees = analyze.read_tree_monitor(mon)
    n_all = len(trees)
    trees = trees[n_all // 4:]
    base = trees[0]
    topo = FlatTopology.from_tree(base)
    H = analyze._node_heights(trees, topo)
    mean_h = H.mean(axis=0)

    rep = {"analysis": an, "monitor_rows": n_all,
           "rows_used": len(trees), "n_nodes": int(topo.n)}
    rep["root_age_mean"] = float(mean_h[0])
    rep["root_age_q025"] = float(np.quantile(H[:, 0], 0.025))
    rep["root_age_q975"] = float(np.quantile(H[:, 0], 0.975))

    cal = load_calibrations_csv(cal_csv, base, topo,
                                ignore_problematic=True, log=lambda *a: None)
    viol = []
    for i in range(cal.n):
        age = mean_h[int(cal.node[i])]
        lo, hi = cal.lower[i], cal.upper[i]
        span = (hi - lo) if np.isfinite(hi) else lo
        if age < lo - 0.05 * span or (np.isfinite(hi) and age > hi + 0.05 * span):
            viol.append((cal.names[i], float(age), float(lo), float(hi)))
    rep["calibrations"] = cal.n
    rep["calibration_violations_5pct"] = len(viol)
    rep["violations"] = viol[:10]

    braces = load_braces_json(braces_json, base, topo, log=lambda *a: None)
    spreads = {}
    for name, row in zip(braces.names, np.asarray(braces.node)):
        ages = [float(mean_h[i]) for i in row if i >= 0]
        spreads[name] = dict(
            ages=ages,
            rel_spread=float((max(ages) - min(ages)) / mean_h[0]),
        )
    rep["braces"] = spreads

    diag_path = os.path.join(out_dir, f"{an}.diagnostics.tsv")
    if os.path.exists(diag_path):
        diag = {}
        with open(diag_path) as fh:
            header = fh.readline().strip().split("\t")
            for line in fh:
                v = line.strip().split("\t")
                diag[v[0]] = dict(zip(header[1:], v[1:]))
        rep["diagnostics"] = diag

    print(json.dumps(rep, indent=2))


if __name__ == "__main__":
    main(*sys.argv[1:5])
