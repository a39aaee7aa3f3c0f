"""Measure NUTS value: bulk ESS/hour with vs without --hamiltonian.

VERDICT round-3 item 2: the reference's stated reason for its Hamiltonian
proposal is convergence (scripts/run:15, app/Hamiltonian.hs:94-105); this
engine gained in-cycle NUTS in round 2 but never measured whether the trade
is worth taking.  This tool runs the SAME prepared analysis twice — MHG
sweeps only, and MHG + in-cycle NUTS — for the same sampling schedule, then
reports per-scalar bulk ESS, wall-clock, and ESS/hour for both, from the
params monitor (chain 0) plus the cross-chain diagnostics table.

Default shape: the reference's 136-taxon Strassert tutorial topology
(tutorial/main/tutorial.org:442) with a simulated fixed-topology treelist,
UncorrelatedLogNormal clock, sparse-spec likelihood — the same
configuration as PERF.md's measured head-to-head.

Usage:
  python tools/nuts_ess_bench.py OUT_DIR [--iterations 4000] [--chains 256]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TREE = ("/root/reference/tutorial/main/data/"
        "step3-strassert-136taxa.rooted.tre")


def cli(args, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
    t0 = time.time()
    r = subprocess.run([sys.executable, "-m", "mcmcdate_tpu"] + args,
                       cwd=cwd, env=env)
    dt = time.time() - t0
    print(f"[nuts_ess] {' '.join(args[:2])} -> rc {r.returncode} in {dt:.0f}s",
          flush=True)
    if r.returncode != 0:
        sys.exit(r.returncode)
    return dt


def ess_table(params_monitor, burn_frac=0.2):
    """Bulk/tail ESS per scalar column from a params monitor file."""
    sys.path.insert(0, REPO)
    import numpy as np

    from mcmcdate_tpu.engine.diagnostics import ess, ess_tail

    with open(params_monitor) as fh:
        header = fh.readline().split()
    cols = np.loadtxt(params_monitor, skiprows=1)
    burn = int(len(cols) * burn_frac)
    cols = cols[burn:]
    out = {}
    for j, name in enumerate(header):
        if name.lower() in ("iteration", "state"):
            continue
        x = cols[:, j]
        if np.allclose(x.std(), 0):
            continue
        # ess/ess_tail take [draws, chains]; this is one chain's series.
        out[name] = {"ess_bulk": float(ess(x[:, None])),
                     "ess_tail": float(ess_tail(x[:, None]))}
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--iterations", type=int, default=4000)
    ap.add_argument("--chains", type=int, default=256)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--n-trees", type=int, default=1000)
    args = ap.parse_args()
    d = os.path.abspath(args.out_dir)
    os.makedirs(d, exist_ok=True)

    sys.path.insert(0, REPO)
    from mcmcdate_tpu.tree import read_one_newick
    from mcmcdate_tpu.utils.simulate import simulate_on_topology, write_fixture

    tree = read_one_newick(TREE)
    sim = simulate_on_topology(tree, n_trees=args.n_trees, seed=5,
                               rate_var=0.05, noise=0.05)
    write_fixture(sim, os.path.join(d, "data"))

    results = {}
    for tag, extra in (("mhg", []), ("nuts", ["--hamiltonian"])):
        sub = os.path.join(d, tag)
        os.makedirs(sub, exist_ok=True)
        stamp = os.path.join(sub, "wall_s.json")
        if os.path.exists(stamp):
            # Leg already ran to completion (the run wall-clock was
            # stamped): reuse its monitors instead of re-running.
            with open(stamp) as fh:
                dt = json.load(fh)["wall_s"]
            print(f"[nuts_ess] {tag}: reusing completed leg "
                  f"({dt:.0f}s)", flush=True)
        else:
            cli(["prepare", "-a", "t136", "--rooted-tree", TREE,
                 "--trees", os.path.join(d, "data", "trees.nwk"),
                 "--likelihood-spec", "sparse 0.1"], cwd=sub)
            dt = cli(["run", "-a", "t136", "--likelihood-spec",
                      "sparse 0.1",
                      "--relaxed-molecular-clock", "UncorrelatedLogNormal",
                      "--iterations", str(args.iterations),
                      "--chains", str(args.chains),
                      "--seed", str(args.seed)] + extra, cwd=sub)
            with open(stamp, "w") as fh:
                json.dump({"wall_s": dt}, fh)
        tab = ess_table(os.path.join(sub, "t136.params.monitor"))
        # Cross-chain bulk/tail ESS from the run's own diagnostics table
        # (all chains pooled) — the number that matters for throughput.
        diag = {}
        with open(os.path.join(sub, "t136.diagnostics.tsv")) as fh:
            header = fh.readline().rstrip("\n").split("\t")
            for line in fh:
                parts = line.rstrip("\n").split("\t")
                diag[parts[0]] = dict(zip(header[1:], map(float, parts[1:])))
        results[tag] = {"wall_s": dt, "chain0_ess": tab,
                        "cross_chain": diag,
                        "ess_per_hour_cross_chain": {
                            k: round(v["ESS"] * 3600.0 / dt, 1)
                            for k, v in diag.items()}}
        print(json.dumps({tag: results[tag]}), flush=True)

    with open(os.path.join(d, "nuts_ess_report.json"), "w") as fh:
        json.dump(results, fh, indent=1)
    print("[nuts_ess] report written", flush=True)


if __name__ == "__main__":
    main()
