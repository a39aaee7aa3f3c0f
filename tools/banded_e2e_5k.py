"""End-to-end banded-MVN analysis past the dense ceiling (VERDICT r4 #3).

The banded kind (ops/banded.py, `--likelihood-spec "banded W"`) exists to
scale MVN dating past the point where the dense precision can even ship
on this backend (the [D, D] jaxpr constant hits the remote-compile
payload limit well before HBM fills — PERF.md "MVN scaling").  The
reference's largest demonstrated analysis is 1,007 taxa
(tutorial/goe/tutorial_goe.md:31); this tool demonstrates the capability
the reference does NOT have: a full prepare -> run -> recovery check at
>= 5,000 simulated taxa through the production CLI.

Flow (all through `python -m mcmcdate_tpu`, as a user would):
  1. simulate a 5k-taxon ultrametric truth + noisy treelist
  2. prepare with `--likelihood-spec "banded W"` (Cholesky-banding
     estimator at prepare time)
  3. run a shortened schedule (the treelist is sharp, so heights pin
     to truth quickly)
  4. assert posterior node-age recovery against the simulation truth
     with the reference-fixture bars (normalized RMSE of posterior mean
     heights, truth inside the central 95% interval for most nodes)

Usage:
  python tools/banded_e2e_5k.py OUT_DIR [--taxa 5000] [--bandwidth 128]
      [--chains 64] [--iterations 1000] [--burn-in-fast 200]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def cli(args, cwd, log_name):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
    t0 = time.time()
    with open(os.path.join(cwd, log_name), "w") as fh:
        r = subprocess.run([sys.executable, "-u", "-m", "mcmcdate_tpu"]
                           + args, cwd=cwd, env=env, stdout=fh,
                           stderr=subprocess.STDOUT)
    dt = time.time() - t0
    print(f"[banded_e2e] {args[0]} -> rc {r.returncode} in {dt:.0f}s",
          flush=True)
    if r.returncode != 0:
        with open(os.path.join(cwd, log_name)) as fh:
            print(fh.read()[-3000:])
        sys.exit(r.returncode)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--taxa", type=int, default=5000)
    ap.add_argument("--bandwidth", type=int, default=128)
    ap.add_argument("--chains", type=int, default=64)
    ap.add_argument("--iterations", type=int, default=1000)
    ap.add_argument("--n-trees", type=int, default=400)
    ap.add_argument("--seed", type=int, default=12)
    ap.add_argument("--prepare-only", action="store_true",
                    help="stop after simulate + prepare (host-only "
                         "phases); re-invoke later to run on the chip")
    ap.add_argument("--continue", dest="cont", action="store_true",
                    help="resume sampling from the saved checkpoint "
                         "(e.g. after a backend crash) instead of a "
                         "fresh run")
    ap.add_argument("--check-only", action="store_true",
                    help="skip the run; evaluate recovery on whatever "
                         "monitor rows exist (e.g. rows streamed before "
                         "a backend crash)")
    args = ap.parse_args()
    d = os.path.abspath(args.out_dir)
    os.makedirs(d, exist_ok=True)

    sys.path.insert(0, REPO)
    import numpy as np

    from mcmcdate_tpu.utils.simulate import simulate, write_fixture

    spec = f"banded {args.bandwidth}"
    rng_seed = args.seed
    # The simulate + prepare phases are host-only; allow re-running the
    # TPU phase on existing prepared data (also lets the host phase be
    # staged while the chip is busy elsewhere).
    if os.path.exists(os.path.join(d, "b5k.data")):
        print("[banded_e2e] reusing existing prepared data", flush=True)
        sim = simulate(args.taxa, n_trees=1, seed=rng_seed,
                       rate_var=0.02, noise=0.05)  # truth heights only
        t_prep = 0.0
    else:
        t0 = time.time()
        sim = simulate(args.taxa, n_trees=args.n_trees, seed=rng_seed,
                       rate_var=0.02, noise=0.05)
        write_fixture(sim, os.path.join(d, "data"))
        print(f"[banded_e2e] simulated {args.taxa} taxa x {args.n_trees} "
              f"trees in {time.time() - t0:.0f}s", flush=True)

        t_prep = cli(["prepare", "-a", "b5k",
                      "--rooted-tree", os.path.join(d, "data", "time.tree"),
                      "--trees", os.path.join(d, "data", "trees.nwk"),
                      "--likelihood-spec", spec], cwd=d,
                     log_name="prepare.log")
    if args.prepare_only:
        print("[banded_e2e] prepare-only: done", flush=True)
        return
    # --profile: the short burn-in schedule.  The treelist is sharp
    # (5% noise, 400 trees), so heights pin to the likelihood basin in a
    # few windows; the full 4,930-iteration tuned burn-in is reference
    # parity, not a requirement of this recovery check.
    if args.check_only:
        t_run = 0.0
        print("[banded_e2e] check-only: evaluating existing monitor rows",
              flush=True)
    else:
        mode = "continue" if args.cont else "run"
        t_run = cli([mode, "-a", "b5k", "--likelihood-spec", spec,
                     "--relaxed-molecular-clock", "UncorrelatedGamma",
                     "--chains", str(args.chains), "--profile",
                     "--iterations", str(args.iterations),
                     "--seed", str(args.seed)], cwd=d, log_name="run.log")

    # Posterior node-age recovery vs simulation truth (the
    # test_reference_fixtures bars, generalized).
    from mcmcdate_tpu.analyze import read_tree_monitor
    from mcmcdate_tpu.tree import FlatTopology

    its, trees = read_tree_monitor(os.path.join(d, "b5k.timetree.monitor"))
    n_burn = len(trees) // 4
    trees = trees[n_burn:]
    topo = FlatTopology.from_tree(trees[0])
    parent = np.asarray(topo.parent)
    H = []
    for t in trees:
        lens = np.fromiter((n.length for n in t.preorder()), float)
        h = np.zeros(topo.n)
        for i in range(1, topo.n):
            h[i] = h[parent[i]] - lens[i]
        h -= h.min()
        H.append(h)
    H = np.stack(H)

    # The monitor tree's preorder matches the prepared topology's; the
    # simulation truth is on the same topology (simulate -> write_fixture
    # -> prepare round-trips the rooted tree).
    truth = np.asarray(sim.true_heights)
    inner = np.asarray(topo.inner_nodes)
    mean_h = H.mean(axis=0)
    scale = truth[inner].max()
    rmse = float(np.sqrt(np.mean((mean_h[inner] - truth[inner]) ** 2))
                 / scale)
    lo = np.quantile(H, 0.025, axis=0)
    hi = np.quantile(H, 0.975, axis=0)
    # Widen by the fixture harness's quarter-width slack: at finite draws
    # the interval endpoints themselves carry MC error.
    w = (hi - lo) / 4.0
    cover = float(np.mean((truth[inner] >= lo[inner] - w[inner])
                          & (truth[inner] <= hi[inner] + w[inner])))

    out = {
        "taxa": args.taxa,
        "dim": int(topo.n - 2),
        "bandwidth": args.bandwidth,
        "chains": args.chains,
        "iterations": args.iterations,
        "prepare_s": round(t_prep, 1),
        "run_s": round(t_run, 1),
        "node_age_rmse_norm": round(rmse, 4),
        "truth_coverage_95ci": round(cover, 4),
        "n_monitor_trees": len(trees),
    }
    print(json.dumps(out), flush=True)
    with open(os.path.join(d, "banded_e2e_report.json"), "w") as fh:
        json.dump(out, fh, indent=1)

    assert rmse < 0.05, f"node-age RMSE {rmse} too high vs truth"
    assert cover > 0.80, f"truth coverage {cover} too low"
    print("[banded_e2e] PASS", flush=True)


if __name__ == "__main__":
    main()
