"""Reproduce the GOE flagship analysis end-to-end (PERF.md "GOE tree").

The reference's largest demonstrated analysis
(tutorial/goe/tutorial_goe.md:31,77-101): the real 1007-taxon
bacterial+organelle tree with its 442 fossil + XGBoost aerobicity
calibrations and 4 organelle braces.  Only the PhyloBayes treelist is not
shipped; a simulated fixed-topology treelist stands in for it
(utils.simulate.simulate_on_topology on the real topology).  The run uses
the FULL dense MVN (strictly more likelihood work than the reference's
sparse approximation) with the reference's tuned burn-in schedule.

Usage:
  python tools/goe_flagship.py OUT_DIR [--iterations N] [--chains C]
         [--seed S] [--n-trees T] [--continue]

Writes <OUT_DIR>/goe.* (monitors, checkpoint, diagnostics.tsv) and a
goe_report.json via tools/goe_report.py.
"""

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOE = "/root/reference/tutorial/goe/data"


def cli(args, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
    t0 = time.time()
    r = subprocess.run([sys.executable, "-m", "mcmcdate_tpu"] + args,
                       cwd=cwd, env=env)
    print(f"[goe_flagship] {' '.join(args[:2])} -> rc {r.returncode} "
          f"in {time.time() - t0:.0f}s", flush=True)
    if r.returncode != 0:
        sys.exit(r.returncode)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--iterations", type=int, default=16000)
    ap.add_argument("--chains", type=int, default=256)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--n-trees", type=int, default=3000)
    ap.add_argument("--continue", dest="cont", action="store_true",
                    help="continue the existing OUT_DIR analysis instead")
    ap.add_argument("--bold-contra", type=float, metavar="P",
                    help="occasional-bold contrary kernel probability "
                         "(--bold-contra of run/continue)")
    ap.add_argument("--fiber-de", type=float, metavar="N",
                    help="cross-chain fiber-DE rounds per sweep chunk "
                         "(engine/ensemble.py; the collective mode-gap "
                         "kernel)")
    ap.add_argument("--fiber-slide", type=float, metavar="P",
                    help="fiber node-slide probability "
                         "(--fiber-slide of run/continue)")
    ap.add_argument("--mc3", action="store_true",
                    help="run MC3 (CHAINS cold groups x 4 temperatures); "
                         "use for the deep-backbone mode mixing the plain "
                         "MHG run cannot achieve (tools/goe_modes.py)")
    ap.add_argument("--prepare-only", action="store_true",
                    help="stop after simulate + prepare (host-only); "
                         "re-invoke later for the chip phase")
    ap.add_argument("--reuse-data", metavar="DIR",
                    help="copy goe.data/goe.meantree from a previous "
                         "flagship OUT_DIR instead of re-simulating, so "
                         "runs are comparable on identical data")
    args = ap.parse_args()
    d = os.path.abspath(args.out_dir)
    os.makedirs(d, exist_ok=True)

    if args.reuse_data and not args.cont:
        import shutil

        for f in ("goe.data", "goe.meantree"):
            shutil.copy(os.path.join(os.path.abspath(args.reuse_data), f),
                        os.path.join(d, f))
        print("[goe_flagship] reusing prepared data from "
              f"{args.reuse_data}", flush=True)
    elif not args.cont and os.path.exists(os.path.join(d, "goe.data")):
        print("[goe_flagship] reusing existing prepared data", flush=True)
    elif not args.cont:
        sys.path.insert(0, REPO)
        from mcmcdate_tpu.tree import read_one_newick
        from mcmcdate_tpu.utils.simulate import (simulate_on_topology,
                                                 write_fixture)

        tree = read_one_newick(os.path.join(GOE, "1007_mito_plastid.tree"))
        sim = simulate_on_topology(tree, n_trees=args.n_trees, seed=5,
                                   rate_var=0.05, noise=0.05)
        write_fixture(sim, os.path.join(d, "data"))
        print("[goe_flagship] treelist simulated", flush=True)
        cli(["prepare", "-a", "goe",
             "--rooted-tree", os.path.join(GOE, "1007_mito_plastid.tree"),
             "--trees", "data/trees.nwk", "--likelihood-spec", "full"],
            cwd=d)

    if args.prepare_only:
        print("[goe_flagship] prepare-only: done", flush=True)
        return

    mode = "continue" if args.cont else "run"
    cli([mode, "-a", "goe", "--likelihood-spec", "full",
         "--relaxed-molecular-clock", "UncorrelatedGamma",
         "--calibrations", f"csv {GOE}/XGBoost.csv",
         "--ignore-problematic-calibrations",
         "--braces", os.path.join(GOE, "braces.json"),
         "--iterations", str(args.iterations),
         "--chains", str(args.chains), "--seed", str(args.seed)]
        + (["--mc3"] if args.mc3 else [])
        + (["--bold-contra", str(args.bold_contra)]
           if args.bold_contra is not None else [])
        + (["--fiber-slide", str(args.fiber_slide)]
           if args.fiber_slide is not None else [])
        + (["--fiber-de", str(args.fiber_de)]
           if args.fiber_de is not None else []),
        cwd=d)

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "goe_report.py"),
         d, "goe", os.path.join(GOE, "XGBoost.csv"),
         os.path.join(GOE, "braces.json")],
    )
    sys.exit(r.returncode)


if __name__ == "__main__":
    main()
