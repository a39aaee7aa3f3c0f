"""Regenerate PARITY.md from parity records.

Usage:
    PARITY_OUT=.parity.jsonl python -m pytest tests/test_reference_fixtures.py \
        tests/test_mcmctree_comparison.py -q
    python tools/make_parity.py .parity.jsonl > PARITY.md
"""

import json
import sys


def main(path):
    fixtures = []
    mcmctree = None
    with open(path) as fh:
        for line in fh:
            rec = json.loads(line)
            if rec.get("fixture") == "mtCDNApri-vs-MCMCtree":
                mcmctree = rec
            else:
                fixtures.append(rec)

    print("# PARITY — validation on the reference's own test data\n")
    print(
        "Each of the six reference fixture directories "
        "(/root/reference/tests/*, the reference's end-to-end scenarios, "
        "SURVEY.md §4) is run through this engine's prepare → run pipeline "
        "with the reference's analysis.conf settings, under BOTH the full "
        "MVN and the reference's real-data default sparse MVN "
        "(tests/test_reference_fixtures.py).  Posterior node ages are "
        "clade-matched against the simulation truth (the rooted time tree "
        "that generated the data).\n"
    )
    print("| Fixture | Spec | Clock | Root age (posterior mean) | Worst "
          "relative node-age error vs truth | Clades | Height R-hat | "
          "Height ESS |")
    print("|---|---|---|---|---|---|---|---|")
    seen = set()
    for r in fixtures:
        key = (r["fixture"], r.get("spec", "full"))
        if key in seen:
            continue
        seen.add(key)
        d = r.get("diagnostics") or {}
        err = r.get("worst_rel_age_error")
        print(
            f"| {r['fixture']} | {r.get('spec', 'full')} | {r['clock']} | "
            f"{r['root_age']:.4g} | "
            f"{'—' if err is None else f'{err:.3f}'} | "
            f"{r.get('n_clades', '—')} | {d.get('Rhat', float('nan')):.3f} | "
            f"{d.get('ESS', float('nan')):.0f} |"
        )
    print()
    print(
        "Additional per-fixture assertions (see the test file): the root "
        "age lands in the calibration interval; the pinned node "
        "(06-leaves-pinned-node) sits on its pin; constraints order "
        "posterior ages; braced node ages coincide; cross-chain R-hat "
        "converges.  25-leaves-bastien is real data (no simulation truth): "
        "calibration/constraint satisfaction and convergence only.\n"
    )
    print(
        "## Why 10-leaves-autocorrelated-rate recovers truth loosely "
        "(round 4)\n\n"
        "The one fixture with a materially looser truth-recovery bar was "
        "chased down: the gap is in the FIXTURE'S DATA, not the engine.  "
        "The fixture's committed PhyloBayes branch-length sample "
        "(data/test.treelist, 5000 LG sites) deviates from the simulation "
        "truth by factors of 2–3 on the short internal branches, and "
        "the posterior faithfully follows the data:\n\n"
        "| Branch (clade) | truth time×rate | PhyloBayes mean | "
        "posterior effect |\n"
        "|---|---|---|---|\n"
        "| (a,b,c,d) stem | 0.0044 | **0.0000** | node pushed up to "
        "≈parent: rel age 0.95 vs truth 0.78 |\n"
        "| (e,f,g,h,i,j) stem | 0.0036 | **0.0098** (2.7×) | node "
        "pushed down: rel age 0.38 vs truth 0.64 |\n"
        "| (e,f,g,h,i) stem | 0.0004 | **0.0014** (3.3×) | pushed "
        "down: rel age 0.31 vs truth 0.60 |\n"
        "| (b,c,d) stem | 0.0022 | 0.0039 (1.7×) | inflated |\n\n"
        "(tools/fixture_data_probe.py reproduces the table from the "
        "fixture's own time.alpha.tree / rate.alpha.tree / test.treelist.)  "
        "A zero-length observed stem forces the dating model — ANY "
        "dating model — to collapse that node onto its parent; a "
        "2.7×-inflated stem pushes it down.  The truth falls outside "
        "the posterior's own 95% interval for 5 of 8 clades in exactly the "
        "directions the data deviations predict, so no schedule or model "
        "change can tighten this bar; only the fixture's data could.  The "
        "0.35 rel_atol is a data-noise bound (worst measured 0.29), and "
        "the banded-kind fixture test asserts parity against the full-spec "
        "posterior on the same data (spec parity, which is not "
        "data-limited) rather than against truth.\n\n"
        "Round-4 correction: earlier PARITY revisions reported 0.167 for "
        "this fixture — an artifact of a truncated-clade-key "
        "collision in the reporting (nested clades sharing their first "
        "leaves overwrote each other's errors), fixed alongside this "
        "analysis.\n"
    )
    if mcmctree:
        print("## Cross-implementation accuracy: mtCDNApri vs PAML MCMCtree\n")
        print(
            "The reference's flagship accuracy benchmark "
            "(bench/comparison_with_mcmctree) dates the 7-taxon mtCDNApri "
            "primate dataset with McmcDate (UncorrelatedLogNormal + sparse "
            "MVN) and PAML MCMCtree and records both posteriors.  Running "
            "THIS engine on the same committed inputs "
            "(tests/test_mcmctree_comparison.py; note the repository ships "
            "a 10-tree subsample of the original 20k-tree PhyloBayes "
            "posterior, so the MVN surface is correspondingly noisier):\n"
        )
        print("| Node | This engine (My) | McmcDate ILN (My) | "
              "MCMCtree ILN (My) |")
        print("|---|---|---|---|")
        for n in mcmctree["nodes"]:
            print(f"| {n['name']} | {n['ours_My']} | {n['mcmcdate_ILN']} | "
                  f"{n['mcmctree_ILN']} |")
        print(
            "\nAssertion: our posterior mean falls inside both programs' "
            "recorded ILN 95% intervals widened by a quarter of their width "
            "(absorbing the subsampled-likelihood noise).\n"
        )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else ".parity.jsonl")
