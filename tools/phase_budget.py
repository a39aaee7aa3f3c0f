"""Phase-budget probe: time each sweep phase of the ticket-batched engine
separately at the bench shape (1k taxa x 1024 chains, f32).

Reports s/sweep for: full sweep (with and without the glob phase),
seq-only, points-only, ranges-only, glob-only (and per glob family).
All timings amortize over NSWEEPS sweeps per jitted dispatch so the
~0.4 s host/tunnel dispatch latency does not pollute phase attribution.
Used to target optimization work; not part of the test suite.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from mcmcdate_tpu.engine import proposals as P
from mcmcdate_tpu.engine.fast_sweep import FastSweeps, _subset_table

NSWEEPS = int(os.environ.get("NSWEEPS", "5"))
REPS = int(os.environ.get("REPS", "2"))


def timeit(fast, batch, tuning, key, reps=REPS):
    run = jax.jit(lambda b, tu, k: fast.sweeps(b, tu, k, NSWEEPS))
    out = run(batch, tuning, key)
    _ = float(np.asarray(out[1])[0])
    t0 = time.perf_counter()
    o = out
    for i in range(reps):
        o = run(o[0], tuning, jax.random.fold_in(key, i))
    _ = float(np.asarray(o[1])[0])
    return (time.perf_counter() - t0) / (reps * NSWEEPS)


def main():
    import dataclasses as dc

    model, batch = bench.build()
    table = P.build_proposal_table(model.topo, model.braces, False)
    fast = FastSweeps(model, table)
    plan = fast.plan
    tuning = jnp.ones((bench.N_CHAINS, table.n_proposals), jnp.float32)
    key = jax.random.PRNGKey(0)

    empty_rows = np.zeros(0, np.int32)
    empty_table = _subset_table(table, empty_rows)

    t_full = timeit(fast, batch, tuning, key)
    print(f"full sweep (glob): {t_full:.3f} s/sweep", flush=True)

    # QUICK=1: time only full/points/ranges (the static-P adjudication
    # needs just these; skips three jit variants on a cold cache).
    quick = bool(os.environ.get("QUICK"))

    # no-glob full sweep: glob tickets return to the sequential fallback
    glob_rows = sorted(set(
        int(r) for g in plan.glob_groups.values() for r in g.rows
    ) | set(int(r) for r in plan.seq_rows))
    ng_rows = np.asarray(glob_rows, np.int32)
    t_ng = t_seq = float("nan")
    if not quick:
        fast.plan = dc.replace(plan, glob_groups={},
                               seq_table=_subset_table(table, ng_rows),
                               seq_rows=ng_rows)
        t_ng = timeit(fast, batch, tuning, key)
        print(f"full sweep (no-glob, {len(ng_rows)} seq rows): "
              f"{t_ng:.3f} s/sweep", flush=True)

        # seq-only (current leftover)
        fast.plan = dc.replace(plan, specs={}, range_specs={},
                               glob_groups={})
        t_seq = timeit(fast, batch, tuning, key)
        print(f"seq-only ({len(plan.seq_table.tickets)} tickets): "
              f"{t_seq:.3f} s/sweep", flush=True)

    # points-only
    fast.plan = dc.replace(plan, range_specs={}, glob_groups={},
                           seq_table=empty_table, seq_rows=empty_rows)
    t_pts = timeit(fast, batch, tuning, key)
    nsteps = sum(s.rows.shape[0] for s in plan.specs.values())
    print(f"points-only ({nsteps} mega-steps): {t_pts:.3f} s/sweep",
          flush=True)

    # ranges-only
    fast.plan = dc.replace(plan, specs={}, glob_groups={},
                           seq_table=empty_table, seq_rows=empty_rows)
    t_rng = timeit(fast, batch, tuning, key)
    nblk = sum(s.rows.shape[0] for s in plan.range_specs.values())
    print(f"ranges-only ({nblk} blocks): {t_rng:.3f} s/sweep", flush=True)

    # glob-only
    t_glob = float("nan")
    if not quick:
        fast.plan = dc.replace(plan, specs={}, range_specs={},
                               seq_table=empty_table, seq_rows=empty_rows)
        t_glob = timeit(fast, batch, tuning, key)
        ngl = sum(g.n_tickets for g in plan.glob_groups.values())
        print(f"glob-only ({ngl} tickets): {t_glob:.3f} s/sweep",
              flush=True)

    # per-family glob
    if os.environ.get("PER_FAMILY"):
        for tag, grp in plan.glob_groups.items():
            fast.plan = dc.replace(plan, specs={}, range_specs={},
                                   glob_groups={tag: grp},
                                   seq_table=empty_table,
                                   seq_rows=empty_rows)
            t1 = timeit(fast, batch, tuning, key, reps=1)
            print(f"  glob {tag} ({grp.n_tickets} tickets): {t1:.3f} s "
                  f"({1e3 * t1 / grp.n_tickets:.2f} ms/ticket)", flush=True)

    fast.plan = plan
    if not quick:
        resid = t_full - (t_seq + t_pts + t_rng + t_glob)
        print(f"residual (overlap/overhead): {resid:+.3f} s", flush=True)
        print(f"glob net gain vs seq fallback: {t_ng - t_full:+.3f} "
              f"s/sweep", flush=True)


if __name__ == "__main__":
    main()
