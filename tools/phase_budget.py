"""Phase-budget probe: time each sweep phase of the ticket-batched engine
separately at the bench shape (1k taxa x 1024 chains, f32).

Reports s/sweep for: full sweep, seq-only, points-only, ranges-only, and
no-op baseline (scan overhead).  Used to target optimization work; not part
of the test suite.
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
from mcmcdate_tpu.engine.fast_sweep import FastSweeps


def timeit(run, batch, tuning, key, reps=3):
    out = run(batch, tuning, key)
    _ = float(np.asarray(out[1])[0])
    t0 = time.perf_counter()
    o = out
    for i in range(reps):
        o = run(o[0], tuning, jax.random.fold_in(key, i))
    _ = float(np.asarray(o[1])[0])
    return (time.perf_counter() - t0) / reps


def main():
    model, batch = bench.build()
    table = P.build_proposal_table(model.topo, model.braces, False)
    fast = FastSweeps(model, table)
    plan = fast.plan
    tuning = jnp.ones((bench.N_CHAINS, table.n_proposals), jnp.float32)
    key = jax.random.PRNGKey(0)

    full = jax.jit(lambda b, tu, k: fast.sweeps(b, tu, k, 1))
    t_full = timeit(full, batch, tuning, key)
    print(f"full sweep:   {t_full:.3f} s/sweep", flush=True)

    import dataclasses as dc
    saved = (plan.specs, plan.range_specs, plan.seq_table, plan.seq_rows)

    # seq-only
    fast.plan = dc.replace(plan, specs={}, range_specs={})
    seq = jax.jit(lambda b, tu, k: fast.sweeps(b, tu, k, 1))
    t_seq = timeit(seq, batch, tuning, key)
    print(f"seq-only ({len(plan.seq_table.tickets)} tickets): "
          f"{t_seq:.3f} s/sweep", flush=True)

    empty_rows = np.zeros(0, np.int32)
    from mcmcdate_tpu.engine.fast_sweep import _subset_table
    empty_table = _subset_table(table, empty_rows)

    # points-only
    fast.plan = dc.replace(plan, range_specs={}, seq_table=empty_table,
                           seq_rows=empty_rows)
    pts = jax.jit(lambda b, tu, k: fast.sweeps(b, tu, k, 1))
    t_pts = timeit(pts, batch, tuning, key)
    nsteps = sum(s.rows.shape[0] for s in plan.specs.values())
    print(f"points-only ({nsteps} mega-steps): {t_pts:.3f} s/sweep",
          flush=True)

    # ranges-only
    fast.plan = dc.replace(plan, specs={}, seq_table=empty_table,
                           seq_rows=empty_rows)
    rng_ = jax.jit(lambda b, tu, k: fast.sweeps(b, tu, k, 1))
    t_rng = timeit(rng_, batch, tuning, key)
    nblk = sum(s.rows.shape[0] for s in plan.range_specs.values())
    print(f"ranges-only ({nblk} blocks): {t_rng:.3f} s/sweep", flush=True)

    # per-bucket ranges
    for (k, rb), spec in plan.range_specs.items():
        fast.plan = dc.replace(plan, specs={},
                               range_specs={(k, rb): spec},
                               seq_table=empty_table, seq_rows=empty_rows)
        f1 = jax.jit(lambda b, tu, k2: fast.sweeps(b, tu, k2, 1))
        t1 = timeit(f1, batch, tuning, key, reps=2)
        print(f"  range kind={k} rb={rb} ({spec.rows.shape[0]} blocks): "
              f"{t1:.3f} s", flush=True)

    fast.plan = dc.replace(plan, specs=saved[0], range_specs=saved[1],
                           seq_table=saved[2], seq_rows=saved[3])
    resid = t_full - (t_seq + t_pts + t_rng)
    print(f"residual (overlap/overhead): {resid:+.3f} s", flush=True)


def combos():
    import dataclasses as dc
    model, batch = bench.build()
    table = P.build_proposal_table(model.topo, model.braces, False)
    fast = FastSweeps(model, table)
    plan = fast.plan
    tuning = jnp.ones((bench.N_CHAINS, table.n_proposals), jnp.float32)
    key = jax.random.PRNGKey(0)
    from mcmcdate_tpu.engine.fast_sweep import _subset_table
    empty_rows = np.zeros(0, np.int32)
    empty_table = _subset_table(table, empty_rows)

    variants = {
        "seq+points": dc.replace(plan, range_specs={}),
        "seq+ranges": dc.replace(plan, specs={}),
        "points+ranges": dc.replace(plan, seq_table=empty_table,
                                    seq_rows=empty_rows),
    }
    for name, pl in variants.items():
        fast.plan = pl
        f = jax.jit(lambda b, tu, k: fast.sweeps(b, tu, k, 1))
        t = timeit(f, batch, tuning, key)
        print(f"{name}: {t:.3f} s/sweep", flush=True)


if __name__ == "__main__":
    if os.environ.get("PHASE_COMBOS"):
        combos()
    else:
        main()
