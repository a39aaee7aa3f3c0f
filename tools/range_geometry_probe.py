"""Ranges-phase geometry probe: time the ranges-only sweep under a given
``MCMCDATE_RANGE_BUCKETS`` geometry at the bench shape.

Run one geometry per process (the env var is read at module import):

    MCMCDATE_RANGE_BUCKETS=128x8,64x16,16x64,4x256 python tools/range_geometry_probe.py

Prints blocks, padded-grid occupancy, and s/sweep.  Used to pick the
production ``RANGE_BUCKETS`` default; not part of the test suite.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np

import bench
from mcmcdate_tpu.engine import proposals as P
from mcmcdate_tpu.engine.fast_sweep import (
    RANGE_BUCKETS, FastSweeps, _subset_table,
)

NSWEEPS = int(os.environ.get("NSWEEPS", "5"))
REPS = int(os.environ.get("REPS", "2"))


def main():
    model, batch = bench.build()
    table = P.build_proposal_table(model.topo, model.braces, False)
    fast = FastSweeps(model, table)
    plan = fast.plan
    tuning = jnp.ones((bench.N_CHAINS, table.n_proposals), jnp.float32)
    key = jax.random.PRNGKey(0)

    empty_rows = np.zeros(0, np.int32)
    fast.plan = dc.replace(
        plan, specs={}, glob_groups={},
        seq_table=_subset_table(table, empty_rows), seq_rows=empty_rows,
    )
    nblk = sum(s.rows.shape[0] for s in plan.range_specs.values())
    n_tickets = sum(int(s.valid.sum()) for s in plan.range_specs.values())
    rows_used = sum(
        int((s.own >= 0).sum()) for s in plan.range_specs.values()
    )
    rows_grid = sum(
        s.rows.shape[0] * s.own.shape[1] * s.own.shape[2]
        for s in plan.range_specs.values()
    )
    occ = f"{rows_used / rows_grid:.2f}" if rows_grid else "n/a (0 blocks)"
    print(f"geometry {RANGE_BUCKETS}: {nblk} blocks, {n_tickets} tickets, "
          f"occupancy {rows_used}/{rows_grid} = {occ}",
          flush=True)

    run = jax.jit(lambda b, tu, k: fast.sweeps(b, tu, k, NSWEEPS))
    out = run(batch, tuning, key)
    _ = float(np.asarray(out[1])[0])
    t0 = time.perf_counter()
    o = out
    for i in range(REPS):
        o = run(o[0], tuning, jax.random.fold_in(key, i))
    _ = float(np.asarray(o[1])[0])
    t = (time.perf_counter() - t0) / (REPS * NSWEEPS)
    print(f"ranges-only: {t:.3f} s/sweep", flush=True)


if __name__ == "__main__":
    main()
