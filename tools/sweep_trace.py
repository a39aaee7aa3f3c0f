"""Capture a JAX profiler trace of one full batched sweep at the bench
shape and aggregate device-op durations by op name prefix.

Usage: python tools/sweep_trace.py [outdir]
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from mcmcdate_tpu.engine import proposals as P
from mcmcdate_tpu.engine.fast_sweep import FastSweeps


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sweep_trace"
    model, batch = bench.build()
    table = P.build_proposal_table(model.topo, model.braces, False)
    fast = FastSweeps(model, table)
    tuning = jnp.ones((bench.N_CHAINS, table.n_proposals), jnp.float32)
    key = jax.random.PRNGKey(0)
    n_sw = int(os.environ.get("TRACE_SWEEPS", "10"))
    run = jax.jit(lambda b, tu, k: fast.sweeps(b, tu, k, n_sw))
    out = run(batch, tuning, key)
    _ = float(np.asarray(out[1])[0])
    with jax.profiler.trace(outdir):
        o = run(out[0], tuning, jax.random.fold_in(key, 7))
        _ = float(np.asarray(o[1])[0])
    print("trace written to", outdir)

    # Aggregate device events from the trace proto (xplane.pb) if present.
    files = glob.glob(outdir + "/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace.json.gz found; inspect with tensorboard")
        return
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)
    per = defaultdict(float)
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pid_name = ev.get("pid")
        name = ev.get("name", "")
        dur = ev.get("dur", 0) / 1e6  # us -> s
        # keep device (TPU) lanes only: heuristics on name
        args = ev.get("args") or {}
        if "run_id" in args or name.startswith("jit_"):
            continue
        per[name.split(".")[0]] += dur
        total += dur
    top = sorted(per.items(), key=lambda kv: -kv[1])[:40]
    for name, dur in top:
        print(f"{dur*1e3:9.2f} ms  {name}")
    print(f"{total*1e3:9.2f} ms  TOTAL (all lanes; includes overlap)")


if __name__ == "__main__":
    main()
