"""Banded-MVN sweep throughput past the dense ceiling (VERDICT r3 item 4).

PERF.md's "MVN scaling decision" documents where the dense precision stops
winning (~10k taxa: the [D, D] stream per mega-step reaches ~2 ms).  On
this tunnel backend the dense path dies earlier still: the precision ships
as a jaxpr constant, and the remote-compile payload limit (HTTP 413,
PERF.md round-3 negatives) rejects it long before HBM does.  The banded
kind (ops/banded.py) stores O(D w) and evaluates through block-tridiagonal
matmuls, so it scales where dense cannot ship.

This tool measures production FastSweeps s/sweep for the banded kind at a
given taxon count — and, where the payload permits, the dense path at the
SAME precision matrix for a head-to-head.

Usage:
  python tools/banded_scale_bench.py --taxa 5000 --chains 256 [--dense]
         [--bandwidth 128] [--sweeps 4]
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build(n_taxa, n_chains, bandwidth, kind="banded", seed=0,
          dtype=jnp.float32):
    from mcmcdate_tpu.models import DatingModel, init_state
    from mcmcdate_tpu.ops import banded as B
    from mcmcdate_tpu.ops import mvn
    from mcmcdate_tpu.tree import FlatTopology
    from mcmcdate_tpu.utils.simulate import random_ultrametric_tree

    rng = np.random.default_rng(seed)
    tree = random_ultrametric_tree(rng, n_taxa)
    topo = FlatTopology.from_tree(tree)
    k = topo.n - 2
    # Synthetic well-conditioned banded Cholesky in the internal layout
    # (the benchmark measures the compute path, not the statistics —
    # same convention as bench.py's synthetic dense precision).
    w = min(bandwidth, k - 1)
    Lb = rng.normal(size=(k, w + 1)) * (0.3 / np.sqrt(w + 1))
    Lb[:, 0] = rng.uniform(1.5, 2.5, size=k)
    for t in range(1, w + 1):
        Lb[k - t:, t] = 0.0
    log_det = float(-2.0 * np.sum(np.log(Lb[:, 0])))
    mu = rng.uniform(0.05, 0.5, size=k)
    perm = topo.ref_to_internal_perm
    if kind == "banded":
        data = mvn.LikelihoodData.banded(mu, Lb, log_det, perm)
    else:
        # densified twin in reference order
        L = np.zeros((k, k))
        for t in range(w + 1):
            idx = np.arange(k - t)
            L[idx, idx + t] = Lb[: k - t, t]
        P_int = L @ L.T
        iperm = np.argsort(perm)
        data = mvn.LikelihoodData.full(
            mu, P_int[np.ix_(iperm, iperm)], log_det
        )
    model = DatingModel(topo=topo, likelihood=data)
    state = init_state(tree, topo, dtype=dtype)
    batch = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n_chains,) + x.shape), state
    )
    r = rng.gamma(5.0, 0.2, size=(n_chains, topo.n))
    r[:, 0] = 1.0
    batch = batch.replace(rates=jnp.asarray(r, dtype))
    return model, batch


def bench(model, batch, n_chains, sweeps_per_call, repeats=3):
    from mcmcdate_tpu.engine import proposals as P
    from mcmcdate_tpu.engine.fast_sweep import FastSweeps

    t0 = time.time()
    table = P.build_proposal_table(model.topo, model.braces, False)
    fast = FastSweeps(model, table)
    print(f"# plan: {table.n_tickets} tickets, host planning "
          f"{time.time() - t0:.1f}s", flush=True)
    tuning = jnp.ones((n_chains, table.n_proposals), jnp.float32)
    key = jax.random.PRNGKey(0)
    run = jax.jit(lambda b, tu, k2: fast.sweeps(b, tu, k2, sweeps_per_call))
    t0 = time.time()
    out = run(batch, tuning, key)
    _ = float(np.asarray(out[1])[0])
    print(f"# compile+first call {time.time() - t0:.1f}s", flush=True)
    times = []
    o = out
    for rix in range(repeats):
        t0 = time.perf_counter()
        o = run(o[0], tuning, jax.random.fold_in(key, rix))
        _ = float(np.asarray(o[1])[0])
        times.append((time.perf_counter() - t0) / sweeps_per_call)
    assert np.all(np.isfinite(np.asarray(o[1])))
    return table.n_tickets, times


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--taxa", type=int, default=5000)
    ap.add_argument("--chains", type=int, default=256)
    ap.add_argument("--bandwidth", type=int, default=128)
    ap.add_argument("--sweeps", type=int, default=4)
    ap.add_argument("--dense", action="store_true",
                    help="also run the densified twin (payload permitting)")
    args = ap.parse_args()

    model, batch = build(args.taxa, args.chains, args.bandwidth)
    n_tickets, times = bench(model, batch, args.chains, args.sweeps)
    med = float(np.median(times))
    print(json.dumps({
        "metric": f"banded_sweep_s_{args.taxa}taxa_{args.chains}chains",
        "dim": model.likelihood.dim,
        "bandwidth": args.bandwidth,
        "tickets": n_tickets,
        "s_per_sweep_median": round(med, 4),
        "s_per_sweep_all": [round(t, 4) for t in times],
        "proposal_evals_per_sec": round(n_tickets * args.chains / med, 1),
    }), flush=True)

    if args.dense:
        model_d, batch_d = build(args.taxa, args.chains, args.bandwidth,
                                 kind="full")
        n_tickets, times = bench(model_d, batch_d, args.chains, args.sweeps)
        med = float(np.median(times))
        print(json.dumps({
            "metric": f"dense_sweep_s_{args.taxa}taxa_{args.chains}chains",
            "s_per_sweep_median": round(med, 4),
            "s_per_sweep_all": [round(t, 4) for t in times],
        }), flush=True)


if __name__ == "__main__":
    main()
