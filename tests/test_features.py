"""Feature coverage: calibrations, constraints, braces in the sampling path.

With no likelihood and a single root calibration B(0.8, 1.2), the absolute
time height's marginal is the normalized soft-calibration density — symmetric
around 1.0 (Calibration.hs:369-392) — and the calibrated-only proposals
(height scale, height/rate-mean contrary, slideRootContrarily,
scaleNormAndTreeContrarily on height) must keep it there.  Braced nodes must
stay within a few sd of each other; constrained pairs must honour their
order.
"""

import json

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mcmcdate_tpu.engine import mh, proposals as P
from mcmcdate_tpu.io.specs import (
    load_braces_json,
    load_calibrations_csv,
    load_constraints_csv,
    mean_root_height,
)
from mcmcdate_tpu.models import DatingModel, init_state, is_valid_state
from mcmcdate_tpu.ops import mvn
from mcmcdate_tpu.tree import FlatTopology, parse_newick

EIGHT = ("((((a:0.2,b:0.2):0.3,(c:0.25,d:0.25):0.25):0.3,(e:0.4,f:0.4):0.4):0.2,"
         "(g:0.6,h:0.6):0.4):0.0;")


def _quiet(*a, **k):
    pass


@pytest.fixture(scope="module")
def calibrated_run():
    t = parse_newick(EIGHT)
    topo = FlatTopology.from_tree(t)
    cal = load_calibrations_csv(
        "Name,LeafA,LeafB,Lower,LowerPM,Upper,UpperPM\n"
        "Root,a,h,0.8,0.05,1.2,0.05\n",
        t, topo, is_text=True, log=_quiet,
    )
    con = load_constraints_csv(
        "Name,YoungA,YoungB,OldA,OldB,PM\n"
        "C1,a,b,e,f,0.025\n",  # MRCA(a,b) younger than MRCA(e,f)
        t, topo, is_text=True, log=_quiet,
    )
    br = load_braces_json(
        json.dumps([{
            "braceDataName": "B1",
            "braceDataNodes": [["a", "b"], ["c", "d"]],
            "braceDataStandardDeviation": 0.005,
        }]),
        t, topo, is_text=True, log=_quiet,
    )
    model = DatingModel(
        topo=topo, likelihood=mvn.LikelihoodData.none(),
        calibrations=cal, constraints=con, braces=br,
        mean_root_height=mean_root_height(cal) or 1.0,
    )
    table = P.build_proposal_table(topo, br, calibrations_available=True)
    kern = mh.MHKernel(model, table)
    C = 16
    state = init_state(t, topo, dtype=jnp.float32)
    batch = jax.tree.map(lambda x: jnp.broadcast_to(x, (C,) + x.shape), state)
    r = np.random.default_rng(0).gamma(5.0, 0.2, size=(C, topo.n))
    r[:, 0] = 1.0
    batch = batch.replace(rates=jnp.asarray(r, jnp.float32))
    tuning = jnp.ones((C, table.n_proposals), jnp.float32)
    targets = jnp.asarray(table.target_rates(), jnp.float32)
    tmax = jnp.asarray(table.tune_max(), jnp.float32)

    y_idx = int(cal.node[0])  # root
    b_nodes = [int(x) for x in br.node[0] if x >= 0]

    def collect(s, lp_pr, lp_lik):
        return dict(
            height=s.height,
            young=s.heights[int(con.young[0])],
            old=s.heights[int(con.old[0])],
            b0=s.heights[b_nodes[0]],
            b1=s.heights[b_nodes[1]],
        )

    chunk = jax.jit(lambda b, tu, k: kern.sweeps(b, tu, k, 50, collect=collect))
    tune = jax.jit(
        lambda tu, a, to: mh.tune_step(
            tu, a.astype(jnp.float32), to.astype(jnp.float32), targets,
            tune_max=tmax,
        )
    )
    key = jax.random.PRNGKey(11)
    for _ in range(12):
        key, k = jax.random.split(key)
        batch, _, _, acc, tot, _ = chunk(batch, tuning, k)
        tuning = tune(tuning, acc, tot)
    samples = []
    for _ in range(30):
        key, k = jax.random.split(key)
        batch, _, _, acc, tot, outs = chunk(batch, tuning, k)
        samples.append(jax.tree.map(np.asarray, outs))
    S = {k2: np.concatenate([s[k2].reshape(-1) for s in samples]) for k2 in samples[0]}
    return model, table, batch, S


def test_calibrated_table_has_height_proposals(calibrated_run):
    model, table, batch, S = calibrated_run
    assert any("Time height" in n for n in table.names)
    assert any("slide root" in n for n in table.names)
    assert any("[B]" in n for n in table.names)  # brace proposals present


def test_height_marginal_centered_on_calibration(calibrated_run):
    model, table, batch, S = calibrated_run
    h = S["height"]
    # Soft B(0.8, 1.2) with pm 0.05: symmetric around 1.
    assert abs(h.mean() - 1.0) < 0.05, h.mean()
    assert np.quantile(h, 0.05) > 0.6
    assert np.quantile(h, 0.95) < 1.4
    # The height must actually move (calibrated proposals active).
    assert h.std() > 0.02


def test_constraint_honoured(calibrated_run):
    model, table, batch, S = calibrated_run
    # The constraint is SOFT (one-sided normal tail, sigma = sqrt(2/pi)*pm):
    # small violations are legitimate; large ones are not.
    viol = np.clip(S["young"] - S["old"], 0.0, None)
    frac_violated = float(np.mean(viol > 0))
    assert frac_violated < 0.2, frac_violated
    sigma = 0.7978845608028654 * 0.025
    assert float(np.quantile(viol, 0.99)) < 4 * sigma


def test_brace_ties_heights(calibrated_run):
    model, table, batch, S = calibrated_run
    gap = np.abs(S["b0"] - S["b1"])
    # sd 0.005 on relative heights; the braced pair should stay within a few sd.
    assert np.quantile(gap, 0.9) < 0.05
    assert gap.mean() < 0.02
    # ... while the heights themselves still move.
    assert S["b0"].std() > 0.01


def test_states_remain_valid(calibrated_run):
    model, table, batch, S = calibrated_run
    ok = jax.vmap(lambda s: is_valid_state(s, model.topo))(batch)
    assert bool(np.all(np.asarray(ok)))
