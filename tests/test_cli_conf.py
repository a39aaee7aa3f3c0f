"""CLI parsing extensions and checkpoint robustness (host-only, fast).

Covers the reference's scripts/run model codes (scripts/run:108-147), the
analysis.conf model keys, atomic checkpoint writes (tmp + rename), the
trace sidecar round-trip, and the tail-ESS diagnostic.
"""

import os

import numpy as np
import pytest

from mcmcdate_tpu.cli import (
    _parse_clock,
    _parse_likelihood_spec,
    build_parser,
    _apply_conf,
)
from mcmcdate_tpu.ops import clocks, mvn


def test_likelihood_spec_short_codes():
    assert _parse_likelihood_spec("f")[0] == mvn.FULL
    assert _parse_likelihood_spec("s 0.2") == (mvn.SPARSE, 0.2)
    assert _parse_likelihood_spec("u")[0] == mvn.UNIVARIATE
    assert _parse_likelihood_spec("n")[0] == mvn.NONE
    # Reference constructor spellings still work.
    assert _parse_likelihood_spec("SparseMultivariateNormal 0.1") == (
        mvn.SPARSE, 0.1)


def test_clock_short_codes():
    assert _parse_clock("ug") == clocks.UNCORRELATED_GAMMA
    assert _parse_clock("ul") == clocks.UNCORRELATED_LOG_NORMAL
    assert _parse_clock("uw") == clocks.UNCORRELATED_WHITE_NOISE
    assert _parse_clock("al") == clocks.AUTOCORRELATED_LOG_NORMAL
    with pytest.raises(SystemExit):
        _parse_clock("xx")


def test_conf_model_keys_and_suffix(tmp_path):
    conf = tmp_path / "analysis.conf"
    conf.write_text(
        'analysis_name="t1"\n'
        'rooted_tree="data/time.tree"\n'
        'trees="data/trees.nwk"\n'
        'likelihood_spec="s 0.1"\n'
        'relaxed_molecular_clock="ul"\n'
        'suffix="x1"\n'
    )
    args = build_parser().parse_args(
        ["run", "--analysis-conf", str(conf)])
    _apply_conf(args)
    assert args.analysis_name == "t1-x1"
    assert args.likelihood_spec == "s 0.1"
    assert args.relaxed_molecular_clock == "ul"
    # CLI flags win over conf keys.
    args = build_parser().parse_args(
        ["run", "--analysis-conf", str(conf), "--likelihood-spec", "full",
         "--relaxed-molecular-clock", "ug", "-a", "cli-name"])
    _apply_conf(args)
    assert args.likelihood_spec == "full"
    assert args.relaxed_molecular_clock == "ug"
    assert args.analysis_name == "cli-name-x1"


def test_missing_likelihood_spec_exits(tmp_path):
    """`prepare` requires the spec; `run` (etc.) defaults it from the kind
    recorded in the .data file, so only prepare exits without it."""
    conf = tmp_path / "analysis.conf"
    conf.write_text('analysis_name="t1"\nrooted_tree="t.tree"\n'
                    'trees="t.nwk"\n')
    from mcmcdate_tpu.cli import main

    with pytest.raises(SystemExit):
        main(["prepare", "--analysis-conf", str(conf)])


# -- checkpoint robustness -------------------------------------------------


def _tiny_state():
    import jax.numpy as jnp

    from mcmcdate_tpu.models.state import State

    return State(
        birth=jnp.ones(3), death=jnp.ones(3), height=jnp.ones(3),
        heights=jnp.ones((3, 5)), rate_mean=jnp.ones(3),
        rate_var=jnp.ones(3), rates=jnp.ones((3, 5)),
    )


def test_checkpoint_atomic_write(tmp_path):
    """A stale torn tmp file never shadows the good checkpoint, and saving
    leaves no tmp files behind (crash mid-write keeps the previous save)."""
    import jax

    from mcmcdate_tpu.engine import checkpoint as ckpt

    st = _tiny_state()
    key = jax.random.PRNGKey(0)
    ckpt.save("an", st, np.ones((3, 4)), key, 100, 4, out_dir=str(tmp_path))
    # Simulate a crash mid-overwrite: a torn tmp file appears.
    torn = tmp_path / (ckpt.checkpoint_file("an") + ".tmp")
    torn.write_bytes(b"garbage")
    state, tuning, k2, meta = ckpt.load("an", in_dir=str(tmp_path))
    assert meta["iteration"] == 100
    assert np.asarray(state.heights).shape == (3, 5)
    ckpt.save("an", st, np.ones((3, 4)), key, 200, 4, out_dir=str(tmp_path))
    _, _, _, meta = ckpt.load("an", in_dir=str(tmp_path))
    assert meta["iteration"] == 200
    leftovers = [f for f in os.listdir(tmp_path) if f.endswith(".tmp")]
    assert not leftovers


def test_trace_sidecar_roundtrip(tmp_path):
    from mcmcdate_tpu.engine import checkpoint as ckpt

    draws = {
        "height": np.random.default_rng(0).normal(size=(50, 4)),
        "age[root]": np.random.default_rng(1).normal(size=(50, 4)),
    }
    assert ckpt.load_trace("an", in_dir=str(tmp_path)) is None
    ckpt.save_trace("an", draws, out_dir=str(tmp_path))
    back = ckpt.load_trace("an", in_dir=str(tmp_path))
    assert set(back) == set(draws)
    np.testing.assert_allclose(back["height"], draws["height"], rtol=1e-6)


# -- diagnostics -----------------------------------------------------------


def test_tail_ess_sane():
    from mcmcdate_tpu.engine.diagnostics import ess, ess_tail

    rng = np.random.default_rng(0)
    iid = rng.normal(size=(2000, 4))
    t = ess_tail(iid)
    # Tail ESS of iid draws is the same order as the draw count.
    assert 2000 < t < 16000
    # AR(1)-correlated draws have materially lower tail ESS.
    x = np.zeros((2000, 4))
    eps = rng.normal(size=(2000, 4))
    for i in range(1, 2000):
        x[i] = 0.95 * x[i - 1] + eps[i]
    assert ess_tail(x) < 0.25 * t
    assert ess(x) < 0.25 * 8000


def test_summarize_includes_tail_ess():
    from mcmcdate_tpu.engine.diagnostics import summarize

    rng = np.random.default_rng(0)
    out = summarize({"a": rng.normal(size=(500, 4))}, log=lambda *a: None)
    assert "ess_tail" in out["a"]
    assert out["a"]["ess_tail"] > 100
