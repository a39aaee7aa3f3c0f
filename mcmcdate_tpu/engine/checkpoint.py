"""Chain checkpointing: save/resume with tuning parameters.

Replaces the reference engine's ``Save`` setting and
``mhgLoad``/``settingsLoad``/``mhgLoadUnsafe`` (app/Main.hs:420-440,494-509):
the full sampler state (state batch, per-chain tuning, RNG key, iteration
counter) is written as ``<analysis>.mcmc.npz`` plus a JSON sidecar with the
cycle shape, so ``continue`` resumes exactly and ``--init-from-save`` can
warm-start a new analysis (tuning is reused iff the proposal cycle shape
matches, app/Main.hs:434-440).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models.state import State

FORMAT_VERSION = 1


def checkpoint_file(analysis_name: str) -> str:
    return analysis_name + ".mcmc.npz"


def meta_file(analysis_name: str) -> str:
    return analysis_name + ".mcmc.json"


def save(
    analysis_name: str,
    state: State,
    tuning,
    key,
    iteration: int,
    n_proposals: int,
    out_dir: str = ".",
    extra: Optional[dict] = None,
):
    arrays = {
        "birth": np.asarray(state.birth),
        "death": np.asarray(state.death),
        "height": np.asarray(state.height),
        "heights": np.asarray(state.heights),
        "rate_mean": np.asarray(state.rate_mean),
        "rate_var": np.asarray(state.rate_var),
        "rates": np.asarray(state.rates),
        "tuning": np.asarray(tuning),
        "key": np.asarray(key),
    }
    path = os.path.join(out_dir, checkpoint_file(analysis_name))
    np.savez_compressed(path, **arrays)
    meta = {
        "format_version": FORMAT_VERSION,
        "iteration": int(iteration),
        "n_proposals": int(n_proposals),
    }
    if extra:
        meta.update(extra)
    with open(os.path.join(out_dir, meta_file(analysis_name)), "w") as fh:
        json.dump(meta, fh)


def load(analysis_name: str, dtype=jnp.float32, in_dir: str = "."):
    """Returns (state, tuning, key, meta)."""
    path = os.path.join(in_dir, checkpoint_file(analysis_name))
    with np.load(path) as z:
        state = State(
            birth=jnp.asarray(z["birth"], dtype),
            death=jnp.asarray(z["death"], dtype),
            height=jnp.asarray(z["height"], dtype),
            heights=jnp.asarray(z["heights"], dtype),
            rate_mean=jnp.asarray(z["rate_mean"], dtype),
            rate_var=jnp.asarray(z["rate_var"], dtype),
            rates=jnp.asarray(z["rates"], dtype),
        )
        tuning = jnp.asarray(z["tuning"], dtype)
        key = jnp.asarray(z["key"])
    with open(os.path.join(in_dir, meta_file(analysis_name))) as fh:
        meta = json.load(fh)
    return state, tuning, key, meta
