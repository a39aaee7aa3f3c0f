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
    extra_arrays: Optional[dict] = None,
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
    if extra_arrays:
        arrays.update({k: np.asarray(v) for k, v in extra_arrays.items()})
    path = os.path.join(out_dir, checkpoint_file(analysis_name))
    np.savez_compressed(path, **arrays)
    meta = {
        "format_version": FORMAT_VERSION,
        "iteration": int(iteration),
        "n_proposals": int(n_proposals),
        "dtype": str(np.asarray(state.heights).dtype),
    }
    if extra:
        meta.update(extra)
    with open(os.path.join(out_dir, meta_file(analysis_name)), "w") as fh:
        json.dump(meta, fh)


def load(analysis_name: str, dtype=None, in_dir: str = "."):
    """Returns (state, tuning, key, meta).

    ``dtype=None`` restores the precision the run was saved with (recorded
    in the JSON sidecar; falls back to the npz array dtype for pre-v2
    checkpoints), so continuing an f64 run never silently downcasts.
    """
    path = os.path.join(in_dir, checkpoint_file(analysis_name))
    with open(os.path.join(in_dir, meta_file(analysis_name))) as fh:
        meta = json.load(fh)
    with np.load(path) as z:
        if dtype is None:
            dtype = np.dtype(meta.get("dtype", str(z["heights"].dtype)))
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
    return state, tuning, key, meta


def load_arrays(analysis_name: str, names, in_dir: str = ".") -> dict:
    """Fetch extra saved arrays (e.g. NUTS adaptation state) by name."""
    path = os.path.join(in_dir, checkpoint_file(analysis_name))
    with np.load(path) as z:
        return {n: np.asarray(z[n]) for n in names if n in z.files}
