"""Cross-chain ensemble moves along the likelihood fiber.

PERF.md's "GOE deep-backbone bimodality" chain of measurements: per-node
kernels (bold contrary, fiber node-slide) cannot cross the collective
mode gap, and whole-state fiber swaps between chains accept at ~1e-4
because the prior ratio spans every branch of both states.  The remaining
exact collective move is DIFFERENTIAL EVOLUTION along the likelihood
fiber (the DE-MC proposal of ter Braak 2006, run on complementary chain
halves for parallel validity like emcee's red-black stretch move): for a
chain i in the active half, with distinct chains (a, b) drawn uniformly
from the frozen complementary half and a step size ``gamma``,

    h'   = h_i + gamma (h_a - h_b)        (relative node heights)
    r'_j = r_j t_j / t'_j                 (every time x rate held fixed)

Root and leaf heights are pinned identically in every chain, so
``h_a - h_b`` vanishes there and ``h'`` stays a valid height vector
whenever every proposed branch span ``t'_j`` is positive (checked; else
reject).  All expected-substitution branch lengths are unchanged, so the
MVN likelihood is EXACTLY invariant and never evaluated.  The move is a
deterministic diffeomorphism of (h, r); the reverse proposal draws the
same pair as (b, a) with equal probability, so the Hastings ratio is the
prior delta plus the rate-map Jacobian ``sum_j log(t_j / t'_j)`` over the
non-root branches (the height shift is volume-preserving).

When a and b sit in different posterior modes, ``h_a - h_b`` IS the
collective mode-gap vector, so ``gamma ~ 1`` transports the active chain
across the gap in ONE step — exactly the move no per-node kernel can
make.  Cross-mode feasibility is measured by tools/goe_de_probe.py on
saved flagship states before this kernel is enabled (PERF.md records the
acceptance distribution).

Validity: chains are updated one fixed half at a time; each active
chain's proposal depends only on its own state, fresh randomness, and
the FROZEN complementary half, so each half-update is a valid MCMC move
on the product ensemble (Goodman & Weare 2010's argument for parallel
ensemble samplers applies unchanged), and the two half-updates compose.

Reference provenance: the reference has no ensemble moves at all (one
chain, app/Main.hs:444-456); this subsystem exists because running
hundreds of vmapped chains per chip makes ensemble information free.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["make_fiber_de"]


def make_fiber_de(model, dtype, jump_p: float = 0.2,
                  gamma_jump: float = 1.0, gamma_jitter: float = 0.1):
    """Build the jittable red-black fiber-DE round.

    Returns ``move(batch, key) -> (batch, acc_rate)`` where ``batch`` is a
    chain-batched State ``[C, ...]`` (C >= 4) and ``acc_rate`` is the
    scalar acceptance fraction over both half-updates.

    Each proposal draws its step size from ter Braak's standard mixture:
    with probability ``jump_p`` the mode-jump ``gamma_jump`` (~1, so a
    cross-mode donor pair maps the chain onto the other mode), otherwise
    the within-mode optimal ``2.38 / sqrt(2 d)`` with ``d`` the number of
    free height coordinates — small steps keep healthy acceptance when
    the ensemble is dispersed (a full-difference step from an
    unequilibrated ensemble almost always violates the height ordering
    and auto-rejects; measured in tests/test_fiber_de.py).  Both are
    jittered multiplicatively by ``exp(gamma_jitter * N(0,1))`` so the
    move is not confined to an exact difference lattice.
    """
    parent = jnp.asarray(model.topo.parent)
    lp_fn = jax.vmap(model.log_prior)
    n_free = max(int(np.sum(~np.asarray(model.topo.is_leaf))) - 1, 1)
    gamma_small = 2.38 / np.sqrt(2.0 * n_free)

    def half_update(batch, key, act, oth):
        """One half-update: ``act``/``oth`` are static index arrays of the
        active and frozen complementary halves."""
        k_a, k_b, k_g, k_j, k_u = jax.random.split(key, 5)
        m = act.shape[0]
        n_oth = oth.shape[0]
        a = jax.random.randint(k_a, (m,), 0, n_oth)
        b0 = jax.random.randint(k_b, (m,), 0, n_oth - 1)
        b = jnp.where(b0 >= a, b0 + 1, b0)  # b != a, still uniform
        ha = batch.heights[oth[a]]
        hb = batch.heights[oth[b]]
        base = jnp.where(jax.random.bernoulli(k_j, jump_p, (m,)),
                         jnp.asarray(gamma_jump, dtype),
                         jnp.asarray(gamma_small, dtype))
        g = (base * jnp.exp(
            gamma_jitter * jax.random.normal(k_g, (m,), dtype)
        ))[:, None]
        h0 = batch.heights[act]
        r0 = batch.rates[act]
        hp = h0 + g * (ha - hb)

        t0 = h0[:, parent] - h0  # entry 0 (root; parent -1) is garbage
        t1 = hp[:, parent] - hp
        eps = jnp.asarray(1e-7, dtype)
        # Valid whenever every non-root branch keeps a positive span.
        # Leaf rows have t > 0 automatically when their parents do; root
        # and leaf heights are pinned (h_a - h_b = 0 there).
        valid = jnp.all(t1[:, 1:] > eps, axis=1)
        safe = jnp.where(t1 > eps, t1, jnp.ones_like(t1))
        ratio = jnp.where(t1 > eps, t0 / safe, jnp.ones_like(t1))
        ratio = ratio.at[:, 0].set(1.0)  # stem rate entry is unused
        rp = r0 * ratio
        log_jac = jnp.sum(jnp.log(jnp.where(t1[:, 1:] > eps,
                                            ratio[:, 1:],
                                            jnp.ones_like(ratio[:, 1:]))),
                          axis=1)

        cur = jax.tree.map(lambda x: x[act], batch)
        prop = dataclasses.replace(cur, heights=hp, rates=rp)
        dlp = lp_fn(prop) - lp_fn(cur) + log_jac
        accept = valid & (
            jnp.log(jax.random.uniform(k_u, (m,), dtype,
                                       minval=jnp.finfo(dtype).tiny))
            < dlp
        )
        h_new = jnp.where(accept[:, None], hp, h0)
        r_new = jnp.where(accept[:, None], rp, r0)
        batch = batch.replace(
            heights=batch.heights.at[act].set(h_new),
            rates=batch.rates.at[act].set(r_new),
        )
        return batch, jnp.sum(accept), jnp.asarray(m)

    def move(batch, key):
        C = batch.heights.shape[0]
        half_a = jnp.arange(0, C // 2)
        half_b = jnp.arange(C // 2, C)
        k1, k2 = jax.random.split(key)
        batch, acc1, tot1 = half_update(batch, k1, half_a, half_b)
        batch, acc2, tot2 = half_update(batch, k2, half_b, half_a)
        rate = (acc1 + acc2) / jnp.maximum(tot1 + tot2, 1)
        return batch, rate.astype(dtype)

    return move
