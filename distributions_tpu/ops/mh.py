"""Metropolis-Hastings mixture sweeps with O(1) per-row cost.

Full collapsed Gibbs scores all C components per row (O(R*C) per sweep —
the reference's design and our sweep_blocked).  For large C the modern
alternative (cf. LightLDA-style stale-proposal samplers) replaces the exact
conditional draw with T Metropolis-Hastings steps per row:

    proposal   q(k) ∝ counts_stale(k) + beta   (row-independent, built once
                                                per tile; inverse-CDF sample
                                                = 1 uniform + log2(C) search)
    acceptance min(1, p(row,k') q(k) / (p(row,k) q(k')))  — posterior scores
               at just the 2 slots involved (gathered coefficients)

Per row per step: ~2 gathered student-t evaluations instead of C, making
sweep cost O(R*T) — C-independent.  The chain targets the same tile-frozen
conditional as sweep_blocked, so the stationary distribution matches
blocked Gibbs (validated against the exact enumerated posterior in
tests/test_mh.py).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from distributions_tpu import mixture as mx
from distributions_tpu import clustering as _cl


def _gather_block_score(block, shared, group, values_row_cols, k):
    """Score one row's values against a single slot k (all ops gathered)."""
    sub = jax.tree_util.tree_map(lambda a: a[k], group)   # [cols]
    per_col = jax.vmap(
        lambda g, v: block.module.score_value(shared, g, v))(
            sub, values_row_cols)
    return jnp.sum(per_col)


def _row_slot_score(spec, cl_model, shareds, state, cl_scores, row, k):
    """Full per-slot log score for one row at slot k."""
    total = cl_scores[k]
    for block, shared, group, v in zip(
            spec.blocks, shareds, state.groups, row):
        total = total + _gather_block_score(block, shared, group, v, k)
    return total


@partial(jax.jit, static_argnums=(0, 6, 7))
def sweep_mh(spec, cl_model, shareds, state, values, assignments, block,
             mh_steps=4, key=None, proposal_beta=1.0):
    """One MH pass: per tile, per row, `mh_steps` stale-proposal MH moves.

    Suff stats are tile-frozen (as in sweep_blocked) and updated by the
    usual one-hot contraction after the tile's rows move.
    """
    R = assignments.shape[0]
    assert R % block == 0
    n_blocks = R // block
    keys = jax.random.split(key, n_blocks)

    tiled_values = tuple(
        jnp.asarray(v).reshape((n_blocks, block) + jnp.asarray(v).shape[1:])
        for v in values)
    row_stats = mx.precompute_row_stats(spec, shareds, values)
    tiled_stats = tuple(
        rs.reshape((n_blocks, block) + rs.shape[1:]) for rs in row_stats)
    tiled_assign = assignments.reshape(n_blocks, block)
    C = spec.capacity

    def step(state, inp):
        tile_vals, tile_stats, tile_assign, tile_key = inp
        cd, tiles = mx.tile_deltas_fast(spec, shareds, tile_stats,
                                        tile_assign)
        state = mx.apply_stat_tiles(spec, shareds, state, cd, tiles, -1,
                                    block)

        cl_scores = _cl.score_value(
            cl_model, state.counts, state.alive, state.sample_size)
        # stale proposal over slots: alive-masked counts + beta
        q = jnp.where(state.alive,
                      state.counts.astype(jnp.float32) + proposal_beta, 0.0)
        cum_q = jnp.cumsum(q)
        total_q = cum_q[-1]
        log_q = jnp.log(jnp.maximum(q, 1e-30)) - jnp.log(total_q)

        def row_score(row, k):
            return _row_slot_score(spec, cl_model, shareds, state,
                                   cl_scores, row, k)

        def mh_row(row, k0, row_key):
            score0 = row_score(row, k0)

            def body(carry, step_key):
                k, score_k = carry
                ku, ka = jax.random.split(step_key)
                u = jax.random.uniform(ku) * total_q
                k_prop = jnp.searchsorted(cum_q, u).astype(jnp.int32)
                k_prop = jnp.clip(k_prop, 0, C - 1)
                score_prop = row_score(row, k_prop)
                log_accept = (score_prop - score_k
                              + log_q[k] - log_q[k_prop])
                accept = jnp.log(jax.random.uniform(ka)) < log_accept
                k_new = jnp.where(accept, k_prop, k)
                s_new = jnp.where(accept, score_prop, score_k)
                return (k_new, s_new), None

            (k_final, _), _ = lax.scan(
                body, (k0, score0), jax.random.split(row_key, mh_steps))
            return k_final

        row_keys = jax.random.split(tile_key, block)
        rows = tuple(v for v in tile_vals)
        new_assign = jax.vmap(
            lambda i: mh_row(tuple(v[i] for v in rows), tile_assign[i],
                             row_keys[i]))(jnp.arange(block))
        new_assign = new_assign.astype(jnp.int32)

        cd, tiles = mx.tile_deltas_fast(spec, shareds, tile_stats,
                                        new_assign)
        state = mx.apply_stat_tiles(spec, shareds, state, cd, tiles, +1,
                                    block)
        return state, new_assign

    state, new_tiled = lax.scan(
        step, state, (tiled_values, tiled_stats, tiled_assign, keys))
    return state, new_tiled.reshape(R)
