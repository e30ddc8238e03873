"""Split on-device sweep time into kernel vs bookkeeping at bench shapes.

Times three variants, each as ONE device program scanning 10 reps so the
~87ms launch overhead amortizes:
  A) full fused sweep        (gibbs.run_sweeps_pallas_fused)
  B) kernel only: 64 blocks of fused_score_sample_stats with FROZEN coeffs
  C) bookkeeping only: the per-block [C]-sized stat/coeff math, no kernel
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from distributions_tpu import clustering, mixture as mx
from distributions_tpu.models import nich
from distributions_tpu.ops import gibbs, pallas_kernels as pk

assert jax.devices()[0].platform != 'cpu'

import os
R, C, REPS = 1048576, 1024, 10
BLOCK = int(os.environ.get('BLOCK', 131072))
BR = int(os.environ.get('BR', 2048))
rng = np.random.RandomState(0)
spec = mx.make_spec([(nich, 2)], capacity=C, empties=1)
cl = clustering.PitmanYor.from_dict({'alpha': 100.0, 'd': 0.1})
shareds = (nich.shared_from_dict(
    {'mu': 0., 'kappa': 0.1, 'sigmasq': 0.01, 'nu': 1.}),)
centers = rng.randn(C - 8, 2).astype(np.float32)
labels = rng.randint(0, C - 8, R)
X = centers[labels] + 0.1 * rng.randn(R, 2).astype(np.float32)
values = (jnp.asarray(X, jnp.float32),)
assignments = jnp.asarray(labels, jnp.int32)
state = mx.state_from_assignments(spec, cl, shareds, values, assignments)
cache = gibbs.build_stat_cache(spec, shareds, values, BLOCK, assignments)
key = jax.random.PRNGKey(0)
n_blocks = R // BLOCK
tiled_values = jnp.concatenate(values, axis=1).reshape(n_blocks, BLOCK, 2)
col_groups = (2,)


def timeit(name, fn, *args):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # sync
    t0 = time.time()
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    dt = (time.time() - t0) / REPS
    print('%-16s %7.2f ms/sweep  (%.3gs total)' % (name, dt * 1e3, dt * REPS),
          flush=True)
    return dt


# A) full sweep x REPS
def full(st, an, ca, k):
    return gibbs.run_sweeps_pallas_fused(
        spec, cl, shareds, st, values, an, BLOCK, BR, k, ca, REPS)

timeit('full', jax.jit(full, static_argnums=()), state, assignments,
       cache, key)


# B) kernel only: frozen coeffs, scan over 64 blocks x REPS sweeps
cl_scores0 = clustering.score_value(cl, state.counts, state.alive,
                                    state.sample_size)
coeffs0 = jnp.concatenate(
    [pk.nich_coeffs_v2(sh, g) for sh, g in zip(shareds, state.groups)], 0)


@jax.jit
def kernel_only(cl_scores, coeffs, seed0):
    def sweep(carry, s0):
        def step(carry, inp):
            tile_vals, seed = inp
            an, sums = pk.fused_score_sample_stats(
                seed, tile_vals, cl_scores, coeffs, col_groups,
                block_rows=BR)
            return carry + jnp.sum(sums[0, :1]), an
        seeds = s0 + jnp.arange(n_blocks, dtype=jnp.int32)
        c, ans = lax.scan(step, carry, (tiled_values, seeds))
        return c, None
    c, _ = lax.scan(sweep, 0.0, seed0 + jnp.arange(REPS, dtype=jnp.int32))
    return c

timeit('kernel_only', kernel_only, cl_scores0, coeffs0, jnp.int32(7))


# C) bookkeeping only: per-block state update + coeff recompute, no kernel
@jax.jit
def book_only(st, ca):
    cached_cd, cached_sums = ca

    def sweep(st, _):
        def step(st, inp):
            cd, sums = inp
            tiles = mx.sums_to_tiles(spec, shareds, sums)
            st = mx.apply_stat_tiles(spec, shareds, st, cd, tiles, -1, BLOCK)
            cl_scores = clustering.score_value(
                cl, st.counts, st.alive, st.sample_size)
            coeffs = jnp.concatenate(
                [pk.nich_coeffs_v2(sh, g)
                 for sh, g in zip(shareds, st.groups)], 0)
            tiles = mx.sums_to_tiles(spec, shareds, sums)
            st = mx.apply_stat_tiles(spec, shareds, st, cd, tiles, +1, BLOCK)
            # fold coeffs into carry so nothing is dead-code-eliminated
            st = st._replace(counts=st.counts +
                             (coeffs[0, :1] * 0).astype(st.counts.dtype))
            return st, None
        st, _ = lax.scan(step, st, (cached_cd, cached_sums))
        return st, None
    st, _ = lax.scan(sweep, st, None, length=REPS)
    return st

timeit('book_only', book_only, state, cache)
