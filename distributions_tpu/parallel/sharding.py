"""Sharded collapsed-Gibbs sweeps over a device mesh.

The reference is single-core (reference SURVEY §2.4: SIMD only, no
distribution of any kind); the scaling dimensions natural to this workload
are implemented here TPU-natively with `jax.sharding` + `shard_map`:

- **Row (data) sharding** — partition the R observations over the mesh's
  'rows' axis; each device scores and reassigns its rows against all C
  components.  Suff-stat deltas are additive (mixture.tile_deltas), so one
  `psum` per tile keeps the replicated state consistent — the collective
  rides ICI.
- **Component sharding** — for very large C, score columns are computed on
  the component-sharded state; the categorical draw needs a row-wise argmax
  over all C, expressed as a gumbel-max: each shard draws local
  gumbel-perturbed maxima and a single `pmax`-style reduction picks the
  winner (layout-independent because keys are counter-based per (row, slot)).
- **Chain parallelism** — independent MCMC chains via vmap/pmap over keys;
  see inference/.

Reproducibility contract: all randomness derives from counter-based
`jax.random` keys folded with global row indices, so results are identical
under any sharding layout (replacing the reference's single sequential
global_rng, src/random.cc:33).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from distributions_tpu import mixture as mx
from distributions_tpu.random import sample_from_scores

ROWS = 'rows'


def make_mesh(devices=None, axis_name=ROWS):
    """1-D mesh over all (or the given) devices, named 'rows'."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def sharded_sweep_blocked(spec, cl_model, shareds, state, values,
                          assignments, key, mesh, block):
    """One blocked-Gibbs pass with rows sharded over `mesh`'s 'rows' axis.

    Per tile step, every device:
      1. removes its local tile (additive deltas psum'd over 'rows'),
      2. scores its [block, C] rows against the tile-frozen replicated
         state,
      3. draws new assignments with per-row counter-based keys,
      4. adds its local tile back (deltas psum'd).

    The effective global block size is block * n_devices.  State (counts +
    group stats, O(C) memory) is replicated; values/assignments are sharded.
    R must be divisible by n_devices * block.
    """
    n_dev = mesh.devices.size
    R = assignments.shape[0]
    assert R % (n_dev * block) == 0, (
        'pad rows to a multiple of devices*block')

    values = tuple(jnp.asarray(v) for v in values)
    in_specs = (
        tuple(P(ROWS) for _ in values),  # values sharded by rows
        P(ROWS),                          # assignments
        P(),                              # state (replicated)
    )
    out_specs = (P(), P(ROWS))

    @partial(shard_map, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
             check_vma=False)
    def run(values_shard, assign_shard, state):
        local_R = assign_shard.shape[0]
        n_tiles = local_R // block
        shard_idx = lax.axis_index(ROWS)

        tiled_values = tuple(
            v.reshape((n_tiles, block) + v.shape[1:])
            for v in values_shard)
        tiled_assign = assign_shard.reshape(n_tiles, block)
        # global row index of each local row: layout-independent keys
        global_rows = (shard_idx * local_R
                       + jnp.arange(local_R, dtype=jnp.uint32)).reshape(
                           n_tiles, block)

        def step(state, inp):
            tile_vals, tile_assign, tile_rows = inp
            # 1. remove local tiles everywhere (one psum per leaf)
            cd, tiles = mx.tile_deltas(spec, shareds, tile_vals, tile_assign)
            cd = lax.psum(cd, ROWS)
            tiles = lax.psum(tiles, ROWS)
            n_removed = block * lax.psum(1, ROWS)
            state = mx.apply_tile_deltas(
                spec, shareds, state, cd, tiles, -1, n_removed)

            # 2. score local rows against frozen state
            scores = mx.score_batch(
                spec, cl_model, shareds, state, tile_vals)  # [B, C]

            # 3. per-row counter-based keys -> layout-independent draws
            row_keys = jax.vmap(
                lambda r: jax.random.fold_in(key, r))(tile_rows)
            new_assign = jax.vmap(sample_from_scores)(
                row_keys, scores).astype(jnp.int32)

            # 4. add local tiles back
            cd, tiles = mx.tile_deltas(spec, shareds, tile_vals, new_assign)
            cd = lax.psum(cd, ROWS)
            tiles = lax.psum(tiles, ROWS)
            state = mx.apply_tile_deltas(
                spec, shareds, state, cd, tiles, +1, n_removed)
            return state, new_assign

        state, new_tiled = lax.scan(
            step, state, (tiled_values, tiled_assign, global_rows))
        return state, new_tiled.reshape(local_R)

    return run(values, assignments, state)


def sharded_score_data(spec, cl_model, shareds, state, mesh=None):
    """score_data on the replicated state (no collective needed — state is
    replicated; kept for API symmetry)."""
    return mx.score_data(spec, cl_model, shareds, state)


def sharded_state_from_assignments(spec, cl_model, shareds, values,
                                   assignments, mesh):
    """Build the replicated state from row-sharded (values, assignments)
    with one psum."""
    values = tuple(jnp.asarray(v) for v in values)
    in_specs = (tuple(P(ROWS) for _ in values), P(ROWS))

    @partial(shard_map, mesh=mesh, in_specs=in_specs, out_specs=P(),
             check_vma=False)
    def run(values_shard, assign_shard):
        cd, tiles = mx.tile_deltas(spec, shareds, values_shard, assign_shard)
        cd = lax.psum(cd, ROWS)
        tiles = lax.psum(tiles, ROWS)
        n = assign_shard.shape[0] * lax.psum(1, ROWS)
        empty = mx.init(spec, shareds)
        return mx.apply_tile_deltas(spec, shareds, empty, cd, tiles, +1, n)

    return run(values, assignments)
