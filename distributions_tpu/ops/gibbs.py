"""Collapsed-Gibbs sweep kernels over a mixture state.

The reference's hot loop (examples/mixture/main.py:236-244: per row,
remove_value -> score_value over all groups -> sample_from_scores ->
add_value, crossing python/Cython/C++ per call) becomes two device-resident
kernels:

- `sweep_sequential` — lax.scan over rows; exact collapsed-Gibbs semantics
  (row i is reassigned against suff stats reflecting rows 0..i-1 of this
  sweep).  Latency-bound but bitwise-faithful to the reference algorithm.

- `sweep_blocked` — rows in tiles of size B; scores for a whole tile are
  computed against tile-frozen suff stats, all B rows are reassigned at
  once (one [B, C] fused score + categorical kernel feeding the MXU/VPU),
  then suff stats are updated by segment sums.  This is blocked/"SAME"-style
  Gibbs (see PAPERS.md: Daniely et al. 1409.5402, Williamson et al.
  1211.7120); B=1 recovers the sequential algorithm.  Posterior correctness
  is validated statistically (tests/test_gibbs.py) rather than bitwise.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from distributions_tpu import mixture as mx
from distributions_tpu.random import sample_from_scores


@partial(jax.jit, static_argnums=(0,))
def sweep_sequential(spec, cl_model, shareds, state, values, assignments,
                     key):
    """One full pass of exact collapsed Gibbs over all rows.

    values: tuple of per-block [R, cols] arrays; assignments: [R] int32.
    Returns (state, assignments).
    """
    R = assignments.shape[0]
    keys = jax.random.split(key, R)

    def step(carry, inp):
        state, assignments = carry
        i, step_key = inp
        row = tuple(jnp.asarray(v)[i] for v in values)
        k_old = assignments[i]
        state, _ = mx.remove_value(spec, cl_model, shareds, state, k_old, row)
        scores = mx.score_value(spec, cl_model, shareds, state, row)
        k_new = sample_from_scores(step_key, scores)
        state, _ = mx.add_value(spec, cl_model, shareds, state, k_new, row)
        return (state, assignments.at[i].set(k_new.astype(jnp.int32))), None

    (state, assignments), _ = lax.scan(
        step, (state, assignments),
        (jnp.arange(R, dtype=jnp.int32), keys))
    return state, assignments


@partial(jax.jit, static_argnums=(0, 6))
def sweep_blocked(spec, cl_model, shareds, state, values, assignments, block,
                  key=None):
    """One full pass of blocked collapsed Gibbs with tile size `block`.

    R must be a multiple of `block` (pad rows to a multiple and carry a
    mask upstream if needed).

    Fast path: per-row statistic columns are precomputed once for the whole
    dataset; each tile's suff-stat update is then one [C, B] x [B, cols*S]
    one-hot contraction (MXU) instead of per-leaf scatters.
    """
    R = assignments.shape[0]
    assert R % block == 0, 'pad rows to a multiple of the block size'
    n_blocks = R // block
    keys = jax.random.split(key, n_blocks)

    # reshape rows into [n_blocks, block, ...]
    tiled_values = tuple(
        jnp.asarray(v).reshape((n_blocks, block) + jnp.asarray(v).shape[1:])
        for v in values)
    tiled_assign = assignments.reshape(n_blocks, block)
    fast = mx.supports_row_stats(spec)

    if fast:
        row_stats = mx.precompute_row_stats(spec, shareds, values)
        tiled_stats = tuple(
            rs.reshape((n_blocks, block) + rs.shape[1:]) for rs in row_stats)

        def step(state, inp):
            tile_vals, tile_stats, tile_assign, step_key = inp
            cd, tiles = mx.tile_deltas_fast(
                spec, shareds, tile_stats, tile_assign)
            state = mx.apply_stat_tiles(
                spec, shareds, state, cd, tiles, -1, block)
            scores = mx.score_batch(
                spec, cl_model, shareds, state, tile_vals)   # [B, C]
            new_assign = sample_from_scores(
                step_key, scores).astype(jnp.int32)
            cd, tiles = mx.tile_deltas_fast(
                spec, shareds, tile_stats, new_assign)
            state = mx.apply_stat_tiles(
                spec, shareds, state, cd, tiles, +1, block)
            return state, new_assign

        state, new_tiled = lax.scan(
            step, state, (tiled_values, tiled_stats, tiled_assign, keys))
        return state, new_tiled.reshape(R)

    def step(state, inp):
        tile_vals, tile_assign, step_key = inp
        state = mx.remove_tile(
            spec, cl_model, shareds, state, tile_vals, tile_assign)
        scores = mx.score_batch(
            spec, cl_model, shareds, state, tile_vals)      # [B, C]
        new_assign = sample_from_scores(step_key, scores).astype(jnp.int32)
        state = mx.add_tile(
            spec, cl_model, shareds, state, tile_vals, new_assign)
        return state, new_assign

    state, new_tiled = lax.scan(
        step, state, (tiled_values, tiled_assign, keys))
    return state, new_tiled.reshape(R)


@partial(jax.jit, static_argnums=(0, 6, 7, 9))
def sweep_blocked_pallas(spec, cl_model, shareds, state, values, assignments,
                         block, block_rows=256, key=None,
                         compute_dtype=jnp.float32):
    """Blocked collapsed-Gibbs sweep with the fused Pallas score+sample
    kernel (ops/pallas_kernels.py) — currently for all-nich specs.

    Matches sweep_blocked in distribution; uses the TPU-core PRNG, so draws
    differ bitwise from the XLA path."""
    from distributions_tpu.ops import pallas_kernels as pk
    from distributions_tpu import clustering as _cl

    assert pk.supports_pallas(spec), 'pallas sweep requires nich blocks'
    R = assignments.shape[0]
    assert R % block == 0
    n_blocks = R // block
    keys = jax.random.split(key, n_blocks)
    seeds = jax.vmap(
        lambda k: jax.random.key_data(k)[-1].astype(jnp.int32))(keys)

    values_cat = jnp.concatenate(
        [jnp.asarray(v) for v in values], axis=1)     # [R, total_cols]
    tiled_values = values_cat.reshape(n_blocks, block, -1)
    row_stats = mx.precompute_row_stats(spec, shareds, values)
    tiled_stats = tuple(
        rs.reshape((n_blocks, block) + rs.shape[1:]) for rs in row_stats)
    tiled_assign = assignments.reshape(n_blocks, block)

    def step(state, inp):
        tile_vals, tile_stats, tile_assign, seed = inp
        cd, tiles = mx.tile_deltas_fast(
            spec, shareds, tile_stats, tile_assign)
        state = mx.apply_stat_tiles(
            spec, shareds, state, cd, tiles, -1, block)

        cl_scores = _cl.score_value(
            cl_model, state.counts, state.alive, state.sample_size)
        coeffs = jnp.concatenate(
            [pk.nich_coeffs(shared, group)
             for shared, group in zip(shareds, state.groups)], axis=0)
        new_assign = pk.nich_score_sample(
            seed, tile_vals, cl_scores, coeffs, block_rows=block_rows,
            compute_dtype=compute_dtype)

        cd, tiles = mx.tile_deltas_fast(
            spec, shareds, tile_stats, new_assign)
        state = mx.apply_stat_tiles(
            spec, shareds, state, cd, tiles, +1, block)
        return state, new_assign

    state, new_tiled = lax.scan(
        step, state, (tiled_values, tiled_stats, tiled_assign, seeds))
    return state, new_tiled.reshape(R)


@partial(jax.jit, static_argnums=(0,))
def sequential_init(spec, cl_model, shareds, state, values, key):
    """Sequential (greedy posterior-predictive) initialization: assign rows
    one at a time from the running predictive (reference
    examples/mixture/main.py:191-210 compress_sequential)."""
    R = jnp.asarray(values[0]).shape[0]
    keys = jax.random.split(key, R)

    def step(carry, inp):
        state, assignments = carry
        i, step_key = inp
        row = tuple(jnp.asarray(v)[i] for v in values)
        scores = mx.score_value(spec, cl_model, shareds, state, row)
        k = sample_from_scores(step_key, scores)
        state, _ = mx.add_value(spec, cl_model, shareds, state, k, row)
        return (state, assignments.at[i].set(k.astype(jnp.int32))), None

    assignments0 = jnp.zeros(R, jnp.int32)
    (state, assignments), _ = lax.scan(
        step, (state, assignments0),
        (jnp.arange(R, dtype=jnp.int32), keys))
    return state, assignments


def _block_supports(spec, values):
    """Static per-block value supports for the mixed pallas sweep: None for
    nich/niw blocks (scored analytically), a sorted unique-value array for
    discrete blocks."""
    import numpy as np
    from distributions_tpu.models import nich as nich_mod, niw as niw_mod
    supports = []
    for block, v in zip(spec.blocks, values):
        if block.module is nich_mod or block.module is niw_mod:
            supports.append(None)
        else:
            supports.append(np.unique(np.asarray(v)).astype(np.int32))
    return tuple(supports)


def packed_value_width(spec, values, supports=None):
    """Packed table value-axis width Vtot for this spec+data (0 when
    there are no table blocks) — the extra VMEM-budget input of
    pallas_kernels.auto_block_rows (the v3 kernel holds [BR, 2*Vtot]
    and [BR, Vtot] buffers besides the [BR, C] scores; see
    _mixed_static_layout for the packing)."""
    from distributions_tpu.models import nich as nich_mod, niw as niw_mod
    if supports is None:
        supports = _block_supports(spec, values)
    vs = [len(supports[i])
          for i, b in enumerate(spec.blocks)
          if b.module is not nich_mod and b.module is not niw_mod
          for _ in range(b.cols)]
    if not vs:
        return 0
    return ((sum(vs) + 127) // 128) * 128


def sweep_blocked_pallas_mixed(spec, cl_model, shareds, state, values,
                               assignments, block, key, supports=None,
                               block_rows=256, backend='pallas'):
    """Fused sweep for ANY mix of nich blocks and bounded-support
    discrete blocks (bb/dd/dpd/gp/bnb).

    Discrete blocks are scored through per-tile [V, C] tables (V = support
    size) computed by score_value_batch — collapsing the per-cell lgamma
    cost by a factor B/V — then each row's support index is one-hotted and
    contracted against the table on the MXU (the MXU form of the
    reference's per-value score matrices, dd.hpp:346-474).
    `supports` (from _block_supports) must cover every value in `values`.

    backend='pallas' fuses score+sample in the Mosaic kernel;
    backend='xla' builds the same scores in XLA (one-hot matmuls) and
    samples with jax.random.categorical — measured faster than the Mosaic
    lowering for table-heavy specs (see BENCH.md).
    """
    from distributions_tpu.ops import pallas_kernels as pk
    from distributions_tpu import clustering as _cl
    from distributions_tpu.models import nich as nich_mod
    import numpy as np

    if supports is None:
        supports = _block_supports(spec, values)
    R = assignments.shape[0]
    assert R % block == 0
    n_blocks = R // block
    C = spec.capacity

    # static layout
    nich_blocks = [i for i, b in enumerate(spec.blocks)
                   if b.module is nich_mod]
    table_blocks = [i for i, b in enumerate(spec.blocks)
                    if b.module is not nich_mod]
    # pad the support axis to a lane multiple: unaligned [B, V] one-hots
    # and [V, C] matmuls lower catastrophically on the MXU (measured:
    # V=65 was ~8x slower than the XLA path; see BENCH.md)
    V_raw = max([len(supports[i]) for i in table_blocks], default=1)
    V = ((V_raw + 127) // 128) * 128

    # host-side precompute: support indices for table columns
    nich_vals = (jnp.concatenate(
        [jnp.asarray(values[i], jnp.float32) for i in nich_blocks], axis=1)
        if nich_blocks else jnp.zeros((R, 0), jnp.float32))
    if table_blocks:
        idx_cols = []
        for i in table_blocks:
            sup = supports[i]
            v = np.asarray(values[i])
            idx = np.searchsorted(sup, v).astype(np.int32)
            idx_cols.append(idx)
        table_idx = jnp.asarray(np.concatenate(idx_cols, axis=1))
    else:
        table_idx = jnp.zeros((R, 0), jnp.int32)

    supports_dev = tuple(
        jnp.asarray(supports[i]) if supports[i] is not None else None
        for i in range(len(spec.blocks)))

    @partial(jax.jit, static_argnums=())
    def run(state, assignments, key):
        keys = jax.random.split(key, n_blocks)
        seeds = jax.vmap(
            lambda k: jax.random.key_data(k)[-1].astype(jnp.int32))(keys)
        row_stats = mx.precompute_row_stats(spec, shareds, values)
        tiled_stats = tuple(
            rs.reshape((n_blocks, block) + rs.shape[1:])
            for rs in row_stats)
        tiled_assign = assignments.reshape(n_blocks, block)
        tiled_nich = nich_vals.reshape(n_blocks, block, -1)
        tiled_idx = table_idx.reshape(n_blocks, block, -1)

        def step(state, inp):
            t_nich, t_idx, tile_stats, tile_assign, seed, step_key = inp
            cd, tiles = mx.tile_deltas_fast(
                spec, shareds, tile_stats, tile_assign)
            state = mx.apply_stat_tiles(
                spec, shareds, state, cd, tiles, -1, block)

            cl_scores = _cl.score_value(
                cl_model, state.counts, state.alive, state.sample_size)

            if backend == 'xla':
                scores = jnp.broadcast_to(cl_scores[None, :], (block, C))
                col0 = 0
                for i in nich_blocks:
                    cols_i = spec.blocks[i].cols
                    scores = scores + mx._block_score_batch(
                        spec.blocks[i], shareds[i], state.groups[i],
                        t_nich[:, col0:col0 + cols_i])
                    col0 += cols_i
                tcol = 0
                for i in table_blocks:
                    blk = spec.blocks[i]
                    sup = supports_dev[i]
                    Vi = sup.shape[0]
                    per_col = jax.vmap(
                        lambda g: blk.module.score_value_batch(
                            shareds[i], g, sup),
                        in_axes=1, out_axes=0)(state.groups[i])  # [c, Vi, C]
                    for j in range(blk.cols):
                        onehot = (t_idx[:, tcol][:, None]
                                  == jnp.arange(Vi)[None, :]
                                  ).astype(jnp.float32)           # [B, Vi]
                        scores = scores + jnp.matmul(
                            onehot, per_col[j],
                            preferred_element_type=jnp.float32)
                        tcol += 1
                new_assign = sample_from_scores(
                    step_key, scores).astype(jnp.int32)
            else:
                if nich_blocks:
                    coeffs = jnp.concatenate(
                        [pk.nich_coeffs(shareds[i], state.groups[i])
                         for i in nich_blocks], axis=0)
                else:
                    coeffs = jnp.zeros((4, C), jnp.float32)
                table_list = []
                for i in table_blocks:
                    blk = spec.blocks[i]
                    sup = supports_dev[i]
                    # per col: [V_i, C] table; pad V_i -> V
                    per_col = jax.vmap(
                        lambda g: blk.module.score_value_batch(
                            shareds[i], g, sup),
                        in_axes=1, out_axes=0)(state.groups[i])  # [c, Vi, C]
                    pad = V - per_col.shape[1]
                    if pad:
                        per_col = jnp.pad(per_col,
                                          ((0, 0), (0, pad), (0, 0)))
                    table_list.append(per_col)
                tables = (jnp.concatenate(table_list, axis=0) if table_list
                          else jnp.zeros((0, V, C), jnp.float32))

                new_assign = pk.mixed_score_sample(
                    seed, t_nich, t_idx, cl_scores, coeffs, tables,
                    block_rows=block_rows)

            cd, tiles = mx.tile_deltas_fast(
                spec, shareds, tile_stats, new_assign)
            state = mx.apply_stat_tiles(
                spec, shareds, state, cd, tiles, +1, block)
            return state, new_assign

        state, new_tiled = lax.scan(
            step, state,
            (tiled_nich, tiled_idx, tiled_stats, tiled_assign, seeds, keys))
        return state, new_tiled.reshape(R)

    return run(state, assignments, key)


@partial(jax.jit, static_argnums=(0, 3))
def build_stat_cache(spec, shareds, values, block, assignments):
    """Per-tile (counts_delta [T, C], raw sums [T, C, cols, S]) for the
    current assignments — the remove-side inputs of the next sweep."""
    R = assignments.shape[0]
    n_blocks = R // block
    row_stats = mx.precompute_row_stats(spec, shareds, values)
    tiled_stats = tuple(
        rs.reshape((n_blocks, block) + rs.shape[1:]) for rs in row_stats)
    tiled_assign = assignments.reshape(n_blocks, block)

    def one(tile_stats, tile_assign):
        return mx.tile_sums_fast(spec, shareds, tile_stats, tile_assign)

    return jax.vmap(one)(tiled_stats, tiled_assign)


@partial(jax.jit, static_argnums=(0, 6, 7, 10))
def sweep_blocked_pallas_fused(spec, cl_model, shareds, state, values,
                               assignments, block, block_rows, key, cache,
                               sampling='cdf'):
    """Blocked pallas sweep v2: the kernel fuses scoring, inverse-CDF
    sampling AND the add-side suff-stat contraction; the remove side is the
    cached add-side sums of the previous sweep (BENCH.md roadmap items
    2+3+4 combined).  Outside the kernel a sweep step is only [C]-sized
    coefficient math and tile-sum adds — no one-hot matmuls.

    cache = build_stat_cache(spec, shareds, values, block, assignments) for
    the CURRENT assignments.  Returns (state, assignments, new_cache).
    """
    from distributions_tpu.ops import pallas_kernels as pk
    from distributions_tpu import clustering as _cl

    assert pk.supports_pallas(spec), 'fused sweep requires nich blocks'
    R = assignments.shape[0]
    assert R % block == 0
    n_blocks = R // block
    keys = jax.random.split(key, n_blocks)
    seeds = jax.vmap(
        lambda k: jax.random.key_data(k)[-1].astype(jnp.int32))(keys)
    col_groups = tuple(b.cols for b in spec.blocks)

    values_cat = jnp.concatenate(
        [jnp.asarray(v, jnp.float32) for v in values], axis=1)
    tiled_values = values_cat.reshape(n_blocks, block, -1)
    cached_cd, cached_sums = cache

    def step(state, inp):
        tile_vals, cd, sums, seed = inp
        tiles = mx.sums_to_tiles(spec, shareds, sums)
        state = mx.apply_stat_tiles(
            spec, shareds, state, cd, tiles, -1, block)

        cl_scores = _cl.score_value(
            cl_model, state.counts, state.alive, state.sample_size)
        coeffs = jnp.concatenate(
            [pk.nich_coeffs_v2(shared, group)
             for shared, group in zip(shareds, state.groups)], axis=0)
        new_assign, stat_sums = pk.fused_score_sample_stats(
            seed, tile_vals, cl_scores, coeffs, col_groups,
            block_rows=block_rows, sampling=sampling)

        new_cd, new_sums = pk.split_stat_sums(spec, stat_sums)
        tiles = mx.sums_to_tiles(spec, shareds, new_sums)
        state = mx.apply_stat_tiles(
            spec, shareds, state, new_cd, tiles, +1, block)
        return state, (new_assign, new_cd, new_sums)

    state, (new_tiled, out_cd, out_sums) = lax.scan(
        step, state, (tiled_values, cached_cd, cached_sums, seeds))
    return state, new_tiled.reshape(R), (out_cd, out_sums)


from collections import namedtuple

_MixedLayout = namedtuple('_MixedLayout', [
    'nich_blocks', 'quad_blocks', 'table_blocks', 'quad_groups', 'V',
    'nich_vals', 'quad_vals', 'table_idx', 'supports_dev', 'table_vs'])


def _mixed_static_layout(spec, values, supports):
    """Host-side static layout for the v3 mixed fused sweep: nich/niw/table
    block split, per-block sorted supports, PACKED value-axis layout, and
    support-index columns.

    All table columns share ONE packed value axis: column j's support
    occupies lanes [offset_j, offset_j + V_j) of a Vtot-lane axis
    (Vtot = sum of true support sizes, rounded up to a 128-lane multiple).
    The kernel then scores ALL table columns with a single
    [BR, 2*Vtot] x [2*Vtot, C] MXU pass and contracts ALL their count
    tables with a single [C, BR] x [BR, Vtot] pass — the per-column
    V-padded-to-128 matmuls this replaces cost ~768 MXU flops/cell *per
    column* regardless of true support size (bb's support is 2!), which
    dominated the table-model sweeps (BENCH.md r4 roofline).

    V in the returned tuple is the packed Vtot; `table_vs` gives each
    table COLUMN's true support length, in column order."""
    import numpy as np
    from distributions_tpu.models import nich as nich_mod, niw as niw_mod

    if supports is None:
        supports = _block_supports(spec, values)
    nich_blocks = [i for i, b in enumerate(spec.blocks)
                   if b.module is nich_mod]
    quad_blocks = [i for i, b in enumerate(spec.blocks)
                   if b.module is niw_mod]
    table_blocks = [i for i, b in enumerate(spec.blocks)
                    if b.module is not nich_mod and b.module is not niw_mod]
    table_vs = tuple(
        len(supports[i])
        for i in table_blocks for _ in range(spec.blocks[i].cols))
    V = ((max(sum(table_vs), 1) + 127) // 128) * 128

    R = jnp.asarray(values[0]).shape[0]
    nich_vals = (jnp.concatenate(
        [jnp.asarray(values[i], jnp.float32) for i in nich_blocks], axis=1)
        if nich_blocks else jnp.zeros((R, 1), jnp.float32))
    quad_groups = []
    quad_cols = []
    for i in quad_blocks:
        v = jnp.asarray(values[i], jnp.float32)          # [R, cols, D]
        quad_groups.append((v.shape[1], v.shape[2]))
        quad_cols.append(v.reshape(R, -1))
    quad_vals = (jnp.concatenate(quad_cols, axis=1) if quad_blocks
                 else jnp.zeros((R, 0), jnp.float32))
    if table_blocks:
        idx_cols = []
        for i in table_blocks:
            v = np.asarray(values[i])
            sup = np.asarray(supports[i])
            idx = np.searchsorted(sup, v).astype(np.int32)
            # every value must be IN the support: with the packed value
            # axis an out-of-support index would land in the NEXT
            # column's lane range and silently corrupt its scores and
            # count table (pre-packing it fell into benign zero padding)
            ok = (idx < len(sup)) & (sup[np.minimum(idx, len(sup) - 1)]
                                     == v)
            if not ok.all():
                bad = np.unique(v[~ok])[:8]
                raise ValueError(
                    'block %d: values %s are not in the provided support '
                    '(the fused table sweep requires supports to cover '
                    'every observed value)' % (i, bad.tolist()))
            idx_cols.append(idx)
        table_idx = jnp.asarray(np.concatenate(idx_cols, axis=1))
    else:
        table_idx = jnp.zeros((R, 0), jnp.int32)
    supports_dev = tuple(
        jnp.asarray(supports[i]) if supports[i] is not None else None
        for i in range(len(spec.blocks)))
    return _MixedLayout(
        tuple(nich_blocks), tuple(quad_blocks), tuple(table_blocks),
        tuple(quad_groups), V, nich_vals, quad_vals, table_idx,
        supports_dev, table_vs)


def sweep_blocked_pallas_fused_mixed(spec, cl_model, shareds, state, values,
                                     assignments, block, block_rows, key,
                                     cache, sampling='cdf', supports=None,
                                     n_sweeps=1, with_score=False):
    """v3 fused sweep for ANY mix of nich + bounded-support discrete blocks
    (bb/dd/dpd/gp/bnb): one Mosaic kernel per tile fuses product-form nich
    scoring, MXU table scoring for discrete columns, CDF/gumbel sampling
    (optionally with polynomial fast log/exp via a '_fast' sampling
    suffix), and the full suff-stat contraction — nich [1,v,v^2] sums plus
    per-column [C, V] count tables, converted to per-model raw tile sums
    by a [C,V]x[V,S] matmul outside the kernel.

    sampling 'cdf_host' / 'gumbel_host' draw the noise host-side from the
    sweep key (per tile) and feed it as a kernel operand: CPU-testable
    (interpret mode has no TPU-core PRNG) and key-reproducible across
    backends, at the cost of materializing the noise in HBM.

    cache = build_stat_cache(...) on the current assignments (the generic
    raw-sums format).  n_sweeps > 1 scans whole sweeps inside one device
    program.  Returns (state, assignments, new_cache), plus the joint
    mx.score_data scalar computed in-program when with_score=True (a
    separately dispatched score program costs ~0.26 s of tunnel
    program-switch tax per step — measured r5)."""
    from distributions_tpu.ops import pallas_kernels as pk
    from distributions_tpu import clustering as _cl

    R = assignments.shape[0]
    assert R % block == 0
    n_blocks = R // block
    C = spec.capacity
    lay = _mixed_static_layout(spec, values, supports)
    (nich_blocks, quad_blocks, table_blocks, quad_groups, V, nich_vals,
     quad_vals, table_idx, supports_dev, table_vs) = lay

    # validate the column-constant-nu restriction of the product-form nich
    # block HERE, where shareds are still concrete (nich_coeffs_v2 runs
    # under jit tracing and cannot inspect values)
    import numpy as np
    for i in nich_blocks:
        nu = np.asarray(shareds[i].nu)
        if nu.ndim > 0 and nu.size > 1 and not (nu == nu.flat[0]).all():
            raise ValueError(
                'fused nich block %d requires column-constant nu (got %r); '
                'put columns with distinct nu in separate cols=1 blocks'
                % (i, nu))

    # per-block [V_raw, S] stat matrices (count_table_slice @ W = raw sums)
    W = []
    for i, b in enumerate(spec.blocks):
        if i in table_blocks:
            W.append(b.module.row_stat_columns(shareds[i], supports_dev[i]))
        else:
            W.append(None)
    W = tuple(W)

    return _fused_mixed_run(
        spec, nich_blocks, quad_blocks, table_blocks, quad_groups, V,
        block, block_rows, sampling, n_sweeps, table_vs, with_score,
        cl_model, shareds, state, assignments, key, cache, nich_vals,
        quad_vals, table_idx, supports_dev, W)


def _build_fused_inputs(spec, nich_blocks, quad_blocks, table_blocks, V,
                        shareds, supports_dev, state):
    """Per-slot kernel coefficient inputs (coeffs, qcoeffs, tables) from
    the current groups — works on full [C] or component-shard-local
    [C_local] group batches alike."""
    from distributions_tpu.ops import pallas_kernels as pk

    C = state.counts.shape[0]
    if nich_blocks:
        coeffs = jnp.concatenate(
            [pk.nich_coeffs_v2(shareds[i], state.groups[i])
             for i in nich_blocks], axis=0)
    else:
        coeffs = None
    if quad_blocks:
        qcoeffs = jnp.concatenate(
            [pk.niw_coeffs_v4(shareds[i], state.groups[i])
             for i in quad_blocks], axis=0)
    else:
        qcoeffs = None

    # PACKED score tables: every table column's [V_raw, C] table occupies
    # its own slice of one shared [V(=Vtot), C] value axis, so the kernel
    # scores all table columns in a single MXU pass (see
    # _mixed_static_layout)
    table_list = []
    for i in table_blocks:
        blk = spec.blocks[i]
        sup = supports_dev[i]
        per_col = jax.vmap(
            lambda g: blk.module.score_value_batch(
                shareds[i], g, sup),
            in_axes=1, out_axes=0)(state.groups[i])  # [c, Vr, C]
        table_list.extend(per_col[j] for j in range(per_col.shape[0]))
    if table_list:
        packed = jnp.concatenate(table_list, axis=0)      # [sumV, C]
        # padding lanes never receive a one-hot 1; zero keeps the bf16
        # split benign
        tables = jnp.pad(packed, ((0, V - packed.shape[0]), (0, 0)))
    else:
        tables = jnp.zeros((0, C), jnp.float32)
    return coeffs, qcoeffs, tables


def _fused_tile_core(spec, nich_blocks, quad_blocks, table_blocks,
                     quad_groups, V, block_rows, sampling, cl_model,
                     shareds, supports_dev, W, state, t_nich, t_quad,
                     t_idx, seed, noise=None, table_vs=()):
    """Score + sample + stats for ONE tile against the current (already
    tile-removed) state via the fused kernel.  Returns (new_assign [B],
    counts_delta [C], per-block raw sums) — sums in build_stat_cache's
    generic format, all additive (psum-able across a device axis)."""
    from distributions_tpu.ops import pallas_kernels as pk
    from distributions_tpu import clustering as _cl

    C = spec.capacity
    ncols = t_nich.shape[1]
    col_groups = tuple(spec.blocks[i].cols for i in nich_blocks)

    cl_scores = _cl.score_value(
        cl_model, state.counts, state.alive, state.sample_size)
    coeffs, qcoeffs, tables = _build_fused_inputs(
        spec, nich_blocks, quad_blocks, table_blocks, V, shareds,
        supports_dev, state)

    new_assign, nich_sums, tcounts, qsums = \
        pk.fused_mixed_score_sample_stats(
            seed, t_nich, t_idx, cl_scores, coeffs, tables,
            col_groups, block_rows=block_rows, sampling=sampling,
            qvalues=t_quad, qcoeffs=qcoeffs, quad_groups=quad_groups,
            noise=noise, table_vs=table_vs)

    # per-column slices of the PACKED [C, Vtot] count table
    offs = []
    o = 0
    for v in table_vs:
        offs.append(o)
        o += v

    # counts delta: the ones-column of whichever stat family is present
    # (nich [1|v|v^2] sums; quad [1|v|vv^T] sums; or a count table's
    # row-sums over the first column's support slice)
    if nich_blocks:
        new_cd = jnp.round(nich_sums[:, 0]).astype(jnp.int32)
    elif quad_blocks:
        new_cd = jnp.round(qsums[:, 0]).astype(jnp.int32)
    else:
        new_cd = jnp.round(jnp.sum(
            tcounts[:, offs[0]:offs[0] + table_vs[0]],
            axis=1)).astype(jnp.int32)
    # per-block raw sums in build_stat_cache's generic format
    quad_raw = pk.quad_sums_to_raw(qsums, quad_groups)
    new_sums = []
    nc0 = 0
    tcol = 0
    qi = 0
    for bi, b in enumerate(spec.blocks):
        if bi in nich_blocks:
            sl = slice(nc0, nc0 + b.cols)
            ones = nich_sums[:, sl]
            vs = nich_sums[:, ncols + nc0:ncols + nc0 + b.cols]
            vv = nich_sums[:, 2 * ncols + nc0:2 * ncols + nc0 + b.cols]
            new_sums.append(jnp.stack([ones, vs, vv], axis=-1))
            nc0 += b.cols
        elif bi in quad_blocks:
            new_sums.append(quad_raw[qi])
            qi += 1
        else:
            cols_s = []
            for c in range(b.cols):
                # count_table slice [C, V_raw] holds exact integer counts
                # up to the tile size (> bf16's 8-bit-exact range) and W
                # holds f32 stat columns: the TPU default one-bf16-pass
                # matmul rounds both; HIGHEST keeps the cached raw sums
                # exact
                sl = slice(offs[tcol], offs[tcol] + table_vs[tcol])
                cols_s.append(jnp.matmul(
                    tcounts[:, sl], W[bi],
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST))
                tcol += 1
            new_sums.append(jnp.stack(cols_s, axis=1))
    return new_assign, new_cd, tuple(new_sums)


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11))
def _fused_mixed_run(spec, nich_blocks, quad_blocks, table_blocks,
                     quad_groups, V, block, block_rows, sampling, n_sweeps,
                     table_vs, with_score, cl_model, shareds, state,
                     assignments, key, cache, nich_vals, quad_vals,
                     table_idx, supports_dev, W):
    R = assignments.shape[0]
    n_blocks = R // block
    tiled_nich = nich_vals.reshape(n_blocks, block, -1)
    tiled_quad = quad_vals.reshape(n_blocks, block, -1)
    tiled_idx = table_idx.reshape(n_blocks, block, -1)

    C = spec.capacity

    def one_sweep(carry, sweep_key):
        state, cache = carry
        cached_cd, cached_sums = cache
        keys = jax.random.split(sweep_key, n_blocks)
        seeds = jax.vmap(
            lambda k: jax.random.key_data(k)[-1].astype(jnp.int32))(keys)

        def step(state, inp):
            t_nich, t_quad, t_idx, cd, sums, seed, key = inp
            tiles = mx.sums_to_tiles(spec, shareds, sums)
            state = mx.apply_stat_tiles(
                spec, shareds, state, cd, tiles, -1, block)

            if sampling.endswith('_host'):   # noise from the jax.random
                noise = (jax.random.gumbel(key, (block, C), jnp.float32)
                         if sampling.startswith('gumbel')
                         else jax.random.uniform(key, (block, 1),
                                                 jnp.float32))
            else:
                noise = None
            new_assign, new_cd, new_sums = _fused_tile_core(
                spec, nich_blocks, quad_blocks, table_blocks, quad_groups,
                V, block_rows, sampling, cl_model, shareds, supports_dev,
                W, state, t_nich, t_quad, t_idx, seed, noise=noise,
                table_vs=table_vs)

            tiles = mx.sums_to_tiles(spec, shareds, new_sums)
            state = mx.apply_stat_tiles(
                spec, shareds, state, new_cd, tiles, +1, block)
            return state, (new_assign, new_cd, new_sums)

        state, (new_tiled, out_cd, out_sums) = lax.scan(
            step, state,
            (tiled_nich, tiled_quad, tiled_idx, cached_cd, cached_sums,
             seeds, keys))
        return (state, (out_cd, out_sums)), new_tiled

    (state, cache), tiled = lax.scan(
        one_sweep, (state, cache), jax.random.split(key, n_sweeps))
    if with_score:
        # joint score computed INSIDE this program: a separate small
        # score_data program dispatched between fused steps costs
        # ~0.26 s of program-switch tax through the tunneled backend
        # (measured, BENCH.md r5) — in-program it is O(C * cols) free
        return state, tiled[-1].reshape(R), cache, mx.score_data(
            spec, cl_model, shareds, state)
    return state, tiled[-1].reshape(R), cache


@partial(jax.jit, static_argnums=(0, 6, 7, 10, 11))
def run_sweeps_pallas_fused(spec, cl_model, shareds, state, values,
                            assignments, block, block_rows, key, cache,
                            n_sweeps, sampling='cdf'):
    """n_sweeps v2 fused sweeps inside ONE device program (lax.scan over
    sweeps).  One launch instead of n: per-launch dispatch overhead is
    ~100ms through the tunneled dev backend while a full 1Mx1024 sweep is
    ~23ms on-device, so batching sweeps is what lets wall-clock throughput
    approach device throughput (profiled; see BENCH.md)."""
    keys = jax.random.split(key, n_sweeps)

    def body(carry, k):
        st, an, ca = carry
        st, an, ca = sweep_blocked_pallas_fused(
            spec, cl_model, shareds, st, values, an, block, block_rows,
            k, ca, sampling)
        return (st, an, ca), None

    (state, assignments, cache), _ = lax.scan(
        body, (state, assignments, cache), keys)
    return state, assignments, cache


def sweep_blocked_chains(spec, cl_model, shareds, states, values,
                         assignments, block, keys):
    """Chain parallelism: run one blocked sweep on N independent chains at
    once (states/assignments/keys carry a leading [N] chain axis; values are
    shared).  The analog of the reference's multiprocessing fan-out
    (examples/mixture/main.py:365-374), as a vmap."""
    return jax.vmap(
        lambda st, an, k: sweep_blocked(
            spec, cl_model, shareds, st, values, an, block, key=k)
    )(states, assignments, keys)


def init_chains(spec, cl_model, shareds, values, assignments_per_chain):
    """Build [N]-chain states from an [N, R] assignment matrix."""
    return jax.vmap(
        lambda an: mx.state_from_assignments(
            spec, cl_model, shareds, values, an))(assignments_per_chain)


@partial(jax.jit, static_argnums=(0,))
def prior_init(spec, cl_model, shareds, state, values, key):
    """Prior-predictive initialization: assign each row from the clustering
    prior only, ignoring likelihoods (reference compress_gibbs init,
    examples/mixture/main.py:227-233)."""
    R = jnp.asarray(values[0]).shape[0]
    keys = jax.random.split(key, R)

    from distributions_tpu import clustering as _cl

    def step(carry, inp):
        state, assignments = carry
        i, step_key = inp
        row = tuple(jnp.asarray(v)[i] for v in values)
        scores = _cl.score_value(
            cl_model, state.counts, state.alive, state.sample_size)
        k = sample_from_scores(step_key, scores)
        state, _ = mx.add_value(spec, cl_model, shareds, state, k, row)
        return (state, assignments.at[i].set(k.astype(jnp.int32))), None

    assignments0 = jnp.zeros(R, jnp.int32)
    (state, assignments), _ = lax.scan(
        step, (state, assignments0),
        (jnp.arange(R, dtype=jnp.int32), keys))
    return state, assignments
