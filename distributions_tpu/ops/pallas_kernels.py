"""Pallas TPU kernels: the fused score+sample inner loop of blocked
collapsed Gibbs.

The XLA path (mixture.score_batch + jax.random.categorical) materializes the
[B, C] score matrix in HBM twice (write scores, read for gumbel+argmax).  At
the target rates that round trip is the bandwidth bottleneck, so this kernel
fuses, per row-block of BR rows:

    scores[BR, C] = clustering_scores
                  + sum_cols (score_c + log_coeff_c * log1p(prec_c (v-m)^2))
    g            ~ Gumbel via pltpu.prng_random_bits
    out[BR]      = argmax(scores + g)

entirely in VMEM — HBM traffic is just values in, assignments out.  The
per-slot coefficient vectors {score, log_coeff, precision, mean} (the
reference's cached MixtureValueScorer columns, src/models/nich.cc:33-67) are
computed outside the kernel from the [C] suff stats.

RNG: seeded per (sweep_key, row_block) from pltpu.prng_seed — counter-based
and layout-independent, but a *different stream* than jax.random.categorical,
so the pallas path equals the XLA path in distribution, not bitwise.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_ROWS = 256


def _gumbel_from_bits(bits):
    # low 24 bits -> uniform in (0, 1); double -log for gumbel.
    # int32 path: mosaic lacks uint32->f32 casts, so mask to a positive
    # 24-bit int32 first.
    masked = jnp.bitwise_and(pltpu.bitcast(bits, jnp.int32),
                             jnp.int32(0x00FFFFFF))
    u = masked.astype(jnp.float32) * (1.0 / (1 << 24))
    u = jnp.maximum(u, 1e-12)
    return -jnp.log(-jnp.log(u))


def _score_sample_kernel(seed_ref, values_ref, cl_ref, coeff_ref, out_ref,
                         *, cols, compute_dtype=jnp.float32):
    """One row-block: fused nich scoring + gumbel-max categorical.

    values_ref: [BR, cols] VMEM
    cl_ref:     [1, C]     clustering scores (-inf on dead slots)
    coeff_ref:  [4*cols, C] rows = per-col {score, log_coeff, prec, mean}
    out_ref:    [BR, 1]    chosen slot per row

    compute_dtype is kept for experimentation but bfloat16 is NOT
    currently usable: Mosaic cannot legalize bf16 transcendentals
    (math.log1p on vector<...xbf16> fails to compile), and the kernel is
    transcendental-bound, so there is nothing to win by downcasting only
    the multiplies.  Measured finding, see BENCH.md.
    """
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0], i)

    cl = cl_ref[0, :][None, :].astype(compute_dtype)     # [1, C]
    scores = jnp.broadcast_to(cl, (values_ref.shape[0],
                                   cl_ref.shape[1]))
    for j in range(cols):
        v = values_ref[:, j][:, None].astype(compute_dtype)  # [BR, 1]
        score = coeff_ref[4 * j, :][None, :].astype(compute_dtype)
        log_coeff = coeff_ref[4 * j + 1, :][None, :].astype(compute_dtype)
        prec = coeff_ref[4 * j + 2, :][None, :].astype(compute_dtype)
        mean = coeff_ref[4 * j + 3, :][None, :].astype(compute_dtype)
        t = v - mean
        scores = scores + score + log_coeff * jnp.log1p(prec * t * t)

    bits = pltpu.prng_random_bits(scores.shape)
    total = scores.astype(jnp.float32) + _gumbel_from_bits(bits)
    out_ref[:, 0] = jnp.argmax(total, axis=1).astype(jnp.int32)


def nich_score_sample(seed, values, cl_scores, coeffs,
                      block_rows=DEFAULT_BLOCK_ROWS, interpret=False,
                      compute_dtype=jnp.float32):
    """Fused score+categorical for a nich feature block.

    seed: int32 scalar (fold the sweep key + tile index outside)
    values: [B, cols] f32; cl_scores: [C] f32; coeffs: [4*cols, C] f32
    returns assignments [B] int32
    """
    B, cols = values.shape
    C = cl_scores.shape[0]
    assert B % block_rows == 0, (B, block_rows)
    grid = (B // block_rows,)

    out = pl.pallas_call(
        functools.partial(_score_sample_kernel, cols=cols,
                          compute_dtype=compute_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_rows, cols), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * cols, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.int32),
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32), values,
      cl_scores[None, :], coeffs)
    return out[:, 0]


def nich_coeffs(shared, group):
    """[4*cols, C] cached scorer columns from [C, cols] nich groups
    (reference src/models/nich.cc:33-67's {score, log_coeff, precision,
    mean}).  Cheap [C]-sized math, fused by XLA outside the kernel."""
    from distributions_tpu.models import nich as nich_mod
    from distributions_tpu.special import lgamma_nu

    post = nich_mod.plus_group(shared, group)            # leaves [C, cols]
    lambda_ = ((1.0 + post.kappa) * post.sigmasq) / post.kappa
    score = (lgamma_nu(post.nu)
             - 0.5 * jnp.log(post.nu * jnp.pi * lambda_))
    log_coeff = -0.5 * (post.nu + 1.0)
    precision = 1.0 / (post.nu * lambda_)
    # -> [cols, 4, C] -> [4*cols, C]
    stack = jnp.stack([score, log_coeff, precision, post.mu],
                      axis=-1)                            # [C, cols, 4]
    return jnp.transpose(stack, (1, 2, 0)).reshape(-1, stack.shape[0])


def supports_pallas(spec):
    from distributions_tpu.models import nich as nich_mod
    return all(b.module is nich_mod for b in spec.blocks)


# ---------------------------------------------------------------------------
# Generic mixed kernel: nich analytic coefficients + discrete score TABLES.
#
# For a discrete feature column with support of V distinct values, the
# per-slot scores form a [V, C] table (the reference's per-value score
# matrix, dd.hpp:346-474 / dpd.hpp:571-577).  V << B, so the table is
# computed OUTSIDE the kernel from score_value_batch (collapsing the
# per-cell lgamma cost by a factor B/V), and the kernel turns each row's
# value-index into a one-hot and rides the MXU:
#
#     scores += onehot(idx_col) [BR, V]  @  table_col [V, C]
#
# This covers bb/dd/dpd/gp/bnb (any bounded-support discrete model) with
# zero per-model kernel code.

def _mixed_kernel(seed_ref, nich_values_ref, idx_ref, cl_ref, coeff_ref,
                  tables_ref, out_ref, *, nich_cols, table_cols, V):
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0], i)
    BR = out_ref.shape[0]
    C = cl_ref.shape[1]

    cl = cl_ref[0, :][None, :]
    scores = jnp.broadcast_to(cl, (BR, C))
    for j in range(nich_cols):
        v = nich_values_ref[:, j][:, None]
        score = coeff_ref[4 * j, :][None, :]
        log_coeff = coeff_ref[4 * j + 1, :][None, :]
        prec = coeff_ref[4 * j + 2, :][None, :]
        mean = coeff_ref[4 * j + 3, :][None, :]
        t = v - mean
        scores = scores + score + log_coeff * jnp.log1p(prec * t * t)

    # bf16 MXU contraction: f32 dots are multi-pass on the MXU (measured
    # ~8x slower — this WAS the mixed kernel's original bottleneck).  The
    # one-hot is 0/1 (bf16-exact); each f32 table is pre-split outside the
    # kernel into hi+mid bf16 halves stacked along the V axis, so the f32
    # score is reconstructed to ~1.5e-5 rel from one [BR, 2V] x [2V, C]
    # bf16 pass with f32 accumulation.
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (BR, V), 1)
    for j in range(table_cols):
        onehot = (idx_ref[:, j][:, None] == iota_v).astype(jnp.bfloat16)
        onehot2 = jnp.concatenate([onehot, onehot], axis=1)    # [BR, 2V]
        scores = scores + jnp.dot(onehot2, tables_ref[j],
                                  preferred_element_type=jnp.float32)

    bits = pltpu.prng_random_bits(scores.shape)
    total = scores + _gumbel_from_bits(bits)
    out_ref[:, 0] = jnp.argmax(total, axis=1).astype(jnp.int32)


def mixed_score_sample(seed, nich_values, table_indices, cl_scores, coeffs,
                       tables, block_rows=DEFAULT_BLOCK_ROWS,
                       interpret=False):
    """Fused score+categorical over nich columns + discrete table columns.

    nich_values:  [B, nich_cols] f32 (nich_cols may be 0 -> pass [B, 1]
                  zeros with coeffs zeros of shape [4, C] and nich_cols=0)
    table_indices: [B, table_cols] int32 indices into each column's support
    cl_scores: [C]; coeffs: [4*nich_cols(+), C]; tables: [table_cols, V, C]
    f32 (split into stacked hi+mid bf16 halves here, outside the kernel).
    """
    B = table_indices.shape[0] if table_indices.size else \
        nich_values.shape[0]
    nich_cols = nich_values.shape[1] if nich_values.size else 0
    table_cols = tables.shape[0]
    V = tables.shape[1]
    C = cl_scores.shape[0]
    assert B % block_rows == 0

    if nich_cols == 0:
        nich_values = jnp.zeros((B, 1), jnp.float32)
        coeffs = jnp.zeros((4, C), jnp.float32)
    if table_cols == 0:
        tables = jnp.zeros((1, V, C), jnp.float32)

    # split each f32 table into hi+mid bf16 halves stacked along V (see
    # kernel comment): same VMEM bytes as the f32 table, one single-pass
    # bf16 MXU contraction instead of a multi-pass f32 one.
    hi = tables.astype(jnp.bfloat16)
    mid = (tables - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    tables = jnp.concatenate([hi, mid], axis=1)          # [tc, 2V, C] bf16

    out = pl.pallas_call(
        functools.partial(_mixed_kernel, nich_cols=nich_cols,
                          table_cols=table_cols, V=V),
        grid=(B // block_rows,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_rows, max(nich_cols, 1)),
                         lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, max(table_cols, 1)),
                         lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((coeffs.shape[0], C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((max(table_cols, 1), 2 * V, C),
                         lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.int32),
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32), nich_values,
      table_indices if table_cols else jnp.zeros((B, 1), jnp.int32),
      cl_scores[None, :], coeffs, tables)
    return out[:, 0]


def supports_mixed_pallas(spec):
    """nich blocks + any discrete model with score_value_batch."""
    from distributions_tpu.models import nich as nich_mod, niw as niw_mod
    for b in spec.blocks:
        if b.module is niw_mod:
            return False
        if b.module is not nich_mod and \
                not hasattr(b.module, 'score_value_batch'):
            return False
    return True


# ---------------------------------------------------------------------------
# v2 fused kernel: product-form scoring + inverse-CDF sampling + in-kernel
# suff-stat contraction.
#
# Three changes over _score_sample_kernel, each removing per-cell work:
#
# 1. PRODUCT FORM.  Within one feature block all columns share the same
#    posterior dof nu_k (it depends only on the component's count), hence
#    the same student-t exponent log_coeff_k = -(nu_k+1)/2.  So
#        sum_j lc * log1p(prec_j (v_j - m_j)^2)
#      = lc * log( prod_j (1 + prec_j (v_j - m_j)^2) )
#    — ONE log per block per cell instead of one log1p per column
#    (reference does one log per column too: src/models/nich.cc:33-67).
#
# 2. INVERSE-CDF SAMPLING.  Gumbel-max costs per-cell random bits + two
#    logs.  Instead: p = exp(score - max) (one exp/cell), inclusive prefix
#    sums within 128-lane chunks via a [128,128] triangular matmul — on
#    the otherwise-idle MXU — then idx = #(global_prefix < u * total) with
#    ONE uniform per row.  Boundary semantics: zero-probability (dead)
#    slots can never be selected (their prefix equals a neighbor's, and
#    the count-of-strictly-less rule always lands on the first slot
#    reaching each prefix value).
#
# 3. IN-KERNEL STATS.  The new assignments' one-hot is contracted against
#    the row statistic columns [1, v, v^2] right in the kernel (MXU) and
#    accumulated across the sequential grid into a [C, 3*cols] output.
#    This replaces the XLA-side add-pass over the tile, and — because a
#    tile's add-side sums in sweep t are its remove-side sums in sweep
#    t+1 — the remove pass becomes a cached subtraction (see
#    ops/gibbs.sweep_blocked_pallas_fused).  No one-hot matmul remains
#    outside the kernel.

def _fused_v2_kernel(seed_ref, values_ref, cl_ref, coeff_ref, out_ref,
                     sums_ref, *, col_groups, sampling):
    """col_groups: tuple of ncols per same-prior feature block.
    coeff_ref rows, per group g: [base(=sum of per-col score consts),
    log_coeff] then per col [prec, mean].  sums_ref: [C, 3*total_cols]
    accumulated across the grid, column order [ones | v | v^2] blocks.
    """
    i = pl.program_id(0)
    if sampling != 'argmax':      # 'argmax' = deterministic debug variant
        pltpu.prng_seed(seed_ref[0], i)
    BR = values_ref.shape[0]
    C = cl_ref.shape[1]

    scores = jnp.broadcast_to(cl_ref[0, :][None, :], (BR, C))
    r = 0
    c0 = 0
    for ncols in col_groups:
        base = coeff_ref[r, :][None, :]
        lc = coeff_ref[r + 1, :][None, :]
        r += 2
        scores = scores + base
        # product over columns in chunks of 4 to bound the factor magnitude.
        # NB the factor stays in (v - mean)^2 form — the Horner expansion
        # a*v^2 + b*v + c is cheaper by 2 ops but cancels catastrophically
        # when |mean| >> |v - mean| (unstandardized data).
        for j0 in range(0, ncols, 4):
            prod = None
            for j in range(j0, min(j0 + 4, ncols)):
                prec = coeff_ref[r, :][None, :]
                mean = coeff_ref[r + 1, :][None, :]
                r += 2
                v = values_ref[:, c0 + j][:, None]
                t = v - mean
                f = 1.0 + prec * (t * t)
                prod = f if prod is None else prod * f
            scores = scores + lc * jnp.log(prod)
        c0 += ncols

    if sampling == 'argmax':
        idx = jnp.argmax(scores, axis=1).astype(jnp.int32)
    elif sampling == 'gumbel':
        bits = pltpu.prng_random_bits(scores.shape)
        total = scores + _gumbel_from_bits(bits)
        idx = jnp.argmax(total, axis=1).astype(jnp.int32)
    else:
        # inverse CDF over 128-lane chunks.  The prefix matmul runs in
        # bf16 (f32 dots are multi-pass on the MXU — measured ~8x slower):
        # tri is 0/1 (bf16-exact) and p in [0,1] rounds to ~2^-9 relative,
        # a statistically negligible perturbation of the sampling CDF.
        m = jnp.max(scores, axis=1, keepdims=True)
        p = jnp.exp(scores - m)                                  # [BR, C]
        tri = (jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
               <= jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
               ).astype(jnp.bfloat16)                   # inclusive prefix
        nch = C // 128
        wps = []
        carry = jnp.zeros((BR, 1), jnp.float32)
        carries = []
        for j in range(nch):
            chunk = p[:, j * 128:(j + 1) * 128].astype(jnp.bfloat16)
            wp = jnp.dot(chunk, tri,
                         preferred_element_type=jnp.float32)  # [BR, 128]
            wps.append(wp)
            carries.append(carry)
            carry = carry + wp[:, 127][:, None]
        total = carry                                            # [BR, 1]
        bits = pltpu.prng_random_bits((BR, 128))
        masked = jnp.bitwise_and(pltpu.bitcast(bits, jnp.int32),
                                 jnp.int32(0x00FFFFFF))
        u = masked[:, 0][:, None].astype(jnp.float32) * (1.0 / (1 << 24))
        t = jnp.maximum(u, 1e-7) * total                         # [BR, 1]
        idx = jnp.zeros((BR, 1), jnp.int32)
        for j in range(nch):
            tj = t - carries[j]                                  # [BR, 1]
            idx = idx + jnp.sum((wps[j] < tj).astype(jnp.int32), axis=1,
                                keepdims=True)
        idx = idx[:, 0]

    out_ref[:, 0] = idx

    # suff-stat contraction: onehot^T [C, BR] @ [ones | v | v^2] [BR, 3*cols].
    # One bf16 MXU pass: the one-hot is 0/1 (bf16-exact) and each f32 stat
    # column is split into hi/mid/lo bf16 pieces (3x8-bit mantissa) packed
    # along the lane axis, so the f32 value is reconstructed exactly from
    # the three partial products — f32-grade sums at bf16 matmul cost.
    vals = values_ref[:, :]                                      # [BR, cols]
    stats = jnp.concatenate(
        [jnp.ones_like(vals), vals, vals * vals], axis=1)        # [BR, 3cols]
    hi = stats.astype(jnp.bfloat16)
    r1 = stats - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    packed = jnp.concatenate([hi, mid, lo], axis=1)              # [BR, 9cols]
    onehot_t = (jax.lax.broadcasted_iota(jnp.int32, (C, BR), 0)
                == idx[None, :]).astype(jnp.bfloat16)            # [C, BR]
    part3 = jnp.dot(onehot_t, packed,
                    preferred_element_type=jnp.float32)          # [C, 9cols]
    S = stats.shape[1]
    part = part3[:, :S] + part3[:, S:2 * S] + part3[:, 2 * S:]   # [C, 3cols]

    @pl.when(i == 0)
    def _():
        sums_ref[:, :] = jnp.zeros_like(sums_ref)

    sums_ref[:, :] += part


def fused_score_sample_stats(seed, values, cl_scores, coeffs, col_groups,
                             block_rows=DEFAULT_BLOCK_ROWS, interpret=False,
                             sampling='cdf'):
    """v2 fused score + sample + stat-contraction for nich feature blocks.

    values: [B, total_cols] f32; cl_scores: [C]; coeffs: [rows, C] per
    nich_coeffs_v2 layout; col_groups: static tuple of per-block ncols.
    Returns (assignments [B] int32, stat_sums [C, 3*total_cols] f32) where
    stat_sums columns are [ones-block | v-block | v^2-block].
    """
    B, total_cols = values.shape
    C = cl_scores.shape[0]
    assert B % block_rows == 0, (B, block_rows)
    assert C % 128 == 0, 'capacity must be a lane multiple'
    assert sum(col_groups) == total_cols

    out, sums = pl.pallas_call(
        functools.partial(_fused_v2_kernel, col_groups=tuple(col_groups),
                          sampling=sampling),
        grid=(B // block_rows,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_rows, total_cols), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((coeffs.shape[0], C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * total_cols), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((C, 3 * total_cols), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32), values, cl_scores[None, :], coeffs)
    return out[:, 0], sums


def nich_coeffs_v2(shared, group):
    """Product-form coefficient rows for one nich block: [2 + 2*cols, C] =
    [sum-of-score-consts; log_coeff; then per col prec; mean].  log_coeff
    is column-independent because nu_post = nu0 + count."""
    from distributions_tpu.models import nich as nich_mod
    from distributions_tpu.special import lgamma_nu

    post = nich_mod.plus_group(shared, group)            # leaves [C, cols]
    lambda_ = ((1.0 + post.kappa) * post.sigmasq) / post.kappa
    score = (lgamma_nu(post.nu)
             - 0.5 * jnp.log(post.nu * jnp.pi * lambda_))   # [C, cols]
    base = jnp.sum(score, axis=1)                           # [C]
    lc = -0.5 * (post.nu[:, 0] + 1.0)                       # [C]
    precision = 1.0 / (post.nu * lambda_)                   # [C, cols]
    cols = precision.shape[1]
    rows = [base, lc]
    for j in range(cols):
        rows.append(precision[:, j])
        rows.append(post.mu[:, j])
    return jnp.stack(rows, axis=0)                          # [2+2c, C]


def split_stat_sums(spec, sums):
    """[C, 3*total_cols] kernel sums -> (counts_delta [C] int32,
    per-block raw sums [C, cols, 3]) matching mixture.tile_sums_fast."""
    total_cols = sum(b.cols for b in spec.blocks)
    ones = sums[:, :total_cols]
    v = sums[:, total_cols:2 * total_cols]
    vv = sums[:, 2 * total_cols:]
    counts = jnp.round(ones[:, 0]).astype(jnp.int32)
    out = []
    c0 = 0
    for b in spec.blocks:
        sl = slice(c0, c0 + b.cols)
        out.append(jnp.stack([ones[:, sl], v[:, sl], vv[:, sl]], axis=-1))
        c0 += b.cols
    return counts, tuple(out)
