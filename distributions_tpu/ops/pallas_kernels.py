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

    iota_v = jax.lax.broadcasted_iota(jnp.int32, (BR, V), 1)
    for j in range(table_cols):
        onehot = (idx_ref[:, j][:, None] == iota_v).astype(jnp.float32)
        scores = scores + jnp.dot(onehot, tables_ref[j],
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
            pl.BlockSpec((max(table_cols, 1), V, C),
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
