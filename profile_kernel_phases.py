"""Split the fused v2 kernel's time into phases: scoring / sampling /
stat contraction / grid+load scaffolding.

Method: compile kernel VARIANTS that run a subset of phases (same grid,
same operand streams, frozen [C]-sized coefficient inputs) and difference
their steady-state times.  Each variant runs the full R=1M row stream as
ONE device program (grid = R/BR steps) scanned REPS times with varying
seeds, so dispatch overhead through the tunneled backend amortizes.

Variants:
  noop          load values, write one int per row        -> scaffolding
  score_max     + product-form scoring, row max           -> + scoring
  score_cdf     + inverse-CDF sampling                    -> + cdf sampling
  score_gumbel  + gumbel-argmax sampling                  -> + gumbel
  full_cdf      + in-kernel stat contraction (= production)
  full_gumbel   ditto with gumbel sampling

Usage: COLS=1 python profile_kernel_phases.py
"""

import functools
import os
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from distributions_tpu import clustering, mixture as mx
from distributions_tpu.models import nich
from distributions_tpu.ops import pallas_kernels as pk

assert jax.devices()[0].platform != 'cpu'

R = int(os.environ.get('ROWS', 1048576))
C = int(os.environ.get('CAP', 1024))
BR = int(os.environ.get('BR', 1024))
COLS = int(os.environ.get('COLS', 1))
REPS = int(os.environ.get('REPS', 10))

rng = np.random.RandomState(0)
spec = mx.make_spec([(nich, COLS)], capacity=C, empties=1)
cl = clustering.PitmanYor.from_dict({'alpha': 100.0, 'd': 0.1})
shareds = (nich.shared_from_dict(
    {'mu': 0., 'kappa': 0.1, 'sigmasq': 0.01, 'nu': 1.}),)
centers = rng.randn(C - 8, COLS).astype(np.float32)
labels = rng.randint(0, C - 8, R)
X = centers[labels] + 0.1 * rng.randn(R, COLS).astype(np.float32)
values = (jnp.asarray(X, jnp.float32),)
assignments = jnp.asarray(labels, jnp.int32)
state = mx.state_from_assignments(spec, cl, shareds, values, assignments)

cl_scores0 = clustering.score_value(cl, state.counts, state.alive,
                                    state.sample_size)
coeffs0 = jnp.concatenate(
    [pk.nich_coeffs_v2(sh, g) for sh, g in zip(shareds, state.groups)], 0)
values_cat = jnp.concatenate(values, axis=1)          # [R, COLS]
col_groups = (COLS,)


def _variant_kernel(seed_ref, values_ref, cl_ref, coeff_ref, out_ref,
                    sums_ref, *, mode):
    i = pl.program_id(0)
    if mode not in ('noop', 'tnoop'):
        pltpu.prng_seed(seed_ref[0], i)
    if mode.startswith('t'):
        tv = jnp.transpose(values_ref[...], (1, 0))   # [BR, COLS]
        values_ref = None
    Ck = cl_ref.shape[1]

    if mode == 'noop':
        out_ref[0, :] = jnp.sum(values_ref[...], axis=1).astype(jnp.int32)
        return
    if mode == 'tnoop':
        out_ref[0, :] = jnp.sum(tv, axis=1).astype(jnp.int32)
        return

    class _R:
        shape = (BR, COLS)
        def __getitem__(self, sl):
            return tv[sl] if mode.startswith('t') else values_ref[sl]
    vref = _R()
    scores = pk._score_nich_product(vref, coeff_ref,
                                    cl_ref[0, :][None, :], col_groups,
                                    jnp.log)
    if mode == 'score_max':
        out_ref[0, :] = jnp.max(scores, axis=1).astype(jnp.int32)
        return

    if mode.endswith('bits16'):
        # ONE 32-bit word per TWO cells: hi/lo 16-bit halves
        bits = pltpu.prng_random_bits((scores.shape[0],
                                       scores.shape[1] // 2))
        w = pltpu.bitcast(bits, jnp.int32)
        hi = jnp.right_shift(w, 16) & jnp.int32(0xFFFF)
        lo = jnp.bitwise_and(w, jnp.int32(0xFFFF))
        m = jnp.concatenate([hi, lo], axis=1)
        total = scores + m.astype(jnp.float32) * 1e-9
        out_ref[0, :] = jnp.argmax(total, axis=1).astype(jnp.int32)
        return
    if mode.endswith('bits'):
        # bits + mask + cast + add + argmax, NO logs: isolates the PRNG
        # generation + cheap-pass cost of the gumbel path
        bits = pltpu.prng_random_bits(scores.shape)
        m = jnp.bitwise_and(pltpu.bitcast(bits, jnp.int32),
                            jnp.int32(0x00FFFFFF))
        total = scores + m.astype(jnp.float32) * 1e-9
        out_ref[0, :] = jnp.argmax(total, axis=1).astype(jnp.int32)
        return
    sampling = 'gumbel' if mode.endswith('gumbel') else 'cdf'
    idx = pk._sample_from_kernel_scores(scores, sampling, jnp.log, jnp.exp)
    out_ref[0, :] = idx
    if not mode.startswith('full'):
        return

    part, _ = pk._nich_stat_contraction(vref, idx, Ck)

    @pl.when(i == 0)
    def _():
        sums_ref[:, :] = jnp.zeros_like(sums_ref)

    sums_ref[:, :] += part


def make_runner(mode):
    vspec = (pl.BlockSpec((COLS, BR), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
             if mode.startswith('t') else
             pl.BlockSpec((BR, COLS), lambda i: (i, 0),
                          memory_space=pltpu.VMEM))
    call = pl.pallas_call(
        functools.partial(_variant_kernel, mode=mode),
        grid=(R // BR,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            vspec,
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((coeffs0.shape[0], C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BR), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * COLS), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, R), jnp.int32),
            jax.ShapeDtypeStruct((C, 3 * COLS), jnp.float32),
        ],
    )

    vc = values_cat.T if mode.startswith('t') else values_cat

    @jax.jit
    def run(seed0, values_cat, cl_scores, coeffs):
        def body(carry, s):
            out, sums = call(jnp.asarray([s], jnp.int32), values_cat,
                             cl_scores[None, :], coeffs)
            return carry + out[0, 0] + sums[0, 0].astype(jnp.int32), ()
        c, _ = lax.scan(body, jnp.int32(0),
                        seed0 + jnp.arange(REPS, dtype=jnp.int32))
        return c

    return lambda s0, v, cl_s, co: run(s0, vc, cl_s, co)


def timeit(mode):
    run = make_runner(mode)
    out = run(jnp.int32(1), values_cat, cl_scores0, coeffs0)
    np.asarray(out)
    best = float('inf')
    for r in range(2):
        t0 = time.time()
        out = run(jnp.int32(100 + r), values_cat, cl_scores0, coeffs0)
        np.asarray(out)
        best = min(best, (time.time() - t0) / REPS)
    print('%-14s %7.2f ms/sweep-equivalent' % (mode, best * 1e3), flush=True)
    return best


if __name__ == '__main__':
    print('R=%d C=%d BR=%d COLS=%d' % (R, C, BR, COLS))
    t = {}
    modes = os.environ.get(
        'MODES', 'noop,score_max,score_cdf,score_gumbel,full_cdf,'
        'full_gumbel').split(',')
    for mode in modes:
        try:
            t[mode] = timeit(mode)
        except Exception as e:
            print('%-14s FAILED (%s)' % (mode, str(e)[:80]), flush=True)
            t[mode] = float('nan')
    print()
    print('scaffolding (load+write+grid): %6.2f ms' % (t['noop'] * 1e3))
    print('scoring:                       %6.2f ms'
          % ((t['score_max'] - t['noop']) * 1e3))
    print('cdf sampling:                  %6.2f ms'
          % ((t['score_cdf'] - t['score_max']) * 1e3))
    print('gumbel sampling:               %6.2f ms'
          % ((t['score_gumbel'] - t['score_max']) * 1e3))
    print('stat contraction (cdf):        %6.2f ms'
          % ((t['full_cdf'] - t['score_cdf']) * 1e3))
    print('full_cdf total:                %6.2f ms' % (t['full_cdf'] * 1e3))
    print('full_gumbel total:             %6.2f ms'
          % (t['full_gumbel'] * 1e3))
