"""Roofline calibration micro-kernels for the fused Gibbs sweep.

Measures, ON CHIP and inside single device programs (in-kernel repeats so
neither dispatch nor HBM traffic pollutes the compute numbers):

  - VPU f32 elementwise throughput for the ops the sweep kernel is built
    from (`log`, `exp`, `log1p`, FMA chains).  Method: per fori_loop
    iteration apply a K-deep chain of the op to a VMEM-resident block and
    accumulate; the time SLOPE vs K isolates the op from loop/VMEM
    scaffolding (an acc += op(x) loop alone is VMEM-traffic-bound and
    under-reports transcendental cost ~5x — measured).
  - MXU bf16 matmul throughput (the prefix-CDF / stat-contraction /
    score-table engine).  Method: grid-axis repeats of a VMEM-resident
    [N,N] dot (loop-carried perturbations would serialize a VPU pass with
    the dot; grid steps are not hoistable).
  - HBM streaming bandwidth: pallas grid copy (read+write), plus the XLA
    scan-of-adds variant for comparison.

These are the denominators for BENCH.md's roofline section: the sweep
kernel's per-cell op counts divide by these rates to give a
speed-of-light time per sweep, and achieved/peak fractions.  This is the
TPU analog of the reference's per-primitive special-function shootout
(/root/reference/benchmarks/special.cc:298-371), which calibrates
glibc/fmath/MKL exp/log/lgamma rates to interpret the mixture benchmark.

Usage: python benchmarks/roofline.py [--json out.json]
"""

import argparse
import functools
import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def _time_call(fn, *args, reps=3):
    out = fn(*args)
    _sync(out)
    best = float('inf')
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        _sync(out)
        best = min(best, time.time() - t0)
    return best


# ---------------------------------------------------------------------------
# VPU elementwise throughput via chain-depth slope.

_OPS = {
    'log': jnp.log,
    'exp': jnp.exp,
    'log1p': jnp.log1p,
    'rsqrt': lax.rsqrt,
    'fma': lambda x: x * 1.000001 + 0.000001,
    'add': lambda x: x + 1e-6,
    'mul': lambda x: x * 1.000001,
}
# keep chained values in each op's happy domain (positive, near 1)
_RENORM = {
    'log': lambda y: jnp.abs(y) + 0.5,
    'exp': lambda y: y * 1e-3,
    'log1p': lambda y: jnp.abs(y) + 0.5,
    'rsqrt': lambda y: jnp.abs(y) + 0.5,
}


def _chain_kernel(x_ref, o_ref, *, T, K, op_name):
    x = x_ref[...]
    op = _OPS[op_name]
    renorm = _RENORM.get(op_name, lambda y: y)

    def body(i, acc):
        y = x + i.astype(jnp.float32)
        for _ in range(K):
            y = op(renorm(y))
        return acc + y

    o_ref[...] = lax.fori_loop(0, T, body, jnp.zeros_like(x))


def _chain_time(op_name, K, BR=256, W=1024, T=256, grid=16):
    x = jnp.abs(jax.random.normal(
        jax.random.PRNGKey(0), (grid * BR, W), jnp.float32)) + 0.5

    @jax.jit
    def run(x):
        return pl.pallas_call(
            functools.partial(_chain_kernel, T=T, K=K, op_name=op_name),
            grid=(grid,),
            in_specs=[pl.BlockSpec((BR, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((BR, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((grid * BR, W), jnp.float32),
        )(x)

    return _time_call(run, x), float(grid) * BR * W * T


def vpu_rate(op_name, K0=1, K1=9):
    """(ops/sec isolated by slope, evals/s at K1) — each chain step is
    op(renorm(y)), so transcendental rows include one cheap renorm op."""
    t0, evals = _chain_time(op_name, K0)
    t1, _ = _chain_time(op_name, K1)
    slope = (t1 - t0) / (K1 - K0)        # seconds per extra chain level
    return evals / slope, evals * K1 / t1


# ---------------------------------------------------------------------------
# MXU bf16 matmul throughput: grid-axis repeats of a VMEM-resident dot.

def _mxu_kernel(a_ref, b_ref, o_ref, *, unroll):
    a = a_ref[...]
    b = b_ref[...]
    acc = jnp.dot(a, b, preferred_element_type=jnp.float32)
    # a second dot with swapped operand roles can't be CSE'd with the first
    for _ in range(unroll - 1):
        acc = acc + jnp.dot(a, acc.astype(jnp.bfloat16)[:, :a.shape[1]],
                            preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(0) == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    o_ref[...] += acc


def mxu_rate(N=1024, steps=512):
    a = jax.random.normal(jax.random.PRNGKey(1), (N, N), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(2), (N, N), jnp.bfloat16)

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            functools.partial(_mxu_kernel, unroll=2),
            grid=(steps,),
            in_specs=[pl.BlockSpec((N, N), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((N, N), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((N, N), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, N), jnp.float32),
        )(a, b)

    dt = _time_call(run, a, b)
    flops = 2.0 * 2 * N * N * N * steps
    return flops / dt, dt


# ---------------------------------------------------------------------------
# HBM streaming bandwidth.

def _copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] + 1.0


def hbm_rate_pallas(mb=512, block_rows=512):
    rows = mb * (1 << 20) // (4 * 1024)
    x = jnp.zeros((rows, 1024), jnp.float32)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            _copy_kernel,
            grid=(rows // block_rows,),
            in_specs=[pl.BlockSpec((block_rows, 1024), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((block_rows, 1024), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, 1024), jnp.float32),
        )(x)

    dt = _time_call(run, x)
    return 2.0 * mb * (1 << 20) / dt, dt


def hbm_rate_scan(mb=256, T=16):
    n = mb * (1 << 20) // 4
    x = jnp.zeros((n,), jnp.float32)

    @jax.jit
    def run(x):
        def body(y, _):
            return y + 1.0, ()
        y, _ = lax.scan(body, x, None, length=T)
        return y

    dt = _time_call(run, x)
    return 2.0 * 4 * n * T / dt, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--json', default=None)
    args = ap.parse_args()

    dev = jax.devices()[0]
    print('device:', dev)
    results = {'device': str(dev)}

    for name in ('add', 'mul', 'fma', 'log', 'exp', 'log1p', 'rsqrt'):
        iso, raw = vpu_rate(name)
        print('vpu %-6s slope-isolated %.3e ops/s  (chained eval %.3e/s)'
              % (name, iso, raw))
        results['vpu_%s_ops_per_sec' % name] = iso

    f, dt = mxu_rate()
    print('mxu bf16->f32 matmul: %.3e FLOP/s  [%.1f ms]' % (f, dt * 1e3))
    results['mxu_bf16_flops_per_sec'] = f

    bw, dt = hbm_rate_pallas()
    print('hbm stream pallas copy (r+w): %.3e B/s  [%.1f ms]'
          % (bw, dt * 1e3))
    results['hbm_bytes_per_sec'] = bw
    bw2, dt = hbm_rate_scan()
    print('hbm stream xla scan-adds (r+w): %.3e B/s  [%.1f ms]'
          % (bw2, dt * 1e3))
    results['hbm_scan_bytes_per_sec'] = bw2

    if args.json:
        with open(args.json, 'w') as fh:
            json.dump(results, fh, indent=1)
        print('wrote', args.json)


if __name__ == '__main__':
    main()
