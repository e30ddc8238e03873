"""Headline benchmark: collapsed-Gibbs cell-scoring throughput on a DPMM.

Workload (analog of reference benchmarks/mixture.cc:104-158, scaled to TPU):
R rows x C components, 2 NICH features, Pitman-Yor prior; one blocked
collapsed-Gibbs sweep = per tile {remove tile, score [B, C] against all
components for both features, categorical reassign, add tile}.

Metric: **cell-scores/sec** where a cell = one (row, component) posterior-
predictive evaluation for one feature (the reference's unit: remove ->
score-all-K -> add per row, benchmarks/mixture.cc:104-143).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "cells/s", "vs_baseline": N}
vs_baseline divides by the measured single-core C++ reference rate
(BASELINE_MEASURED.json, recorded by running the reference's own
benchmarks/mixture on this machine — see BASELINE.md).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    # sizes (env-overridable for smoke tests)
    R = int(os.environ.get('BENCH_ROWS', 1048576))
    C = int(os.environ.get('BENCH_COMPONENTS', 1024))
    # block/kernel-rows tuning measured on the v5e chip (BENCH.md r4):
    # with gumbel sampling + lane-oriented layouts, BLOCK=131072/BR=2048
    # = 11.9 ms/sweep nich x2 (186x) and 11.0 ms nich x1 (101x); larger
    # tiles amortize the [C]-sized inter-kernel bookkeeping.
    BLOCK = int(os.environ.get('BENCH_BLOCK', 131072))
    FEATURES = int(os.environ.get('BENCH_FEATURES', 2))
    # 150 sweeps in 3 fused 50-sweep programs: a single timed call reads
    # anomalously slow through the tunnel (~2x; measured), and per-program
    # launch overhead is ~28 ms, so 3 calls x 50 fused sweeps keeps the
    # launch tax at ~0.6 ms/sweep with a stable 3-call timing base.
    SWEEPS = int(os.environ.get('BENCH_SWEEPS', 150))

    import jax
    if os.environ.get('BENCH_FORCE_CPU') == '1':
        # JAX_PLATFORMS env is overridden by the axon plugin registration;
        # only the config knob reliably forces CPU (see tests/conftest.py)
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    from distributions_tpu import clustering, mixture as mx
    from distributions_tpu.ops import gibbs
    from distributions_tpu.models import nich

    rng = np.random.RandomState(0)
    spec = mx.make_spec([(nich, FEATURES)], capacity=C, empties=1)
    cl = clustering.PitmanYor.from_dict({'alpha': 100.0, 'd': 0.1})
    shareds = (nich.shared_from_dict(
        {'mu': 0., 'kappa': 0.1, 'sigmasq': 0.01, 'nu': 1.}),)

    centers = rng.randn(C - 8, FEATURES).astype(np.float32)
    labels = rng.randint(0, C - 8, R)
    X = centers[labels] + 0.1 * rng.randn(R, FEATURES).astype(np.float32)
    values = (jnp.asarray(X, jnp.float32),)
    assignments = jnp.asarray(labels, jnp.int32)

    state = mx.state_from_assignments(spec, cl, shareds, values, assignments)
    key = jax.random.PRNGKey(0)

    use_pallas = (os.environ.get('BENCH_PALLAS', '1') == '1'
                  and jax.devices()[0].platform != 'cpu')
    kernel = os.environ.get('BENCH_KERNEL', 'v2')  # v2 | v1 | xla
    # gumbel-argmax measured faster than inverse-CDF once the roofline
    # showed logs are ~1e12/s on this VPU while the CDF's prefix matmul
    # costs 256 MXU flops/cell (BENCH.md roofline section)
    sampling = os.environ.get('BENCH_SAMPLING', 'gumbel')
    from distributions_tpu.ops import pallas_kernels as pk
    kernel_rows = int(os.environ.get(
        'BENCH_KERNEL_ROWS',
        pk.auto_block_rows(C, 2048, block=BLOCK, sampling=sampling) or 128))
    # 50 sweeps per device program (see SWEEPS comment above): amortizes
    # the ~28 ms/program launch overhead without relying on a single
    # timed call
    fuse_sweeps = int(os.environ.get('BENCH_FUSE_SWEEPS',
                                     str(max(1, SWEEPS // 3))))
    if use_pallas and kernel == 'v2':
        # v2: in-kernel stats + inverse-CDF sampling; remove-side sums are
        # cache-carried between sweeps (the [1] element of the carry).
        # BENCH_FUSE_SWEEPS>1 runs that many sweeps per device program
        # (lax.scan) so per-launch dispatch overhead amortizes.
        cache0 = gibbs.build_stat_cache(
            spec, shareds, values, BLOCK, assignments)

        if fuse_sweeps > 1:
            def one_sweep(carry, key):
                state, assignments, cache = carry
                return gibbs.run_sweeps_pallas_fused(
                    spec, cl, shareds, state, values, assignments, BLOCK,
                    kernel_rows, key, cache, fuse_sweeps, sampling)
        else:
            def one_sweep(carry, key):
                state, assignments, cache = carry
                return gibbs.sweep_blocked_pallas_fused(
                    spec, cl, shareds, state, values, assignments, BLOCK,
                    kernel_rows, key, cache, sampling)

        carry0 = (state, assignments, cache0)
    elif use_pallas and kernel == 'v1':
        dtype = (jnp.bfloat16 if os.environ.get('BENCH_DTYPE') == 'bf16'
                 else jnp.float32)

        def one_sweep(carry, key):
            state, assignments, _ = carry
            state, assignments = gibbs.sweep_blocked_pallas(
                spec, cl, shareds, state, values, assignments, BLOCK,
                kernel_rows, key=key, compute_dtype=dtype)
            return state, assignments, None

        carry0 = (state, assignments, None)
    else:
        def one_sweep(carry, key):
            state, assignments, _ = carry
            state, assignments = gibbs.sweep_blocked(
                spec, cl, shareds, state, values, assignments, BLOCK,
                key=key)
            return state, assignments, None

        carry0 = (state, assignments, None)

    # warmup/compile.  NOTE: jax.block_until_ready does not actually block
    # on the tunneled axon backend — force a host read to synchronize.
    # Synchronize on a SMALL output: reading the [R] assignment vector back
    # through the tunnel costs ~1.4s for 4MB and would dominate the timed
    # region (this inflated the round-1 recorded number 7x).  Any output of
    # the program only becomes readable when the whole program finished, so
    # the [C]-sized counts buffer is an equivalent barrier.
    def sync(carry):
        np.asarray(carry[0].counts)

    # keys are pre-split and materialized outside all timed regions; every
    # call (warmup included) gets a DISTINCT key — repeating identical
    # (program, args) calls measured ~5x slower on the first subsequent
    # distinct-args call through the tunneled backend (dedup/caching
    # artifact), which inflated the round-1 recorded numbers.
    per_call = fuse_sweeps if (use_pallas and kernel == 'v2') else 1
    calls = max(1, SWEEPS // per_call)
    allkeys = jax.random.split(key, calls + 3)
    np.asarray(jax.random.key_data(allkeys))
    subkeys, warmkeys = allkeys[:calls], allkeys[calls:]

    t0 = time.time()
    carry = one_sweep(carry0, warmkeys[0])
    sync(carry)
    compile_time = time.time() - t0

    # two more warmup passes (distinct keys) to reach steady state
    for wk in warmkeys[1:]:
        carry = one_sweep(carry0, wk)
        sync(carry)
    debug = os.environ.get('BENCH_DEBUG') == '1'
    t0 = time.time()
    carry = carry0
    for i in range(calls):
        carry = one_sweep(carry, subkeys[i])
        if debug:
            sync(carry)
            print('# call %d: %.1f ms cumulative' %
                  (i, (time.time() - t0) * 1e3), file=sys.stderr)
    sync(carry)
    elapsed = (time.time() - t0) / (calls * per_call)

    cells = float(R) * C * FEATURES
    cells_per_sec = cells / elapsed

    baseline = None
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             'BASELINE_MEASURED.json')
    if os.path.exists(base_path):
        with open(base_path) as f:
            baseline = json.load(f).get('nich_cells_per_sec_K1000')

    out = {
        'metric': 'gibbs_cell_scores_per_sec',
        'value': round(cells_per_sec, 1),
        'unit': 'cells/s',
        'vs_baseline': (round(cells_per_sec / baseline, 2)
                        if baseline else None),
    }
    print(json.dumps(out))
    print("# R={} C={} block={} pallas={} kernel={} sweep={:.4f}s "
          "compile={:.1f}s device={}"
          .format(R, C, BLOCK, int(use_pallas), kernel if use_pallas
                  else 'xla', elapsed, compile_time,
                  jax.devices()[0].platform), file=sys.stderr)


if __name__ == '__main__':
    main()
