"""CPU (interpret-mode) accuracy tests for the in-kernel polynomial
log/exp (ops/pallas_kernels.fast_log/fast_exp) — the TPU analog of the
reference's fast special functions (include/distributions/special.hpp:53-96),
validated to the same spirit of tolerance (well under the 1e-3 rel the
reference's tests allow, distributions/tests/util.py:100-151).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from distributions_tpu.ops import pallas_kernels as pk


def _run(fn, x):
    def kernel(x_ref, o_ref):
        o_ref[:, :] = fn(x_ref[:, :])
    return pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        interpret=True)(x)


def test_fast_log_accuracy():
    rng = np.random.RandomState(0)
    # spans denormal-free positive range incl. the product-form inputs
    # (>= 1) and gumbel uniforms (~2^-24..1)
    x = np.exp(rng.uniform(-17, 30, (64, 128))).astype(np.float32)
    got = np.asarray(_run(pk.fast_log, jnp.asarray(x)))
    want = np.log(x.astype(np.float64))
    assert np.abs(got - want).max() < 2e-6, np.abs(got - want).max()


def test_fast_exp_accuracy():
    rng = np.random.RandomState(1)
    x = rng.uniform(-80, 4, (64, 128)).astype(np.float32)
    got = np.asarray(_run(pk.fast_exp, jnp.asarray(x)))
    want = np.exp(x.astype(np.float64))
    rel = np.abs(got / want - 1)
    # poly is 2.3e-7 rel in f64; f32 range reduction (r = x*log2e - floor)
    # adds ~ulp(|x|*log2e)*ln2 ~ 3e-6 at x = -80
    assert rel.max() < 1e-5, rel.max()


def test_fast_exp_clamps_underflow():
    x = jnp.asarray(np.full((8, 128), -1e4, np.float32))
    got = np.asarray(_run(pk.fast_exp, x))
    assert np.isfinite(got).all()
    assert (got >= 0).all() and (got < 1e-36).all()


def test_fused_v2_fastmath_matches_exact_argmax():
    # deterministic argmax variant: fast vs exact transcendentals must pick
    # the same component for well-separated scores
    rng = np.random.RandomState(2)
    B, C, cols = 256, 256, 2
    values = jnp.asarray(rng.randn(B, cols).astype(np.float32))
    cl_scores = jnp.asarray(rng.randn(C).astype(np.float32))
    # plausible coeff rows: [base, lc, prec0, mean0, prec1, mean1]
    base = rng.randn(C).astype(np.float32)
    lc = -np.abs(rng.randn(C).astype(np.float32)) - 0.5
    coeffs = np.stack([
        base, lc,
        np.abs(rng.randn(C).astype(np.float32)) + 0.1,
        rng.randn(C).astype(np.float32),
        np.abs(rng.randn(C).astype(np.float32)) + 0.1,
        rng.randn(C).astype(np.float32)])
    co = jnp.asarray(coeffs)

    a_exact, s_exact = pk.fused_score_sample_stats(
        0, values, cl_scores, co, (cols,), block_rows=128,
        interpret=True, sampling='argmax')
    a_fast, s_fast = pk.fused_score_sample_stats(
        0, values, cl_scores, co, (cols,), block_rows=128,
        interpret=True, sampling='argmax_fast')
    # ties at 1e-6 score resolution are possible in principle but absent
    # for this seed; equality here pins the fastmath path end to end
    assert (np.asarray(a_exact) == np.asarray(a_fast)).all()
    np.testing.assert_allclose(np.asarray(s_exact), np.asarray(s_fast),
                               rtol=1e-5, atol=1e-5)
