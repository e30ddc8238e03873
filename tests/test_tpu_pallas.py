"""Hardware-only tests for the Pallas fused kernels (the TPU-core PRNG is
stubbed in interpret mode, so these must run on a real chip; they skip on
CPU).  Run manually:

    JAX_PLATFORMS=axon python -m pytest tests/test_tpu_pallas.py -q
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

requires_tpu = pytest.mark.skipif(
    jax.devices()[0].platform == 'cpu',
    reason='pallas PRNG requires real TPU')

from distributions_tpu import clustering, mixture as mx
from distributions_tpu.models import nich
from distributions_tpu.models import gp as gp_mod, bb as bb_mod
from distributions_tpu.ops import gibbs, pallas_kernels as pk

PY = clustering.PitmanYor.from_dict({'alpha': 1.0, 'd': 0.1})


def _problem(R=4096, C=128, seed=0):
    rng = np.random.RandomState(seed)
    spec = mx.make_spec([(nich, 2)], capacity=C, empties=1)
    shareds = (nich.shared_from_dict(
        {'mu': 0., 'kappa': 0.1, 'sigmasq': 1.0, 'nu': 1.}),)
    centers = rng.randn(8, 2) * 3
    labels = rng.randint(0, 8, R)
    values = (jnp.asarray(
        centers[labels] + 0.3 * rng.randn(R, 2), jnp.float32),)
    assignments = jnp.asarray(labels, jnp.int32)
    return spec, shareds, values, assignments, labels


@requires_tpu
def test_kernel_sampling_distribution():
    spec, shareds, values, assignments, _ = _problem()
    state = mx.state_from_assignments(spec, PY, shareds, values, assignments)
    cl_scores = clustering.score_value(
        PY, state.counts, state.alive, state.sample_size)
    coeffs = pk.nich_coeffs(shareds[0], state.groups[0])
    out = np.asarray(pk.nich_score_sample(
        7, jnp.concatenate(values, axis=1), cl_scores, coeffs,
        block_rows=256))
    from scipy.special import softmax
    ref = np.asarray(mx.score_batch(spec, PY, shareds, state, values))
    p = softmax(ref, axis=1)
    counts = np.bincount(out, minlength=spec.capacity).astype(float)
    exp = p.sum(0)
    var = np.maximum((p * (1 - p)).sum(0), 1e-9)
    z = (counts - exp) / np.sqrt(var)
    big = exp > 20
    assert np.abs(z[big]).max() < 5.0, z[big]


@requires_tpu
def test_pallas_sweep_matches_xla_statistically():
    spec, shareds, values, assignments, labels = _problem()
    state = mx.state_from_assignments(spec, PY, shareds, values, assignments)
    key = jax.random.PRNGKey(0)
    st_p, an_p = state, assignments
    st_x, an_x = state, assignments
    for i in range(5):
        key, sub = jax.random.split(key)
        st_p, an_p = gibbs.sweep_blocked_pallas(
            spec, PY, shareds, st_p, values, an_p, 1024, 256, key=sub)
        st_x, an_x = gibbs.sweep_blocked(
            spec, PY, shareds, st_x, values, an_x, 1024, key=sub)
    sp = float(mx.score_data(spec, PY, shareds, st_p))
    sx = float(mx.score_data(spec, PY, shareds, st_x))
    # both should reach comparable fits on easy data
    assert abs(sp - sx) / abs(sx) < 0.05, (sp, sx)


@requires_tpu
def test_fused_v2_kernel_distribution_and_stats():
    """v2 kernel (product-form scoring + inverse-CDF sampling + in-kernel
    stat contraction): draws must match the XLA softmax expectation and
    the emitted stat sums must equal the XLA one-hot contraction."""
    spec, shareds, values, assignments, _ = _problem()
    state = mx.state_from_assignments(spec, PY, shareds, values, assignments)
    cl_scores = clustering.score_value(
        PY, state.counts, state.alive, state.sample_size)
    coeffs = pk.nich_coeffs_v2(shareds[0], state.groups[0])
    out, sums = pk.fused_score_sample_stats(
        7, jnp.concatenate(values, axis=1), cl_scores, coeffs, (2,),
        block_rows=256)
    out = np.asarray(out)

    cd2, raw2 = pk.split_stat_sums(spec, sums)
    cd, raw = mx.tile_sums_fast(
        spec, shareds, mx.precompute_row_stats(spec, shareds, values),
        jnp.asarray(out))
    np.testing.assert_array_equal(np.asarray(cd), np.asarray(cd2))
    np.testing.assert_allclose(np.asarray(raw[0]), np.asarray(raw2[0]),
                               rtol=1e-5, atol=1e-3)

    from scipy.special import softmax
    ref = np.asarray(mx.score_batch(spec, PY, shareds, state, values))
    p = softmax(ref, axis=1)
    counts = np.bincount(out, minlength=spec.capacity).astype(float)
    exp = p.sum(0)
    var = np.maximum((p * (1 - p)).sum(0), 1e-9)
    z = (counts - exp) / np.sqrt(var)
    big = exp > 20
    assert np.abs(z[big]).max() < 5.0, z[big]


@requires_tpu
def test_fused_v2_kernel_fastmath():
    """cdf_fast (polynomial in-kernel log/exp) must match the exact-math
    XLA softmax expectation distributionally and emit identical stat sums
    for the drawn assignments."""
    spec, shareds, values, assignments, _ = _problem()
    state = mx.state_from_assignments(spec, PY, shareds, values, assignments)
    cl_scores = clustering.score_value(
        PY, state.counts, state.alive, state.sample_size)
    coeffs = pk.nich_coeffs_v2(shareds[0], state.groups[0])
    out, sums = pk.fused_score_sample_stats(
        7, jnp.concatenate(values, axis=1), cl_scores, coeffs, (2,),
        block_rows=256, sampling='cdf_fast')
    out = np.asarray(out)

    cd2, raw2 = pk.split_stat_sums(spec, sums)
    cd, raw = mx.tile_sums_fast(
        spec, shareds, mx.precompute_row_stats(spec, shareds, values),
        jnp.asarray(out))
    np.testing.assert_array_equal(np.asarray(cd), np.asarray(cd2))

    from scipy.special import softmax
    ref = np.asarray(mx.score_batch(spec, PY, shareds, state, values))
    p = softmax(ref, axis=1)
    counts = np.bincount(out, minlength=spec.capacity).astype(float)
    exp = p.sum(0)
    var = np.maximum((p * (1 - p)).sum(0), 1e-9)
    z = (counts - exp) / np.sqrt(var)
    big = exp > 20
    assert np.abs(z[big]).max() < 5.0, z[big]


@requires_tpu
def test_fused_v2_sweep():
    """Cache-carried v2 sweep reaches the same fit as the XLA blocked sweep
    and its emitted cache equals a fresh cache on the new assignments."""
    spec, shareds, values, assignments, _ = _problem()
    state = mx.state_from_assignments(spec, PY, shareds, values, assignments)
    key = jax.random.PRNGKey(0)
    cache = gibbs.build_stat_cache(spec, shareds, values, 1024, assignments)
    st_f, an_f = state, assignments
    st_x, an_x = state, assignments
    for i in range(5):
        key, sub = jax.random.split(key)
        st_f, an_f, cache = gibbs.sweep_blocked_pallas_fused(
            spec, PY, shareds, st_f, values, an_f, 1024, 256, sub, cache)
        st_x, an_x = gibbs.sweep_blocked(
            spec, PY, shareds, st_x, values, an_x, 1024, key=sub)
    fresh = gibbs.build_stat_cache(spec, shareds, values, 1024, an_f)
    np.testing.assert_array_equal(np.asarray(cache[0]),
                                  np.asarray(fresh[0]))
    sf = float(mx.score_data(spec, PY, shareds, st_f))
    sx = float(mx.score_data(spec, PY, shareds, st_x))
    assert abs(sf - sx) / abs(sx) < 0.05, (sf, sx)


@requires_tpu
def test_fused_mixed_v3_statistics():
    """v3 fused mixed sweep (in-kernel tables + count-table stats + CDF
    sampling with fast transcendentals): slot counts must match XLA-path
    softmax expectations on the tile-frozen state."""
    rng = np.random.RandomState(0)
    R, C = 4096, 128
    spec = mx.make_spec([(nich, 1), (gp_mod, 1), (bb_mod, 1)],
                        capacity=C, empties=1)
    shareds = (
        nich.shared_from_dict({'mu': 0., 'kappa': .1, 'sigmasq': 1., 'nu': 1.}),
        gp_mod.shared_from_dict({'alpha': 1.0, 'inv_beta': 0.5}),
        bb_mod.shared_from_dict({'alpha': 0.5, 'beta': 0.5}),
    )
    labels = rng.randint(0, 3, R)
    values = (
        jnp.asarray(np.array([[-2.], [0.], [2.]])[labels]
                    + 0.4 * rng.randn(R, 1), jnp.float32),
        jnp.asarray(rng.poisson(np.where(labels == 0, 2., 9.))[:, None]),
        jnp.asarray((rng.rand(R) < 0.3)[:, None]),
    )
    assignments = jnp.asarray(labels, jnp.int32)
    state = mx.state_from_assignments(spec, PY, shareds, values, assignments)
    cache = gibbs.build_stat_cache(spec, shareds, values, R, assignments)
    st, an, cache2 = gibbs.sweep_blocked_pallas_fused_mixed(
        spec, PY, shareds, state, values, assignments, R, 256,
        jax.random.PRNGKey(0), cache, sampling='cdf_fast')
    an = np.asarray(an)
    counts = np.asarray(st.counts)
    assert counts.sum() == R
    assert np.bincount(an, minlength=C).tolist() == counts.tolist()
    # emitted cache equals a fresh cache on the new assignments
    fresh = gibbs.build_stat_cache(spec, shareds, values, R, an)
    np.testing.assert_array_equal(np.asarray(cache2[0]),
                                  np.asarray(fresh[0]))
    st_rm = mx.remove_tile(spec, PY, shareds, state, values, assignments)
    from scipy.special import softmax
    ref = np.asarray(mx.score_batch(spec, PY, shareds, st_rm, values))
    p = softmax(ref, axis=1)
    cnt = np.bincount(an, minlength=C).astype(float)
    exp = p.sum(0)
    var = np.maximum((p * (1 - p)).sum(0), 1e-9)
    z = (cnt - exp) / np.sqrt(var)
    big = exp > 20
    assert np.abs(z[big]).max() < 5.0, z[big]


@requires_tpu
def test_fused_niw_v4_statistics():
    """v4 fused sweep with a niw (d=2) quadratic-form block + nich + bb:
    slot counts must match XLA-path softmax expectations, and the emitted
    cache (incl. expanded sum_xxT) must equal a fresh one."""
    from distributions_tpu.models import niw as niw_mod
    rng = np.random.RandomState(0)
    R, C, d = 4096, 128, 2
    spec = mx.make_spec([(niw_mod, 1), (nich, 1), (bb_mod, 1)],
                        capacity=C, empties=1)
    shareds = (
        niw_mod.shared_from_dict(
            {'mu': np.zeros(d), 'kappa': 1.0, 'psi': np.eye(d),
             'nu': d + 1.}),
        nich.shared_from_dict({'mu': 0., 'kappa': .1, 'sigmasq': 1.,
                               'nu': 1.}),
        bb_mod.shared_from_dict({'alpha': 0.5, 'beta': 0.5}),
    )
    labels = rng.randint(0, 3, R)
    centers = np.array([[-3.] * d, [0.] * d, [3.] * d], np.float32)
    values = (
        jnp.asarray((centers[labels]
                     + 0.5 * rng.randn(R, d))[:, None, :], jnp.float32),
        jnp.asarray(np.array([[-2.], [0.], [2.]])[labels]
                    + 0.4 * rng.randn(R, 1), jnp.float32),
        jnp.asarray((rng.rand(R) < 0.3)[:, None]),
    )
    assignments = jnp.asarray(labels, jnp.int32)
    state = mx.state_from_assignments(spec, PY, shareds, values, assignments)
    cache = gibbs.build_stat_cache(spec, shareds, values, R, assignments)
    st, an, cache2 = gibbs.sweep_blocked_pallas_fused_mixed(
        spec, PY, shareds, state, values, assignments, R, 256,
        jax.random.PRNGKey(0), cache, sampling='cdf')
    an = np.asarray(an)
    counts = np.asarray(st.counts)
    assert counts.sum() == R
    assert np.bincount(an, minlength=C).tolist() == counts.tolist()
    fresh = gibbs.build_stat_cache(spec, shareds, values, R, an)
    np.testing.assert_array_equal(np.asarray(cache2[0]),
                                  np.asarray(fresh[0]))
    for got, want in zip(cache2[1], fresh[1]):
        got, want = np.asarray(got), np.asarray(want)
        # kernel MXU reduction vs XLA's fresh contraction use different
        # f32 summation trees; cancelling sums (e.g. sum_x over +-3
        # centers) differ by O(1e-5) of the GROSS accumulated magnitude
        np.testing.assert_allclose(
            got, want, rtol=1e-3,
            atol=1e-4 * max(1.0, float(np.abs(want).max())))
    st_rm = mx.remove_tile(spec, PY, shareds, state, values, assignments)
    from scipy.special import softmax
    ref = np.asarray(mx.score_batch(spec, PY, shareds, st_rm, values))
    p = softmax(ref, axis=1)
    cnt = np.bincount(an, minlength=C).astype(float)
    exp = p.sum(0)
    var = np.maximum((p * (1 - p)).sum(0), 1e-9)
    z = (cnt - exp) / np.sqrt(var)
    big = exp > 20
    assert np.abs(z[big]).max() < 5.0, z[big]


@requires_tpu
def test_mixed_sweep_statistics():
    """gp + bb + nich blocks through the generic table kernel; slot counts
    must match XLA-path softmax expectations."""
    rng = np.random.RandomState(0)
    R, C = 4096, 64
    spec = mx.make_spec([(nich, 1), (gp_mod, 1), (bb_mod, 1)],
                        capacity=C, empties=1)
    shareds = (
        nich.shared_from_dict({'mu': 0., 'kappa': .1, 'sigmasq': 1., 'nu': 1.}),
        gp_mod.shared_from_dict({'alpha': 1.0, 'inv_beta': 0.5}),
        bb_mod.shared_from_dict({'alpha': 0.5, 'beta': 0.5}),
    )
    labels = rng.randint(0, 3, R)
    values = (
        jnp.asarray(np.array([[-2.], [0.], [2.]])[labels]
                    + 0.4 * rng.randn(R, 1), jnp.float32),
        jnp.asarray(rng.poisson(np.where(labels == 0, 2., 9.))[:, None]),
        jnp.asarray((rng.rand(R) < 0.3)[:, None]),
    )
    assignments = jnp.asarray(labels, jnp.int32)
    state = mx.state_from_assignments(spec, PY, shareds, values, assignments)
    key = jax.random.PRNGKey(0)
    st, an = gibbs.sweep_blocked_pallas_mixed(
        spec, PY, shareds, state, values, assignments, R, key,
        block_rows=256)
    an = np.asarray(an)
    counts = np.asarray(st.counts)
    assert counts.sum() == R
    assert np.bincount(an, minlength=C).tolist() == counts.tolist()
    # single-tile sweep: compare against XLA softmax expectation on the
    # tile-frozen (empty-removed) state
    st_rm = mx.remove_tile(spec, PY, shareds, state, values, assignments)
    from scipy.special import softmax
    ref = np.asarray(mx.score_batch(spec, PY, shareds, st_rm, values))
    p = softmax(ref, axis=1)
    cnt = np.bincount(an, minlength=C).astype(float)
    exp = p.sum(0)
    var = np.maximum((p * (1 - p)).sum(0), 1e-9)
    z = (cnt - exp) / np.sqrt(var)
    big = exp > 20
    assert np.abs(z[big]).max() < 5.0, z[big]
