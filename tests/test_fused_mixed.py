"""CPU (interpret-mode) correctness tests for the v3 mixed fused sweep
(ops/gibbs.sweep_blocked_pallas_fused_mixed): product-form nich scoring +
MXU table scoring + in-kernel count-table stats must reproduce the XLA
blocked path's deterministic argmax sweep and its stat sums.

Sampling paths (TPU-core PRNG) are hardware-gated in test_tpu_pallas.py;
here the deterministic 'argmax' variant pins scoring + stats end to end.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from distributions_tpu import clustering, mixture as mx
from distributions_tpu.models import nich, gp as gp_mod, bb as bb_mod
from distributions_tpu.models import dd as dd_mod
from distributions_tpu.models import niw as niw_mod
from distributions_tpu.ops import gibbs

PY = clustering.PitmanYor.from_dict({'alpha': 1.0, 'd': 0.1})


def _mixed_problem(R=512, C=128, seed=0):
    rng = np.random.RandomState(seed)
    spec = mx.make_spec([(nich, 1), (gp_mod, 1), (bb_mod, 1)],
                        capacity=C, empties=1)
    shareds = (
        nich.shared_from_dict(
            {'mu': 0., 'kappa': .1, 'sigmasq': 1., 'nu': 1.}),
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
    return spec, shareds, values, assignments


def _xla_argmax_sweep(spec, shareds, state, values, assignments):
    """Reference: remove tile, score via XLA, argmax, add tile."""
    st = mx.remove_tile(spec, PY, shareds, state, values, assignments)
    scores = mx.score_batch(spec, PY, shareds, st, values)
    an = jnp.argmax(scores, axis=1).astype(jnp.int32)
    st = mx.add_tile(spec, PY, shareds, st, values, an)
    return st, an


@pytest.mark.parametrize('sampling', ['argmax', 'argmax_fast'])
def test_mixed_fused_argmax_matches_xla(sampling):
    spec, shareds, values, assignments = _mixed_problem()
    state = mx.state_from_assignments(spec, PY, shareds, values, assignments)
    R = assignments.shape[0]
    cache = gibbs.build_stat_cache(spec, shareds, values, R, assignments)

    st3, an3, cache3 = gibbs.sweep_blocked_pallas_fused_mixed(
        spec, PY, shareds, state, values, assignments, R, 128,
        jax.random.PRNGKey(0), cache, sampling=sampling)
    st_ref, an_ref = _xla_argmax_sweep(spec, shareds, state, values,
                                       assignments)

    np.testing.assert_array_equal(np.asarray(an3), np.asarray(an_ref))
    np.testing.assert_array_equal(np.asarray(st3.counts),
                                  np.asarray(st_ref.counts))
    # emitted cache == fresh cache on the new assignments
    fresh = gibbs.build_stat_cache(spec, shareds, values, R, an3)
    np.testing.assert_array_equal(np.asarray(cache3[0]),
                                  np.asarray(fresh[0]))
    for got, want in zip(cache3[1], fresh[1]):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-3)


def test_mixed_fused_pure_discrete():
    """Spec with NO nich blocks (dummy zeros column path)."""
    rng = np.random.RandomState(1)
    R, C = 256, 128
    spec = mx.make_spec([(dd_mod, 1), (bb_mod, 1)], capacity=C, empties=1)
    shareds = (
        dd_mod.shared_from_dict({'alphas': [1.0, 0.5, 2.0, 1.5]}),
        bb_mod.shared_from_dict({'alpha': 0.5, 'beta': 0.5}),
    )
    labels = rng.randint(0, 3, R)
    values = (
        jnp.asarray(np.where(labels == 0, rng.randint(0, 2, R),
                             rng.randint(2, 4, R))[:, None], jnp.int32),
        jnp.asarray((rng.rand(R) < 0.5)[:, None]),
    )
    assignments = jnp.asarray(labels, jnp.int32)
    state = mx.state_from_assignments(spec, PY, shareds, values, assignments)
    cache = gibbs.build_stat_cache(spec, shareds, values, R, assignments)

    st3, an3, cache3 = gibbs.sweep_blocked_pallas_fused_mixed(
        spec, PY, shareds, state, values, assignments, R, 128,
        jax.random.PRNGKey(0), cache, sampling='argmax')
    st_ref, an_ref = _xla_argmax_sweep(spec, shareds, state, values,
                                       assignments)
    np.testing.assert_array_equal(np.asarray(an3), np.asarray(an_ref))
    np.testing.assert_array_equal(np.asarray(st3.counts),
                                  np.asarray(st_ref.counts))


def test_sharded_fused_matches_single_device_argmax():
    """8-device row-sharded fused sweep (local block 64 -> global union
    tile 512) must reproduce the single-device v3 sweep with block=512
    exactly under deterministic argmax sampling."""
    from distributions_tpu.parallel import sharding
    spec, shareds, values, assignments = _mixed_problem(R=512)
    state = mx.state_from_assignments(spec, PY, shareds, values, assignments)
    mesh = sharding.make_mesh()
    n_dev = mesh.devices.size
    assert n_dev == 8

    cache = gibbs.build_stat_cache(spec, shareds, values, 64, assignments)
    st_s, an_s, cache_s = sharding.sharded_sweep_fused(
        spec, PY, shareds, state, values, assignments,
        jax.random.PRNGKey(0), mesh, 64, cache, block_rows=64,
        sampling='argmax')

    cache1 = gibbs.build_stat_cache(spec, shareds, values, 512, assignments)
    st_1, an_1, _ = gibbs.sweep_blocked_pallas_fused_mixed(
        spec, PY, shareds, state, values, assignments, 512, 64,
        jax.random.PRNGKey(0), cache1, sampling='argmax')

    np.testing.assert_array_equal(np.asarray(an_s), np.asarray(an_1))
    np.testing.assert_array_equal(np.asarray(st_s.counts),
                                  np.asarray(st_1.counts))
    # the sharded cache (local per-tile sums) re-aggregates to a fresh one
    fresh = gibbs.build_stat_cache(spec, shareds, values, 64, an_s)
    np.testing.assert_array_equal(np.asarray(cache_s[0]),
                                  np.asarray(fresh[0]))


def _niw_problem(R=512, C=128, seed=3, d=2, with_mixed=True):
    rng = np.random.RandomState(seed)
    blocks = [(niw_mod, 1)] + ([(nich, 1), (bb_mod, 1)] if with_mixed
                               else [])
    spec = mx.make_spec(blocks, capacity=C, empties=1)
    shareds = [niw_mod.shared_from_dict(
        {'mu': np.zeros(d), 'kappa': 1.0, 'psi': np.eye(d), 'nu': d + 1.})]
    if with_mixed:
        shareds += [
            nich.shared_from_dict(
                {'mu': 0., 'kappa': .1, 'sigmasq': 1., 'nu': 1.}),
            bb_mod.shared_from_dict({'alpha': 0.5, 'beta': 0.5}),
        ]
    labels = rng.randint(0, 3, R)
    centers = np.array([[-3.] * d, [0.] * d, [3.] * d], np.float32)
    vals = [jnp.asarray((centers[labels]
                         + 0.5 * rng.randn(R, d))[:, None, :], jnp.float32)]
    if with_mixed:
        vals += [
            jnp.asarray(np.array([[-2.], [0.], [2.]])[labels]
                        + 0.4 * rng.randn(R, 1), jnp.float32),
            jnp.asarray((rng.rand(R) < 0.3)[:, None]),
        ]
    return spec, tuple(shareds), tuple(vals), jnp.asarray(labels, jnp.int32)


@pytest.mark.parametrize('with_mixed', [True, False])
def test_niw_fused_argmax_matches_xla(with_mixed):
    """niw (quadratic-form) blocks in the v4 fused kernel: deterministic
    argmax sweep must reproduce the XLA blocked path, and the emitted
    cache (incl. the in-kernel [1|v|upper-tri vv^T] contraction expanded
    to full sum_xxT) must equal a fresh cache on the new assignments."""
    from distributions_tpu.ops import pallas_kernels as pk
    spec, shareds, values, assignments = _niw_problem(with_mixed=with_mixed)
    assert pk.supports_mixed_pallas(spec)
    state = mx.state_from_assignments(spec, PY, shareds, values, assignments)
    R = assignments.shape[0]
    cache = gibbs.build_stat_cache(spec, shareds, values, R, assignments)

    st4, an4, cache4 = gibbs.sweep_blocked_pallas_fused_mixed(
        spec, PY, shareds, state, values, assignments, R, 128,
        jax.random.PRNGKey(0), cache, sampling='argmax')
    st_ref, an_ref = _xla_argmax_sweep(spec, shareds, state, values,
                                       assignments)

    np.testing.assert_array_equal(np.asarray(an4), np.asarray(an_ref))
    np.testing.assert_array_equal(np.asarray(st4.counts),
                                  np.asarray(st_ref.counts))
    fresh = gibbs.build_stat_cache(spec, shareds, values, R, an4)
    np.testing.assert_array_equal(np.asarray(cache4[0]),
                                  np.asarray(fresh[0]))
    for got, want in zip(cache4[1], fresh[1]):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-3)


def test_niw_sharded_fused_matches_single_device():
    from distributions_tpu.parallel import sharding
    spec, shareds, values, assignments = _niw_problem(R=512)
    state = mx.state_from_assignments(spec, PY, shareds, values, assignments)
    mesh = sharding.make_mesh()
    assert mesh.devices.size == 8

    cache = gibbs.build_stat_cache(spec, shareds, values, 64, assignments)
    st_s, an_s, _ = sharding.sharded_sweep_fused(
        spec, PY, shareds, state, values, assignments,
        jax.random.PRNGKey(0), mesh, 64, cache, block_rows=64,
        sampling='argmax')

    cache1 = gibbs.build_stat_cache(spec, shareds, values, 512, assignments)
    st_1, an_1, _ = gibbs.sweep_blocked_pallas_fused_mixed(
        spec, PY, shareds, state, values, assignments, 512, 64,
        jax.random.PRNGKey(0), cache1, sampling='argmax')

    np.testing.assert_array_equal(np.asarray(an_s), np.asarray(an_1))
    np.testing.assert_array_equal(np.asarray(st_s.counts),
                                  np.asarray(st_1.counts))


def test_dpd_fused_argmax_matches_xla():
    """dpd (mutable stick-breaking Shared) through the fused table path:
    sticks are realized for the observed support up front, then the
    fused argmax sweep must equal the XLA blocked path."""
    from distributions_tpu.models import dpd as dpd_mod
    rng = np.random.RandomState(5)
    R, C = 256, 128
    spec = mx.make_spec([(dpd_mod, 1), (nich, 1)], capacity=C, empties=1)
    sh = dpd_mod.shared_from_dict(
        {'gamma': 1.0, 'alpha': 1.0, 'betas': {}}, cap=16)
    key = jax.random.PRNGKey(7)
    for v in range(6):                      # break sticks for values 0..5
        key, sub = jax.random.split(key)
        sh = dpd_mod.shared_add_value(sub, sh, v)
    shareds = (sh, nich.shared_from_dict(
        {'mu': 0., 'kappa': .1, 'sigmasq': 1., 'nu': 1.}))
    labels = rng.randint(0, 3, R)
    values = (
        jnp.asarray(np.where(labels == 0, rng.randint(0, 3, R),
                             rng.randint(3, 6, R))[:, None], jnp.int32),
        jnp.asarray(np.array([[-2.], [0.], [2.]])[labels]
                    + 0.4 * rng.randn(R, 1), jnp.float32),
    )
    assignments = jnp.asarray(labels, jnp.int32)
    state = mx.state_from_assignments(spec, PY, shareds, values, assignments)
    cache = gibbs.build_stat_cache(spec, shareds, values, R, assignments)

    st3, an3, _ = gibbs.sweep_blocked_pallas_fused_mixed(
        spec, PY, shareds, state, values, assignments, R, 128,
        jax.random.PRNGKey(0), cache, sampling='argmax')
    st_ref, an_ref = _xla_argmax_sweep(spec, shareds, state, values,
                                       assignments)
    np.testing.assert_array_equal(np.asarray(an3), np.asarray(an_ref))
    np.testing.assert_array_equal(np.asarray(st3.counts),
                                  np.asarray(st_ref.counts))


def test_low_entropy_prior_fused_argmax():
    """LowEntropy clustering prior through the fused sweep (cl scores are
    computed outside the kernel, so any prior composes)."""
    le = clustering.LowEntropy.from_dict({'dataset_size': 512})
    spec, shareds, values, assignments = _mixed_problem()
    state = mx.state_from_assignments(spec, le, shareds, values, assignments)
    R = assignments.shape[0]
    cache = gibbs.build_stat_cache(spec, shareds, values, R, assignments)

    st3, an3, _ = gibbs.sweep_blocked_pallas_fused_mixed(
        spec, le, shareds, state, values, assignments, R, 128,
        jax.random.PRNGKey(0), cache, sampling='argmax')
    st = mx.remove_tile(spec, le, shareds, state, values, assignments)
    scores = mx.score_batch(spec, le, shareds, st, values)
    an_ref = jnp.argmax(scores, axis=1).astype(jnp.int32)
    np.testing.assert_array_equal(np.asarray(an3), np.asarray(an_ref))


def test_mixed_fused_multi_sweep_and_tiles():
    """Multiple tiles per sweep + n_sweeps>1 fused in one program."""
    spec, shareds, values, assignments = _mixed_problem(R=512)
    state = mx.state_from_assignments(spec, PY, shareds, values, assignments)
    cache = gibbs.build_stat_cache(spec, shareds, values, 256, assignments)

    st, an, cache2 = gibbs.sweep_blocked_pallas_fused_mixed(
        spec, PY, shareds, state, values, assignments, 256, 128,
        jax.random.PRNGKey(0), cache, sampling='argmax', n_sweeps=3)
    assert int(np.asarray(st.counts).sum()) == 512
    fresh = gibbs.build_stat_cache(spec, shareds, values, 256, an)
    np.testing.assert_array_equal(np.asarray(cache2[0]),
                                  np.asarray(fresh[0]))


# ---------------------------------------------------------------------------
# Host-noise sampling variants ('cdf_host' / 'gumbel_host'): pltpu.prng_seed
# has no interpret-mode lowering, so these take jax.random-generated noise
# as a kernel operand — giving the sampling paths CI-grade statistical
# coverage off-hardware (previously TPU-only, tests/test_tpu_pallas.py).

def _host_sampling_draws(sampling, key, R=4096, C=128):
    """R iid kernel draws from ONE categorical: identical rows scored
    against a fixed populated state, sampled with host noise."""
    from distributions_tpu.ops import pallas_kernels as pk
    from distributions_tpu import clustering as cl_mod

    spec, shareds, values, assignments = _mixed_problem(R=R, C=C)
    # every row identical -> every row samples the same distribution
    values = tuple(jnp.broadcast_to(v[:1], v.shape) for v in values)
    state = mx.state_from_assignments(spec, PY, shareds, values, assignments)

    (nich_blocks, quad_blocks, table_blocks, quad_groups, V, nich_vals,
     quad_vals, table_idx, supports_dev, table_vs) = \
        gibbs._mixed_static_layout(spec, values, None)
    coeffs, qcoeffs, tables = gibbs._build_fused_inputs(
        spec, nich_blocks, quad_blocks, table_blocks, V, shareds,
        supports_dev, state)
    cl_scores = cl_mod.score_value(
        PY, state.counts, state.alive, state.sample_size)
    col_groups = tuple(spec.blocks[i].cols for i in nich_blocks)

    noise = (jax.random.gumbel(key, (R, C), jnp.float32)
             if sampling.startswith('gumbel')
             else jax.random.uniform(key, (R, 1), jnp.float32))
    an, _, _, _ = pk.fused_mixed_score_sample_stats(
        0, nich_vals, table_idx, cl_scores, coeffs, tables, col_groups,
        block_rows=128, sampling=sampling, qvalues=quad_vals,
        qcoeffs=qcoeffs, quad_groups=quad_groups, noise=noise,
        table_vs=table_vs)

    scores = np.asarray(
        mx.score_batch(spec, PY, shareds, state, values))[0]  # [C]
    return np.asarray(an), scores


@pytest.mark.parametrize('sampling', ['cdf_host', 'gumbel_host'])
def test_fused_host_sampling_statistics(sampling):
    from distributions_tpu import util
    an, scores = _host_sampling_draws(sampling, jax.random.PRNGKey(7))
    probs = util.scores_to_probs(scores)
    probs_dict = {k: float(p) for k, p in enumerate(probs)}
    gof = util.discrete_goodness_of_fit(an.tolist(), probs_dict)
    assert gof > 1e-3, '%s sampling gof = %.3g' % (sampling, gof)


def test_fused_host_sampling_reproducible():
    an1, _ = _host_sampling_draws('cdf_host', jax.random.PRNGKey(3), R=512)
    an2, _ = _host_sampling_draws('cdf_host', jax.random.PRNGKey(3), R=512)
    an3, _ = _host_sampling_draws('cdf_host', jax.random.PRNGKey(4), R=512)
    np.testing.assert_array_equal(an1, an2)
    assert (an1 != an3).any()


def test_fused_host_sampling_sweep_end_to_end():
    """Full fused sweeps with 'cdf_host' sampling (the gibbs driver
    generates per-tile noise from the sweep key): state stays valid and
    the data fit improves on easy data."""
    from distributions_tpu import debug
    spec, shareds, values, _ = _mixed_problem(R=512)
    # random init (not the true labels): the sampler must find structure
    assignments = jax.random.randint(
        jax.random.PRNGKey(9), (512,), 0, 16, dtype=jnp.int32)
    state = mx.state_from_assignments(spec, PY, shareds, values, assignments)
    cache = gibbs.build_stat_cache(spec, shareds, values, 256, assignments)
    s0 = float(mx.score_data(spec, PY, shareds, state))
    key = jax.random.PRNGKey(0)
    for _ in range(3):
        key, sub = jax.random.split(key)
        state, assignments, cache = gibbs.sweep_blocked_pallas_fused_mixed(
            spec, PY, shareds, state, values, assignments, 256, 128, sub,
            cache, sampling='cdf_host')
    debug.validate_state(spec, state)
    debug.validate_assignments(spec, state, assignments)
    s1 = float(mx.score_data(spec, PY, shareds, state))
    assert np.isfinite(s1) and s1 > s0, (s0, s1)


def test_v2_kernel_stat_sums_match_xla_contraction():
    """v2 kernel's in-kernel hi/mid/lo stat contraction == the XLA one-hot
    contraction of the same draws (CPU interpret, host noise; the TPU
    bf16-MXU version of this equality is test_tpu_pallas.py's
    test_fused_v2_kernel_distribution_and_stats)."""
    import numpy as np
    from distributions_tpu import clustering
    from distributions_tpu.models import nich
    from distributions_tpu.ops import pallas_kernels as pk

    PY = clustering.PitmanYor.from_dict({'alpha': 1.0, 'd': 0.1})
    R, C = 1024, 128
    rng = np.random.RandomState(0)
    spec = mx.make_spec([(nich, 2)], capacity=C, empties=1)
    shareds = (nich.shared_from_dict(
        {'mu': 0., 'kappa': 0.1, 'sigmasq': 1.0, 'nu': 1.}),)
    centers = rng.randn(8, 2) * 3
    labels = rng.randint(0, 8, R)
    values = (jnp.asarray(
        centers[labels] + 0.3 * rng.randn(R, 2), jnp.float32),)
    state = mx.state_from_assignments(
        spec, PY, shareds, values, jnp.asarray(labels, jnp.int32))
    cl_scores = clustering.score_value(
        PY, state.counts, state.alive, state.sample_size)
    coeffs = pk.nich_coeffs_v2(shareds[0], state.groups[0])
    noise = jnp.asarray(
        np.random.RandomState(1).rand(R, 1), jnp.float32)
    out, sums = pk.fused_score_sample_stats(
        7, jnp.concatenate(values, axis=1), cl_scores, coeffs, (2,),
        block_rows=256, interpret=True, sampling='cdf_host', noise=noise)
    cd2, raw2 = pk.split_stat_sums(spec, np.asarray(sums))
    cd, raw = mx.tile_sums_fast(
        spec, shareds, mx.precompute_row_stats(spec, shareds, values),
        jnp.asarray(np.asarray(out)))
    np.testing.assert_array_equal(np.asarray(cd), np.asarray(cd2))
    np.testing.assert_allclose(np.asarray(raw[0]), np.asarray(raw2[0]),
                               rtol=1e-5, atol=1e-3)


def test_mixed_layout_rejects_uncovered_support():
    """With the packed value axis an out-of-support index would land in
    the NEXT column's lanes — the layout builder must reject supports
    that do not cover every observed value instead."""
    from distributions_tpu.models import gp as gp_mod
    spec = mx.make_spec([(gp_mod, 1)], capacity=128, empties=1)
    values = (jnp.asarray([[0], [1], [5]], jnp.int32),)
    with pytest.raises(ValueError, match='not in the provided support'):
        gibbs._mixed_static_layout(
            spec, values, (np.asarray([0, 1], np.int32),))


def test_auto_block_rows_packed_value_budget():
    """ADVICE r4: the VMEM budget must include the packed value-axis
    width for table-heavy specs (the v3 kernel holds [BR, 2V]+[BR, V]
    buffers besides [BR, C] scores)."""
    from distributions_tpu.ops import pallas_kernels as pk
    base_br = pk.auto_block_rows(1024, 2048, block=131072,
                                 sampling='gumbel')
    assert base_br == 2048
    # a huge packed axis must shrink the admitted block rows
    wide = pk.auto_block_rows(1024, 2048, block=131072,
                              sampling='gumbel', packed_v=1024 * 3)
    assert wide is not None and wide < base_br
    tiny = pk.auto_block_rows(1024, 2048, block=131072,
                              sampling='gumbel', packed_v=128)
    assert tiny == 2048  # bb-sized packing: budget unchanged


def test_packed_value_width():
    from distributions_tpu.ops import gibbs
    from distributions_tpu import mixture as mx
    from distributions_tpu.models import nich, bb, dd

    spec_n = mx.make_spec([(nich, 2)], capacity=64, empties=1)
    v_n = (jnp.zeros((8, 2), jnp.float32),)
    assert gibbs.packed_value_width(spec_n, v_n) == 0

    spec_t = mx.make_spec([(bb, 1), (dd, 1)], capacity=64, empties=1)
    v_t = (jnp.asarray([[0], [1]] * 4, jnp.int32),
           jnp.asarray([[0], [1], [2], [3]] * 2, jnp.int32))
    # supports 2 + 4 -> rounded up to one 128-lane axis
    assert gibbs.packed_value_width(spec_t, v_t) == 128
