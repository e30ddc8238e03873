"""Closed-form SPD inverse/logdet (ops/pallas_kernels._inv_logdet_spd_small)
vs jnp.linalg, for every dimension branch."""

import numpy as np
import pytest

import jax.numpy as jnp

from distributions_tpu.ops.pallas_kernels import _inv_logdet_spd_small


@pytest.mark.parametrize('d', [1, 2, 3, 4])
def test_inv_logdet_matches_linalg(d):
    rng = np.random.RandomState(d)
    A = rng.randn(64, 2, d, d).astype(np.float32)
    m = A @ np.swapaxes(A, -1, -2) + 0.5 * np.eye(d, dtype=np.float32)

    inv, logdet = _inv_logdet_spd_small(jnp.asarray(m))
    want_inv = np.linalg.inv(m.astype(np.float64))
    want_logdet = np.linalg.slogdet(m.astype(np.float64))[1]

    np.testing.assert_allclose(np.asarray(inv), want_inv,
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(logdet), want_logdet,
                               rtol=1e-4, atol=1e-4)


def test_niw_d3_fused_argmax_matches_xla():
    """niw d=3 through the fused kernel exercises the d=3 adjugate branch
    end to end."""
    import jax
    from distributions_tpu import clustering, mixture as mx
    from distributions_tpu.models import niw as niw_mod
    from distributions_tpu.ops import gibbs

    PY = clustering.PitmanYor.from_dict({'alpha': 1.0, 'd': 0.1})
    rng = np.random.RandomState(9)
    R, C, d = 256, 128, 3
    spec = mx.make_spec([(niw_mod, 1)], capacity=C, empties=1)
    shareds = (niw_mod.shared_from_dict(
        {'mu': np.zeros(d), 'kappa': 1.0, 'psi': np.eye(d),
         'nu': d + 1.}),)
    labels = rng.randint(0, 3, R)
    centers = np.array([[-3.] * d, [0.] * d, [3.] * d], np.float32)
    values = (jnp.asarray(
        (centers[labels] + 0.5 * rng.randn(R, d))[:, None, :],
        jnp.float32),)
    assignments = jnp.asarray(labels, jnp.int32)
    state = mx.state_from_assignments(spec, PY, shareds, values, assignments)
    cache = gibbs.build_stat_cache(spec, shareds, values, R, assignments)

    st4, an4, _ = gibbs.sweep_blocked_pallas_fused_mixed(
        spec, PY, shareds, state, values, assignments, R, 128,
        jax.random.PRNGKey(0), cache, sampling='argmax')

    st = mx.remove_tile(spec, PY, shareds, state, values, assignments)
    scores = mx.score_batch(spec, PY, shareds, st, values)
    an_ref = jnp.argmax(scores, axis=1).astype(jnp.int32)
    np.testing.assert_array_equal(np.asarray(an4), np.asarray(an_ref))
