"""Sharded sweep tests on the 8-virtual-device CPU mesh.

The reference never needed these (single process); the key new property is
single-device vs multi-device EQUALITY under fixed keys (layout-independent
counter-based RNG)."""

import numpy as np

import jax
import jax.numpy as jnp

from distributions_tpu import clustering, mixture as mx
from distributions_tpu.models import nich
from distributions_tpu.parallel import sharding
from tests.util import assert_close

PY = clustering.PitmanYor.from_dict({'alpha': 1.0, 'd': 0.1})


def make_problem(R=64, cols=2, C=16, seed=0):
    rng = np.random.RandomState(seed)
    spec = mx.make_spec([(nich, cols)], capacity=C, empties=1)
    shareds = (nich.shared_from_dict(
        {'mu': 0., 'kappa': 1., 'sigmasq': 1., 'nu': 1.}),)
    centers = rng.randn(3, cols) * 3
    assign_true = rng.randint(0, 3, R)
    values = (jnp.asarray(
        centers[assign_true] + 0.3 * rng.randn(R, cols), jnp.float32),)
    assignments = jnp.asarray(rng.randint(0, 3, R), jnp.int32)
    return spec, shareds, values, assignments


def test_sharded_state_matches_local():
    spec, shareds, values, assignments = make_problem()
    mesh = sharding.make_mesh()
    state_sharded = sharding.sharded_state_from_assignments(
        spec, PY, shareds, values, assignments, mesh)
    state_local = mx.state_from_assignments(
        spec, PY, shareds, values, assignments)
    assert np.asarray(state_sharded.counts).tolist() == \
        np.asarray(state_local.counts).tolist()
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3),
        state_sharded.groups, state_local.groups)


def test_sharded_sweep_invariants():
    spec, shareds, values, assignments = make_problem()
    mesh = sharding.make_mesh()
    state = mx.state_from_assignments(spec, PY, shareds, values, assignments)
    key = jax.random.PRNGKey(0)
    state2, assignments2 = sharding.sharded_sweep_blocked(
        spec, PY, shareds, state, values, assignments, key, mesh, block=4)
    counts = np.asarray(state2.counts)
    assert counts.sum() == 64
    expected = np.bincount(np.asarray(assignments2),
                           minlength=spec.capacity)
    assert counts.tolist() == expected.tolist()


def test_sharded_sweep_layout_independent():
    """The same key must give identical assignments on a 1-device and an
    8-device mesh (counter-based per-row keys) when the tile schedule
    matches (global tile = n_dev * block rows)."""
    spec, shareds, values, assignments = make_problem(R=64)
    key = jax.random.PRNGKey(3)
    state = mx.state_from_assignments(spec, PY, shareds, values, assignments)

    mesh8 = sharding.make_mesh(jax.devices()[:8])
    _, a8 = sharding.sharded_sweep_blocked(
        spec, PY, shareds, state, values, assignments, key, mesh8, block=8)

    mesh1 = sharding.make_mesh(jax.devices()[:1])
    _, a1 = sharding.sharded_sweep_blocked(
        spec, PY, shareds, state, values, assignments, key, mesh1, block=64)

    # NOTE: with 8 devices x block 8, a global tile is rows [0..63] in
    # row-major shard order == the same 64 rows as 1 device x block 64,
    # scored against the same frozen state with the same per-row keys.
    assert np.asarray(a8).tolist() == np.asarray(a1).tolist()


def test_sharded_sweep_converges_to_clusters():
    spec, shareds, values, assignments = make_problem(R=64)
    mesh = sharding.make_mesh()
    state = mx.state_from_assignments(spec, PY, shareds, values, assignments)
    key = jax.random.PRNGKey(1)
    for i in range(20):
        key, sub = jax.random.split(key)
        state, assignments = sharding.sharded_sweep_blocked(
            spec, PY, shareds, state, values, assignments, sub, mesh,
            block=4)
    # well-separated 3-cluster data: should find <= 6 nonempty groups
    nonempty = int((np.asarray(state.counts) > 0).sum())
    assert 2 <= nonempty <= 6, nonempty
