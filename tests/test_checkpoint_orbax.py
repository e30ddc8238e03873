"""Sharded (orbax) checkpoint tests on the 8-virtual-device mesh: leaves
save with their shardings, restore onto the same mesh, a different
layout, or no mesh at all."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from distributions_tpu import clustering, mixture as mx
from distributions_tpu.models import nich
from distributions_tpu.parallel import sharding
from distributions_tpu.io import checkpoint_orbax as co

PY = clustering.PitmanYor.from_dict({'alpha': 1.0, 'd': 0.1})


def _problem(C=32):
    spec = mx.make_spec([(nich, 2)], capacity=C, empties=1)
    shareds = (nich.shared_from_dict(
        {'mu': 0., 'kappa': .1, 'sigmasq': 1., 'nu': 1.}),)
    rng = np.random.RandomState(0)
    values = (jnp.asarray(rng.randn(64, 2), jnp.float32),)
    an = jnp.asarray(rng.randint(0, 3, 64), jnp.int32)
    state = mx.state_from_assignments(spec, PY, shareds, values, an)
    return spec, shareds, values, an, state


def test_sharded_roundtrip_and_reshard(tmp_path):
    spec, shareds, values, an, state = _problem()
    mesh = sharding.make_mesh()
    an_sharded = jax.device_put(an, NamedSharding(mesh, P('rows')))
    path = str(tmp_path / 'ckpt')

    co.save_sharded(path, state, assignments=an_sharded,
                    key=jax.random.PRNGKey(3), sweep=5,
                    logger_rows=[{'sweep': i} for i in range(5)])

    st2, an2, key2, sweep2, rows2 = co.load_sharded(
        path, spec, shareds, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(an2), np.asarray(an))
    np.testing.assert_array_equal(np.asarray(st2.counts),
                                  np.asarray(state.counts))
    for g2, g1 in zip(jax.tree_util.tree_leaves(st2.groups),
                      jax.tree_util.tree_leaves(state.groups)):
        np.testing.assert_array_equal(np.asarray(g2), np.asarray(g1))
    assert sweep2 == 5 and len(rows2) == 5
    assert (jax.random.key_data(key2)
            == jax.random.key_data(jax.random.PRNGKey(3))).all()
    assert an2.sharding.spec == P('rows')

    # restore WITHOUT a mesh: resharding to single-device
    st3, an3, _, _, _ = co.load_sharded(path, spec, shareds)
    np.testing.assert_array_equal(np.asarray(an3), np.asarray(an))


def test_component_sharded_state_roundtrip(tmp_path):
    """A component-sharded state (the case the replicated protobuf
    envelope cannot handle without gathering) round-trips with its
    sharding."""
    spec, shareds, values, an, state = _problem()
    mesh2 = sharding.make_mesh_2d(2, 4)
    state_c = sharding.shard_state_components(state, mesh2)
    path = str(tmp_path / 'ckpt_c')

    co.save_sharded(path, state_c, sweep=1)

    state_spec = mx.MixtureState(
        counts=P('components'), alive=P('components'), sample_size=P(),
        groups=tuple(
            jax.tree_util.tree_map(lambda _: P('components'), g)
            for g in state.groups))
    st2, an2, key2, sweep2, _ = co.load_sharded(
        path, spec, shareds, mesh=mesh2, state_sharding=state_spec)
    assert an2 is None and key2 is None and sweep2 == 1
    np.testing.assert_array_equal(np.asarray(st2.counts),
                                  np.asarray(state.counts))
    assert st2.counts.sharding.spec == P('components')
