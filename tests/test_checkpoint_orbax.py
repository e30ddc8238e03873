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


def test_atomic_overwrite_and_hypers_meta(tmp_path):
    """force=True replaces an existing checkpoint via tmp+rename (no
    window with no valid checkpoint; ADVICE r4) and meta.json carries
    persisted hypers + capacity."""
    import os
    spec, shareds, values, an, state = _problem()
    path = str(tmp_path / 'ckpt_atomic')

    co.save_sharded(path, state, key=jax.random.PRNGKey(0), sweep=1,
                    shareds=shareds, cl_model=PY, spec=spec)
    shareds2 = (shareds[0]._replace(sigmasq=jnp.float32(2.5)),)
    co.save_sharded(path, state, key=jax.random.PRNGKey(1), sweep=2,
                    force=True, shareds=shareds2, cl_model=PY, spec=spec)
    assert not os.path.exists(path + '.tmp-orbax')
    assert not os.path.exists(path + '.stale')

    loaded = co.load_sharded(path, spec, shareds, extended=True)
    assert loaded.sweep == 2
    assert loaded.shareds is not None
    assert float(loaded.shareds[0].sigmasq) == 2.5
    assert float(loaded.cl_model.alpha) == 1.0
    assert loaded.spec.capacity == spec.capacity


def test_load_adopts_saved_capacity(tmp_path):
    """Restoring with a spec at the ORIGINAL capacity after the state
    grew mid-run succeeds: the template follows meta.json's capacity
    (ADVICE r4 medium: previously a shape-mismatch failure)."""
    spec, shareds, values, an, state = _problem(C=32)
    grown_spec, grown_state = mx.grow_capacity(spec, state, 64)
    path = str(tmp_path / 'ckpt_grown')
    co.save_sharded(path, grown_state, assignments=an,
                    key=jax.random.PRNGKey(0), sweep=3)

    loaded = co.load_sharded(path, spec, shareds, extended=True)
    assert loaded.spec.capacity == 64
    assert loaded.state.counts.shape[0] == 64
    np.testing.assert_array_equal(np.asarray(loaded.state.counts),
                                  np.asarray(grown_state.counts))


def test_runner_orbax_resume_after_growth(tmp_path):
    """End-to-end: orbax-format run that grows capacity, checkpoints,
    and resumes with the caller's ORIGINAL (smaller) spec."""
    from distributions_tpu.inference import runner
    rng = np.random.RandomState(0)
    spec = mx.make_spec([(nich, 1)], capacity=4, empties=1)
    shareds = (nich.shared_from_dict(
        {'mu': 0., 'kappa': 0.1, 'sigmasq': 0.01, 'nu': 1.}),)
    values = (jnp.asarray(rng.randn(64, 1) * 5, jnp.float32),)
    cl = clustering.PitmanYor.from_dict({'alpha': 20.0, 'd': 0.1})
    ckpt = str(tmp_path / 'grow_orbax')

    st1, an1, _ = runner.run_gibbs(
        spec, cl, shareds, values, jax.random.PRNGKey(1), passes=5,
        block=16, checkpoint_path=ckpt, checkpoint_every=5,
        checkpoint_format='orbax', resume=False)
    assert np.asarray(st1.counts).shape[0] >= 8  # grew beyond 4

    st2, an2, log2 = runner.run_gibbs(
        spec, cl, shareds, values, jax.random.PRNGKey(2), passes=7,
        block=16, checkpoint_path=ckpt, checkpoint_format='orbax',
        resume=True)
    assert int(st2.sample_size) == 64
    assert np.asarray(st2.counts).shape[0] >= 8
    # restored history [0..4] + the two new sweeps, continuous numbering
    assert [r['sweep'] for r in log2.rows] == list(range(7))


def test_recover_from_mid_swap_crash(tmp_path):
    """A crash between the overwrite-swap's two renames leaves `path`
    missing with complete checkpoints at the siblings; recover() heals
    it (preferring the newer .tmp-orbax) instead of silently restarting
    from sweep 0 (r5 self-review)."""
    import os
    spec, shareds, values, an, state = _problem()
    path = str(tmp_path / 'ck')
    co.save_sharded(path, state, key=jax.random.PRNGKey(0), sweep=1)
    path2 = str(tmp_path / 'ck2')
    co.save_sharded(path2, state, key=jax.random.PRNGKey(1), sweep=2)

    # simulate the crash window: old at .stale, new at .tmp-orbax
    os.rename(path, path + '.stale')
    os.rename(path2, path + '.tmp-orbax')
    assert not os.path.exists(path)

    assert co.recover(path)
    loaded = co.load_sharded(path, spec, shareds, extended=True)
    assert loaded.sweep == 2          # the newer checkpoint won
    assert not os.path.exists(path + '.tmp-orbax')

    # stale-only variant (crash before the tmp write completed)
    os.rename(path, path + '.stale')
    assert co.recover(path)
    loaded = co.load_sharded(path, spec, shareds, extended=True)
    assert loaded.sweep == 2
    # nothing to recover -> False
    assert not co.recover(str(tmp_path / 'missing'))


def test_nonextended_load_rejects_capacity_mismatch(tmp_path):
    """Without extended=True a capacity-mismatched restore raises
    immediately instead of returning a state the caller's spec cannot
    describe (r5 self-review)."""
    spec, shareds, values, an, state = _problem(C=32)
    grown_spec, grown_state = mx.grow_capacity(spec, state, 64)
    path = str(tmp_path / 'ck_g')
    co.save_sharded(path, grown_state, sweep=1)
    with pytest.raises(ValueError, match='extended=True'):
        co.load_sharded(path, spec, shareds)
