"""IO tests: stream containers (reference tests/test_io.py), protobuf
round trips (reference test_protobuf analogs), checkpoint/resume."""

import os
import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from distributions_tpu.io import stream, protobuf as pio, checkpoint
from distributions_tpu.io import schema_pb2
from distributions_tpu.models import MODULES
from distributions_tpu import clustering, mixture as mx
from distributions_tpu.models import nich
from tests.util import assert_close
from tests.test_models import load_shared, group_from_values, group_to_dict


@pytest.fixture
def tmpfile(tmp_path):
    def make(name):
        return str(tmp_path / name)
    return make


EXAMPLE_ITEMS = [
    {'a': 0},
    {'b': [0, 1, 2]},
    {'c': 'asdf'},
    [0, 1, 'asdf'],
    0,
    1.5,
]


@pytest.mark.parametrize('suffix', ['', '.gz', '.bz2'])
def test_json_stream(tmpfile, suffix):
    fn = tmpfile('stream.json' + suffix)
    stream.json_stream_dump(EXAMPLE_ITEMS, fn)
    assert list(stream.json_stream_load(fn)) == EXAMPLE_ITEMS


def test_json_dump_load(tmpfile):
    fn = tmpfile('data.json.gz')
    stream.json_dump(EXAMPLE_ITEMS, fn)
    assert stream.json_load(fn) == EXAMPLE_ITEMS


@pytest.mark.parametrize('suffix', ['', '.gz', '.bz2'])
def test_protobuf_stream(tmpfile, suffix):
    fn = tmpfile('stream.pbs' + suffix)
    items = [b'', b'a', b'xyz' * 1000, bytes(range(256))]
    stream.protobuf_stream_dump(items, fn)
    assert list(stream.protobuf_stream_load(fn)) == items


def test_protobuf_stream_framing_matches_reference_format(tmpfile):
    # uint32-LE length prefix (reference io/stream.py:141-152)
    fn = tmpfile('frames.pbs')
    stream.protobuf_stream_dump([b'abc'], fn)
    with open(fn, 'rb') as f:
        raw = f.read()
    assert raw == b'\x03\x00\x00\x00abc'


@pytest.mark.parametrize('name', sorted(MODULES))
def test_protobuf_shared_roundtrip(name):
    module = MODULES[name]
    for example in module.EXAMPLES:
        shared = load_shared(module, example, observe=True)
        msg = pio.shared_dump(name, shared)
        data = msg.SerializeToString()
        msg2 = type(msg).FromString(data)
        shared2 = pio.shared_load(name, msg2)
        d1 = module.shared_to_dict(shared)
        d2 = module.shared_to_dict(shared2)
        assert_close(d1, d2, tol=1e-5)


@pytest.mark.parametrize('name', sorted(MODULES))
def test_protobuf_group_roundtrip(name):
    module = MODULES[name]
    for example in module.EXAMPLES:
        shared = load_shared(module, example, observe=True)
        group = group_from_values(module, shared, example['values'])
        msg = pio.group_dump(name, group, shared=shared)
        msg2 = type(msg).FromString(msg.SerializeToString())
        group2 = pio.group_load(name, msg2, shared=shared)
        assert_close(group_to_dict(module, group, shared),
                     group_to_dict(module, group2, shared), tol=1e-5)


def test_protobuf_clustering_roundtrip():
    py = clustering.PitmanYor.from_dict({'alpha': 2.5, 'd': 0.3})
    msg = pio.clustering_dump(py)
    back = pio.clustering_load(
        schema_pb2.Clustering.FromString(msg.SerializeToString()))
    assert isinstance(back, clustering.PitmanYor)
    assert_close(back.to_dict(), py.to_dict(), tol=1e-6)

    le = clustering.LowEntropy.from_dict({'dataset_size': 1000})
    msg = pio.clustering_dump(le)
    back = pio.clustering_load(
        schema_pb2.Clustering.FromString(msg.SerializeToString()))
    assert isinstance(back, clustering.LowEntropy)
    assert back.to_dict() == le.to_dict()


def test_checkpoint_roundtrip(tmpfile):
    rng = np.random.RandomState(0)
    spec = mx.make_spec([(nich, 2)], capacity=16, empties=1)
    cl = clustering.PitmanYor.from_dict({'alpha': 1.0, 'd': 0.1})
    shareds = (nich.shared_from_dict(
        {'mu': 0., 'kappa': 1., 'sigmasq': 1., 'nu': 1.}),)
    values = (jnp.asarray(rng.randn(32, 2), jnp.float32),)
    assignments = jnp.asarray(rng.randint(0, 4, 32), jnp.int32)
    state = mx.state_from_assignments(spec, cl, shareds, values, assignments)
    key = jax.random.PRNGKey(42)

    fn = tmpfile('ckpt.pbs')
    checkpoint.save(fn, state, assignments=assignments, key=key)
    state2, assignments2, key2 = checkpoint.load(fn, spec, shareds)

    assert np.asarray(state2.counts).tolist() == \
        np.asarray(state.counts).tolist()
    assert np.asarray(assignments2).tolist() == \
        np.asarray(assignments).tolist()
    assert (np.asarray(jax.random.key_data(key2))
            == np.asarray(jax.random.key_data(key))).all()
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), state2.groups, state.groups)
    # resumed state scores identically
    s1 = float(mx.score_data(spec, cl, shareds, state))
    s2 = float(mx.score_data(spec, cl, shareds, state2))
    assert s1 == s2


def test_checkpoint_reads_legacy_per_element_format(tmp_path):
    """Round-1 checkpoints encoded counts/alive/assignments as repeated
    proto scalars (fields 1/2/6); the loader still reads them."""
    import jax
    from distributions_tpu import clustering, mixture as mx
    from distributions_tpu.models import nich
    from distributions_tpu.io import checkpoint, schema_pb2
    from distributions_tpu.io.stream import protobuf_stream_dump

    spec = mx.make_spec([(nich, 1)], capacity=8, empties=1)
    shareds = (nich.shared_from_dict(
        {'mu': 0., 'kappa': 1., 'sigmasq': 1., 'nu': 1.}),)
    state = mx.init(spec, shareds)

    msg = schema_pb2.MixtureCheckpoint()
    msg.counts.extend(int(c) for c in np.asarray(state.counts))
    msg.alive.extend(bool(a) for a in np.asarray(state.alive))
    msg.sample_size = 0
    for group in state.groups:
        msg.feature_blocks.append(checkpoint._pack_tree(group))
    msg.assignments.extend([0, 1, 1, 0])
    path = str(tmp_path / 'legacy.ckpt')
    protobuf_stream_dump([msg.SerializeToString()], path)

    st2, an2, key2, sweep2, rows2 = checkpoint.load_extended(
        path, spec, shareds)
    np.testing.assert_array_equal(np.asarray(an2), [0, 1, 1, 0])
    np.testing.assert_array_equal(np.asarray(st2.counts),
                                  np.asarray(state.counts))
    assert key2 is None and sweep2 == 0 and rows2 == []


def test_json_costream_dump_roundtrip(tmp_path):
    from distributions_tpu.io.stream import (
        json_costream_dump, json_stream_load)
    path = str(tmp_path / 'co.json.gz')
    co = json_costream_dump(path)
    next(co)
    items = [{'a': 1}, [2, 3], 'four']
    for item in items:
        co.send(item)
    co.close()
    assert list(json_stream_load(path)) == items


def test_fileutil_tempdir_and_chdir():
    import os
    from distributions_tpu import fileutil
    start = os.getcwd()
    with fileutil.tempdir() as wd:
        assert os.getcwd() == os.path.realpath(wd) or os.getcwd() == wd
        with open('x.txt', 'w') as f:
            f.write('hi')
    assert os.getcwd() == start
    assert not os.path.exists(wd)
    with fileutil.chdir('/tmp'):
        assert os.getcwd() == '/tmp' or os.getcwd().endswith('tmp')
    assert os.getcwd() == start
