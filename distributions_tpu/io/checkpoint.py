"""Checkpoint/resume for mixture states: full inference state (counts,
alive mask, per-feature suff stats, assignments, rng key) to one file.

The reference checkpoints via per-object json/protobuf dumps plus
MixtureIdTracker global ids (reference examples/mixture/main.py:232-244,
io/stream.py).  Here a whole device-resident MixtureState round-trips in
one call; the payload is a protobuf envelope (schema.MixtureCheckpoint)
with npz-packed feature blocks, written through the length-prefixed
stream container so checkpoints can be appended to a stream file.

For multi-host sharded states the state is replicated (O(C) memory), so
host 0 writing is sufficient; orbax integration for sharded arrays can
layer on later without changing this format.
"""

import io as _io

import numpy as np
import jax
import jax.numpy as jnp

from distributions_tpu import mixture as mx
from distributions_tpu.io import schema_pb2
from distributions_tpu.io.stream import (
    protobuf_stream_dump, protobuf_stream_load)


def _pack_tree(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    buf = _io.BytesIO()
    np.savez(buf, *[np.asarray(l) for l in leaves])
    return buf.getvalue()


def _unpack_tree(data, like):
    _, treedef = jax.tree_util.tree_flatten(like)
    with np.load(_io.BytesIO(data)) as z:
        leaves = [jnp.asarray(z['arr_%d' % i]) for i in range(len(z.files))]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def state_to_message(state, assignments=None, key=None):
    msg = schema_pb2.MixtureCheckpoint()
    msg.counts.extend(int(c) for c in np.asarray(state.counts))
    msg.alive.extend(bool(a) for a in np.asarray(state.alive))
    msg.sample_size = int(state.sample_size)
    for group in state.groups:
        msg.feature_blocks.append(_pack_tree(group))
    if key is not None:
        msg.rng_key.extend(
            int(x) for x in np.asarray(jax.random.key_data(key)).ravel())
    if assignments is not None:
        msg.assignments.extend(int(a) for a in np.asarray(assignments))
    return msg


def message_to_state(msg, spec, shareds):
    counts = jnp.asarray(list(msg.counts), jnp.int32)
    template = mx.init(spec, shareds)
    groups = tuple(
        _unpack_tree(data, like)
        for data, like in zip(msg.feature_blocks, template.groups))
    state = mx.MixtureState(
        counts=counts,
        alive=jnp.asarray(list(msg.alive), bool),
        sample_size=jnp.int32(msg.sample_size),
        groups=groups)
    assignments = (jnp.asarray(list(msg.assignments), jnp.int32)
                   if msg.assignments else None)
    key = None
    if msg.rng_key:
        key = jax.random.wrap_key_data(
            jnp.asarray(list(msg.rng_key), jnp.uint32))
    return state, assignments, key


def save(filename, state, assignments=None, key=None):
    msg = state_to_message(state, assignments, key)
    protobuf_stream_dump([msg.SerializeToString()], filename)


def load(filename, spec, shareds):
    stream = protobuf_stream_load(filename)
    data = next(iter(stream))
    stream.close()
    msg = schema_pb2.MixtureCheckpoint.FromString(data)
    return message_to_state(msg, spec, shareds)
