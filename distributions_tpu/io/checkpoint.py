"""Checkpoint/resume for mixture states: full inference state (counts,
alive mask, per-feature suff stats, assignments, rng key, sweep index,
sweep logs) to one file.

The reference checkpoints via per-object json/protobuf dumps plus
MixtureIdTracker global ids (reference examples/mixture/main.py:232-244,
io/stream.py).  Here a whole device-resident MixtureState round-trips in
one call; the payload is a protobuf envelope (schema.MixtureCheckpoint)
whose array contents — counts, alive, assignments, feature blocks — ride
npz byte blobs (O(1) python objects; a 1M-row assignment vector packs in
milliseconds, vs multi-second repeated-int encoding), written through the
length-prefixed stream container so checkpoints can be appended to a
stream file.

Resume contract: the envelope carries the RNG key, the COMPLETED-SWEEP
index, and the SweepLogger rows, so `inference.runner.run_gibbs` continues
at sweep t+1 with the identical key stream and uninterrupted sweep
numbering after a crash.

For multi-host sharded states the state is replicated (O(C) memory), so
host 0 writing is sufficient (runner._save gathers the row-sharded
assignments first); orbax integration for sharded arrays can layer on
later without changing this format.
"""

import io as _io
import json

import numpy as np
import jax
import jax.numpy as jnp

from distributions_tpu import mixture as mx
from distributions_tpu.io import schema_pb2
from distributions_tpu.io.stream import (
    protobuf_stream_dump, protobuf_stream_load)


def _pack_arrays(**arrays):
    buf = _io.BytesIO()
    np.savez(buf, **arrays)
    return buf.getvalue()


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


def _hypers_to_json(shareds, cl_model, spec):
    """json blob for hyper-grid runs: the CURRENT shareds + clustering
    model, so resume restores resampled hyperparameters (the spec's block
    modules define the dict schemas)."""
    from distributions_tpu import clustering as _cl

    def default(o):
        return o.tolist() if hasattr(o, 'tolist') else float(o)

    dumped = []
    for block, shared in zip(spec.blocks, shareds):
        if hasattr(block.module, 'shared_to_state_dict'):
            # dpd: slot-order-preserving form (group tables are
            # slot-aligned; the sorted dict form would permute slots)
            raw = block.module.shared_to_state_dict(shared)
            raw['__state_dict__'] = True
        else:
            raw = block.module.shared_to_dict(shared)
        dumped.append(raw)
    blob = {'shareds': dumped}
    if cl_model is not None:
        blob['cl_kind'] = ('py' if isinstance(cl_model, _cl.PitmanYor)
                           else 'le')
        blob['cl'] = cl_model.to_dict()
    return json.dumps(blob, default=default).encode()


def _hypers_from_json(data, spec):
    """(shareds tuple or None, cl_model or None) from the hypers blob."""
    from distributions_tpu import clustering as _cl
    blob = json.loads(data.decode())

    def intkeys(raw):
        # json coerces dict keys to str; dpd's betas/counts are value-keyed
        return {k: ({int(a): b for a, b in v.items()}
                    if isinstance(v, dict) else v)
                for k, v in raw.items()}

    shareds = []
    for block, raw in zip(spec.blocks, blob['shareds']):
        raw = intkeys(raw)
        if raw.pop('__state_dict__', False):
            shareds.append(block.module.shared_from_state_dict(raw))
        else:
            shareds.append(block.module.shared_from_dict(raw))
    shareds = tuple(shareds)
    cl_model = None
    if 'cl' in blob:
        cls = _cl.PitmanYor if blob['cl_kind'] == 'py' else _cl.LowEntropy
        cl_model = cls.from_dict(blob['cl'])
    return shareds, cl_model


def state_to_message(state, assignments=None, key=None, sweep=None,
                     logger_rows=None, shareds=None, cl_model=None,
                     spec=None):
    msg = schema_pb2.MixtureCheckpoint()
    arrays = {
        'counts': np.asarray(state.counts),
        'alive': np.asarray(state.alive),
    }
    if assignments is not None:
        arrays['assignments'] = np.asarray(assignments)
    msg.arrays = _pack_arrays(**arrays)
    msg.sample_size = int(state.sample_size)
    for group in state.groups:
        msg.feature_blocks.append(_pack_tree(group))
    if key is not None:
        msg.rng_key.extend(
            int(x) for x in np.asarray(jax.random.key_data(key)).ravel())
    if sweep is not None:
        msg.sweep = int(sweep)
    if logger_rows is not None:
        msg.logger_rows = json.dumps(logger_rows).encode()
    if shareds is not None:
        assert spec is not None, 'shareds serialization needs the spec'
        msg.hypers = _hypers_to_json(shareds, cl_model, spec)
    return msg


def message_to_state(msg, spec, shareds):
    if msg.arrays:
        with np.load(_io.BytesIO(msg.arrays)) as z:
            counts = jnp.asarray(z['counts'], jnp.int32)
            alive = jnp.asarray(z['alive'], bool)
            assignments = (jnp.asarray(z['assignments'], jnp.int32)
                           if 'assignments' in z.files else None)
    else:  # legacy per-element encoding (fields 1/2/6)
        counts = jnp.asarray(list(msg.counts), jnp.int32)
        alive = jnp.asarray(list(msg.alive), bool)
        assignments = (jnp.asarray(list(msg.assignments), jnp.int32)
                       if msg.assignments else None)
    template = mx.init(spec, shareds)
    groups = tuple(
        _unpack_tree(data, like)
        for data, like in zip(msg.feature_blocks, template.groups))
    state = mx.MixtureState(
        counts=counts,
        alive=alive,
        sample_size=jnp.int32(msg.sample_size),
        groups=groups)
    key = None
    if msg.rng_key:
        key = jax.random.wrap_key_data(
            jnp.asarray(list(msg.rng_key), jnp.uint32))
    return state, assignments, key


def save(filename, state, assignments=None, key=None, sweep=None,
         logger_rows=None, shareds=None, cl_model=None, spec=None):
    msg = state_to_message(state, assignments, key, sweep=sweep,
                           logger_rows=logger_rows, shareds=shareds,
                           cl_model=cl_model, spec=spec)
    protobuf_stream_dump([msg.SerializeToString()], filename)


def _load_message(filename):
    stream = protobuf_stream_load(filename)
    data = next(iter(stream))
    stream.close()
    return schema_pb2.MixtureCheckpoint.FromString(data)


def load(filename, spec, shareds):
    """(state, assignments, key) — the round-1 3-tuple interface."""
    return message_to_state(_load_message(filename), spec, shareds)


def load_extended(filename, spec, shareds):
    """(state, assignments, key, sweep, logger_rows) — sweep is the
    number of completed sweeps (0 for legacy checkpoints), logger_rows a
    list of dicts ([] for legacy)."""
    msg = _load_message(filename)
    state, assignments, key = message_to_state(msg, spec, shareds)
    rows = json.loads(msg.logger_rows.decode()) if msg.logger_rows else []
    return state, assignments, key, int(msg.sweep), rows


def load_hypers(filename, spec):
    """(shareds tuple or None, cl_model or None) — the resampled
    hyperparameters of a hyper-grid run's checkpoint (None, None for
    checkpoints written without them)."""
    msg = _load_message(filename)
    if not msg.hypers:
        return None, None
    return _hypers_from_json(msg.hypers, spec)
