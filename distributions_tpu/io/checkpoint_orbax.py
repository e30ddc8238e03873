"""Sharded (orbax-backed) checkpointing for large / multi-host states.

io/checkpoint.py's protobuf envelope replicates the whole state through
host 0 — right for O(C) replicated states, wrong once the state itself is
sharded (component-sharded sweeps: O(C/n_dev * V) per device) or the
assignment vector is distributed and too large to gather.  This path
saves every leaf with its sharding through orbax: each host writes only
its addressable shards, and restore re-lays the arrays onto any mesh.

Format: an orbax StandardCheckpointer directory holding
{'state': MixtureState-as-dict, 'assignments', 'rng_key_data'} plus a
`meta.json` (sweep index, logger rows) written by process 0.

Wire format interop note: this is an operational checkpoint, not the
reference-compatible exchange format — use io.checkpoint / io.protobuf
for files the reference library must read.
"""

import json
import os

import numpy as np
import jax

from distributions_tpu import mixture as mx


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.StandardCheckpointer()


def _discover_mesh(tree):
    from jax.sharding import NamedSharding
    for leaf in jax.tree_util.tree_leaves(tree):
        sh = getattr(leaf, 'sharding', None)
        if isinstance(sh, NamedSharding):
            return sh.mesh
    return None


def _globalize(tree, mesh):
    """Multi-host orbax can only serialize globally-addressable arrays;
    host-local leaves (e.g. the RNG key, scalars computed outside jit)
    are replicated onto the global mesh first.  Values must be identical
    across processes — true for everything we checkpoint."""
    if jax.process_count() == 1 or mesh is None:
        return tree
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    def fix(a):
        if isinstance(a, jax.Array) and not a.is_fully_addressable:
            return a                      # already global
        return multihost_utils.host_local_array_to_global_array(
            np.asarray(a), mesh, P())
    return jax.tree_util.tree_map(fix, tree)


def save_sharded(path, state, assignments=None, key=None, sweep=None,
                 logger_rows=None, force=False):
    """Write a sharded checkpoint directory at `path` (must not exist
    unless force=True, which overwrites — the periodic-checkpoint case).
    Collective: every process must call with the same arguments."""
    path = os.path.abspath(path)
    tree = {'state': dict(state._asdict())}
    if assignments is not None:
        tree['assignments'] = assignments
    if key is not None:
        tree['rng_key_data'] = jax.random.key_data(key)
    tree = _globalize(tree, _discover_mesh(tree))
    ckptr = _checkpointer()
    ckptr.save(path, tree, force=force)
    ckptr.wait_until_finished()
    if jax.process_index() == 0:
        meta = {'sweep': int(sweep or 0), 'logger_rows': logger_rows or []}
        with open(os.path.join(path, 'meta.json'), 'w') as f:
            json.dump(meta, f)
    ckptr.close()


def load_sharded(path, spec, shareds, mesh=None, n_rows=None,
                 state_sharding=None, rows_spec=None):
    """Restore (state, assignments, key, sweep, logger_rows) from a
    sharded checkpoint, laying arrays onto `mesh`:

    - state leaves: replicated unless `state_sharding` (a PartitionSpec
      pytree matching MixtureState, e.g. component-sharded) is given;
    - assignments: P('rows') over the mesh (or `rows_spec`);
    - with mesh=None everything restores unsharded on the default device.

    The target mesh does NOT have to match the mesh at save time.
    """
    import orbax.checkpoint as ocp
    from jax.sharding import NamedSharding, PartitionSpec as P

    path = os.path.abspath(path)
    template = mx.init(spec, shareds)

    def abstract(a, pspec):
        a = jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype) \
            if not isinstance(a, jax.ShapeDtypeStruct) else a
        if mesh is None:
            return a
        return jax.ShapeDtypeStruct(
            a.shape, a.dtype, sharding=NamedSharding(mesh, pspec))

    if state_sharding is None:
        state_sharding = jax.tree_util.tree_map(lambda _: P(), template)
    abstract_state = jax.tree_util.tree_map(
        abstract, dict(template._asdict()),
        dict(state_sharding._asdict())
        if hasattr(state_sharding, '_asdict') else state_sharding)

    target = {'state': abstract_state}
    has_meta = os.path.exists(os.path.join(path, 'meta.json'))
    # discover optional leaves from the checkpoint's own metadata
    ckptr = _checkpointer()
    saved = ckptr.metadata(path)
    item_meta = getattr(saved, 'item_metadata', saved)
    keys = set(item_meta.keys() if hasattr(item_meta, 'keys') else [])
    if 'assignments' in keys:
        meta_a = item_meta['assignments']
        n = n_rows or meta_a.shape[0]
        target['assignments'] = abstract(
            jax.ShapeDtypeStruct((n,), meta_a.dtype),
            rows_spec if rows_spec is not None else P(mesh.axis_names[0])
            if mesh is not None else P())
    if 'rng_key_data' in keys:
        meta_k = item_meta['rng_key_data']
        target['rng_key_data'] = abstract(
            jax.ShapeDtypeStruct(meta_k.shape, meta_k.dtype), P())

    restored = ckptr.restore(path, target)
    ckptr.close()

    state = mx.MixtureState(**restored['state'])
    assignments = restored.get('assignments')
    key = None
    if 'rng_key_data' in restored:
        key = jax.random.wrap_key_data(restored['rng_key_data'])
    sweep, rows = 0, []
    if has_meta:
        with open(os.path.join(path, 'meta.json')) as f:
            meta = json.load(f)
        sweep, rows = int(meta['sweep']), meta['logger_rows']
    return state, assignments, key, sweep, rows
