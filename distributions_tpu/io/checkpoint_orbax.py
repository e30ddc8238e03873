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
import shutil
from collections import namedtuple

import numpy as np
import jax

from distributions_tpu import mixture as mx

LoadedCheckpoint = namedtuple('LoadedCheckpoint', [
    'state', 'assignments', 'key', 'sweep', 'logger_rows',
    'shareds', 'cl_model', 'spec'])


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.StandardCheckpointer()


def _barrier(name):
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)


def _complete(path):
    """A checkpoint directory is complete once meta.json exists — it is
    written by process 0 only after ckptr.save + wait_until_finished."""
    return os.path.isdir(path) and \
        os.path.exists(os.path.join(path, 'meta.json'))


def recover(path):
    """Recover from a crash mid-overwrite-swap (see save_sharded):
    if `path` is missing but a COMPLETE checkpoint sits at the
    `.tmp-orbax` (newer) or `.stale` (previous) sibling, rename it into
    place.  Returns True iff a complete checkpoint exists at `path`
    afterwards.  Idempotent; the runner calls it before resuming.
    Multi-process: process 0 performs the renames, everyone barriers."""
    path = os.path.abspath(path)
    if jax.process_count() > 1:
        if jax.process_index() == 0:
            _recover_local(path)
        _barrier('orbax-recover:%s' % path)
        return _complete(path)
    return _recover_local(path)


def _recover_local(path):
    if _complete(path):
        return True
    if os.path.isdir(path):
        # partial write at path itself: unusable, prefer the siblings
        shutil.rmtree(path)
    for sib in (path + '.tmp-orbax', path + '.stale'):
        if _complete(sib):
            os.rename(sib, path)
            # any remaining sibling is now obsolete (the .stale copy
            # after recovering the newer .tmp-orbax)
            for left in (path + '.tmp-orbax', path + '.stale'):
                if os.path.isdir(left):
                    shutil.rmtree(left)
            return True
    return False


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
                 logger_rows=None, force=False, shareds=None,
                 cl_model=None, spec=None):
    """Write a sharded checkpoint directory at `path` (must not exist
    unless force=True, which ATOMICALLY replaces it — the periodic-
    checkpoint case).  Collective: every process must call with the same
    arguments.

    Overwrite protocol (force=True with an existing checkpoint): the new
    checkpoint is fully written to a `<path>.tmp-orbax` sibling first,
    then swapped in with two renames (old -> `<path>.stale`, tmp ->
    path) and the stale copy deleted — a crash at any point leaves a
    complete checkpoint at `path` or at one of the siblings, never
    nothing (the reference never needed this: single-process, write-once
    files; SURVEY §5 failure-recovery row).

    shareds/cl_model (+ spec, which defines the dict schemas): current
    hyperparameters, persisted in meta.json via the same json schema as
    the npz envelope (io.checkpoint._hypers_to_json) so hyper-resampling
    runs can use the orbax format too.  The mixture capacity is also
    recorded, so restore works after mid-run grow_capacity."""
    path = os.path.abspath(path)
    tree = {'state': dict(state._asdict())}
    if assignments is not None:
        tree['assignments'] = assignments
    if key is not None:
        tree['rng_key_data'] = jax.random.key_data(key)
    tree = _globalize(tree, _discover_mesh(tree))
    swap = force and os.path.exists(path)
    dest = path + '.tmp-orbax' if swap else path
    ckptr = _checkpointer()
    ckptr.save(dest, tree, force=force)
    ckptr.wait_until_finished()
    if jax.process_index() == 0:
        meta = {'sweep': int(sweep or 0), 'logger_rows': logger_rows or [],
                'capacity': int(state.counts.shape[0])}
        if shareds is not None:
            assert spec is not None, 'hypers serialization needs the spec'
            from distributions_tpu.io import checkpoint as _ck
            meta['hypers'] = json.loads(
                _ck._hypers_to_json(shareds, cl_model, spec).decode())
        with open(os.path.join(dest, 'meta.json'), 'w') as f:
            json.dump(meta, f)
    ckptr.close()
    if swap:
        _barrier('orbax-swap-written:%s' % path)
        if jax.process_index() == 0:
            stale = path + '.stale'
            if os.path.exists(stale):
                shutil.rmtree(stale)
            os.rename(path, stale)
            os.rename(dest, path)
            shutil.rmtree(stale)
        _barrier('orbax-swap-done:%s' % path)


def load_sharded(path, spec, shareds, mesh=None, n_rows=None,
                 state_sharding=None, rows_spec=None, extended=False):
    """Restore (state, assignments, key, sweep, logger_rows) from a
    sharded checkpoint, laying arrays onto `mesh`:

    - state leaves: replicated unless `state_sharding` (a PartitionSpec
      pytree matching MixtureState, e.g. component-sharded) is given;
    - assignments: P('rows') over the mesh (or `rows_spec`);
    - with mesh=None everything restores unsharded on the default device.

    The target mesh does NOT have to match the mesh at save time.

    If the checkpoint was written after mid-run grow_capacity, the
    restore template is grown to the SAVED capacity (meta.json
    `capacity`), so state shapes always match the stored arrays; pass
    extended=True to get a LoadedCheckpoint that also carries the
    (possibly grown) spec and any persisted hyperparameters
    (shareds/cl_model — None when the checkpoint has none).
    """
    import orbax.checkpoint as ocp
    from jax.sharding import NamedSharding, PartitionSpec as P

    path = os.path.abspath(path)
    meta = None
    if os.path.exists(os.path.join(path, 'meta.json')):
        with open(os.path.join(path, 'meta.json')) as f:
            meta = json.load(f)
    if meta and meta.get('capacity') and \
            int(meta['capacity']) != spec.capacity:
        if not extended:
            # silently handing back a state at a different capacity than
            # the caller's spec would fail far from the load (r5 self-
            # review); only the extended form can return the grown spec
            raise ValueError(
                'checkpoint capacity %d != spec.capacity %d (the run '
                'grew mid-flight); call load_sharded(..., extended=True) '
                'and use the returned spec' %
                (int(meta['capacity']), spec.capacity))
        spec = spec._replace(capacity=int(meta['capacity']))
    saved_shareds, saved_cl = None, None
    if meta and meta.get('hypers') is not None:
        from distributions_tpu.io import checkpoint as _ck
        saved_shareds, saved_cl = _ck._hypers_from_json(
            json.dumps(meta['hypers']).encode(), spec)
    if saved_shareds is not None:
        shareds = saved_shareds   # dpd: group-table shapes follow shareds
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
    if meta:
        sweep, rows = int(meta['sweep']), meta['logger_rows']
    if extended:
        return LoadedCheckpoint(state, assignments, key, sweep, rows,
                                saved_shareds, saved_cl, spec)
    return state, assignments, key, sweep, rows
