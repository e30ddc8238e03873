"""Class-based model facade: one submodule-like namespace per model with
`Shared`, `Group`, `Sampler`, `sample_group`, `NAME`, `EXAMPLES`, `Value`
(the reference's feature-model API, doc/overview.rst:51-157), generated
from the functional core modules.

Groups and Shareds here hold scalar (unbatched) pytrees; scoring/sampling
delegate to the functional core with keys drawn from compat.rng.global_rng.
"""

import math
import types

import numpy as np
import jax

from distributions_tpu.models import MODULES as _CORE
from distributions_tpu.compat.rng import get_key


class _SharedBase(object):
    _core = None

    def __init__(self):
        self._data = None

    # -- reference SharedIoMixin surface (mixins.py:61-105) --
    def load(self, raw):
        self._data = self._core.shared_from_dict(raw)

    def dump(self):
        return self._core.shared_to_dict(self._data)

    @classmethod
    def from_dict(cls, raw):
        self = cls()
        self.load(raw)
        return self

    # -- reference SharedMixin surface (mixins.py:33-58) --
    def add_value(self, value):
        fn = getattr(self._core, 'shared_add_value', None)
        if fn is not None:
            self._data = fn(get_key(), self._data, value)

    def add_repeated_value(self, value, count=1):
        for _ in range(int(count)):
            self.add_value(value)

    def remove_value(self, value):
        fn = getattr(self._core, 'shared_remove_value', None)
        if fn is not None:
            self._data = fn(get_key(), self._data, value)

    def realize(self):
        fn = getattr(self._core, 'shared_realize', None)
        if fn is not None:
            self._data = fn(get_key(), self._data)

    def plus_group(self, group):
        fn = getattr(self._core, 'plus_group', None)
        if fn is None:
            raise AttributeError('no plus_group for this model')
        post = type(self)()
        post._data = fn(self._data, group._data)
        return post


class _GroupBase(object):
    _core = None

    def __init__(self):
        self._data = None

    def init(self, shared):
        self._data = self._core.group_init(shared._data)

    def load(self, raw, shared=None):
        try:
            self._data = self._core.group_from_dict(raw)
        except TypeError:
            assert shared is not None, 'this model needs shared to load'
            self._data = self._core.group_from_dict(raw, shared._data)

    def dump(self, shared=None):
        try:
            return self._core.group_to_dict(self._data)
        except TypeError:
            assert shared is not None, 'this model needs shared to dump'
            return self._core.group_to_dict(self._data, shared._data)

    @classmethod
    def from_dict(cls, raw, shared=None):
        self = cls()
        self.load(raw, shared)
        return self

    @classmethod
    def from_values(cls, shared, values=()):
        self = cls()
        self.init(shared)
        for value in values:
            self.add_value(shared, value)
        return self

    def add_value(self, shared, value):
        self._data = self._core.add_value(shared._data, self._data, value)

    def add_repeated_value(self, shared, value, count):
        self._data = self._core.add_repeated_value(
            shared._data, self._data, value, count)

    def remove_value(self, shared, value):
        self._data = self._core.remove_value(shared._data, self._data, value)

    def merge(self, shared, source):
        self._data = self._core.merge(shared._data, self._data, source._data)

    def score_value(self, shared, value):
        return float(self._core.score_value(shared._data, self._data, value))

    def score_data(self, shared):
        return float(self._core.score_data(shared._data, self._data))

    def sample_value(self, shared):
        out = self._core.sample_value(get_key(), shared._data, self._data)
        return _pyvalue(out)


class _SamplerBase(object):
    _core = None

    def init(self, shared, group=None):
        self._params = self._core.sampler_init(
            get_key(), shared._data, None if group is None else group._data)

    def eval(self, shared):
        return _pyvalue(self._core.sampler_eval(
            get_key(), shared._data, self._params))


def _pyvalue(x):
    arr = np.asarray(x)
    if arr.ndim > 0:
        return arr
    if arr.dtype == bool:
        return bool(arr)
    if np.issubdtype(arr.dtype, np.integer):
        return int(arr)
    return float(arr)


def _make_namespace(name, core):
    mod = types.ModuleType('distributions_tpu.compat.models.' + name)
    mod.NAME = core.NAME
    mod.EXAMPLES = core.EXAMPLES
    mod.Value = core.Value

    shared_cls = type('Shared', (_SharedBase,), {'_core': core})
    group_cls = type('Group', (_GroupBase,), {'_core': core})
    sampler_cls = type('Sampler', (_SamplerBase,), {'_core': core})
    mod.Shared = shared_cls
    mod.Group = group_cls
    mod.Sampler = sampler_cls

    def sample_group(shared, size):
        values = core.sample_group(get_key(), shared._data, size)
        return [_pyvalue(v) for v in np.asarray(values)]

    mod.sample_group = sample_group

    from distributions_tpu.compat.mixture import make_feature_mixture
    mod.Mixture = make_feature_mixture(core)
    mod._core = core
    return mod


_NAMESPACES = {name: _make_namespace(name, core)
               for name, core in _CORE.items()}

bb = _NAMESPACES['bb']
bnb = _NAMESPACES['bnb']
dd = _NAMESPACES['dd']
dpd = _NAMESPACES['dpd']
gp = _NAMESPACES['gp']
nich = _NAMESPACES['nich']
niw = _NAMESPACES['niw']

MODULES = _NAMESPACES
