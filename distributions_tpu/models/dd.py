"""Dirichlet-Discrete conjugate model.

Semantics match the reference (dbg/models/dd.py:34-156,
include/distributions/models/dd.hpp): Value=int in [0, dim),
Shared={alphas[dim]}, Group={counts[dim]}.

The reference templates a compile-time `max_dim` (dd.hpp:40-42, instantiated
at 256 for python); here `dim` is simply the static trailing axis of the
arrays, so any dim jit-compiles its own kernel.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from distributions_tpu.special import gammaln
from distributions_tpu.random import sample_dirichlet, sample_discrete
from distributions_tpu.models import base

NAME = 'DirichletDiscrete'
EXAMPLES = [
    {
        'shared': {'alphas': [0.5] * 4},
        'values': [0, 1, 0, 2, 0, 1, 0],
    },
    {
        'shared': {'alphas': [1.0, 4.0]},
        'values': [0, 1, 1, 1, 1, 0, 1],
    },
    {
        'shared': {'alphas': [2.0 / n for n in range(1, 21)]},
        'values': list(range(20)),
    },
]
Value = int


class Shared(NamedTuple):
    alphas: jnp.ndarray  # [dim] float32


class Group(NamedTuple):
    counts: jnp.ndarray  # [..., dim] int32


def dim(shared):
    return shared.alphas.shape[-1]


def shared_from_dict(raw):
    return Shared(alphas=jnp.asarray(raw['alphas'], jnp.float32))


def shared_to_dict(shared):
    return {'alphas': [float(a) for a in shared.alphas]}


def group_from_dict(raw):
    return Group(counts=jnp.asarray(raw['counts'], jnp.int32))


def group_to_dict(group):
    return {'counts': [int(c) for c in group.counts]}


def group_init(shared, shape=()):
    return Group(counts=jnp.zeros(shape + (dim(shared),), jnp.int32))


def add_value(shared, group, value):
    return add_repeated_value(shared, group, value, 1)


def add_repeated_value(shared, group, value, count):
    value = jnp.asarray(value, jnp.int32)
    count = jnp.asarray(count, jnp.int32)
    onehot = (jnp.arange(dim(shared), dtype=jnp.int32) == value[..., None])
    return Group(counts=group.counts + count * onehot.astype(jnp.int32))


def remove_value(shared, group, value):
    return add_repeated_value(shared, group, value, -1)


def merge(shared, destin, source):
    return Group(counts=destin.counts + source.counts)


def unmerge(shared, destin, source):
    return Group(counts=destin.counts - source.counts)


def score_value(shared, group, value):
    """\\cite{wallach2009rethinking} Eqn 4 (reference dbg/models/dd.py:94-101).

    Accepts a [..., dim]-batched group and integer value broadcastable
    against the batch."""
    value = jnp.asarray(value, jnp.int32)
    counts = group.counts.astype(jnp.float32)
    numer = (jnp.take_along_axis(
        counts, value[..., None], axis=-1)[..., 0]
        + shared.alphas[value])
    denom = jnp.sum(counts, axis=-1) + jnp.sum(shared.alphas)
    return jnp.log(numer / denom)


def score_value_batch(shared, group, values):
    """[K, dim] group x [B] values -> [B, K]: the per-value score matrix of
    reference dd.hpp:346-474 computed by one gather + broadcast."""
    counts = group.counts.astype(jnp.float32)                      # [K, D]
    denom = jnp.log(jnp.sum(counts, axis=-1) + jnp.sum(shared.alphas))  # [K]
    post = counts + shared.alphas[None, :]                         # [K, D]
    values = jnp.asarray(values, jnp.int32)
    return jnp.log(post[:, values].T) - denom[None, :]


def score_data(shared, group):
    """\\cite{jordan2001more} Eqn 22 (reference dbg/models/dd.py:103-118).

    Rising-factorial terms go through special.lgamma_ratio: the naive
    gammaln(a + m) - gammaln(a) cancels to garbage (eventually exactly
    0) in f32 once a >> m, which matters now that `alphas` is a
    continuous slice-sampling target (inference/slice.py)."""
    from distributions_tpu.special import lgamma_ratio
    a = shared.alphas
    m = group.counts.astype(jnp.float32)
    score = jnp.sum(lgamma_ratio(a, m), axis=-1)
    score -= lgamma_ratio(jnp.sum(a), jnp.sum(m, axis=-1))
    return score


def score_data_grid(shareds, group):
    """Score one group under a grid of Shareds (reference dd.hpp:259-287's
    incremental `score_data_grid`): pure vmap."""
    return jax.vmap(lambda s: score_data(s, group))(shareds)


def sampler_init(key, shared, group=None):
    if group is None:
        return sample_dirichlet(key, shared.alphas)
    return sample_dirichlet(
        key, group.counts.astype(jnp.float32) + shared.alphas)


def sampler_eval(key, shared, ps, shape=()):
    return sample_discrete(key, ps, shape=shape if shape else None)


def sample_value(key, shared, group):
    k1, k2 = jax.random.split(key)
    ps = sampler_init(k1, shared, group)
    return sampler_eval(k2, shared, ps)


def sample_group(key, shared, size):
    return base.generic_sample_group(
        sampler_init, sampler_eval, key, shared, size)


def from_values_grouped(shared, values, assignments, num_groups):
    v = jnp.asarray(values, jnp.int32)
    d = dim(shared)
    onehot = (jnp.arange(d, dtype=jnp.int32)[None, :]
              == v[:, None]).astype(jnp.int32)               # [B, D]
    return Group(counts=base.segment_sum(onehot, assignments, num_groups))


# -- uncollapsed parameter-space API (HMC/NUTS/VI backends) -----------------
# params = {'alr': [..., dim-1]} additive-log-ratio coords of the simplex;
# p ~ Dirichlet(alphas).

def _alr_to_simplex(alr):
    z = jnp.concatenate([alr, jnp.zeros(alr.shape[:-1] + (1,))], axis=-1)
    return jax.nn.softmax(z, axis=-1)


def param_init(key, shared, shape=()):
    d = dim(shared)
    return {'alr': 0.1 * jax.random.normal(key, shape + (d - 1,))}


def param_log_prior(shared, params):
    p = _alr_to_simplex(params['alr'])
    a = shared.alphas
    log_dir = (gammaln(jnp.sum(a)) - jnp.sum(gammaln(a))
               + jnp.sum((a - 1.0) * jnp.log(p), axis=-1))
    # log |det J| of ALR^-1 = sum_i log p_i
    return log_dir + jnp.sum(jnp.log(p), axis=-1)


def param_log_likelihood(shared, params, value):
    p = _alr_to_simplex(params['alr'])
    value = jnp.asarray(value, jnp.int32)
    return jnp.log(jnp.take_along_axis(
        p, jnp.broadcast_to(value[..., None], p.shape[:-1] + (1,)),
        axis=-1)[..., 0])


def param_constrain(shared, params):
    return {'p': _alr_to_simplex(params['alr'])}


# -- row-stat columns (single-matmul tile aggregation; see mixture.py) ------

def row_stat_dim(shared):
    return dim(shared)


def row_stat_columns(shared, values):
    v = jnp.asarray(values, jnp.int32)
    d = dim(shared)
    return (jnp.arange(d, dtype=jnp.int32) == v[..., None]).astype(
        jnp.float32)


def row_stats_to_tile(shared, sums):
    return Group(counts=jnp.round(sums).astype(jnp.int32))
