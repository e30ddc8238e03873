"""Beta-Bernoulli conjugate model.

Semantics match the reference (dbg/models/bb.py:33-169,
include/distributions/models/bb.hpp): Value=bool, Shared={alpha, beta},
Group={heads, tails}; predictive p(True) = (alpha+heads)/(alpha+beta+n).

Everything is vectorized: Group fields may carry a [K] component axis and all
functions broadcast over it, replacing the reference's cached
`heads_scores_`/`tails_scores_` MixtureValueScorer (bb.hpp:231-313) with XLA
fusion over the batched formula.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from distributions_tpu.special import gammaln
from distributions_tpu.random import sample_beta, sample_bernoulli
from distributions_tpu.models import base

NAME = 'BetaBernoulli'
EXAMPLES = [
    {
        'shared': {'alpha': 0.5, 'beta': 2.0},
        'values': [False, False, True, False, True, True, False, False],
    },
    {
        'shared': {'alpha': 10.5, 'beta': 0.5},
        'values': [False, False, False, False, False, False, False, True],
    },
]
Value = bool


class Shared(NamedTuple):
    alpha: jnp.ndarray
    beta: jnp.ndarray


class Group(NamedTuple):
    heads: jnp.ndarray  # int32, any batch shape
    tails: jnp.ndarray


def shared_from_dict(raw):
    return Shared(alpha=jnp.float32(raw['alpha']),
                  beta=jnp.float32(raw['beta']))


def shared_to_dict(shared):
    return {'alpha': float(shared.alpha), 'beta': float(shared.beta)}


def group_from_dict(raw):
    return Group(heads=jnp.int32(raw['heads']), tails=jnp.int32(raw['tails']))


def group_to_dict(group):
    return {'heads': int(group.heads), 'tails': int(group.tails)}


def group_init(shared, shape=()):
    return Group(heads=jnp.zeros(shape, jnp.int32),
                 tails=jnp.zeros(shape, jnp.int32))


def _as_bool(value):
    return jnp.asarray(value, bool)


def add_value(shared, group, value):
    return add_repeated_value(shared, group, value, 1)


def add_repeated_value(shared, group, value, count):
    value = _as_bool(value)
    count = jnp.asarray(count, jnp.int32)
    return Group(heads=group.heads + jnp.where(value, count, 0),
                 tails=group.tails + jnp.where(value, 0, count))


def remove_value(shared, group, value):
    return add_repeated_value(shared, group, value, -1)


def merge(shared, destin, source):
    return Group(heads=destin.heads + source.heads,
                 tails=destin.tails + source.tails)


def score_value(shared, group, value):
    """\\cite{wallach2009rethinking} Eqn 4 (reference dbg/models/bb.py:102-111).
    Broadcasts a [K] group against a scalar (or [...]) value."""
    heads = shared.alpha + group.heads
    tails = shared.beta + group.tails
    numer = jnp.where(_as_bool(value), heads, tails)
    return jnp.log(numer / (heads + tails))


def score_value_batch(shared, group, values):
    """[K]-group x [B]-values -> [B, K] scores: one broadcasted formula, no
    per-group caches needed (replaces reference bb.hpp:267-306)."""
    heads = shared.alpha + group.heads  # [K]
    tails = shared.beta + group.tails
    denom = jnp.log(heads + tails)
    log_heads = jnp.log(heads) - denom
    log_tails = jnp.log(tails) - denom
    v = _as_bool(values)[:, None]
    return jnp.where(v, log_heads[None, :], log_tails[None, :])


def score_data(shared, group):
    """\\cite{jordan2001more} Eqn 22 (reference dbg/models/bb.py:113-125).

    Differences go through special.lgamma_ratio — cancellation-safe for
    large alpha/beta (continuous hyper inference can visit them)."""
    from distributions_tpu.special import lgamma_ratio
    h = group.heads.astype(jnp.float32)
    t = group.tails.astype(jnp.float32)
    return (lgamma_ratio(shared.alpha, h)
            + lgamma_ratio(shared.beta, t)
            - lgamma_ratio(shared.alpha + shared.beta, h + t))


def sampler_init(key, shared, group=None):
    if group is None:
        return sample_beta(key, shared.alpha, shared.beta)
    return sample_beta(key, shared.alpha + group.heads,
                       shared.beta + group.tails)


def sampler_eval(key, shared, p, shape=()):
    return sample_bernoulli(key, p, shape)


def sample_value(key, shared, group):
    k1, k2 = jax.random.split(key)
    p = sampler_init(k1, shared, group)
    return sampler_eval(k2, shared, p)


def sample_group(key, shared, size):
    return base.generic_sample_group(
        sampler_init, sampler_eval, key, shared, size)


def from_values_grouped(shared, values, assignments, num_groups):
    """Batched suff-stat construction: segment-sum of head/tail indicators."""
    v = _as_bool(values)
    ones = jnp.ones(v.shape, jnp.int32)
    heads = base.segment_sum(jnp.where(v, ones, 0), assignments, num_groups)
    tails = base.segment_sum(jnp.where(v, 0, ones), assignments, num_groups)
    return Group(heads=heads, tails=tails)


def unmerge(shared, destin, source):
    """Inverse of merge (used by blocked Gibbs removal)."""
    return Group(heads=destin.heads - source.heads,
                 tails=destin.tails - source.tails)


# -- uncollapsed parameter-space API (HMC/NUTS/VI backends) -----------------
# params = {'logit_p': [..]}; p ~ Beta(alpha, beta).

def param_init(key, shared, shape=()):
    mean = shared.alpha / (shared.alpha + shared.beta)
    return {'logit_p': jnp.log(mean / (1 - mean))
            + 0.1 * jax.random.normal(key, shape)}


def param_log_prior(shared, params):
    z = params['logit_p']
    log_p = jax.nn.log_sigmoid(z)
    log_1mp = jax.nn.log_sigmoid(-z)
    beta_norm = (gammaln(shared.alpha + shared.beta)
                 - gammaln(shared.alpha) - gammaln(shared.beta))
    # Beta(p; a, b) density + log-Jacobian of the sigmoid: log p + log(1-p)
    return (beta_norm + (shared.alpha - 1.0) * log_p
            + (shared.beta - 1.0) * log_1mp + log_p + log_1mp)


def param_log_likelihood(shared, params, value):
    z = params['logit_p']
    v = _as_bool(value)
    return jnp.where(v, jax.nn.log_sigmoid(z), jax.nn.log_sigmoid(-z))


def param_constrain(shared, params):
    return {'p': jax.nn.sigmoid(params['logit_p'])}


# -- row-stat columns (single-matmul tile aggregation; see mixture.py) ------

ROW_STAT_DIM = 2


def row_stat_columns(shared, values):
    v = _as_bool(values)
    vf = v.astype(jnp.float32)
    return jnp.stack([vf, 1.0 - vf], axis=-1)


def row_stats_to_tile(shared, sums):
    return Group(heads=jnp.round(sums[..., 0]).astype(jnp.int32),
                 tails=jnp.round(sums[..., 1]).astype(jnp.int32))
