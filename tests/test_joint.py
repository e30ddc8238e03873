"""Geweke joint-distribution tests (reference tests/test_models.py:449-480,
\\cite{geweke04getting}): marginal-conditional sampling (draw params from
the prior, then data) must match successive-conditional sampling (Gibbs
alternation of params | data and data | params) in distribution of the
group sufficient statistics, checked by a two-sample t-test per statistic.

Device-native formulation: the successive-conditional chain is a lax.scan;
both samplers are vmapped over keys."""

import numpy as np
import pytest
import scipy.stats

import jax
import jax.numpy as jnp
from jax import lax

from distributions_tpu.models import MODULES
from tests.test_models import load_shared

SIZE = 10
SKIP = 20
SAMPLE_COUNT = 500
MIN_GOODNESS_OF_FIT = 1e-3

# every model family: dpd runs on a realized (fixed-support) Shared so the
# chain is fixed-shape; niw's matrix-valued suff stats ravel per component
JOINT_MODELS = ['bb', 'gp', 'nich', 'bnb', 'dd', 'dpd', 'niw']


def _marginal_conditional(module, shared, key):
    """params ~ prior; values ~ params; return suff stats."""
    values = module.sample_group(key, shared, SIZE)
    group = module.from_values_grouped(
        shared, values, jnp.zeros(SIZE, jnp.int32), 1)
    return jax.tree_util.tree_map(
        lambda a: a[0].astype(jnp.float32).ravel(), group)


def _successive_conditional(module, shared, key, n_steps):
    """Gibbs chain: params | group, values | params, repeat."""
    k0, kchain = jax.random.split(key)
    values0 = module.sample_group(k0, shared, SIZE)
    group0 = module.from_values_grouped(
        shared, values0, jnp.zeros(SIZE, jnp.int32), 1)

    def step(group, step_key):
        k1, k2 = jax.random.split(step_key)
        params = module.sampler_init(
            k1, shared, jax.tree_util.tree_map(lambda a: a[0], group))
        values = module.sampler_eval(k2, shared, params, (SIZE,))
        group = module.from_values_grouped(
            shared, values, jnp.zeros(SIZE, jnp.int32), 1)
        return group, None

    keys = jax.random.split(kchain, n_steps)
    group, _ = lax.scan(step, group0, keys)
    return jax.tree_util.tree_map(
        lambda a: a[0].astype(jnp.float32).ravel(), group)


@pytest.mark.parametrize('name', JOINT_MODELS)
def test_joint(name):
    module = MODULES[name]
    example = module.EXAMPLES[0]
    shared = load_shared(module, example, observe=True, realize=True)

    keys = jax.random.split(jax.random.PRNGKey(0), SAMPLE_COUNT)
    marg = jax.jit(jax.vmap(
        lambda k: _marginal_conditional(module, shared, k)))(keys)

    keys = jax.random.split(jax.random.PRNGKey(1), SAMPLE_COUNT)
    succ = jax.jit(jax.vmap(
        lambda k: _successive_conditional(module, shared, k, SKIP)))(keys)

    marg_leaves = jax.tree_util.tree_leaves(marg)
    succ_leaves = jax.tree_util.tree_leaves(succ)
    fields = [f for f in type(marg).__dict__.get('_fields', [])] or \
        list(range(len(marg_leaves)))
    for field, a, b in zip(fields, marg_leaves, succ_leaves):
        a = np.asarray(a).reshape(SAMPLE_COUNT, -1)
        b = np.asarray(b).reshape(SAMPLE_COUNT, -1)
        for j in range(a.shape[1]):
            if a[:, j].std() == 0 and b[:, j].std() == 0:
                continue
            gof = scipy.stats.ttest_ind(a[:, j], b[:, j]).pvalue
            assert gof > MIN_GOODNESS_OF_FIT, \
                '{}.{}[{}] gof = {:.3g}'.format(name, field, j, gof)
