"""Execution-mode agreement: eager vs jit vs batched scoring must agree,
filling the role of the reference's dbg/hp/lp flavor-agreement tests
(reference tests/test_model_flavors.py:40-136)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from distributions_tpu.models import MODULES
from tests.util import assert_close
from tests.test_models import (
    load_shared, group_from_values, group_to_dict)

CASES = [(name, i)
         for name, module in sorted(MODULES.items())
         for i in range(len(module.EXAMPLES))]

parametrize_cases = pytest.mark.parametrize(
    'name,example_idx', CASES,
    ids=['{}-{}'.format(*c) for c in CASES])


@parametrize_cases
def test_score_value_eager_vs_jit(name, example_idx):
    module = MODULES[name]
    example = module.EXAMPLES[example_idx]
    shared = load_shared(module, example, observe=True)
    group = group_from_values(module, shared, example['values'])
    jitted = jax.jit(module.score_value)
    for value in example['values'][:4]:
        value = jnp.asarray(np.asarray(value))
        eager = module.score_value(shared, group, value)
        compiled = jitted(shared, group, value)
        assert_close(eager, compiled, tol=1e-5)


@parametrize_cases
def test_score_data_eager_vs_jit(name, example_idx):
    module = MODULES[name]
    example = module.EXAMPLES[example_idx]
    shared = load_shared(module, example, observe=True)
    group = group_from_values(module, shared, example['values'])
    eager = module.score_data(shared, group)
    compiled = jax.jit(module.score_data)(shared, group)
    assert_close(eager, compiled, tol=1e-5)


@parametrize_cases
def test_add_value_eager_vs_jit(name, example_idx):
    module = MODULES[name]
    example = module.EXAMPLES[example_idx]
    shared = load_shared(module, example, observe=True)
    jitted = jax.jit(module.add_value)
    g1 = module.group_init(shared)
    g2 = module.group_init(shared)
    for value in example['values']:
        value = jnp.asarray(np.asarray(value))
        g1 = module.add_value(shared, g1, value)
        g2 = jitted(shared, g2, value)
    assert_close(group_to_dict(module, g1, shared),
                 group_to_dict(module, g2, shared), tol=1e-5)


@parametrize_cases
def test_sample_value_eager_vs_jit_same_key(name, example_idx):
    module = MODULES[name]
    example = module.EXAMPLES[example_idx]
    shared = load_shared(module, example, observe=True)
    group = group_from_values(module, shared, example['values'])
    key = jax.random.PRNGKey(0)
    eager = module.sample_value(key, shared, group)
    compiled = jax.jit(module.sample_value)(key, shared, group)
    assert_close(np.asarray(eager), np.asarray(compiled), tol=1e-6)
