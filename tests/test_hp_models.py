"""Generic identity + statistical tests for the hp flavor itself (the
reference ran its full per-model harness on EVERY flavor, reference
tests/test_models.py:63-594; tests/test_models.py here covers the JAX
core — this file covers the independent hp implementation).

Pure CPU, no jax involvement: hp is numpy/scipy float64 end to end, so
the algebraic identities hold to ~1e-9 and the sampler GoF uses the same
chi-squared machinery as the core's tests (distributions_tpu/util.py).
"""


import numpy as np
import pytest

from distributions_tpu.hp.models import MODULES
from distributions_tpu import util

SAMPLE_COUNT = 1200
MIN_GOODNESS_OF_FIT = 1e-3

CASES = [(name, i)
         for name, module in sorted(MODULES.items())
         for i in range(len(module.EXAMPLES))]
parametrize_cases = pytest.mark.parametrize(
    'name,example_idx', CASES, ids=['{}-{}'.format(*c) for c in CASES])


def load_shared(module, example, seed=0, observe=False):
    shared = module.shared_from_dict(example['shared'])
    if observe and hasattr(module, 'shared_add_value'):
        rng = np.random.default_rng(seed)
        for value in example['values']:
            shared = module.shared_add_value(rng, shared, value)
    return shared


def group_of(module, shared, values):
    group = module.group_init(shared)
    for v in values:
        group = module.add_value(shared, group, v)
    return group


def dicts_equal(module, a, b, shared=None):
    def dump(g):
        try:
            return module.group_to_dict(g)
        except TypeError:
            return module.group_to_dict(g, shared)
    da, db = dump(a), dump(b)
    assert set(da) == set(db)
    for k in da:
        np.testing.assert_allclose(
            np.asarray(da[k], np.float64) if not isinstance(da[k], dict)
            else np.asarray(sorted(da[k].items()), np.float64),
            np.asarray(db[k], np.float64) if not isinstance(db[k], dict)
            else np.asarray(sorted(db[k].items()), np.float64),
            rtol=1e-8, atol=1e-8, err_msg=k)


@parametrize_cases
def test_add_remove_inverse_shuffled(name, example_idx):
    """Adding values then removing them in a different order restores the
    empty group exactly (float64; reference tests/test_models.py:253-270)."""
    module = MODULES[name]
    example = module.EXAMPLES[example_idx]
    shared = load_shared(module, example, observe=True)
    values = list(example['values'])
    group = group_of(module, shared, values)
    rng = np.random.default_rng(1)
    for v in [values[i] for i in rng.permutation(len(values))]:
        group = module.remove_value(shared, group, v)
    dicts_equal(module, group, module.group_init(shared), shared)


@parametrize_cases
def test_add_repeated_equals_n_adds(name, example_idx):
    module = MODULES[name]
    if module.Value is np.ndarray:
        pytest.skip('add_repeated on vector values: same code path')
    example = module.EXAMPLES[example_idx]
    shared = load_shared(module, example, observe=True)
    value = example['values'][0]
    g1 = module.add_repeated_value(
        shared, module.group_init(shared), value, 4)
    g2 = group_of(module, shared, [value] * 4)
    dicts_equal(module, g1, g2, shared)


@parametrize_cases
def test_merge_equals_concat(name, example_idx):
    module = MODULES[name]
    example = module.EXAMPLES[example_idx]
    shared = load_shared(module, example, observe=True)
    values = list(example['values'])
    for split in (1, len(values) // 2, len(values) - 1):
        g1 = group_of(module, shared, values[:split])
        g2 = group_of(module, shared, values[split:])
        merged = module.merge(shared, g1, g2)
        dicts_equal(module, merged, group_of(module, shared, values), shared)


@parametrize_cases
def test_data_debt(name, example_idx):
    """Negative counts are legal intermediate states for discrete models
    (reference tests/test_models.py:332-355): removing values never seen
    then re-adding them restores the group."""
    module = MODULES[name]
    if module.Value is np.ndarray or module.Value is float:
        pytest.skip('debt applies to bool/int models')
    if name == 'dpd':
        pytest.skip('dpd shared counts cannot go negative (reference '
                    'semantics: Shared tracks global value counts)')
    example = module.EXAMPLES[example_idx]
    shared = load_shared(module, example, observe=True)
    values = list(example['values'])
    group = module.group_init(shared)
    for v in values:
        group = module.remove_value(shared, group, v)
    for v in reversed(values):
        group = module.add_value(shared, group, v)
    dicts_equal(module, group, module.group_init(shared), shared)


@parametrize_cases
def test_seeded_samples_deterministic(name, example_idx):
    module = MODULES[name]
    example = module.EXAMPLES[example_idx]
    shared = load_shared(module, example, observe=True)
    group = group_of(module, shared, example['values'])
    a = module.sample_value(np.random.default_rng(3), shared, group)
    b = module.sample_value(np.random.default_rng(3), shared, group)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ga = module.sample_group(np.random.default_rng(4), shared, 5)
    gb = module.sample_group(np.random.default_rng(4), shared, 5)
    np.testing.assert_array_equal(np.asarray(ga), np.asarray(gb))


@parametrize_cases
def test_sampler_matches_scorer_gof(name, example_idx):
    """Draw sample_value repeatedly; the empirical distribution must match
    exp(score_value) (reference tests/test_models.py:373-419)."""
    module = MODULES[name]
    example = module.EXAMPLES[example_idx]
    shared = load_shared(module, example, observe=True)
    group = group_of(module, shared, example['values'])
    rng = np.random.default_rng(5)
    samples = [module.sample_value(rng, shared, group)
               for _ in range(SAMPLE_COUNT)]

    if module.Value is bool:
        probs = {v: np.exp(module.score_value(shared, group, v))
                 for v in (False, True)}
        counts = np.asarray([sum(1 for s in samples if bool(s) == v)
                             for v in (False, True)], np.float64)
        gof = util.multinomial_goodness_of_fit(
            np.asarray([probs[False], probs[True]]), counts, SAMPLE_COUNT)
    elif module.Value is int:
        support = sorted(set(int(s) for s in samples))
        probs_dict = {v: np.exp(module.score_value(shared, group, v))
                      for v in support}
        gof = util.discrete_goodness_of_fit(
            [int(s) for s in samples], probs_dict)
    elif module.Value is float:
        xs = np.asarray(samples, np.float64)
        probs = np.exp([module.score_value(shared, group, x) for x in xs])
        gof = util.density_goodness_of_fit(xs, probs)
    else:
        # multivariate (niw): Mahalanobis GoF against the predictive MVT
        # (same construction as the core's test, tests/test_models.py:343):
        # (x-mu)' Sigma^{-1} (x-mu) / d ~ F(d, dof) under the predictive.
        from scipy.stats import f as f_dist
        xs = np.asarray(samples, np.float64)
        post = module.plus_group(shared, group)
        d = xs.shape[1]
        dof = post.nu - d + 1.0
        sigma = post.psi * (post.kappa + 1.0) / (post.kappa * dof)
        diff = xs - post.mu
        maha = np.einsum('nd,de,ne->n', diff, np.linalg.inv(sigma), diff)
        u = f_dist.cdf(maha / d, d, dof)
        gof = util.unif01_goodness_of_fit(u)
    assert gof > MIN_GOODNESS_OF_FIT, (name, gof)


@parametrize_cases
def test_sample_group_smoke(name, example_idx):
    """sample_group draws iid from ONE parameter draw — smoke only
    (per-draw GoF is sample_value's job above)."""
    module = MODULES[name]
    example = module.EXAMPLES[example_idx]
    shared = load_shared(module, example, observe=True)
    values = module.sample_group(np.random.default_rng(6), shared, 50)
    assert len(values) == 50
