"""Clustering prior tests (mirrors reference tests/test_clustering.py)."""

import math
from collections import defaultdict

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from distributions_tpu import clustering, util
from tests.util import assert_close

SAMPLE_COUNT = 2000
MIN_GOODNESS_OF_FIT = 1e-3

MODELS = (
    [('PitmanYor', clustering.PitmanYor, ex)
     for ex in clustering.PitmanYor.EXAMPLES]
    + [('LowEntropy', clustering.LowEntropy, ex)
       for ex in clustering.LowEntropy.EXAMPLES])

IDS = ['{}-{}'.format(n, i) for i, (n, _, _) in enumerate(MODELS)]

parametrize_models = pytest.mark.parametrize(
    'name,Model,example', MODELS, ids=IDS)


def canonicalize(assignments):
    groups = defaultdict(list)
    for value, group in enumerate(np.asarray(assignments).tolist()):
        groups[group].append(value)
    return tuple(sorted(tuple(sorted(g)) for g in groups.values()))


def counts_of(assignments):
    c = np.bincount(np.asarray(assignments))
    return c[c > 0]


def valid_sizes(example, max_size=5, min_size=2):
    dataset_size = example.get('dataset_size', float('inf'))
    return [s for s in range(min_size, max_size + 1) if s <= dataset_size]


def batched_sample_assignments(Model, example, size, n, seed=0):
    model = Model.from_dict(example)
    keys = jax.random.split(jax.random.PRNGKey(seed), n)
    fn = jax.jit(jax.vmap(
        lambda k: clustering.sample_assignments(k, model, size, capacity=32)))
    return np.asarray(fn(keys))


@parametrize_models
def test_load_and_dump(name, Model, example):
    model = Model.from_dict(example)
    assert_close(model.to_dict(), example)


@parametrize_models
def test_sample_matches_score_counts(name, Model, example):
    model = Model.from_dict(example)
    for size in valid_sizes(example):
        all_assignments = batched_sample_assignments(
            Model, example, size, SAMPLE_COUNT)
        samples = []
        probs_dict = {}
        for value in all_assignments:
            sample = canonicalize(value)
            samples.append(sample)
            if sample not in probs_dict:
                counts = counts_of(value)
                probs_dict[sample] = math.exp(float(
                    clustering.score_counts(model, jnp.asarray(counts))))
        total = sum(probs_dict.values())
        for k in probs_dict:
            probs_dict[k] /= total
        gof = util.discrete_goodness_of_fit(samples, probs_dict)
        assert gof > MIN_GOODNESS_OF_FIT, '{} gof = {:.3g}'.format(name, gof)


@parametrize_models
def test_score_counts_is_normalized(name, Model, example):
    model = Model.from_dict(example)
    for size in valid_sizes(example):
        dataset_size = example.get('dataset_size')
        if name == 'LowEntropy' and size < dataset_size:
            tol = 0.5  # reference test_clustering.py:174-179
        else:
            tol = 0.01
        all_assignments = batched_sample_assignments(
            Model, example, size, SAMPLE_COUNT)
        probs_dict = {}
        for value in all_assignments:
            sample = canonicalize(value)
            if sample not in probs_dict:
                counts = counts_of(value)
                probs_dict[sample] = math.exp(float(
                    clustering.score_counts(model, jnp.asarray(counts))))
        total = sum(probs_dict.values())
        assert abs(total - 1) < tol, 'not normalized: {}'.format(total)


@parametrize_models
def test_score_add_value_matches_score_counts(name, Model, example):
    # (reference test_clustering.py:201-239)
    model = Model.from_dict(example)
    for sample_size in valid_sizes(example):
        all_assignments = batched_sample_assignments(
            Model, example, sample_size - 1, 200, seed=1)
        samples = {canonicalize(v) for v in all_assignments}
        for sample in samples:
            nonempty = len(sample)
            counts = [len(g) for g in sample]
            actual = np.zeros(len(counts) + 1)
            expected = np.zeros(len(counts) + 1)
            for i, group in enumerate(sample):
                bigger = list(counts)
                bigger[i] += 1
                expected[i] = float(clustering.score_counts(
                    model, jnp.asarray(bigger)))
                actual[i] = float(clustering.score_add_value(
                    model, len(group), nonempty, sample_size - 1))
            expected[-1] = float(clustering.score_counts(
                model, jnp.asarray(counts + [1])))
            actual[-1] = float(clustering.score_add_value(
                model, 0, nonempty, sample_size - 1))
            assert_close(util.scores_to_probs(actual),
                         util.scores_to_probs(expected), tol=0.05)


def test_py_score_value_matches_score_add_value():
    # vectorized masked scorer == scalar score_add_value over a randomized
    # add/remove trajectory (the reference's CachedMixture-vs-naive test,
    # test_clustering.py:242-303)
    model = clustering.PitmanYor.from_dict({'alpha': 2.0, 'd': 0.2})
    K = 16
    rng = np.random.RandomState(0)
    counts = np.zeros(K, np.int32)
    alive = np.zeros(K, bool)
    alive[0] = True  # one empty slot
    for step in range(200):
        n = counts.sum()
        scores = np.asarray(clustering.py_score_value(
            model, jnp.asarray(counts), jnp.asarray(alive), float(n)))
        is_empty = alive & (counts == 0)
        empty_count = max(is_empty.sum(), 1)
        nonempty = int((counts > 0).sum())
        for k in range(K):
            if not alive[k]:
                assert np.isneginf(scores[k])
            else:
                expected = float(clustering.score_add_value(
                    model, int(counts[k]), nonempty, float(n), empty_count))
                assert_close(scores[k], expected, tol=1e-4,
                             err_msg='slot {} at step {}'.format(k, step))
        # random add or remove
        if n == 0 or rng.rand() < 0.6:
            choices = np.flatnonzero(alive)
            k = int(rng.choice(choices))
            counts[k] += 1
            if not (alive & (counts == 0)).any():
                free = np.flatnonzero(~alive)
                if len(free):
                    alive[free[0]] = True
        else:
            choices = np.flatnonzero(counts > 0)
            k = int(rng.choice(choices))
            counts[k] -= 1
            if counts[k] == 0:
                empties = np.flatnonzero(alive & (counts == 0))
                if len(empties) > 1:
                    alive[k] = False


def test_count_assignments():
    a = jnp.asarray([0, 0, 2, 1, 2, 2])
    counts = np.asarray(clustering.count_assignments(a, 4))
    assert counts.tolist() == [2, 1, 3, 0]


def test_log_partition_function_table():
    model = clustering.LowEntropy.from_dict({'dataset_size': 100})
    # spot-check exact values against the reference-generated table
    assert_close(clustering.le_log_partition_function(model, 2),
                 1.60943791, tol=1e-5)
    assert_close(clustering.le_log_partition_function(model, 47),
                 183.80678238, tol=1e-5)
    # asymptotic branch is continuous-ish across the boundary
    a = float(clustering.le_log_partition_function(model, 47))
    b = float(clustering.le_log_partition_function(model, 48))
    assert b > a
    assert (b - a) / a < 0.05


def test_stick_breaking_matches_sequential_partition():
    """py_sample_assignments_stick induces the SAME partition
    distribution as the sequential CRP scan (exchangeability of the PY
    partition): compare label-invariant statistics across many draws,
    plus the exact 2-row co-clustering probability."""
    model = clustering.PitmanYor.from_dict({'alpha': 2.0, 'd': 0.25})
    n, reps = 40, 2000

    keys = jax.random.split(jax.random.PRNGKey(0), reps)
    stick = jax.vmap(lambda k: clustering.py_sample_assignments_stick(
        k, model, n, capacity=256))(keys)
    keys2 = jax.random.split(jax.random.PRNGKey(1), reps)
    seq = jax.vmap(lambda k: clustering.py_sample_assignments(
        k, model, n, capacity=64))(keys2)

    def stats(A, cap):
        A = np.asarray(A)
        ks, lg = [], []
        for row in A:
            c = np.bincount(row, minlength=cap)
            ks.append(int((c > 0).sum()))
            lg.append(int(c.max()))
        return np.array(ks), np.array(lg)

    k_a, l_a = stats(stick, 256)
    k_b, l_b = stats(seq, 64)

    def tv(x, y, hi):
        px = np.bincount(x, minlength=hi) / x.size
        py = np.bincount(y, minlength=hi) / y.size
        return 0.5 * np.abs(px - py).sum()

    assert abs(k_a.mean() - k_b.mean()) < 0.35, (k_a.mean(), k_b.mean())
    assert tv(k_a, k_b, 41) < 0.08, tv(k_a, k_b, 41)
    assert tv(l_a, l_b, 41) < 0.08, tv(l_a, l_b, 41)

    # exact: P(rows 0,1 together) = (1 - d) / (1 + alpha)
    p_exact = (1 - 0.25) / (1 + 2.0)
    pairs = jax.vmap(lambda k: clustering.py_sample_assignments_stick(
        k, model, 2, capacity=256))(
        jax.random.split(jax.random.PRNGKey(2), 4000))
    pairs = np.asarray(pairs)
    p_emp = (pairs[:, 0] == pairs[:, 1]).mean()
    se = np.sqrt(p_exact * (1 - p_exact) / 4000)
    assert abs(p_emp - p_exact) < 4 * se, (p_emp, p_exact)
