"""Compat facade tests: the reference's class-based API semantics
(reference tests/test_models.py:503-594 mixture tests, examples/mixture
coordination pattern, MixtureIdTracker)."""

import numpy as np
import pytest

from distributions_tpu.compat import models as cmodels
from distributions_tpu.compat.clustering import PitmanYor, LowEntropy
from distributions_tpu.compat.mixture import MixtureIdTracker
from distributions_tpu.compat.rng import seed_all
from distributions_tpu.util import scores_to_probs
from tests.util import assert_close

MODELS = ['bb', 'gp', 'nich', 'bnb', 'dd']


@pytest.mark.parametrize('name', MODELS)
def test_shared_group_roundtrip(name):
    mod = cmodels.MODULES[name]
    for example in mod.EXAMPLES:
        shared = mod.Shared.from_dict(example['shared'])
        assert_close(shared.dump(), example['shared'])
        group = mod.Group.from_values(shared, example['values'])
        dumped = group.dump()
        group2 = mod.Group.from_dict(dumped, shared)
        assert_close(group2.dump(), dumped)


@pytest.mark.parametrize('name', MODELS)
def test_group_scoring_matches_functional(name):
    mod = cmodels.MODULES[name]
    core = mod._core
    example = mod.EXAMPLES[0]
    shared = mod.Shared.from_dict(example['shared'])
    group = mod.Group.from_values(shared, example['values'])
    fshared = core.shared_from_dict(example['shared'])
    fgroup = core.group_init(fshared)
    for v in example['values']:
        fgroup = core.add_value(fshared, fgroup, v)
    for v in example['values'][:3]:
        assert_close(group.score_value(shared, v),
                     float(core.score_value(fshared, fgroup, v)), tol=1e-5)
    assert_close(group.score_data(shared),
                 float(core.score_data(fshared, fgroup)), tol=1e-5)


@pytest.mark.parametrize('name', MODELS)
def test_sampler(name):
    seed_all(0)
    mod = cmodels.MODULES[name]
    example = mod.EXAMPLES[0]
    shared = mod.Shared.from_dict(example['shared'])
    group = mod.Group.from_values(shared, example['values'])
    sampler = mod.Sampler()
    sampler.init(shared, group)
    values = [sampler.eval(shared) for _ in range(5)]
    assert len(values) == 5
    vs = mod.sample_group(shared, 10)
    assert len(vs) == 10


def test_seed_all_determinism():
    mod = cmodels.MODULES['nich']
    shared = mod.Shared.from_dict(mod.EXAMPLES[0]['shared'])
    group = mod.Group.from_values(shared, [])
    seed_all(42)
    a = [group.sample_value(shared) for _ in range(5)]
    seed_all(42)
    b = [group.sample_value(shared) for _ in range(5)]
    assert a == b


def test_mixture_id_tracker():
    # reference mixture.hpp:460-521 semantics
    t = MixtureIdTracker()
    t.init(3)
    assert [t.packed_to_global(i) for i in range(3)] == [0, 1, 2]
    t.add_group()
    assert t.packed_to_global(3) == 3
    t.remove_group(1)  # swap-with-back: global 3 moves into packed 1
    assert len(t) == 3
    assert t.packed_to_global(1) == 3
    assert t.global_to_packed(3) == 1
    assert t.global_to_packed(0) == 0
    with pytest.raises(KeyError):
        t.global_to_packed(1)


def test_mixture_score_accumulation():
    # per-group scoring == batched accumulate (reference
    # test_models.py:537-594 incl. noise-resistant accumulate check)
    seed_all(0)
    mod = cmodels.nich
    shared = mod.Shared.from_dict(mod.EXAMPLES[0]['shared'])
    values = mod.EXAMPLES[0]['values']
    groups = [mod.Group.from_values(shared, [v]) for v in values]
    mixture = mod.Mixture()
    for g in groups:
        mixture.append(g)
    mixture.init(shared)
    rng = np.random.RandomState(0)
    for value in values[:4]:
        expected = np.asarray(
            [g.score_value(shared, value) for g in groups])
        noise = rng.randn(len(groups)).astype(np.float32)
        accum = noise.copy()
        mixture.score_value(shared, value, accum)
        assert_close(accum - noise, expected, tol=1e-4)
        per_group = [mixture.score_value_group(shared, i, value)
                     for i in range(len(groups))]
        assert_close(np.asarray(per_group), expected, tol=1e-4)
    assert_close(mixture.score_data(shared),
                 sum(g.score_data(shared) for g in groups), tol=1e-3)


def test_driver_slave_coordination():
    # the add_value/remove_value lockstep of doc/overview.rst:185-204
    seed_all(1)
    clustering = PitmanYor.from_dict({'alpha': 2.0, 'd': 0.1})
    feature = cmodels.nich.Shared.from_dict(
        {'mu': 0., 'kappa': 1., 'sigmasq': 1., 'nu': 1.})
    cmix = clustering.Mixture()
    fmix = cmodels.nich.Mixture()
    tracker = MixtureIdTracker()
    cmix.init(clustering, [0, 0])
    tracker.init(2)
    for _ in range(2):
        fmix.add_group(feature)

    rng = np.random.RandomState(0)
    data = rng.randn(30).tolist()
    assignments = {}
    for i, x in enumerate(data):
        scores = np.zeros(len(cmix), np.float32)
        cmix.score_value(clustering, scores)
        fmix.score_value(feature, x, scores)
        gid = int(np.argmax(rng.multinomial(1, scores_to_probs(scores))))
        added = cmix.add_value(clustering, gid)
        fmix.add_value(feature, gid, x)
        if added:
            fmix.add_group(feature)
            tracker.add_group()
        assignments[i] = tracker.packed_to_global(gid)
        assert len(cmix) == len(fmix) == len(tracker)

    # one full gibbs pass with removal bookkeeping
    for i, x in enumerate(data):
        gid = tracker.global_to_packed(assignments[i])
        removed = cmix.remove_value(clustering, gid)
        fmix.remove_value(feature, gid, x)
        if removed:
            fmix.remove_group(feature, gid)
            tracker.remove_group(gid)
        scores = np.zeros(len(cmix), np.float32)
        cmix.score_value(clustering, scores)
        fmix.score_value(feature, x, scores)
        gid = int(np.argmax(rng.multinomial(1, scores_to_probs(scores))))
        added = cmix.add_value(clustering, gid)
        fmix.add_value(feature, gid, x)
        if added:
            fmix.add_group(feature)
            tracker.add_group()
        assignments[i] = tracker.packed_to_global(gid)

    assert sum(cmix.counts) == len(data)
    assert len(cmix) == len(fmix) == len(tracker)


def test_clustering_scalar_api():
    py = PitmanYor.from_dict({'alpha': 1.0, 'd': 0.2})
    s1 = py.score_add_value(0, 3, 10)
    s2 = py.score_add_value(5, 3, 10)
    assert s1 < 0 and s2 < 0
    # score_remove inverse
    assert_close(py.score_remove_value(6, 4, 11),
                 -py.score_add_value(5, 3, 10), tol=1e-6)
    counts = py.sample_assignments(20)
    assert len(counts) == 20
    score = py.score_counts([3, 4, 5])
    assert np.isfinite(score)

    le = LowEntropy.from_dict({'dataset_size': 50})
    assert np.isfinite(le.score_counts([3, 4, 5]))
    assert np.isfinite(le.log_partition_function(10))
    a = le.sample_assignments(10)
    assert len(a) == 10


def test_dpd_compat_shared_mutation():
    seed_all(3)
    mod = cmodels.dpd
    shared = mod.Shared.from_dict(mod.EXAMPLES[1]['shared'])
    for v in mod.EXAMPLES[1]['values']:
        shared.add_value(v)
    d = shared.dump()
    assert len(d['betas']) == 6
    shared.realize()
    d2 = shared.dump()
    assert len(d2['betas']) > 6


def test_niw_compat():
    mod = cmodels.niw
    example = mod.EXAMPLES[0]
    shared = mod.Shared.from_dict(example['shared'])
    group = mod.Group.from_values(shared, example['values'])
    s = group.score_value(shared, example['values'][0])
    assert np.isfinite(s)
    assert np.isfinite(group.score_data(shared))
    d = group.dump()
    g2 = mod.Group.from_dict(d, shared)
    assert_close(g2.dump(), d)
    seed_all(0)
    v = group.sample_value(shared)
    assert np.asarray(v).shape == (2,)


def test_dpd_compat_group_roundtrip():
    seed_all(0)
    mod = cmodels.dpd
    example = mod.EXAMPLES[0]
    shared = mod.Shared.from_dict(example['shared'])
    group = mod.Group.from_values(shared, example['values'])
    d = group.dump(shared)
    g2 = mod.Group.from_dict(d, shared)
    assert_close(g2.dump(shared), d)
    s = group.score_value(shared, 7)
    assert np.isfinite(s)
    # OTHER scores the unbroken mass
    other_score = group.score_value(shared, -1)
    assert np.isfinite(other_score) or other_score == -np.inf
