"""Scaled-down versions of the five BASELINE.json validation configs:

1. beta-binomial exact-moment check (tests/test_derivations.py covers full)
2. CRP-NICH DPMM (examples/mixture semantics)
3. gamma-Poisson DPMM
4. Pitman-Yor + DPD-feature mixture
5. sharded Gibbs + SMC-annealed init (multi-host analog on virtual devices)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from distributions_tpu import clustering, mixture as mx
from distributions_tpu.models import nich, gp, dpd, bb
from distributions_tpu.ops import gibbs
from distributions_tpu.inference import smc
from distributions_tpu.parallel import sharding


def test_crp_nich_dpmm():
    # config 2: CRP Gaussian DPMM finds well-separated clusters
    rng = np.random.RandomState(0)
    centers = np.array([[-3.0], [0.0], [3.0]])
    labels = rng.randint(0, 3, 128)
    X = (centers[labels] + 0.2 * rng.randn(128, 1)).astype(np.float32)
    spec = mx.make_spec([(nich, 1)], capacity=16, empties=1)
    cl = clustering.PitmanYor.from_dict({'alpha': 1.0, 'd': 0.0})  # CRP
    shareds = (nich.shared_from_dict(
        {'mu': 0., 'kappa': 0.1, 'sigmasq': 1.0, 'nu': 1.}),)
    values = (jnp.asarray(X),)
    state = mx.init(spec, shareds)
    key = jax.random.PRNGKey(0)
    key, sub = jax.random.split(key)
    state, assign = gibbs.prior_init(spec, cl, shareds, state, values, sub)
    for _ in range(15):
        key, sub = jax.random.split(key)
        state, assign = gibbs.sweep_blocked(
            spec, cl, shareds, state, values, assign, 32, key=sub)
    a = np.asarray(assign)
    purity = sum(np.bincount(labels[a == k]).max()
                 for k in np.unique(a)) / len(labels)
    assert purity > 0.95, purity


def test_gamma_poisson_dpmm():
    # config 3 (scaled): Poisson counts with distinct rates
    rng = np.random.RandomState(1)
    rates = np.array([2.0, 15.0, 40.0])
    labels = rng.randint(0, 3, 192)
    X = rng.poisson(rates[labels])[:, None].astype(np.int32)
    spec = mx.make_spec([(gp, 1)], capacity=16, empties=1)
    cl = clustering.PitmanYor.from_dict({'alpha': 1.0, 'd': 0.0})
    shareds = (gp.shared_from_dict({'alpha': 1.0, 'inv_beta': 0.1}),)
    values = (jnp.asarray(X),)
    state = mx.init(spec, shareds)
    key = jax.random.PRNGKey(0)
    key, sub = jax.random.split(key)
    state, assign = gibbs.prior_init(spec, cl, shareds, state, values, sub)
    for _ in range(15):
        key, sub = jax.random.split(key)
        state, assign = gibbs.sweep_blocked(
            spec, cl, shareds, state, values, assign, 48, key=sub)
    a = np.asarray(assign)
    purity = sum(np.bincount(labels[a == k]).max()
                 for k in np.unique(a)) / len(labels)
    assert purity > 0.85, purity


def test_pitman_yor_dpd_mixture():
    # config 4: categorical data through the DPD feature model
    rng = np.random.RandomState(2)
    # two "topics" over a vocabulary of 12 values
    vocab = np.arange(100, 112)
    topic_probs = np.stack([
        np.concatenate([np.full(6, 0.15), np.full(6, 0.0167)]),
        np.concatenate([np.full(6, 0.0167), np.full(6, 0.15)]),
    ])
    topic_probs /= topic_probs.sum(axis=1, keepdims=True)
    labels = rng.randint(0, 2, 160)
    # three iid symbols per row for a clearly separable signal
    X = np.array([
        [vocab[rng.choice(12, p=topic_probs[t])] for _ in range(3)]
        for t in labels
    ])

    shared_raw = {
        'gamma': 1.0, 'alpha': 5.0,
        'betas': {int(v): 1.0 / 13 for v in vocab},
        'counts': {int(v): 1 for v in vocab},
    }
    spec = mx.make_spec([(dpd, 3)], capacity=12, empties=1)
    cl = clustering.PitmanYor.from_dict({'alpha': 0.5, 'd': 0.1})
    shareds = (dpd.shared_from_dict(shared_raw, cap=32),)
    values = (jnp.asarray(X, jnp.int32),)
    state = mx.init(spec, shareds)
    key = jax.random.PRNGKey(5)
    key, sub = jax.random.split(key)
    state, assign = gibbs.sequential_init(
        spec, cl, shareds, state, values, sub)
    for _ in range(20):
        key, sub = jax.random.split(key)
        state, assign = gibbs.sweep_blocked(
            spec, cl, shareds, state, values, assign, 40, key=sub)
    counts = np.asarray(state.counts)
    assert counts.sum() == 160
    a = np.asarray(assign)
    purity = sum(np.bincount(labels[a == k]).max()
                 for k in np.unique(a)) / len(labels)
    # dpd topics are noisy; just require clear bimodal structure
    assert purity > 0.7, purity
    assert float(mx.score_data(spec, cl, shareds, state)) < 0


def test_sharded_gibbs_with_smc_init():
    # config 5 (scaled): SMC-annealed init feeding a sharded Gibbs run on
    # the 8-virtual-device mesh
    rng = np.random.RandomState(3)
    centers = np.array([[-2., -2.], [2., 2.], [-2., 2.]])
    labels = rng.randint(0, 3, 128)
    X = (centers[labels] + 0.25 * rng.randn(128, 2)).astype(np.float32)
    spec = mx.make_spec([(nich, 2)], capacity=16, empties=1)
    cl = clustering.PitmanYor.from_dict({'alpha': 1.0, 'd': 0.1})
    shareds = (nich.shared_from_dict(
        {'mu': 0., 'kappa': 0.1, 'sigmasq': 1.0, 'nu': 1.}),)
    values = (jnp.asarray(X),)
    key = jax.random.PRNGKey(0)

    key, sub = jax.random.split(key)
    states, assigns, logw, log_ev = smc.smc_init(
        spec, cl, shareds, values, 4, 32, sub)
    state, assign = smc.best_particle(states, assigns, logw)
    assert np.isfinite(float(log_ev))

    mesh = sharding.make_mesh()
    for _ in range(10):
        key, sub = jax.random.split(key)
        state, assign = sharding.sharded_sweep_blocked(
            spec, cl, shareds, state, values, assign, sub, mesh, block=4)
    a = np.asarray(assign)
    purity = sum(np.bincount(labels[a == k]).max()
                 for k in np.unique(a)) / len(labels)
    assert purity > 0.9, purity
