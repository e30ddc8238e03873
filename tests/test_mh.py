"""MH sweep validation: stationary distribution vs exact enumeration
(same harness as test_gibbs_stationary) and cluster recovery."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from distributions_tpu import clustering, mixture as mx
from distributions_tpu.models import bb, nich
from distributions_tpu.ops import mh
from tests.test_gibbs_stationary import (
    SPEC, PY, SHAREDS, VALUES, R, exact_posterior, empirical,
    total_variation)


def test_mh_sweep_stationary():
    posterior = exact_posterior()
    assignments = jnp.zeros(R, jnp.int32)
    state = mx.state_from_assignments(SPEC, PY, SHAREDS, VALUES, assignments)

    def step(carry, key):
        state, assignments = carry
        state, assignments = mh.sweep_mh(
            SPEC, PY, SHAREDS, state, VALUES, assignments, 1,
            mh_steps=8, key=key)
        return (state, assignments), assignments

    keys = jax.random.split(jax.random.PRNGKey(0), 6000)
    (_, _), trace = lax.scan(step, (state, assignments), keys)
    emp = empirical(np.asarray(trace), burn=500, thin=2)
    tv = total_variation(emp, posterior)
    # MH with block=1 and frozen-per-row stats targets the exact
    # conditional; mixing is slower than Gibbs so allow a looser bound
    assert tv < 0.08, (tv, emp, posterior)


def test_mh_sweep_recovers_clusters():
    rng = np.random.RandomState(0)
    Rn = 128
    spec = mx.make_spec([(nich, 2)], capacity=16, empties=1)
    shareds = (nich.shared_from_dict(
        {'mu': 0., 'kappa': 0.1, 'sigmasq': 1.0, 'nu': 1.}),)
    centers = np.array([[-2., -2.], [2., 2.], [-2., 2.]])
    labels = rng.randint(0, 3, Rn)
    values = (jnp.asarray(
        centers[labels] + 0.25 * rng.randn(Rn, 2), jnp.float32),)
    cl = clustering.PitmanYor.from_dict({'alpha': 1.0, 'd': 0.1})
    # random scattered init (MH with a popularity proposal mixes slowly out
    # of a single-cluster init; Gibbs or SMC init is the production pattern)
    assignments = jnp.asarray(rng.randint(0, 8, Rn), jnp.int32)
    state = mx.state_from_assignments(spec, cl, shareds, values, assignments)
    key = jax.random.PRNGKey(1)
    for _ in range(60):
        key, sub = jax.random.split(key)
        state, assignments = mh.sweep_mh(
            spec, cl, shareds, state, values, assignments, 32,
            mh_steps=8, key=sub, proposal_beta=4.0)
    a = np.asarray(assignments)
    counts = np.asarray(state.counts)
    assert counts.sum() == Rn
    assert np.bincount(a, minlength=16).tolist() == counts.tolist()
    purity = sum(np.bincount(labels[a == k]).max()
                 for k in np.unique(a)) / Rn
    assert purity > 0.9, purity
