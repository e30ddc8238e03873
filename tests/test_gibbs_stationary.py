"""Stationary-distribution validation of the Gibbs sweep kernels: on a
tiny problem the chain's empirical partition distribution must match the
exact enumerated posterior exp(score_data(partition)).

This is the strongest end-to-end correctness check of the collapsed-Gibbs
machinery (clustering scores + feature scores + slot bookkeeping +
categorical sampling together).  sweep_sequential is exact collapsed Gibbs
and must pass tightly; sweep_blocked freezes suff stats within a tile
(SAME-style) and is checked at block=1 (exact) and block=2 (approximate,
looser tolerance)."""

from collections import Counter
from itertools import product

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from distributions_tpu import clustering, mixture as mx
from distributions_tpu.models import bb
from distributions_tpu.ops import gibbs

R = 4
C = 6
PY = clustering.PitmanYor.from_dict({'alpha': 1.0, 'd': 0.0})
SHAREDS = (bb.shared_from_dict({'alpha': 1.0, 'beta': 1.0}),)
SPEC = mx.make_spec([(bb, 1)], capacity=C, empties=1)
VALUES = (jnp.asarray([[True], [True], [False], [False]]),)


def canonical(assign):
    seen = {}
    out = []
    for a in assign:
        if a not in seen:
            seen[a] = len(seen)
        out.append(seen[a])
    return tuple(out)


def exact_posterior():
    """Enumerate canonical assignment vectors; p ∝ exp(score_data)."""
    probs = {}
    for assign in product(range(R), repeat=R):
        c = canonical(assign)
        if c in probs:
            continue
        state = mx.state_from_assignments(
            SPEC, PY, SHAREDS, VALUES, jnp.asarray(c, jnp.int32))
        probs[c] = float(mx.score_data(SPEC, PY, SHAREDS, state))
    mx_score = max(probs.values())
    total = sum(np.exp(s - mx_score) for s in probs.values())
    return {c: np.exp(s - mx_score) / total for c, s in probs.items()}


def run_chain(sweep_fn, n_sweeps, seed=0):
    assignments = jnp.zeros(R, jnp.int32)
    state = mx.state_from_assignments(SPEC, PY, SHAREDS, VALUES, assignments)

    def step(carry, key):
        state, assignments = carry
        state, assignments = sweep_fn(state, assignments, key)
        return (state, assignments), assignments

    keys = jax.random.split(jax.random.PRNGKey(seed), n_sweeps)
    (_, _), trace = lax.scan(step, (state, assignments), keys)
    return np.asarray(trace)


def empirical(trace, burn=200, thin=2):
    counter = Counter(canonical(row) for row in trace[burn::thin])
    total = sum(counter.values())
    return {c: n / total for c, n in counter.items()}


def total_variation(p, q):
    keys = set(p) | set(q)
    return 0.5 * sum(abs(p.get(k, 0.0) - q.get(k, 0.0)) for k in keys)


@pytest.fixture(scope='module')
def posterior():
    return exact_posterior()


def test_sequential_sweep_stationary(posterior):
    trace = run_chain(
        lambda st, an, k: gibbs.sweep_sequential(
            SPEC, PY, SHAREDS, st, VALUES, an, k), 4200)
    emp = empirical(trace)
    tv = total_variation(emp, posterior)
    assert tv < 0.05, (tv, emp, posterior)


def test_blocked_sweep_block1_stationary(posterior):
    trace = run_chain(
        lambda st, an, k: gibbs.sweep_blocked(
            SPEC, PY, SHAREDS, st, VALUES, an, 1, key=k), 4200)
    emp = empirical(trace)
    tv = total_variation(emp, posterior)
    assert tv < 0.05, (tv, emp, posterior)


def test_blocked_sweep_block2_near_stationary(posterior):
    # Tile-frozen scoring is an approximation whose bias scales with
    # block/R; this tiny case (R=4, block=2 — HALF the data frozen per
    # tile) is the worst realistic ratio and lands at TV ~0.28.  The test
    # characterizes that the bias stays bounded; production sweeps use
    # block << R where the bias vanishes (see the purity/score results in
    # tests/test_configs.py at block/R ~ 1/4).
    trace = run_chain(
        lambda st, an, k: gibbs.sweep_blocked(
            SPEC, PY, SHAREDS, st, VALUES, an, 2, key=k), 4200)
    emp = empirical(trace)
    tv = total_variation(emp, posterior)
    assert tv < 0.35, (tv, emp, posterior)


# ---------------------------------------------------------------------------
# Per-model-family stationarity: the same exact-posterior check for each
# likelihood the BASELINE validation configs name (gamma-Poisson, DPD,
# nich, niw) — the sequential sweep must target the enumerated posterior
# regardless of the feature model.

def _family_problem(name):
    from distributions_tpu.models import gp, nich, dpd, niw
    if name == 'gp':
        shareds = (gp.shared_from_dict({'alpha': 2.0, 'inv_beta': 1.0}),)
        values = (jnp.asarray([[0], [1], [5], [6]], jnp.int32),)
        spec = mx.make_spec([(gp, 1)], capacity=C, empties=1)
    elif name == 'nich':
        shareds = (nich.shared_from_dict(
            {'mu': 0., 'kappa': 1., 'sigmasq': 1., 'nu': 1.}),)
        values = (jnp.asarray([[-1.0], [-0.8], [1.2], [1.0]], jnp.float32),)
        spec = mx.make_spec([(nich, 1)], capacity=C, empties=1)
    elif name == 'dpd':
        sh = dpd.shared_from_dict(
            {'gamma': 1.0, 'alpha': 1.0, 'betas': {}}, cap=8)
        key = jax.random.PRNGKey(11)
        for v in range(3):
            key, sub = jax.random.split(key)
            sh = dpd.shared_add_value(sub, sh, v)
        shareds = (sh,)
        values = (jnp.asarray([[0], [0], [1], [2]], jnp.int32),)
        spec = mx.make_spec([(dpd, 1)], capacity=C, empties=1)
    elif name == 'niw':
        shareds = (niw.shared_from_dict(
            {'mu': np.zeros(2), 'kappa': 1.0, 'psi': np.eye(2),
             'nu': 3.0}),)
        values = (jnp.asarray(
            [[[-1., -1.]], [[-0.8, -1.2]], [[1., 1.2]], [[0.9, 1.1]]],
            jnp.float32),)
        spec = mx.make_spec([(niw, 1)], capacity=C, empties=1)
    else:
        raise AssertionError(name)
    return spec, shareds, values


def _exact_posterior_for(spec, shareds, values):
    probs = {}
    for assign in product(range(R), repeat=R):
        c = canonical(assign)
        if c in probs:
            continue
        state = mx.state_from_assignments(
            spec, PY, shareds, values, jnp.asarray(c, jnp.int32))
        probs[c] = float(mx.score_data(spec, PY, shareds, state))
    mx_score = max(probs.values())
    total = sum(np.exp(s - mx_score) for s in probs.values())
    return {c: np.exp(s - mx_score) / total for c, s in probs.items()}


@pytest.mark.parametrize('name', ['gp', 'nich', 'dpd', 'niw'])
def test_sequential_sweep_stationary_per_family(name):
    spec, shareds, values = _family_problem(name)
    posterior = _exact_posterior_for(spec, shareds, values)

    assignments = jnp.zeros(R, jnp.int32)
    state = mx.state_from_assignments(spec, PY, shareds, values, assignments)

    def step(carry, key):
        st, an = carry
        st, an = gibbs.sweep_sequential(spec, PY, shareds, st, values, an,
                                        key)
        return (st, an), an

    keys = jax.random.split(jax.random.PRNGKey(0), 4200)
    (_, _), trace = lax.scan(step, (state, assignments), keys)
    emp = empirical(np.asarray(trace))
    tv = total_variation(emp, posterior)
    assert tv < 0.05, (name, tv, emp, posterior)
