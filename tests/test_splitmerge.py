"""Split-merge move validation: a composite Gibbs + split-merge chain must
preserve the exact enumerated posterior (the acceptance-ratio check), and
split-merge must jump between modes Gibbs crosses only slowly."""

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from distributions_tpu import clustering, mixture as mx
from distributions_tpu.models import nich
from distributions_tpu.ops import gibbs, splitmerge
from tests.test_gibbs_stationary import (
    SPEC, PY, SHAREDS, VALUES, R, exact_posterior, empirical,
    total_variation)


def test_composite_chain_stationary():
    posterior = exact_posterior()
    assignments = jnp.zeros(R, jnp.int32)
    state = mx.state_from_assignments(SPEC, PY, SHAREDS, VALUES, assignments)

    def step(carry, key):
        state, assignments = carry
        k1, k2 = jax.random.split(key)
        state, assignments = gibbs.sweep_sequential(
            SPEC, PY, SHAREDS, state, VALUES, assignments, k1)
        state, assignments, _ = splitmerge.split_merge_move(
            SPEC, PY, SHAREDS, state, VALUES, assignments, k2)
        return (state, assignments), assignments

    keys = jax.random.split(jax.random.PRNGKey(0), 4200)
    (_, _), trace = lax.scan(step, (state, assignments), keys)
    emp = empirical(np.asarray(trace))
    tv = total_variation(emp, posterior)
    assert tv < 0.05, (tv, emp, posterior)


def test_splitmerge_only_chain_stationary():
    # split-merge alone is also a valid (if slow) chain on partitions; run
    # many moves and check it does not drift from the posterior support
    posterior = exact_posterior()
    assignments = jnp.zeros(R, jnp.int32)
    state = mx.state_from_assignments(SPEC, PY, SHAREDS, VALUES, assignments)

    def step(carry, key):
        state, assignments = carry
        state, assignments, acc = splitmerge.split_merge_move(
            SPEC, PY, SHAREDS, state, VALUES, assignments, key)
        return (state, assignments), (assignments, acc)

    keys = jax.random.split(jax.random.PRNGKey(1), 20000)
    (_, _), (trace, accs) = lax.scan(step, (state, assignments), keys)
    assert float(jnp.mean(accs.astype(jnp.float32))) > 0.02
    emp = empirical(np.asarray(trace), burn=2000, thin=5)
    tv = total_variation(emp, posterior)
    # split-merge alone can move between all partitions of this tiny
    # problem; moderate tolerance for its slower mixing
    assert tv < 0.12, (tv, emp, posterior)


def test_splitmerge_jumps_merged_modes():
    # two tight clusters initialized as ONE cluster: a random-coin split
    # aligning with the data separates them.  NOTE: simple random splits
    # only have usable acceptance for small clusters (alignment prob
    # ~2^-n) — the known weakness that restricted-Gibbs split proposals
    # (Jain & Neal's full scheme) fix; kept small here by design.
    rng = np.random.RandomState(0)
    Rn = 8
    spec = mx.make_spec([(nich, 1)], capacity=8, empties=1)
    shareds = (nich.shared_from_dict(
        {'mu': 0., 'kappa': 0.05, 'sigmasq': 0.5, 'nu': 1.}),)
    labels = np.array([0] * 4 + [1] * 4)
    X = np.where(labels == 0, -3.0, 3.0)[:, None] \
        + 0.2 * rng.randn(Rn, 1)
    values = (jnp.asarray(X, jnp.float32),)
    cl = clustering.PitmanYor.from_dict({'alpha': 1.0, 'd': 0.0})
    assignments = jnp.zeros(Rn, jnp.int32)
    state = mx.state_from_assignments(spec, cl, shareds, values, assignments)

    key = jax.random.PRNGKey(2)
    accepted_any = False
    for _ in range(500):
        key, sub = jax.random.split(key)
        state, assignments, acc = splitmerge.split_merge_move(
            spec, cl, shareds, state, values, assignments, sub)
        if int((np.asarray(state.counts) > 0).sum()) >= 2:
            accepted_any = True
            break
    assert accepted_any, 'no split accepted in 500 moves'
    # a random split seeds >=2 clusters; a few Gibbs sweeps then snap the
    # partition to the data-aligned mode
    for _ in range(10):
        key, sub = jax.random.split(key)
        state, assignments = gibbs.sweep_sequential(
            spec, cl, shareds, state, values, assignments, sub)
    a = np.asarray(assignments)
    purity = sum(np.bincount(labels[a == k]).max()
                 for k in np.unique(a)) / Rn
    assert purity > 0.9, purity


def test_restricted_composite_chain_stationary():
    posterior = exact_posterior()
    assignments = jnp.zeros(R, jnp.int32)
    state = mx.state_from_assignments(SPEC, PY, SHAREDS, VALUES, assignments)

    def step(carry, key):
        state, assignments = carry
        k1, k2 = jax.random.split(key)
        state, assignments = gibbs.sweep_sequential(
            SPEC, PY, SHAREDS, state, VALUES, assignments, k1)
        state, assignments, _ = splitmerge.split_merge_restricted(
            SPEC, PY, SHAREDS, state, VALUES, assignments, k2,
            n_intermediate=2)
        return (state, assignments), assignments

    keys = jax.random.split(jax.random.PRNGKey(3), 4200)
    (_, _), trace = lax.scan(step, (state, assignments), keys)
    emp = empirical(np.asarray(trace))
    tv = total_variation(emp, posterior)
    assert tv < 0.05, (tv, emp, posterior)


def test_restricted_splits_large_cluster():
    # the case simple random splits cannot handle: 32 rows, two tight
    # modes, initialized as ONE cluster — restricted-Gibbs proposals follow
    # the data and split it within a few moves
    rng = np.random.RandomState(0)
    Rn = 32
    spec = mx.make_spec([(nich, 1)], capacity=8, empties=1)
    shareds = (nich.shared_from_dict(
        {'mu': 0., 'kappa': 0.05, 'sigmasq': 0.5, 'nu': 1.}),)
    labels = np.array([0] * 16 + [1] * 16)
    X = np.where(labels == 0, -3.0, 3.0)[:, None] + 0.2 * rng.randn(Rn, 1)
    values = (jnp.asarray(X, jnp.float32),)
    cl = clustering.PitmanYor.from_dict({'alpha': 1.0, 'd': 0.0})
    assignments = jnp.zeros(Rn, jnp.int32)
    state = mx.state_from_assignments(spec, cl, shareds, values, assignments)

    key = jax.random.PRNGKey(4)
    split_done = False
    for _ in range(30):
        key, sub = jax.random.split(key)
        state, assignments, acc = splitmerge.split_merge_restricted(
            spec, cl, shareds, state, values, assignments, sub,
            n_intermediate=3)
        if int((np.asarray(state.counts) > 0).sum()) >= 2:
            split_done = True
            break
    assert split_done, 'restricted split never accepted in 30 moves'
    a = np.asarray(assignments)
    purity = sum(np.bincount(labels[a == k]).max()
                 for k in np.unique(a)) / Rn
    assert purity > 0.95, purity
