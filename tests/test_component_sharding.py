"""Component-axis sharding tests on the 8-virtual-device mesh."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from distributions_tpu import clustering, mixture as mx
from distributions_tpu.models import nich
from distributions_tpu.parallel import sharding

PY = clustering.PitmanYor.from_dict({'alpha': 1.0, 'd': 0.1})


def make_problem(R=64, cols=2, C=32, seed=0):
    rng = np.random.RandomState(seed)
    spec = mx.make_spec([(nich, cols)], capacity=C, empties=1)
    shareds = (nich.shared_from_dict(
        {'mu': 0., 'kappa': 0.1, 'sigmasq': 1.0, 'nu': 1.}),)
    centers = rng.randn(3, cols) * 3
    labels = rng.randint(0, 3, R)
    values = (jnp.asarray(
        centers[labels] + 0.3 * rng.randn(R, cols), jnp.float32),)
    assignments = jnp.asarray(labels, jnp.int32)
    return spec, shareds, values, assignments, labels


def test_component_sharded_sweep():
    spec, shareds, values, assignments, labels = make_problem()
    mesh = sharding.make_component_mesh()
    state = mx.state_from_assignments(spec, PY, shareds, values, assignments)
    key = jax.random.PRNGKey(0)
    for i in range(10):
        key, sub = jax.random.split(key)
        state, assignments = sharding.sharded_sweep_components(
            spec, PY, shareds, state, values, assignments, sub, mesh,
            block=16)
    counts = np.asarray(state.counts)
    assert counts.sum() == 64
    a = np.asarray(assignments)
    expected = np.bincount(a, minlength=spec.capacity)
    assert counts.tolist() == expected.tolist()
    purity = sum(np.bincount(labels[a == k]).max()
                 for k in np.unique(a)) / len(labels)
    assert purity > 0.9, purity


def test_component_sharded_matches_counts_invariants():
    spec, shareds, values, assignments, _ = make_problem(seed=3)
    mesh = sharding.make_component_mesh()
    state = mx.state_from_assignments(spec, PY, shareds, values, assignments)
    key = jax.random.PRNGKey(1)
    state2, assignments2 = sharding.sharded_sweep_components(
        spec, PY, shareds, state, values, assignments, key, mesh, block=8)
    # every shard keeps at least one alive empty slot
    alive = np.asarray(state2.alive).reshape(8, -1)
    counts = np.asarray(state2.counts).reshape(8, -1)
    assert ((alive & (counts == 0)).sum(axis=1) >= 1).all()
    assert int(state2.sample_size) == 64


def test_component_sharded_argmax_matches_single_device():
    """Deterministic argmax equality: the 1-D component-sharded sweep must
    produce exactly the single-device argmax sweep's assignments and
    counts (sharding.py documents the two caveats — per-shard reserved
    empties and cross-shard tie order — neither binds here: clusters are
    well-separated, alpha=0.1 disfavors empty slots, and no two slots tie)."""
    py = clustering.PitmanYor.from_dict({'alpha': 0.1, 'd': 0.0})
    spec, shareds, values, assignments, _ = make_problem(seed=5)
    mesh = sharding.make_component_mesh()
    state = mx.state_from_assignments(spec, py, shareds, values, assignments)

    block = 16
    st_s, an_s = sharding.sharded_sweep_components(
        spec, py, shareds, state, values, assignments,
        jax.random.PRNGKey(0), mesh, block, sampling='argmax')

    # single-device reference: per-tile remove -> score -> argmax -> add
    st_1 = state
    an_np = np.asarray(assignments).copy()
    R = an_np.shape[0]
    for t0 in range(0, R, block):
        sl = slice(t0, t0 + block)
        t_vals = tuple(v[sl] for v in values)
        t_an = jnp.asarray(an_np[sl])
        st_1 = mx.remove_tile(spec, py, shareds, st_1, t_vals, t_an)
        scores = mx.score_batch(spec, py, shareds, st_1, t_vals)
        new = np.asarray(jnp.argmax(scores, axis=1).astype(jnp.int32))
        st_1 = mx.add_tile(spec, py, shareds, st_1, t_vals,
                           jnp.asarray(new))
        an_np[sl] = new

    assert (np.asarray(an_s) == an_np).all(), (
        np.asarray(an_s).tolist(), an_np.tolist())
    np.testing.assert_array_equal(np.asarray(st_s.counts),
                                  np.asarray(st_1.counts))


def test_component_sharded_sampling_stationary():
    """Distributional validation of the component-sharded sweep in
    SAMPLING mode (gumbel): on the tiny enumerable bb problem of
    tests/test_gibbs_stationary.py, the chain's empirical partition
    distribution must match the exact posterior.  This exercises the
    per-shard-empty-slot semantics statistically: the clustering empty
    mass splits over n_shards * empties slots, which must leave the
    PARTITION posterior unchanged (the per-slot scores are alpha/E each,
    summing to the same new-table mass).  Analog of the reference's
    CachedMixture-vs-naive trajectory tests
    (/root/reference/distributions/tests/test_clustering.py:242-303)."""
    from collections import Counter
    from jax import lax
    from distributions_tpu.models import bb
    from tests.test_gibbs_stationary import (
        canonical, _exact_posterior_for, total_variation)

    R, C = 4, 8
    py = clustering.PitmanYor.from_dict({'alpha': 1.0, 'd': 0.0})
    shareds = (bb.shared_from_dict({'alpha': 1.0, 'beta': 1.0}),)
    spec = mx.make_spec([(bb, 1)], capacity=C, empties=1)
    values = (jnp.asarray([[True], [True], [False], [False]]),)
    mesh = sharding.make_component_mesh(jax.devices()[:4])  # C_local=2

    # same PY params as tests/test_gibbs_stationary.PY, which
    # _exact_posterior_for bakes in; the partition posterior is
    # capacity-independent so C=8 reuses it unchanged
    posterior = _exact_posterior_for(spec, shareds, values)

    assignments0 = jnp.zeros(R, jnp.int32)
    state0 = mx.state_from_assignments(spec, py, shareds, values,
                                       assignments0)
    n_sweeps = 3000

    @jax.jit
    def chain(state, assignments, keys):
        def step(carry, key):
            st, an = carry
            # block=1 recovers exact per-row collapsed semantics
            st, an = sharding.sharded_sweep_components(
                spec, py, shareds, st, values, an, key, mesh, block=1,
                sampling='gumbel')
            return (st, an), an
        (_, _), trace = lax.scan(step, (state, assignments), keys)
        return trace

    trace = np.asarray(chain(
        state0, assignments0,
        jax.random.split(jax.random.PRNGKey(7), n_sweeps)))

    emp = Counter(canonical(row) for row in trace[200::2])
    total = sum(emp.values())
    emp = {c: n / total for c, n in emp.items()}
    tv = total_variation(emp, posterior)
    assert tv < 0.07, (tv, emp, posterior)
