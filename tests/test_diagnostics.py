"""Diagnostics + chain-parallelism tests."""

import numpy as np

import jax
import jax.numpy as jnp

from distributions_tpu import clustering, mixture as mx, diagnostics
from distributions_tpu.models import nich
from distributions_tpu.ops import gibbs
from tests.util import assert_close

PY = clustering.PitmanYor.from_dict({'alpha': 1.0, 'd': 0.1})


def _problem(R=64, seed=0):
    rng = np.random.RandomState(seed)
    spec = mx.make_spec([(nich, 2)], capacity=16, empties=1)
    shareds = (nich.shared_from_dict(
        {'mu': 0., 'kappa': 0.1, 'sigmasq': 1.0, 'nu': 1.}),)
    centers = np.array([[-2., -2.], [2., 2.]])
    labels = rng.randint(0, 2, R)
    values = (jnp.asarray(
        centers[labels] + 0.3 * rng.randn(R, 2), jnp.float32),)
    return spec, shareds, values


def test_sweep_stats():
    spec, shareds, values = _problem()
    assignments = jnp.zeros(64, jnp.int32)
    state = mx.state_from_assignments(spec, PY, shareds, values, assignments)
    stats = diagnostics.sweep_stats(spec, PY, shareds, state)
    assert stats['sample_size'] == 64
    assert stats['nonempty_groups'] == 1
    assert np.isfinite(stats['score_data'])


def test_chain_parallel_sweeps():
    spec, shareds, values = _problem()
    N = 4
    rng = np.random.RandomState(0)
    assignments = jnp.asarray(rng.randint(0, 3, (N, 64)), jnp.int32)
    states = gibbs.init_chains(spec, PY, shareds, values, assignments)
    assert np.asarray(states.counts).shape == (N, spec.capacity)
    keys = jax.random.split(jax.random.PRNGKey(0), N)
    scores = []
    for _ in range(8):
        states, assignments = gibbs.sweep_blocked_chains(
            spec, PY, shareds, states, values, assignments, 16, keys)
        keys = jax.vmap(lambda k: jax.random.split(k)[0])(keys)
    counts = np.asarray(states.counts)
    assert (counts.sum(axis=1) == 64).all()
    # chains explored independently: assignments differ across chains
    a = np.asarray(assignments)
    assert not (a[0] == a[1]).all()


def test_rhat_and_ess():
    rng = np.random.RandomState(0)
    good = rng.randn(4, 500)
    assert diagnostics.rhat(good) < 1.05
    bad = good + np.arange(4)[:, None] * 3.0
    assert diagnostics.rhat(bad) > 1.5
    iid = rng.randn(1000)
    assert 500 < diagnostics.ess(iid) < 1500
    correlated = np.cumsum(rng.randn(1000)) * 0.1
    assert diagnostics.ess(correlated) < 200


def test_score_data_grid():
    spec, shareds, values = _problem()
    assignments = jnp.asarray(
        np.random.RandomState(0).randint(0, 3, 64), jnp.int32)
    state = mx.state_from_assignments(spec, PY, shareds, values, assignments)
    G = 5
    kappas = jnp.linspace(0.05, 1.0, G)
    grid = (nich.Shared(
        mu=jnp.zeros(G), kappa=kappas,
        sigmasq=jnp.ones(G), nu=jnp.ones(G)),)
    scores = mx.score_data_grid(spec, PY, grid, state)
    assert scores.shape == (G,)
    assert np.isfinite(np.asarray(scores)).all()
    # each grid point's score equals the direct per-group feature sum
    for g in [0, 2, 4]:
        shared_g = nich.Shared(
            mu=jnp.float32(0.), kappa=kappas[g],
            sigmasq=jnp.float32(1.0), nu=jnp.float32(1.0))
        expected = 0.0
        for k in range(spec.capacity):
            for j in range(2):
                grp = jax.tree_util.tree_map(
                    lambda a: a[k, j], state.groups[0])
                expected += float(nich.score_data(shared_g, grp))
        assert_close(scores[g], expected, tol=1e-3)


def test_hyperparameter_grid_steps():
    from distributions_tpu.inference import hypers
    spec, shareds, values = _problem()
    assignments = jnp.asarray(
        np.random.RandomState(1).randint(0, 3, 64), jnp.int32)
    state = mx.state_from_assignments(spec, PY, shareds, values, assignments)
    # feature grid: kappa sweep; the chosen shared enters the tuple
    G = 7
    grid = nich.Shared(mu=jnp.zeros(G),
                       kappa=jnp.logspace(-2, 1, G),
                       sigmasq=jnp.ones(G), nu=jnp.ones(G))
    key = jax.random.PRNGKey(0)
    new_shareds, idx, scores = hypers.grid_step_feature(
        key, spec, 0, shareds, state, grid, sample=False)
    assert scores.shape == (G,)
    assert float(scores[idx]) == float(scores.max())
    assert float(new_shareds[0].kappa) == float(grid.kappa[idx])
    # clustering grid
    cl_grid = hypers.make_py_grid([0.5, 1.0, 2.0], [0.0, 0.1, 0.3])
    chosen, cidx, cscores = hypers.grid_step_clustering(
        key, cl_grid, state, sample=False)
    assert cscores.shape == (9,)
    assert np.isfinite(np.asarray(cscores)).all()
