"""Inference-backend tests: HMC/NUTS/ADVI against exact conjugate
posteriors, SMC invariants, annealing driver, shared log-prob graph."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from distributions_tpu import clustering, mixture as mx
from distributions_tpu.models import nich, bb, gp
from distributions_tpu.inference import hmc as hmc_mod
from distributions_tpu.inference import vi as vi_mod
from distributions_tpu.inference import smc as smc_mod
from distributions_tpu.inference import logprob as lp_mod
from distributions_tpu.inference import annealing
from tests.util import assert_close

PY = clustering.PitmanYor.from_dict({'alpha': 1.0, 'd': 0.0})


def _single_group_logprob(module, shared, values):
    def logprob(params):
        return (jnp.sum(module.param_log_prior(shared, params))
                + jnp.sum(module.param_log_likelihood(
                    shared, params, values)))
    return logprob


def test_hmc_bb_conjugate_posterior(key):
    shared = bb.shared_from_dict({'alpha': 2.0, 'beta': 3.0})
    values = jnp.asarray([1, 1, 0, 1, 1, 1, 0, 1, 1, 1], bool)
    logprob = _single_group_logprob(bb, shared, values)
    init = bb.param_init(jax.random.PRNGKey(1), shared)
    samples, info = hmc_mod.hmc(key, logprob, init, num_samples=2000,
                                num_warmup=500, num_leapfrog=16)
    p = np.asarray(jax.nn.sigmoid(samples['logit_p']))
    # exact: p ~ Beta(2+8, 3+2) -> mean 10/15
    assert_close(p.mean(), 10.0 / 15.0, tol=0.03)
    assert float(info['accept_rate']) > 0.5


def test_hmc_nich_conjugate_posterior(key):
    shared = nich.shared_from_dict(
        {'mu': 0., 'kappa': 1., 'sigmasq': 1., 'nu': 1.})
    rng = np.random.RandomState(0)
    values = jnp.asarray(rng.randn(50) + 2.0, jnp.float32)
    logprob = _single_group_logprob(nich, shared, values)
    init = nich.param_init(jax.random.PRNGKey(1), shared)
    samples, info = hmc_mod.hmc(key, logprob, init, num_samples=2000,
                                num_warmup=500, num_leapfrog=16)
    group = nich.Group(count=jnp.int32(50),
                       mean=jnp.mean(values),
                       count_times_variance=jnp.sum(
                           (values - jnp.mean(values)) ** 2))
    post = nich.plus_group(shared, group)
    assert_close(np.asarray(samples['mu']).mean(), float(post.mu), tol=0.05)
    # posterior mean of sigmasq: nu_n sigmasq_n / (nu_n - 2)
    expected_var = float(post.nu * post.sigmasq / (post.nu - 2))
    assert_close(np.exp(np.asarray(samples['log_sigmasq'])).mean(),
                 expected_var, tol=0.15)


def test_nuts_nich_conjugate_posterior(key):
    shared = nich.shared_from_dict(
        {'mu': 0., 'kappa': 1., 'sigmasq': 1., 'nu': 1.})
    rng = np.random.RandomState(1)
    values = jnp.asarray(rng.randn(50) + 2.0, jnp.float32)
    logprob = _single_group_logprob(nich, shared, values)
    init = nich.param_init(jax.random.PRNGKey(1), shared)
    samples, info = hmc_mod.nuts(key, logprob, init, num_samples=1500,
                                 num_warmup=500, max_depth=6)
    group = nich.Group(count=jnp.int32(50), mean=jnp.mean(values),
                       count_times_variance=jnp.sum(
                           (values - jnp.mean(values)) ** 2))
    post = nich.plus_group(shared, group)
    assert_close(np.asarray(samples['mu']).mean(), float(post.mu), tol=0.05)


def test_advi_nich_conjugate_posterior(key):
    shared = nich.shared_from_dict(
        {'mu': 0., 'kappa': 1., 'sigmasq': 1., 'nu': 1.})
    rng = np.random.RandomState(2)
    values = jnp.asarray(rng.randn(50) + 2.0, jnp.float32)
    logprob = _single_group_logprob(nich, shared, values)
    init = nich.param_init(jax.random.PRNGKey(1), shared)
    var_params, info = vi_mod.advi(key, logprob, init, num_steps=1500)
    group = nich.Group(count=jnp.int32(50), mean=jnp.mean(values),
                       count_times_variance=jnp.sum(
                           (values - jnp.mean(values)) ** 2))
    post = nich.plus_group(shared, group)
    assert_close(float(var_params['mu']['mu']), float(post.mu), tol=0.05)
    # elbo should be increasing on average
    trace = np.asarray(info['elbo_trace'])
    assert trace[-100:].mean() > trace[:100].mean()


def test_hmc_gp_conjugate_posterior(key):
    shared = gp.shared_from_dict({'alpha': 2.0, 'inv_beta': 1.0})
    values = jnp.asarray([3, 4, 5, 2, 6, 4, 3, 5], jnp.int32)
    logprob = _single_group_logprob(gp, shared, values)
    init = gp.param_init(jax.random.PRNGKey(1), shared)
    samples, _ = hmc_mod.hmc(key, logprob, init, num_samples=2000,
                             num_warmup=500, num_leapfrog=16)
    # exact posterior: Gamma(alpha + sum, inv_beta + n) -> mean
    expected = (2.0 + 32) / (1.0 + 8)
    lam = np.exp(np.asarray(samples['log_lambda']))
    assert_close(lam.mean(), expected, tol=0.05)


def test_hmc_niw_conjugate_posterior(key):
    from distributions_tpu.models import niw
    shared = niw.shared_from_dict(
        {'mu': np.zeros(2), 'kappa': 1.0, 'psi': np.eye(2), 'nu': 4.0})
    rng = np.random.RandomState(0)
    V = jnp.asarray(rng.randn(40, 2) + np.array([1.5, -0.5]), jnp.float32)

    def logprob(params):
        return (jnp.sum(niw.param_log_prior(shared, params))
                + jnp.sum(niw.param_log_likelihood(shared, params, V)))

    init = niw.param_init(jax.random.PRNGKey(1), shared)
    samples, info = hmc_mod.hmc(key, logprob, init, num_samples=1500,
                                num_warmup=700, num_leapfrog=24)
    group = niw.group_init(shared)
    for i in range(40):
        group = niw.add_value(shared, group, V[i])
    post = niw.plus_group(shared, group)
    mu_mean = np.asarray(samples['mu']).mean(0)
    assert np.abs(mu_mean - np.asarray(post.mu)).max() < 0.1


def test_hmc_bnb_conjugate_posterior(key):
    from distributions_tpu.models import bnb
    shared = bnb.shared_from_dict({'alpha': 2.0, 'beta': 2.0, 'r': 3})
    rng = np.random.RandomState(1)
    V = jnp.asarray(rng.negative_binomial(3, 0.5, 30), jnp.int32)

    def logprob(params):
        return (jnp.sum(bnb.param_log_prior(shared, params))
                + jnp.sum(bnb.param_log_likelihood(shared, params, V)))

    init = bnb.param_init(jax.random.PRNGKey(2), shared)
    samples, _ = hmc_mod.hmc(key, logprob, init, num_samples=2000,
                             num_warmup=500, num_leapfrog=16)
    p = 1 / (1 + np.exp(-np.asarray(samples['logit_p'])))
    exact = (2.0 + 3 * 30) / (2.0 + 3 * 30 + 2.0 + float(V.sum()))
    assert abs(p.mean() - exact) < 0.03


def _blob_problem(R=64, K=8, seed=0):
    rng = np.random.RandomState(seed)
    spec = mx.make_spec([(nich, 2)], capacity=K, empties=1)
    shareds = (nich.shared_from_dict(
        {'mu': 0., 'kappa': 0.1, 'sigmasq': 1.0, 'nu': 1.}),)
    centers = np.array([[-2., -2.], [2., 2.]])
    labels = rng.randint(0, 2, R)
    X = (centers[labels] + 0.2 * rng.randn(R, 2)).astype(np.float32)
    return spec, shareds, (jnp.asarray(X),), labels


def test_mixture_logprob_graph(key):
    spec, shareds, values, labels = _blob_problem()
    logprob, init_fn = lp_mod.make_mixture_logprob(
        spec, PY, shareds, values, K=4)
    params = init_fn(key)
    val = logprob(params)
    assert np.isfinite(float(val))
    grads = jax.grad(logprob)(params)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()
    resp = lp_mod.responsibilities(spec, PY, shareds, params, values)
    assert_close(np.asarray(resp.sum(axis=1)), np.ones(64), tol=1e-4)


def test_hmc_mixture_recovers_clusters(key):
    spec, shareds, values, labels = _blob_problem()
    logprob, init_fn = lp_mod.make_mixture_logprob(
        spec, PY, shareds, values, K=4)
    params0 = init_fn(jax.random.PRNGKey(5))
    samples, info = hmc_mod.hmc(key, logprob, params0, num_samples=300,
                                num_warmup=700, num_leapfrog=24)
    last = jax.tree_util.tree_map(lambda a: a[-1], samples)
    resp = np.asarray(lp_mod.responsibilities(
        spec, PY, shareds, last, values))
    hard = resp.argmax(axis=1)
    purity = sum(np.bincount(labels[hard == k]).max()
                 for k in np.unique(hard)) / len(labels)
    assert purity > 0.9, purity


def test_smc_init(key):
    spec, shareds, values, labels = _blob_problem()
    states, assignments, logw, log_ev = smc_mod.smc_init(
        spec, PY, shareds, values, 8, 16, key)
    assert np.isfinite(float(log_ev))
    counts = np.asarray(states.counts)
    assert (counts.sum(axis=1) == 64).all()
    state, assign = smc_mod.best_particle(states, assignments, logw)
    a = np.asarray(assign)
    purity = sum(np.bincount(labels[a == k]).max()
                 for k in np.unique(a)) / len(labels)
    assert purity > 0.9, purity


def test_annealing(key):
    spec, shareds, values, labels = _blob_problem()
    state, assignments = annealing.anneal(
        spec, PY, shareds, values, key, passes=4, tile=16)
    counts = np.asarray(state.counts)
    assert counts.sum() == 64
    a = np.asarray(assignments)
    assert (a >= 0).all()
    expected = np.bincount(a, minlength=spec.capacity)
    assert counts.tolist() == expected.tolist()
