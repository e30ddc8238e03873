"""Tests for distributions_tpu.random (mirrors reference
tests/test_random.py: seed determinism, GoF of discrete samplers, student-t
consistency, Wishart moments)."""

import numpy as np
import scipy.stats

import jax
import jax.numpy as jnp

from distributions_tpu import random as dr
from distributions_tpu import util
from tests.util import assert_close

MIN_GOODNESS_OF_FIT = 1e-3  # reference tests/test_models.py:63-65


def test_seed_determinism():
    key = jax.random.PRNGKey(42)
    a = dr.sample_gamma(key, 2.0, 3.0, shape=(10,))
    b = dr.sample_gamma(key, 2.0, 3.0, shape=(10,))
    assert_close(a, b, tol=0)


def test_sample_discrete_gof(key):
    probs = np.array([0.1, 0.3, 0.05, 0.55])
    n = 20000
    samples = dr.sample_discrete(key, probs, shape=(n,))
    counts = np.bincount(np.asarray(samples), minlength=4)
    gof = util.multinomial_goodness_of_fit(probs, counts, n)
    assert gof > MIN_GOODNESS_OF_FIT, gof


def test_sample_from_scores_gof(key):
    scores = np.log(np.array([0.1, 0.3, 0.05, 0.55])) + 7.0
    n = 20000
    samples = dr.sample_from_scores(key, jnp.asarray(scores), shape=(n,))
    counts = np.bincount(np.asarray(samples), minlength=4)
    probs = util.scores_to_probs(scores)
    gof = util.multinomial_goodness_of_fit(probs, counts, n)
    assert gof > MIN_GOODNESS_OF_FIT, gof


def test_sample_from_scores_batched(key):
    scores = jnp.asarray(np.random.RandomState(0).randn(5, 8))
    out = dr.sample_from_scores(key, scores)
    assert out.shape == (5,)
    assert (np.asarray(out) >= 0).all() and (np.asarray(out) < 8).all()


def test_sample_from_scores_respects_neg_inf(key):
    scores = jnp.asarray([0.0, -jnp.inf, 1.0, -jnp.inf])
    samples = dr.sample_from_scores(key, scores, shape=(1000,))
    assert set(np.asarray(samples).tolist()) <= {0, 2}


def test_sample_prob_from_scores(key):
    scores = jnp.asarray([0.1, 0.7, -0.3])
    choice, prob = dr.sample_prob_from_scores(key, scores)
    probs = util.scores_to_probs(np.asarray(scores))
    assert_close(prob, probs[int(choice)], tol=1e-4)


def test_score_from_scores():
    scores = jnp.asarray([0.1, 0.7, -0.3])
    probs = util.scores_to_probs(np.asarray(scores))
    for i in range(3):
        assert_close(dr.score_from_scores(scores, i), np.log(probs[i]),
                     tol=1e-4)


def test_gamma_moments(key):
    alpha, beta = 2.5, 1.7  # shape, scale
    x = np.asarray(dr.sample_gamma(key, alpha, beta, shape=(200000,)))
    assert_close(x.mean(), alpha * beta, tol=0.05)
    assert_close(x.var(), alpha * beta ** 2, tol=0.1)


def test_beta_moments(key):
    a, b = 2.0, 5.0
    x = np.asarray(dr.sample_beta(key, a, b, shape=(100000,)))
    assert_close(x.mean(), a / (a + b), tol=0.05)


def test_chisq_moments(key):
    nu = 3.7
    x = np.asarray(dr.sample_chisq(key, nu, shape=(200000,)))
    assert_close(x.mean(), nu, tol=0.05)
    assert_close(x.var(), 2 * nu, tol=0.1)


def test_negative_binomial_gof(key):
    p, r = 0.4, 3
    n = 20000
    x = np.asarray(dr.sample_negative_binomial(key, p, r, shape=(n,)))
    support = np.arange(0, 30)
    probs = scipy.stats.nbinom.pmf(support, r, p)
    probs_dict = {int(k): float(v) for k, v in zip(support, probs)}
    x = np.clip(x, 0, 29)
    gof = util.discrete_goodness_of_fit(x.tolist(), probs_dict)
    assert gof > MIN_GOODNESS_OF_FIT, gof


def test_poisson_gof(key):
    lam = 3.3
    n = 20000
    x = np.asarray(dr.sample_poisson(key, lam, shape=(n,)))
    support = np.arange(0, 25)
    probs = scipy.stats.poisson.pmf(support, lam)
    probs_dict = {int(k): float(v) for k, v in zip(support, probs)}
    gof = util.discrete_goodness_of_fit(
        np.clip(x, 0, 24).tolist(), probs_dict)
    assert gof > MIN_GOODNESS_OF_FIT, gof


def test_dirichlet_zero_alpha(key):
    alphas = jnp.asarray([1.0, 0.0, 2.0])
    p = np.asarray(dr.sample_dirichlet(key, alphas))
    assert p[1] == 0.0
    assert_close(p.sum(), 1.0, tol=1e-5)


def test_student_t_score_matches_scipy():
    nu, mu, sigma = 5.0, 1.0, 2.0
    xs = np.linspace(-3, 5, 20)
    ours = np.asarray(dr.score_student_t(
        xs[:, None], nu, jnp.asarray([mu]), jnp.asarray([[sigma ** 2]])))
    expected = scipy.stats.t.logpdf(xs, nu, loc=mu, scale=sigma)
    assert_close(ours, expected, tol=1e-3)


def test_student_t_sampler_scorer_gof(key):
    nu, mu = 5.0, 0.5
    sigma = np.array([[1.5]])
    n = 5000
    samples = np.asarray(dr.sample_student_t(
        key, nu, jnp.asarray([mu]), jnp.asarray(sigma), shape=(n,)))[:, 0]
    probs = np.exp(np.asarray(dr.score_student_t(
        samples[:, None], nu, jnp.asarray([mu]), jnp.asarray(sigma))))
    gof = util.density_goodness_of_fit(samples, probs)
    assert gof > MIN_GOODNESS_OF_FIT, gof


def test_wishart_mean(key):
    nu, d = 7.0, 3
    Lambda = np.array([[2.0, 0.3, 0.0], [0.3, 1.0, 0.1], [0.0, 0.1, 0.5]])
    keys = jax.random.split(key, 3000)
    samples = jax.vmap(
        lambda k: dr.sample_wishart(k, nu, jnp.asarray(Lambda)))(keys)
    mean = np.asarray(jnp.mean(samples, axis=0))
    assert_close(mean, nu * Lambda, tol=0.15)


def test_inverse_wishart_mean(key):
    nu, d = 10.0, 2
    S = np.array([[2.0, 0.3], [0.3, 1.0]])
    keys = jax.random.split(key, 4000)
    samples = jax.vmap(
        lambda k: dr.sample_inverse_wishart(k, nu, jnp.asarray(S)))(keys)
    mean = np.asarray(jnp.mean(samples, axis=0))
    expected = S / (nu - d - 1)  # E[IW(nu, S)] = S / (nu - d - 1)
    assert_close(mean, expected, tol=0.15)


def test_normal_inverse_wishart_shapes(key):
    mu0 = jnp.zeros(3)
    mu, cov = dr.sample_normal_inverse_wishart(
        key, mu0, 2.0, jnp.eye(3), 5.0)
    assert mu.shape == (3,)
    assert cov.shape == (3, 3)
    evals = np.linalg.eigvalsh(np.asarray(cov))
    assert (evals > 0).all()


def test_sample_stick(key):
    w = np.asarray(dr.sample_stick(key, 2.0, capacity=128))
    assert_close(w.sum(), 1.0, tol=1e-5)
    assert (w >= 0).all()


def test_sample_pair_from_urn(key):
    keys = jax.random.split(key, 500)
    for k in keys[:50]:
        i, j = dr.sample_pair_from_urn(k, 5)
        assert int(i) != int(j)
        assert 0 <= int(i) < 5 and 0 <= int(j) < 5
