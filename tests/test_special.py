"""Tests for distributions_tpu.special (mirrors reference
tests/test_special.py plus extra coverage)."""

import numpy as np
import scipy.special

import jax.numpy as jnp

from distributions_tpu import special
from tests.util import assert_close


def test_lgamma_matches_scipy():
    x = np.linspace(0.01, 50.0, 500)
    assert_close(special.lgamma(jnp.asarray(x, jnp.float32)),
                 scipy.special.gammaln(x), tol=1e-3)


def test_log_beta():
    for x, y in [(0.5, 0.5), (1.0, 2.0), (10.0, 0.1), (100.0, 100.0)]:
        assert_close(special.log_beta(x, y),
                     scipy.special.betaln(x, y), tol=1e-3)


def test_log_binom():
    for n, k in [(10, 3), (100, 50), (7, 0), (7, 7)]:
        expected = np.log(float(scipy.special.comb(n, k, exact=True)))
        assert_close(special.log_binom(float(n), float(k)), expected)


def test_log_factorial():
    n = np.arange(0, 100)
    expected = scipy.special.gammaln(n + 1.0)
    assert_close(special.log_factorial(n), expected, tol=1e-3)


def test_lgamma_nu():
    nu = np.array([0.1, 0.5, 1.0, 2.0, 10.0, 1000.0])
    expected = (scipy.special.gammaln(nu / 2 + 0.5)
                - scipy.special.gammaln(nu / 2))
    assert_close(special.lgamma_nu(nu), expected, tol=1e-3)


def test_lmultigamma():
    for d in [1, 2, 3, 5]:
        for a in [2.5, 5.0, 17.5]:
            if a <= 0.5 * (d - 1):
                continue
            assert_close(special.lmultigamma(d, a),
                         scipy.special.multigammaln(a, d), tol=1e-3)


def test_logsumexp():
    scores = np.random.RandomState(0).randn(7, 13).astype(np.float32)
    assert_close(special.logsumexp(jnp.asarray(scores)),
                 scipy.special.logsumexp(scores, axis=-1))


def test_logsumexp_all_neg_inf():
    scores = jnp.full((4,), -jnp.inf)
    assert np.isneginf(float(special.logsumexp(scores)))


def test_log_sum_exp_pairwise():
    assert_close(special.log_sum_exp(0.0, 0.0), np.log(2.0))
    assert_close(special.log_sum_exp(-1e30, 0.0), 0.0)


def test_log_stirling1_row_exact():
    # s(4, k) = [0, 6, 11, 6, 1]
    row = np.asarray(special.log_stirling1_row(4))
    expected = np.log([6.0, 11.0, 6.0, 1.0])
    assert np.isneginf(row[0])
    assert_close(row[1:], expected, tol=1e-4)


def test_log_stirling1_row_shapes():
    for n in [0, 1, 2, 10, 31, 32, 40, 100]:
        row = np.asarray(special.log_stirling1_row(n))
        assert row.shape == (n + 1,)
        if n > 0:
            assert np.isneginf(row[0])
            assert abs(row[n]) < 1e-5


def test_log_stirling1_row_approx_vs_exact():
    # Reference tests the approximation against the exact recurrence at the
    # boundary; reproduce the check near n=32 using the exact recurrence.
    n = 32
    exact = np.asarray(special._log_stirling1_row_exact(n), np.float64)
    approx = np.asarray(special._log_stirling1_row_approx(n), np.float64)
    # interior points: approximations are documented overestimates with
    # softmin blending; require agreement within ~12% of magnitude
    rel = np.abs(approx[1:-1] - exact[1:-1]) / np.maximum(
        np.abs(exact[1:-1]), 1.0)
    assert rel.max() < 0.12, rel.max()
