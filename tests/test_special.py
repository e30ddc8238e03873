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


def test_lgamma_ratio_accuracy_and_extremes():
    """lgamma_ratio(x, y) = lgamma(x+y) - lgamma(x) must stay accurate
    where the naive f32 difference loses all significance (x >> y) —
    the r5 trigger: slice-sampled dd alphas walked to 1e9 because
    score_data's naive difference cancelled to exactly 0 there."""
    import scipy.special as ss
    from distributions_tpu.special import lgamma_ratio

    xs = np.array([0.5, 3.0, 63.0, 64.0, 1e3, 1e5, 1e8, 1e9], np.float64)
    ys = np.array([0.0, 0.25, 1.0, 7.0, 120.0, 1e4], np.float64)
    for x in xs:
        for y in ys:
            got = float(lgamma_ratio(jnp.float32(x), jnp.float32(y)))
            want = ss.gammaln(x + y) - ss.gammaln(x)
            tol = 1e-5 * max(1.0, abs(want))
            assert abs(got - want) <= tol, (x, y, got, want)


def test_score_data_safe_at_huge_hypers():
    """Conjugate score_data must keep DECLINING past the data-supported
    scale instead of cancelling to 0 (dd/bb/gp/bnb all route their
    gammaln differences through lgamma_ratio now)."""
    from distributions_tpu.models import dd, bb, gp, bnb

    # asymmetric growth (one concentration -> inf) forces the predictive
    # toward p=1 against 30 observed tails: the exact score declines
    # ~ -30 log(a); the old naive difference plateaued then hit 0.0
    g_dd = dd.Group(counts=jnp.asarray([120., 30.]))
    s = [float(dd.score_data(
        dd.Shared(alphas=jnp.asarray([a, 1.0], jnp.float32)), g_dd))
        for a in (1e0, 1e4, 1e8)]
    assert s[0] > s[1] > s[2], s

    g_bb = bb.Group(heads=jnp.float32(120.), tails=jnp.float32(30.))
    s = [float(bb.score_data(
        bb.shared_from_dict({'alpha': a, 'beta': 1.0}), g_bb))
        for a in (1e0, 1e4, 1e8)]
    assert s[0] > s[1] > s[2], s

    # gp/bnb: the increments must come from RAW group stats — a
    # post-minus-prior reconstruction absorbs to 0 in f32 at prior 1e8
    # and the score freezes (r5 self-review finding)
    g_gp = gp.Group(count=jnp.float32(30.), sum=jnp.float32(120.),
                    log_prod=jnp.float32(50.))
    s = [float(gp.score_data(
        gp.shared_from_dict({'alpha': a, 'inv_beta': 1.0}), g_gp))
        for a in (1e0, 1e4, 1e8)]
    assert s[0] > s[1] > s[2], s

    g_bnb = bnb.Group(count=jnp.float32(30.), sum=jnp.float32(120.))
    s = [float(bnb.score_data(
        bnb.shared_from_dict({'alpha': a, 'beta': 1.0, 'r': 1.0}),
        g_bnb))
        for a in (1e0, 1e4, 1e8)]
    assert s[0] > s[1] > s[2], s
