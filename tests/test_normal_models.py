"""Inter-model consistency oracle: NIW in dimension 1 must agree with NICH
(reference tests/test_normal_models.py:34-100) under the parameter map
mu=[mu], kappa=kappa, psi=[[nu*sigmasq]], nu=nu."""

import numpy as np
import pytest

import jax.numpy as jnp

from distributions_tpu.models import nich, niw
from tests.util import assert_close

CASES = [
    {'mu': 0.0, 'kappa': 1.0, 'sigmasq': 1.0, 'nu': 1.0},
    {'mu': 2.5, 'kappa': 7.5, 'sigmasq': 0.25, 'nu': 4.0},
]
VALUES = [-3.1, -1.0, -0.1, 0.0, 0.5, 1.7, 4.2]


def _pair(raw):
    s_nich = nich.shared_from_dict(raw)
    s_niw = niw.shared_from_dict({
        'mu': np.array([raw['mu']]),
        'kappa': raw['kappa'],
        'psi': np.array([[raw['nu'] * raw['sigmasq']]]),
        'nu': raw['nu'],
    })
    return s_nich, s_niw


@pytest.mark.parametrize('raw', CASES,
                         ids=['case{}'.format(i) for i in range(len(CASES))])
def test_score_value_agrees(raw):
    s_nich, s_niw = _pair(raw)
    g_nich = nich.group_init(s_nich)
    g_niw = niw.group_init(s_niw)
    for v in VALUES:
        a = float(nich.score_value(s_nich, g_nich, v))
        b = float(niw.score_value(s_niw, g_niw, jnp.asarray([v])))
        assert_close(a, b, tol=1e-3, err_msg='empty group, v={}'.format(v))
        g_nich = nich.add_value(s_nich, g_nich, v)
        g_niw = niw.add_value(s_niw, g_niw, jnp.asarray([v]))
        a = float(nich.score_value(s_nich, g_nich, v))
        b = float(niw.score_value(s_niw, g_niw, jnp.asarray([v])))
        assert_close(a, b, tol=1e-3, err_msg='after add, v={}'.format(v))


@pytest.mark.parametrize('raw', CASES,
                         ids=['case{}'.format(i) for i in range(len(CASES))])
def test_score_data_agrees(raw):
    s_nich, s_niw = _pair(raw)
    g_nich = nich.group_init(s_nich)
    g_niw = niw.group_init(s_niw)
    for v in VALUES:
        g_nich = nich.add_value(s_nich, g_nich, v)
        g_niw = niw.add_value(s_niw, g_niw, jnp.asarray([v]))
        a = float(nich.score_data(s_nich, g_nich))
        b = float(niw.score_data(s_niw, g_niw))
        assert_close(a, b, tol=2e-3)


@pytest.mark.parametrize('raw', CASES,
                         ids=['case{}'.format(i) for i in range(len(CASES))])
def test_posterior_params_agree(raw):
    s_nich, s_niw = _pair(raw)
    g_nich = nich.group_init(s_nich)
    g_niw = niw.group_init(s_niw)
    for v in VALUES:
        g_nich = nich.add_value(s_nich, g_nich, v)
        g_niw = niw.add_value(s_niw, g_niw, jnp.asarray([v]))
    p_nich = nich.plus_group(s_nich, g_nich)
    p_niw = niw.plus_group(s_niw, g_niw)
    assert_close(float(p_nich.mu), float(p_niw.mu[0]), tol=1e-4)
    assert_close(float(p_nich.kappa), float(p_niw.kappa), tol=1e-5)
    assert_close(float(p_nich.nu), float(p_niw.nu), tol=1e-5)
    # psi_n == nu_n * sigmasq_n in 1-d
    assert_close(float(p_nich.nu * p_nich.sigmasq),
                 float(p_niw.psi[0, 0]), tol=2e-3)
