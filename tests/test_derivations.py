"""Closed-form derivation checks (reference derivations/ as validators)."""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from derivations import betabinomial
from derivations.clustering import (
    exact_log_partition_function, py_normalization, partition_table)


def test_betabinomial_closed_form():
    assert betabinomial.check_against_model(0.5, 2.0)
    assert betabinomial.check_against_model(10.5, 0.5)


def test_betabinomial_moments():
    mean, var = betabinomial.monte_carlo_moments(
        0.5, 2.0, n=20, samples=50000)
    assert abs(mean - betabinomial.exact_mean_heads(0.5, 2.0, 20)) < 0.05
    exact_var = betabinomial.exact_var_heads(0.5, 2.0, 20)
    assert abs(var - exact_var) < 0.05 * exact_var + 0.3


def test_low_entropy_partition_table_exact():
    partition_table(max_n=8)


def test_py_eppf_normalized():
    py_normalization(n=6, alpha=1.5, d=0.2)
    py_normalization(n=5, alpha=0.5, d=0.0)


def test_logbeta_envelope():
    """special.log_beta / log_binom meet the 2e-4 envelope everywhere the
    audit grid covers — including the x >> y cancellation corner the
    naive three-lgamma identity fails at (derivations/logbeta.py)."""
    from derivations import logbeta
    assert logbeta.check()
