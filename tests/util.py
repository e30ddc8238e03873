"""Shared test helpers (analog of reference distributions/tests/util.py)."""

import numpy as np

import jax
import jax.numpy as jnp

TOL = 1e-3  # relative tolerance, matching reference tests/util.py:100-151


def assert_close(x, y, tol=TOL, err_msg=''):
    """Structural closeness: dicts, lists, arrays, scalars (reference
    tests/util.py:100-151)."""
    if isinstance(x, dict):
        assert isinstance(y, dict), err_msg
        assert set(x.keys()) == set(y.keys()), err_msg
        for k in x:
            assert_close(x[k], y[k], tol, '{}[{}]'.format(err_msg, k))
    elif isinstance(x, (list, tuple)):
        assert len(x) == len(y), err_msg
        for i, (a, b) in enumerate(zip(x, y)):
            assert_close(a, b, tol, '{}[{}]'.format(err_msg, i))
    elif isinstance(x, (bool, np.bool_)):
        assert bool(x) == bool(y), err_msg
    elif isinstance(x, (int, np.integer)):
        assert int(x) == int(y), '{}: {} != {}'.format(err_msg, x, y)
    else:
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        np.testing.assert_allclose(
            x, y, rtol=tol, atol=tol, err_msg=err_msg)


def seed_keys(seed, n):
    return jax.random.split(jax.random.PRNGKey(seed), n)


def py_value(v):
    """Convert a device value to the python-level Value type for dict use."""
    if isinstance(v, (jnp.ndarray, np.ndarray)) and v.ndim > 0:
        return np.asarray(v)
    arr = np.asarray(v)
    if arr.dtype == bool:
        return bool(arr)
    if np.issubdtype(arr.dtype, np.integer):
        return int(arr)
    return float(arr)
