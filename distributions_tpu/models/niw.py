"""Normal-Inverse-Wishart conjugate model on multivariate normal data.

Semantics match the reference (dbg/models/niw.py:28-272,
include/distributions/models/niw.hpp): Value=float vector [D],
Shared={mu[D], kappa, psi[D,D], nu}, Group={count, sum_x[D], sum_xxT[D,D]}.
Equations from Murphy (2007) Eqs. 251-254, 258, 266.

Batched over a leading [K] component axis; the reference's Eigen matrix ops
become batched jnp.linalg/einsum (no Mixture existed in the reference for
niw — niw.hpp:70-74 — but the batched formulation here gives one for free).
"""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from distributions_tpu.special import lmultigamma
from distributions_tpu.random import (
    score_student_t,
    sample_normal_inverse_wishart,
)
from distributions_tpu.models import base

NAME = 'NormalInverseWishart'
EXAMPLES = [
    {
        'shared': {
            'mu': np.zeros(2), 'kappa': 2., 'psi': np.eye(2), 'nu': 3.,
        },
        'values': [np.array(v) for v in (
            [1., 2.], [-2., 3.], [-0.2, -0.2], [-0.1, 0.5],
            [0.8, 0.5], [0.8, 0.3], [-9., 0.2],
        )],
    },
    {
        'shared': {
            'mu': np.ones(3), 'kappa': 7.5, 'psi': np.eye(3), 'nu': 5.,
        },
        'values': [np.array(v) for v in (
            [1.35, 0.97, 0.88], [0.87, 1.74, 2.13], [-0.31, 1.48, 1.96],
            [1.18, 0.34, 1.00], [1.47, 0.62, -0.10], [-0.23, 2.23, 0.99],
            [1.23, 0.98, 0.36], [1.97, 0.81, 0.79], [0.59, 4.27, 0.44],
        )],
    },
    {
        'shared': {
            'mu': -np.ones(4), 'kappa': 7.5, 'psi': np.eye(4), 'nu': 10.,
        },
        'values': [np.array(v) for v in (
            [0.32, -1.92, -2.13, -0.78], [-2.35, -1.98, -0.27, -1.48],
            [-0.54, -1.76, -1.14, 0.24], [-0.68, -1.62, -0.76, -1.82],
            [-3.03, 0.54, -1.85, -0.53], [0.56, -0.96, -1.00, -2.05],
            [-1.18, -1.52, -1.19, -1.06], [0.47, -0.23, -0.99, 0.69],
            [-1.41, -3.18, -3.09, -1.93],
        )],
    },
]
Value = np.ndarray

_LOG_PI = 1.1447298858494002


class Shared(NamedTuple):
    mu: jnp.ndarray     # [..., D]
    kappa: jnp.ndarray
    psi: jnp.ndarray    # [..., D, D]
    nu: jnp.ndarray


class Group(NamedTuple):
    count: jnp.ndarray    # [...] int32
    sum_x: jnp.ndarray    # [..., D]
    sum_xxT: jnp.ndarray  # [..., D, D]


def dim(shared):
    return shared.mu.shape[-1]


def shared_from_dict(raw):
    mu = jnp.asarray(raw['mu'], jnp.float32)
    return Shared(mu=mu, kappa=jnp.float32(raw['kappa']),
                  psi=jnp.asarray(raw['psi'], jnp.float32),
                  nu=jnp.float32(raw['nu']))


def shared_to_dict(shared):
    return {'mu': np.asarray(shared.mu, np.float64),
            'kappa': float(shared.kappa),
            'psi': np.asarray(shared.psi, np.float64),
            'nu': float(shared.nu)}


def group_from_dict(raw):
    return Group(count=jnp.int32(raw['count']),
                 sum_x=jnp.asarray(raw['sum_x'], jnp.float32),
                 sum_xxT=jnp.asarray(raw['sum_xxT'], jnp.float32))


def group_to_dict(group):
    return {'count': int(group.count),
            'sum_x': np.asarray(group.sum_x, np.float64),
            'sum_xxT': np.asarray(group.sum_xxT, np.float64)}


def group_init(shared, shape=()):
    d = dim(shared)
    return Group(count=jnp.zeros(shape, jnp.int32),
                 sum_x=jnp.zeros(shape + (d,), jnp.float32),
                 sum_xxT=jnp.zeros(shape + (d, d), jnp.float32))


def plus_group(shared, group):
    """\\cite{murphy2007conjugate} Eqs. 251-254 (reference
    dbg/models/niw.py:103-123).  Batched over the group's [K] axis."""
    n = group.count.astype(jnp.float32)[..., None]               # [K, 1]
    safe_n = jnp.maximum(n, 1.0)
    xbar = jnp.where(n > 0, group.sum_x / safe_n, 0.0)           # [K, D]
    kappa_n = shared.kappa + n                                   # [K, 1]
    mu_n = (shared.kappa * shared.mu + group.sum_x) / kappa_n    # [K, D]
    nu_n = shared.nu + n[..., 0]                                 # [K]
    diff = xbar - shared.mu                                      # [K, D]
    outer = lambda a, b: a[..., :, None] * b[..., None, :]
    C_n = (group.sum_xxT
           - outer(group.sum_x, xbar)
           - outer(xbar, group.sum_x)
           + n[..., None] * outer(xbar, xbar))                   # [K, D, D]
    psi_n = (shared.psi + C_n
             + (shared.kappa * n[..., None] / kappa_n[..., None])
             * outer(diff, diff))
    return Shared(mu=mu_n, kappa=kappa_n[..., 0], psi=psi_n, nu=nu_n)


def add_value(shared, group, value):
    return add_repeated_value(shared, group, value, 1)


def add_repeated_value(shared, group, value, count):
    v = jnp.asarray(value, jnp.float32)
    c = jnp.asarray(count, jnp.int32)
    cf = c.astype(jnp.float32)
    return Group(count=group.count + c,
                 sum_x=group.sum_x + cf * v,
                 sum_xxT=group.sum_xxT
                 + cf * (v[..., :, None] * v[..., None, :]))


def remove_value(shared, group, value):
    return add_repeated_value(shared, group, value, -1)


def merge(shared, destin, source):
    return Group(count=destin.count + source.count,
                 sum_x=destin.sum_x + source.sum_x,
                 sum_xxT=destin.sum_xxT + source.sum_xxT)


def unmerge(shared, destin, source):
    return Group(count=destin.count - source.count,
                 sum_x=destin.sum_x - source.sum_x,
                 sum_xxT=destin.sum_xxT - source.sum_xxT)


def score_value(shared, group, value):
    """Multivariate student-t predictive, \\cite{murphy2007conjugate} Eq. 258
    (reference dbg/models/niw.py:192-200)."""
    post = plus_group(shared, group)
    dof = post.nu - dim(shared) + 1.0
    sigma_n = (post.psi
               * ((post.kappa + 1.0)
                  / (post.kappa * dof))[..., None, None])
    return score_student_t(jnp.asarray(value, jnp.float32),
                           dof, post.mu, sigma_n)


def score_value_batch(shared, group, values):
    """[K] groups x [B, D] values -> [B, K]."""
    values = jnp.asarray(values, jnp.float32)
    return jax.vmap(
        lambda v: score_value(shared, group, v))(values)


def score_data(shared, group):
    """\\cite{murphy2007conjugate} Eq. 266 (reference
    dbg/models/niw.py:202-217)."""
    d = dim(shared)
    post = plus_group(shared, group)
    n = group.count.astype(jnp.float32)
    _, logdet0 = jnp.linalg.slogdet(shared.psi)
    _, logdet_n = jnp.linalg.slogdet(post.psi)
    return (lmultigamma(d, 0.5 * post.nu)
            + 0.5 * shared.nu * logdet0
            - 0.5 * n * d * _LOG_PI
            - lmultigamma(d, 0.5 * shared.nu)
            - 0.5 * post.nu * logdet_n
            + 0.5 * d * jnp.log(shared.kappa / post.kappa))


def sampler_init(key, shared, group=None):
    post = shared if group is None else plus_group(shared, group)
    return sample_normal_inverse_wishart(
        key, post.mu, post.kappa, post.psi, post.nu)


def sampler_eval(key, shared, params, shape=()):
    mu, cov = params
    chol = jnp.linalg.cholesky(cov)
    z = jax.random.normal(key, shape + mu.shape)
    return mu + z @ chol.T


def sample_value(key, shared, group):
    k1, k2 = jax.random.split(key)
    params = sampler_init(k1, shared, group)
    return sampler_eval(k2, shared, params)


def sample_group(key, shared, size):
    return base.generic_sample_group(
        sampler_init, sampler_eval, key, shared, size)


def from_values_grouped(shared, values, assignments, num_groups):
    v = jnp.asarray(values, jnp.float32)            # [B, D]
    return Group(
        count=base.segment_sum(jnp.ones(v.shape[0], jnp.int32),
                               assignments, num_groups),
        sum_x=base.segment_sum(v, assignments, num_groups),
        sum_xxT=base.segment_sum(v[:, :, None] * v[:, None, :],
                                 assignments, num_groups))


# -- uncollapsed parameter-space API (HMC/NUTS/VI backends) -----------------
# params = {'mu': [.., D], 'chol': [.., D*(D+1)/2]}: Sigma = L L^T with L
# lower-triangular, diagonal exp-transformed for unconstrained sampling.

def _tri_indices(d):
    return np.tril_indices(d)


def _unpack_chol(chol_flat, d):
    """[.., D(D+1)/2] -> lower-tri L with exp'd diagonal; also returns the
    raw diagonal entries (for the Jacobian)."""
    rows, cols = _tri_indices(d)
    L = jnp.zeros(chol_flat.shape[:-1] + (d, d))
    L = L.at[..., rows, cols].set(chol_flat)
    raw_diag = jnp.diagonal(L, axis1=-2, axis2=-1)
    L = L - jnp.zeros_like(L).at[..., jnp.arange(d), jnp.arange(d)].set(
        raw_diag) + jnp.zeros_like(L).at[
            ..., jnp.arange(d), jnp.arange(d)].set(jnp.exp(raw_diag))
    return L, raw_diag


def param_init(key, shared, shape=()):
    d = dim(shared)
    k1, k2 = jax.random.split(key)
    n_tri = d * (d + 1) // 2
    return {
        'mu': jnp.broadcast_to(shared.mu, shape + (d,))
        + 0.1 * jax.random.normal(k1, shape + (d,)),
        'chol': 0.05 * jax.random.normal(k2, shape + (n_tri,)),
    }


def param_log_prior(shared, params):
    """NIW(mu0, kappa, psi, nu) density over (mu, Sigma=LL^T) plus the
    log-Jacobian of the Cholesky/log-diag parameterization:
    log|J| = D log 2 + sum_i (D - i + 2) l_ii (i 1-based)."""
    d = dim(shared)
    L, raw_diag = _unpack_chol(params['chol'], d)
    logdet_sigma = 2.0 * jnp.sum(raw_diag, axis=-1)
    # tr(psi Sigma^-1) = || L^-1 chol(psi) ||_F^2... use solves against L
    sol = jax.scipy.linalg.solve_triangular(
        L, jnp.broadcast_to(shared.psi, L.shape[:-2] + shared.psi.shape),
        lower=True)
    sol2 = jax.scipy.linalg.solve_triangular(
        L, jnp.swapaxes(sol, -1, -2), lower=True)
    trace_term = jnp.trace(sol2, axis1=-2, axis2=-1)
    _, logdet_psi = jnp.linalg.slogdet(shared.psi)
    nu = shared.nu
    log_iw = (0.5 * nu * logdet_psi - 0.5 * nu * d * jnp.log(2.0)
              - lmultigamma(d, 0.5 * nu)
              - 0.5 * (nu + d + 1.0) * logdet_sigma
              - 0.5 * trace_term)
    # mu | Sigma ~ N(mu0, Sigma / kappa)
    z = jnp.sqrt(shared.kappa) * (params['mu'] - shared.mu)
    sol_mu = jax.scipy.linalg.solve_triangular(
        L, z[..., None], lower=True)[..., 0]
    log_mu = (-0.5 * d * jnp.log(2.0 * jnp.pi / shared.kappa)
              - 0.5 * logdet_sigma
              - 0.5 * jnp.sum(sol_mu * sol_mu, axis=-1))
    weights = jnp.arange(d, 0, -1, dtype=jnp.float32) + 1.0  # D-i+2
    jacobian = d * jnp.log(2.0) + jnp.sum(weights * raw_diag, axis=-1)
    return log_iw + log_mu + jacobian


def param_log_likelihood(shared, params, value):
    d = dim(shared)
    L, raw_diag = _unpack_chol(params['chol'], d)
    v = jnp.asarray(value, jnp.float32)
    z = v - params['mu']
    bshape = jnp.broadcast_shapes(z.shape[:-1], L.shape[:-2])
    Lb = jnp.broadcast_to(L, bshape + L.shape[-2:])
    zb = jnp.broadcast_to(z, bshape + z.shape[-1:])
    sol = jax.scipy.linalg.solve_triangular(
        Lb, zb[..., None], lower=True)[..., 0]
    logdet_sigma = 2.0 * jnp.sum(raw_diag, axis=-1)
    return (-0.5 * d * jnp.log(2.0 * jnp.pi) - 0.5 * logdet_sigma
            - 0.5 * jnp.sum(sol * sol, axis=-1))


def param_constrain(shared, params):
    L, _ = _unpack_chol(params['chol'], dim(shared))
    return {'mu': params['mu'], 'sigma': L @ jnp.swapaxes(L, -1, -2)}


# -- row-stat columns (single-matmul tile aggregation; see mixture.py) ------

def row_stat_dim(shared):
    d = dim(shared)
    return 1 + d + d * d


def row_stat_columns(shared, values):
    v = jnp.asarray(values, jnp.float32)                  # [..., D]
    d = v.shape[-1]
    outer = (v[..., :, None] * v[..., None, :]).reshape(v.shape[:-1]
                                                        + (d * d,))
    ones = jnp.ones(v.shape[:-1] + (1,), jnp.float32)
    return jnp.concatenate([ones, v, outer], axis=-1)


def row_stats_to_tile(shared, sums):
    d = dim(shared)
    return Group(count=jnp.round(sums[..., 0]).astype(jnp.int32),
                 sum_x=sums[..., 1:1 + d],
                 sum_xxT=sums[..., 1 + d:].reshape(sums.shape[:-1] + (d, d)))
