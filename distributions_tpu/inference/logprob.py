"""The shared log-prob graph: an uncollapsed, differentiable mixture
posterior over explicit component parameters + stick-breaking weights.

This is the surface the gradient-based backends (HMC/NUTS in hmc.py, ADVI
in vi.py) and SMC share with collapsed Gibbs: same Shared hyperparameters,
same clustering prior (truncated stick-breaking representation of
Pitman-Yor), same data — so posteriors are mutually checkable.

params pytree:
  {'sticks': [K-1] unconstrained,              # logit of stick fractions
   'blocks': (per-block param pytree with [K, cols] leaves, ...)}
"""

import jax
import jax.numpy as jnp

from distributions_tpu.special import gammaln, logsumexp


def stick_log_weights(cl_model, sticks_logit):
    """Log mixture weights from logit-space stick fractions under the
    Pitman-Yor stick-breaking construction GEM(alpha, d):
    v_k ~ Beta(1 - d, alpha + (k+1) d), w_k = v_k prod_{j<k} (1 - v_j),
    with the truncation remainder folded into the last weight."""
    log_v = jax.nn.log_sigmoid(sticks_logit)           # [K-1]
    log_1mv = jax.nn.log_sigmoid(-sticks_logit)        # [K-1]
    cum = jnp.concatenate([jnp.zeros(1), jnp.cumsum(log_1mv)])  # [K]
    logw = jnp.concatenate([log_v, jnp.zeros(1)]) + cum
    return logw


def stick_log_prior(cl_model, sticks_logit):
    """Beta(1-d, alpha+(k+1)d) prior on each stick + sigmoid Jacobian."""
    K_minus_1 = sticks_logit.shape[0]
    k = jnp.arange(1, K_minus_1 + 1, dtype=jnp.float32)
    a = 1.0 - cl_model.d
    b = cl_model.alpha + k * cl_model.d
    log_v = jax.nn.log_sigmoid(sticks_logit)
    log_1mv = jax.nn.log_sigmoid(-sticks_logit)
    norm = gammaln(a + b) - gammaln(a) - gammaln(b)
    dens = (a - 1.0) * log_v + (b - 1.0) * log_1mv
    jacobian = log_v + log_1mv
    return jnp.sum(norm + dens + jacobian)


def make_mixture_logprob(spec, cl_model, shareds, values, K):
    """Return (logprob_fn, init_fn) for a K-component truncated mixture.

    logprob_fn(params) = stick prior + component-parameter priors
                       + sum_rows logsumexp_k [log w_k + loglik_k(row)]
    """
    values = tuple(jnp.asarray(v) for v in values)

    def init_fn(key):
        keys = jax.random.split(key, len(spec.blocks) + 1)
        blocks = tuple(
            block.module.param_init(k, shared, (K, block.cols))
            for block, shared, k in zip(spec.blocks, shareds, keys[:-1]))
        sticks = 0.1 * jax.random.normal(keys[-1], (K - 1,))
        return {'sticks': sticks, 'blocks': blocks}

    def logprob_fn(params):
        logw = stick_log_weights(cl_model, params['sticks'])     # [K]
        total = stick_log_prior(cl_model, params['sticks'])
        loglik = logw[None, :]                                    # [B, K]
        for block, shared, bparams, v in zip(
                spec.blocks, shareds, params['blocks'], values):
            total = total + jnp.sum(
                block.module.param_log_prior(shared, bparams))
            # [B, 1, cols] vs [K, cols] -> [B, K, cols] -> sum cols
            contrib = block.module.param_log_likelihood(
                shared, bparams, jnp.asarray(v)[:, None, :])
            loglik = loglik + jnp.sum(contrib, axis=-1)
        total = total + jnp.sum(logsumexp(loglik, axis=-1))
        return total

    return logprob_fn, init_fn


def responsibilities(spec, cl_model, shareds, params, values):
    """Posterior assignment probabilities [B, K] under fixed params."""
    logw = stick_log_weights(cl_model, params['sticks'])
    loglik = logw[None, :]
    for block, shared, bparams, v in zip(
            spec.blocks, shareds, params['blocks'], values):
        contrib = block.module.param_log_likelihood(
            shared, bparams, jnp.asarray(v)[:, None, :])
        loglik = loglik + jnp.sum(contrib, axis=-1)
    return jax.nn.softmax(loglik, axis=-1)
