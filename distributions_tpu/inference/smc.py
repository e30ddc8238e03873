"""Sequential Monte Carlo initialization for mixtures.

A particle = a full mixture state built by sequential posterior-predictive
assignment (the reference's compress_sequential, examples/mixture/
main.py:191-210, which is SMC with one particle and no weights).  Here P
particles run in lockstep via vmap; each row contributes its predictive
marginal log p(x_i | state) to the particle weight, and particles are
systematically resampled when effective sample size drops below
`ess_threshold * P`.

This is the 'SMC annealed init' configuration of BASELINE.json; on a mesh,
particles shard naturally (vmap axis -> device axis) with `ppermute`-free
resampling via replicated weights.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from distributions_tpu import mixture as mx
from distributions_tpu.special import logsumexp
from distributions_tpu.random import sample_from_scores


def _systematic_resample(key, logw, n):
    """Systematic resampling: returns parent indices [n]."""
    w = jnp.exp(logw - logsumexp(logw))
    cum = jnp.cumsum(w)
    u = (jax.random.uniform(key) + jnp.arange(n)) / n
    return jnp.searchsorted(cum, u).astype(jnp.int32)


@partial(jax.jit, static_argnums=(0, 4, 5))
def smc_init(spec, cl_model, shareds, values, n_particles, resample_every,
             key, ess_threshold=0.5):
    """Run particle-filter initialization over all rows.

    Returns (states [P, ...], assignments [P, R], log_weights [P],
    log_marginal_estimate).
    """
    R = jnp.asarray(values[0]).shape[0]
    P = n_particles

    def init_one(_):
        return mx.init(spec, shareds)

    states = jax.vmap(init_one)(jnp.arange(P))
    logw = jnp.zeros(P)
    log_evidence = jnp.float32(0.0)
    assignments = jnp.zeros((P, R), jnp.int32)

    def assign_row(state, row, step_key):
        scores = mx.score_value(spec, cl_model, shareds, state, row)
        logmarg = logsumexp(scores)
        k = sample_from_scores(step_key, scores)
        state, _ = mx.add_value(spec, cl_model, shareds, state, k, row)
        return state, k.astype(jnp.int32), logmarg

    def step(carry, inp):
        states, logw, assignments, log_evidence = carry
        i, row_key = inp
        row = tuple(jnp.asarray(v)[i] for v in values)
        keys = jax.random.split(row_key, P + 1)
        states, ks, logmargs = jax.vmap(
            lambda s, k: assign_row(s, row, k))(states, keys[:P])
        logw = logw + logmargs
        assignments = assignments.at[:, i].set(ks)

        # periodic ESS-gated systematic resampling
        do_check = (i % resample_every) == (resample_every - 1)
        ess = jnp.exp(2 * logsumexp(logw) - logsumexp(2 * logw))
        do_resample = do_check & (ess < ess_threshold * P)
        parents = _systematic_resample(keys[P], logw, P)
        parents = jnp.where(do_resample, parents,
                            jnp.arange(P, dtype=jnp.int32))
        states = jax.tree_util.tree_map(lambda a: a[parents], states)
        assignments = assignments[parents]
        # fold resampled weight into the evidence estimate
        log_evidence = log_evidence + jnp.where(
            do_resample, logsumexp(logw) - jnp.log(P), 0.0)
        logw = jnp.where(do_resample, jnp.zeros_like(logw), logw)
        return (states, logw, assignments, log_evidence), None

    keys = jax.random.split(key, R)
    (states, logw, assignments, log_evidence), _ = lax.scan(
        step, (states, logw, assignments, log_evidence),
        (jnp.arange(R), keys))
    log_evidence = log_evidence + logsumexp(logw) - jnp.log(P)
    return states, assignments, logw, log_evidence


def best_particle(states, assignments, logw):
    """Extract the max-weight particle's (state, assignments)."""
    i = jnp.argmax(logw)
    return (jax.tree_util.tree_map(lambda a: a[i], states),
            assignments[i])
