"""Beta-binomial exact-moment validation (reference
derivations/betabinomial.py:1-150): closed-form checks that the bb model's
marginal likelihood and predictive match the analytic beta-binomial.

Run: python derivations/betabinomial.py
Also exercised by tests/test_derivations.py.
"""

import sys

import numpy as np
from scipy.special import betaln, comb


def exact_log_marginal(alpha, beta, heads, tails):
    """log P(sequence with h heads, t tails | alpha, beta) =
    B(alpha+h, beta+t) / B(alpha, beta)   (per-sequence, no binomial
    coefficient — matches score_data semantics)."""
    return (betaln(alpha + heads, beta + tails) - betaln(alpha, beta))


def exact_predictive(alpha, beta, heads, tails):
    """P(next = True | h, t) = (alpha + h) / (alpha + beta + h + t)."""
    return (alpha + heads) / (alpha + beta + heads + tails)


def exact_mean_heads(alpha, beta, n):
    """E[# heads in n draws] = n alpha / (alpha + beta)."""
    return n * alpha / (alpha + beta)


def exact_var_heads(alpha, beta, n):
    """Var[# heads] = n ab (a+b+n) / ((a+b)^2 (a+b+1))."""
    ab = alpha + beta
    return n * alpha * beta * (ab + n) / (ab * ab * (ab + 1))


def check_against_model(alpha=0.5, beta=2.0, tol=1e-4):
    import jax.numpy as jnp
    from distributions_tpu.models import bb

    shared = bb.Shared(alpha=jnp.float32(alpha), beta=jnp.float32(beta))
    for heads, tails in [(0, 0), (3, 1), (1, 7), (10, 10)]:
        group = bb.Group(heads=jnp.int32(heads), tails=jnp.int32(tails))
        got = float(bb.score_data(shared, group))
        want = exact_log_marginal(alpha, beta, heads, tails)
        assert abs(got - want) < tol, (heads, tails, got, want)
        got_p = float(jnp.exp(bb.score_value(shared, group, True)))
        want_p = exact_predictive(alpha, beta, heads, tails)
        assert abs(got_p - want_p) < tol, (heads, tails, got_p, want_p)
    return True


def monte_carlo_moments(alpha=0.5, beta=2.0, n=20, samples=200000, seed=0):
    import jax
    import jax.numpy as jnp
    from distributions_tpu.models import bb

    shared = bb.Shared(alpha=jnp.float32(alpha), beta=jnp.float32(beta))
    keys = jax.random.split(jax.random.PRNGKey(seed), samples)
    counts = jax.vmap(
        lambda k: jnp.sum(jnp.asarray(bb.sample_group(k, shared, n))))(keys)
    counts = np.asarray(counts)
    return counts.mean(), counts.var()


def main():
    alpha, beta, n = 0.5, 2.0, 20
    assert check_against_model(alpha, beta)
    print('closed-form score_data / score_value checks passed')
    mean, var = monte_carlo_moments(alpha, beta, n)
    print('MC mean {:.4f} vs exact {:.4f}'.format(
        mean, exact_mean_heads(alpha, beta, n)))
    print('MC var  {:.4f} vs exact {:.4f}'.format(
        var, exact_var_heads(alpha, beta, n)))
    assert abs(mean - exact_mean_heads(alpha, beta, n)) < 0.05
    assert abs(var - exact_var_heads(alpha, beta, n)) \
        < 0.02 * exact_var_heads(alpha, beta, n) + 0.3
    print('beta-binomial exact-moment validation passed')


if __name__ == '__main__':
    main()
