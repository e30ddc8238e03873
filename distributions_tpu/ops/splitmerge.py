"""Split-merge Metropolis-Hastings moves for mixture states.

Per-row Gibbs mixes slowly between well-separated modes (it must move rows
one at a time through low-probability configurations).  Split-merge moves
(Jain & Neal 2004; this is the *simple random split* variant) jump whole
clusters at once:

- merge: pick an ordered pair of occupied slots (i, j) uniformly
  [q = 1/(m(m-1)), m = #occupied]; move all of j's rows into i.
- split: pick an occupied slot i uniformly [q = 1/m]; each of i's rows
  flips a fair coin [q = (1/2)^n]; heads move to the first alive empty
  slot.  Degenerate coin patterns (all heads / all tails) are rejected.

Acceptance uses the exact collapsed posterior (score_data = clustering
EPPF + feature marginals) with the matching reverse-proposal densities:

  merge:  log A = dscore + n log(1/2) + log m
  split:  log A = dscore - n log(1/2) - log(m + 1)

so the composite Gibbs + split-merge chain targets the true posterior —
validated against exact enumeration in tests/test_splitmerge.py.

Each move is O(R + C) (masks + one tile-stat state rebuild); interleave
every few sweeps.
"""

from functools import partial

import jax
import jax.numpy as jnp

from distributions_tpu import mixture as mx

_LOG_HALF = -0.6931471805599453


@partial(jax.jit, static_argnums=(0,))
def split_merge_move(spec, cl_model, shareds, state, values, assignments,
                     key):
    """One split-merge MH move; returns (state, assignments, accepted)."""
    k_type, k_i, k_j, k_coins, k_acc = jax.random.split(key, 5)
    C = spec.capacity
    R = assignments.shape[0]
    counts = state.counts
    occupied = counts > 0
    m = jnp.sum(occupied.astype(jnp.int32)).astype(jnp.float32)

    score_cur = mx.score_data(spec, cl_model, shareds, state)

    def pick_occupied(k, forbid=-1):
        w = occupied & (jnp.arange(C) != forbid)
        return jax.random.categorical(
            k, jnp.where(w, 0.0, -jnp.inf))

    do_split = jax.random.bernoulli(k_type)

    # ---- merge proposal: j's rows -> i ----
    i_m = pick_occupied(k_i)
    j_m = pick_occupied(k_j, forbid=i_m)
    n_merge = (counts[i_m] + counts[j_m]).astype(jnp.float32)
    assign_merge = jnp.where(assignments == j_m, i_m, assignments)
    log_corr_merge = n_merge * _LOG_HALF + jnp.log(jnp.maximum(m, 1.0))
    merge_valid = m >= 2

    # ---- split proposal: i's heads -> first alive empty slot ----
    i_s = pick_occupied(k_i)
    empty_slot = jnp.argmax(state.alive & (counts == 0))
    coins = jax.random.bernoulli(k_coins, shape=(R,))
    in_i = assignments == i_s
    heads = jnp.sum((in_i & coins).astype(jnp.int32))
    tails = jnp.sum((in_i & ~coins).astype(jnp.int32))
    assign_split = jnp.where(in_i & coins, empty_slot, assignments)
    n_split = counts[i_s].astype(jnp.float32)
    log_corr_split = -n_split * _LOG_HALF - jnp.log(m + 1.0)
    split_valid = ((state.alive[empty_slot]) & (counts[empty_slot] == 0)
                   & (heads > 0) & (tails > 0))

    proposal_assign = jnp.where(do_split, assign_split, assign_merge)
    log_corr = jnp.where(do_split, log_corr_split, log_corr_merge)
    valid = jnp.where(do_split, split_valid, merge_valid)

    prop_state = mx.state_from_assignments(
        spec, cl_model, shareds, values, proposal_assign)
    score_prop = mx.score_data(spec, cl_model, shareds, prop_state)

    log_accept = score_prop - score_cur + log_corr
    accept = valid & (jnp.log(jax.random.uniform(k_acc)) < log_accept)

    new_assign = jnp.where(accept, proposal_assign, assignments)
    new_state = jax.tree_util.tree_map(
        lambda a, b: jnp.where(accept, a, b), prop_state, state)
    return new_state, new_assign, accept
