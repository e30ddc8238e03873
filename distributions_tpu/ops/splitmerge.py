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


def _empty_row_groups(spec, shareds):
    """Per-block scalar [cols] Groups for one slot's restricted stats."""
    return tuple(
        block.module.group_init(shared, (block.cols,))
        for block, shared in zip(spec.blocks, shareds))


def _row_add(spec, shareds, groups, row):
    return tuple(
        jax.vmap(lambda g, v, m=block.module, s=shared: m.add_value(s, g, v)
                 )(group, jnp.asarray(v))
        for block, shared, group, v in zip(spec.blocks, shareds, groups, row))


def _row_score(spec, shareds, groups, row):
    total = jnp.float32(0.0)
    for block, shared, group, v in zip(spec.blocks, shareds, groups, row):
        per_col = jax.vmap(
            lambda g, vv, m=block.module, s=shared: m.score_value(s, g, vv)
        )(group, jnp.asarray(v))
        total = total + jnp.sum(per_col)
    return total


@partial(jax.jit, static_argnums=(0, 7))
def split_merge_restricted(spec, cl_model, shareds, state, values,
                           assignments, key, n_intermediate=3):
    """Jain & Neal (2004) restricted-Gibbs split-merge move.

    1. Pick two distinct rows (a, b) uniformly.  Same cluster -> propose a
       split of that cluster between its slot and a fresh empty slot;
       different clusters -> propose merging b's cluster into a's.
    2. Launch state: a/b anchor the two sides; the clusters' other rows S
       are seeded by fair coins, then `n_intermediate` restricted Gibbs
       scans (two-way conditionals with running side stats) refine it.
    3. Split proposal = one more restricted scan, RECORDING the product of
       its conditionals (q_fwd).  Merge proposal is deterministic; its
       reverse probability is the product of conditionals of a restricted
       scan FORCED to reproduce the current two-cluster configuration.
    4. Accept with min(1, exp(dscore) * q_rev/q_fwd); the pair-choice
       probabilities are symmetric and cancel.

    Unlike simple random splits (split_merge_move), proposals follow the
    data, so acceptance stays useful for large clusters.  Validated against
    the exact enumerated posterior (tests/test_splitmerge.py).
    """
    R = assignments.shape[0]
    (k_pair, k_seed, k_scans, k_final, k_acc) = jax.random.split(key, 5)

    # ---- anchors ----
    a = jax.random.randint(k_pair, (), 0, R)
    b_raw = jax.random.randint(jax.random.fold_in(k_pair, 1), (), 0, R - 1)
    b = jnp.where(b_raw >= a, b_raw + 1, b_raw)
    slot_a = assignments[a]
    slot_b = assignments[b]
    is_split = slot_a == slot_b

    # side-1 slot: a's slot; side-2 slot: for a split, the first alive
    # empty slot; for a merge, b's slot (rows to be absorbed)
    empty_slot = jnp.argmax(state.alive & (state.counts == 0))
    slot2 = jnp.where(is_split, empty_slot, slot_b)
    # rows in play: members of the two clusters minus the anchors
    in_play = ((assignments == slot_a) | (assignments == slot2)) \
        & (jnp.arange(R) != a) & (jnp.arange(R) != b)

    def row_of(i):
        return tuple(jnp.asarray(v)[i] for v in values)

    def scan_once(carry_sides, scan_key, force_to=None):
        """One restricted Gibbs scan over all rows (masked to in_play).
        carry_sides: current side of every row (True = side1/slot_a).
        Returns (new_sides, log_q of the scan)."""
        # rebuild side stats from anchors + current sides as we go:
        # sequential scan with running stats
        g1_0 = _row_add(spec, shareds, _empty_row_groups(spec, shareds),
                        row_of(a))
        g2_0 = _row_add(spec, shareds, _empty_row_groups(spec, shareds),
                        row_of(b))
        keys = jax.random.split(scan_key, R)

        def body(carry, i):
            g1, g2, n1, n2, sides, log_q = carry
            row = row_of(i)
            s1 = (jnp.log(n1 - cl_model.d)
                  + _row_score(spec, shareds, g1, row))
            s2 = (jnp.log(n2 - cl_model.d)
                  + _row_score(spec, shareds, g2, row))
            p1 = jax.nn.sigmoid(s1 - s2)
            if force_to is None:
                choose1 = jax.random.uniform(keys[i]) < p1
            else:
                choose1 = force_to[i]
            logp = jnp.where(choose1, jax.nn.log_sigmoid(s1 - s2),
                             jax.nn.log_sigmoid(s2 - s1))
            active = in_play[i]
            g1 = jax.tree_util.tree_map(
                lambda new, old: jnp.where(active & choose1, new, old),
                _row_add(spec, shareds, g1, row), g1)
            g2 = jax.tree_util.tree_map(
                lambda new, old: jnp.where(active & ~choose1, new, old),
                _row_add(spec, shareds, g2, row), g2)
            n1 = n1 + jnp.where(active & choose1, 1.0, 0.0)
            n2 = n2 + jnp.where(active & ~choose1, 1.0, 0.0)
            sides = sides.at[i].set(jnp.where(active, choose1, sides[i]))
            log_q = log_q + jnp.where(active, logp, 0.0)
            return (g1, g2, n1, n2, sides, log_q), None

        init = (g1_0, g2_0, jnp.float32(1.0), jnp.float32(1.0),
                carry_sides, jnp.float32(0.0))
        (g1, g2, n1, n2, sides, log_q), _ = jax.lax.scan(
            body, init, jnp.arange(R))
        return sides, log_q

    # ---- launch: random seed + intermediate scans ----
    sides = jax.random.bernoulli(k_seed, shape=(R,))
    sides = sides.at[a].set(True).at[b].set(False)
    for t in range(n_intermediate):
        sides, _ = scan_once(sides, jax.random.fold_in(k_scans, t))

    # ---- final scan ----
    # split: sample freely, record q_fwd
    split_sides, log_q_split = scan_once(sides, k_final)
    # merge reverse: force the scan to reproduce the CURRENT configuration
    cur_sides = assignments == slot_a
    _, log_q_rev = scan_once(sides, k_final, force_to=cur_sides)

    # ---- proposals and scores ----
    assign_split = jnp.where(
        in_play, jnp.where(split_sides, slot_a, slot2), assignments)
    assign_split = assign_split.at[b].set(slot2)
    assign_merge = jnp.where(assignments == slot2, slot_a, assignments)

    proposal = jnp.where(is_split, assign_split, assign_merge)
    log_q_corr = jnp.where(is_split, -log_q_split, log_q_rev)

    score_cur = mx.score_data(spec, cl_model, shareds, state)
    prop_state = mx.state_from_assignments(
        spec, cl_model, shareds, values, proposal)
    score_prop = mx.score_data(spec, cl_model, shareds, prop_state)

    valid = jnp.where(
        is_split,
        state.alive[empty_slot] & (state.counts[empty_slot] == 0), True)
    log_accept = score_prop - score_cur + log_q_corr
    accept = valid & (jnp.log(jax.random.uniform(k_acc)) < log_accept)

    new_assign = jnp.where(accept, proposal, assignments)
    new_state = jax.tree_util.tree_map(
        lambda x, y: jnp.where(accept, x, y), prop_state, state)
    return new_state, new_assign, accept


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
