"""Invariant validation (the analog of the reference's DIST_ASSERT1/2/3
layered asserts, reference common.hpp:99-110 and per-struct validate()
methods).

jit code can't branch on data, so validation here is host-side: call these
between jitted steps when config.DEBUG_LEVEL > 0.  Each check raises
AssertionError with a description on violation.
"""

import numpy as np

from distributions_tpu import config


def validate_state(spec, state):
    """Mixture-state invariants (reference MixtureDriver::_validate,
    mixture.hpp:150-162, generalized to the masked layout)."""
    if config.DEBUG_LEVEL < 1:
        return
    counts = np.asarray(state.counts)
    alive = np.asarray(state.alive)
    assert counts.shape == (spec.capacity,)
    assert (counts >= 0).all(), 'negative group count'
    assert int(counts.sum()) == int(state.sample_size), \
        'sample_size != sum(counts)'
    assert alive[counts > 0].all(), 'nonempty slot not alive'
    n_empty_alive = int((alive & (counts == 0)).sum())
    assert n_empty_alive >= 1, 'missing empty groups'
    if config.DEBUG_LEVEL >= 2:
        # dead slots must be bitwise-empty (reuse hygiene)
        for g in state.groups:
            import jax
            for leaf in jax.tree_util.tree_leaves(g):
                arr = np.asarray(leaf)
                dead = ~alive
                assert (arr[dead] == 0).all(), 'dead slot has residue'


def validate_assignments(spec, state, assignments):
    if config.DEBUG_LEVEL < 1:
        return
    a = np.asarray(assignments)
    counts = np.asarray(state.counts)
    assert (a >= 0).all() and (a < spec.capacity).all(), 'slot out of range'
    bc = np.bincount(a, minlength=spec.capacity)
    assert bc.tolist() == counts.tolist(), \
        'assignments inconsistent with counts'


def validate_dpd_shared(shared):
    """dpd stick invariants (reference dpd.py:82-90)."""
    if config.DEBUG_LEVEL < 1:
        return
    betas = np.asarray(shared.betas)
    beta0 = float(shared.beta0)
    assert beta0 >= -1e-5, 'negative beta0'
    assert betas.min() >= 0, 'negative stick'
    total = betas.sum() + beta0
    assert abs(total - 1.0) < 1e-3, 'sticks do not sum to 1: %f' % total
