"""Derivation validators for the clustering priors (reference
derivations/clustering.py:1-754, which generated the low-entropy partition
table and validated its approximations).

Commands:
  python derivations/clustering.py partition_table   # regenerate + check
  python derivations/clustering.py postpred          # approximation quality
  python derivations/clustering.py py_normalization  # PY EPPF sums to 1
"""

import sys
from itertools import product

import numpy as np


def partitions_log_weights(n):
    """Enumerate all assignment vectors of n items (first-occurrence
    canonical order) and return log prod_k N_k^{N_k} for each partition
    counted with multiplicity 1 per assignment vector."""
    weights = []

    def rec(assignment, next_label):
        if len(assignment) == n:
            counts = np.bincount(assignment)
            w = float(np.sum(counts * np.log(counts)))
            weights.append(w)
            return
        for label in range(next_label + 1):
            rec(assignment + [label], max(next_label, label + 1))

    rec([], 0)
    return np.array(weights)


def exact_log_partition_function(n):
    """log sum over assignment vectors of prod N_k^N_k (reference
    derivations/clustering.py's table generator)."""
    w = partitions_log_weights(n)
    m = w.max()
    return m + np.log(np.exp(w - m).sum())


def partition_table(max_n=10):
    from distributions_tpu import clustering as cl
    model = cl.LowEntropy.from_dict({'dataset_size': 1000})
    print(' n   exact      table      |diff|')
    for n in range(2, max_n + 1):
        exact = exact_log_partition_function(n)
        table = float(cl.le_log_partition_function(model, n))
        print('{:2d}  {:9.5f}  {:9.5f}  {:.2e}'.format(
            n, exact, table, abs(exact - table)))
        assert abs(exact - table) < 1e-3, n
    print('partition table matches exact enumeration')


def py_normalization(n=6, alpha=1.5, d=0.2):
    """Sum of exp(score_counts) over all assignment vectors == 1 for the
    Pitman-Yor EPPF."""
    import jax.numpy as jnp
    from distributions_tpu import clustering as cl
    model = cl.PitmanYor.from_dict({'alpha': alpha, 'd': d})

    total = 0.0

    def rec(assignment, next_label):
        nonlocal total
        if len(assignment) == n:
            counts = np.bincount(assignment)
            total += float(np.exp(
                cl.py_score_counts(model, jnp.asarray(counts, jnp.float32))))
            return
        for label in range(next_label + 1):
            rec(assignment + [label], max(next_label, label + 1))

    rec([], 0)
    print('sum over assignment vectors = {:.6f}'.format(total))
    assert abs(total - 1.0) < 1e-3
    print('Pitman-Yor EPPF normalization verified (n={})'.format(n))


def postpred(dataset_size=100, sample_sizes=(10, 30, 60, 90)):
    """Report the low-entropy postpred correction magnitudes (the reference
    fits its ad hoc formula against simulations; here we just surface the
    values for inspection)."""
    import jax.numpy as jnp
    from distributions_tpu import clustering as cl
    model = cl.LowEntropy.from_dict({'dataset_size': dataset_size})
    for n in sample_sizes:
        corr = float(cl._le_postpred_correction(model, float(n)))
        print('n={:3d}  postpred correction = {:.4f}'.format(n, corr))


def main():
    cmd = sys.argv[1] if len(sys.argv) > 1 else 'all'
    if cmd in ('partition_table', 'all'):
        partition_table()
    if cmd in ('py_normalization', 'all'):
        py_normalization()
    if cmd in ('postpred', 'all'):
        postpred()


if __name__ == '__main__':
    main()
