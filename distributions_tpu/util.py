"""Statistical test utilities: goodness-of-fit machinery used by the test
suite (TPU-native analog of reference distributions/util.py:33-212).

These run host-side on numpy — they evaluate *statistics of* device
computations, not device computations themselves.
"""

import numpy as np
import scipy.stats
from collections import defaultdict


def scores_to_probs(scores):
    """Normalized probabilities from log scores (reference util.py:33-38)."""
    scores = np.array(scores, dtype=np.float64)
    scores -= scores.max()
    probs = np.exp(scores)
    probs /= probs.sum()
    return probs


def score_to_empirical_kl(score, count):
    """KL(empirical || model) from a total log score (reference
    util.py:41-47)."""
    count = float(count)
    return -score / count - np.log(count)


def multinomial_goodness_of_fit(probs, counts, total_count, truncated=False):
    """Pearson's chi^2 test on possibly-truncated multinomial data
    (reference util.py:59-98).  Returns a p-value."""
    assert len(probs) == len(counts)
    assert truncated or total_count == sum(counts)
    chi_squared = 0.0
    dof = 0
    for p, c in zip(probs, counts):
        if p == 1:
            return 1.0 if c == total_count else 0.0
        assert p < 1, 'bad probability: %g' % p
        if p > 0:
            mean = total_count * p
            variance = total_count * p * (1 - p)
            assert variance > 1, (
                'goodness of fit is inaccurate; use more samples')
            chi_squared += (c - mean) ** 2 / variance
            dof += 1
        else:
            if c > 0:
                return float('inf')
    if not truncated:
        dof -= 1
    return scipy.stats.chi2.sf(chi_squared, dof)


def unif01_goodness_of_fit(samples):
    """Bin uniform samples, then Pearson chi^2 (reference util.py:101-114)."""
    samples = np.array(samples, dtype=float)
    assert samples.min() >= 0.0
    assert samples.max() <= 1.0
    bin_count = int(round(len(samples) ** 0.333))
    assert bin_count >= 7, 'imprecise test, use more samples'
    probs = np.ones(bin_count) / bin_count
    counts = np.zeros(bin_count, dtype=int)
    for sample in samples:
        counts[min(int(bin_count * sample), bin_count - 1)] += 1
    return multinomial_goodness_of_fit(probs, counts, len(samples))


def density_goodness_of_fit(samples, probs):
    """Continuous-sample GoF via the spacings transform (reference
    util.py:117-135)."""
    assert len(samples) == len(probs)
    assert len(samples) > 100, 'imprecision; use more samples'
    pairs = sorted(zip(np.asarray(samples).tolist(),
                       np.asarray(probs).tolist()))
    samples = np.array([x for x, p in pairs])
    probs = np.array([p for x, p in pairs])
    density = np.sqrt(probs[1:] * probs[:-1])
    gaps = samples[1:] - samples[:-1]
    unif01_samples = 1.0 - np.exp(-len(samples) * gaps * density)
    return unif01_goodness_of_fit(unif01_samples)


def discrete_goodness_of_fit(samples, probs_dict, truncate_beyond=8):
    """Discrete-sample GoF (reference util.py:138-164)."""
    samples = [s.item() if hasattr(s, 'item') else s for s in samples]
    assert len(samples) > 100, 'imprecision; use more samples'
    counts = defaultdict(int)
    for sample in samples:
        assert sample in probs_dict, 'sample out of support: %r' % (sample,)
        counts[sample] += 1
    items = sorted(
        ((prob, counts.get(i, 0)) for i, prob in probs_dict.items()),
        reverse=True)
    truncated = bool(truncate_beyond) and truncate_beyond < len(items)
    if truncated:
        items = items[:truncate_beyond]
    # drop items whose expected variance is too small for the chi^2
    # approximation (rare tail values); the test becomes truncated
    kept = [(p, c) for p, c in items
            if p * (1 - p) * len(samples) > 1]
    if len(kept) < len(items):
        truncated = True
        items = kept
    probs = [prob for prob, _ in items]
    counts = [count for _, count in items]
    return multinomial_goodness_of_fit(
        probs, counts, len(samples), truncated=truncated)


def bin_samples(samples, k=10, support=()):
    """Equal-fill binning via the empirical cdf (reference util.py:167-203)."""
    samples = sorted(np.asarray(samples).tolist())
    N = len(samples)
    q, r = divmod(N, k)
    indices = [i * q + min(r, i) for i in range(k + 1)]
    bins = [samples[indices[i]:indices[i + 1]] for i in range(k)]
    bin_ranges = []
    counts = []
    for i in range(k):
        bin_min = bins[i][0]
        bin_max = bins[i + 1][0] if i + 1 < k else bins[i][-1]
        bin_ranges.append([bin_min, bin_max])
        counts.append(len(bins[i]))
    if support:
        bin_ranges[0][0] = support[0]
        bin_ranges[-1][1] = support[1]
    return np.array(counts), np.array(bin_ranges)


def histogram(samples, bin_count=None):
    samples = np.asarray(samples)
    if bin_count is None:
        bin_count = int(np.max(samples)) + 1
    v = np.zeros(bin_count, dtype=int)
    for sample in samples:
        v[int(sample)] += 1
    return v
