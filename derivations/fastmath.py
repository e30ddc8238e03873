"""Derive the polynomial coefficients for the in-kernel fast log/exp used by
ops/pallas_kernels (the TPU analog of the reference's table-based fast
transcendentals, include/distributions/special.hpp:53-96 + fmath.hpp).

fast_log:  x = 2^e * m, m in [1, 2)  ->  log x = e*ln2 + P(m - 1)
           P = minimax-ish (Chebyshev-fit) polynomial for log1p on [0, 1)
fast_exp:  x = (f + r) * ln2, f integer, r in [0, 1)
           exp x = 2^f * Q(r),  Q fits 2^r on [0, 1)

Run:  python derivations/fastmath.py
Prints Horner coefficient lists (to paste into pallas_kernels.py) and the
max abs/rel error over a dense grid, for a few degrees.
"""

import numpy as np


def cheb_fit(f, lo, hi, deg, n=20001):
    # least-squares fit in Chebyshev basis on [lo, hi] — near-minimax
    x = np.linspace(lo, hi, n)
    c = np.polynomial.chebyshev.Chebyshev.fit(x, f(x), deg, domain=[lo, hi])
    return np.polynomial.chebyshev.cheb2poly(c.convert().coef)


def horner_eval(coeffs, x):
    y = np.zeros_like(x) + coeffs[-1]
    for c in coeffs[-2::-1]:
        y = y * x + c
    return y


def report_log(deg):
    co = cheb_fit(np.log1p, 0.0, 1.0, deg)
    t = np.linspace(0, 1, 200001)
    err = horner_eval(co, t) - np.log1p(t)
    # end-to-end: random positive floats
    rng = np.random.RandomState(0)
    x = np.exp(rng.uniform(-30, 30, 100000)).astype(np.float32)
    bits = x.view(np.int32)
    e = (bits >> 23) - 127
    m = ((bits & 0x007FFFFF) | 0x3F800000).view(np.float32)
    approx = e * np.log(2) + horner_eval(co, m.astype(np.float64) - 1.0)
    full = np.abs(approx - np.log(x.astype(np.float64)))
    print('log  deg=%d  poly abs err=%.3g  end-to-end abs err=%.3g' %
          (deg, np.abs(err).max(), full.max()))
    print('  coeffs =', list(co))
    return co


def report_exp(deg):
    f = lambda r: np.exp2(r)
    co = cheb_fit(f, 0.0, 1.0, deg)
    r = np.linspace(0, 1, 200001)
    rel = (horner_eval(co, r) - np.exp2(r)) / np.exp2(r)
    # end to end
    rng = np.random.RandomState(0)
    x = rng.uniform(-80, 5, 100000)
    y = x * np.log2(np.e)
    fl = np.floor(y)
    rr = y - fl
    approx = np.exp2(fl) * horner_eval(co, rr)
    rel2 = np.abs(approx / np.exp(x) - 1)
    print('exp  deg=%d  poly rel err=%.3g  end-to-end rel err=%.3g' %
          (deg, np.abs(rel).max(), rel2.max()))
    print('  coeffs =', list(co))
    return co


if __name__ == '__main__':
    for d in (5, 6, 7, 8):
        report_log(d)
    for d in (4, 5, 6):
        report_exp(d)
