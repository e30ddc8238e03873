"""CPU-runnable bound on the hi/mid bf16 table-split reconstruction used
by the mixed/v3 pallas kernels (ops/pallas_kernels._mixed_kernel /
_fused_v3_kernel).

The kernels score discrete columns as onehot2 [BR, 2V] @ split_tables
[2V, C] in bf16 with f32 accumulation, where split_tables stacks the
hi = bf16(table) and mid = bf16(table - hi) halves along V.  These tests
pin, off-TPU:

  1. the reconstruction error of that contraction against a direct f32
     gather (ADVICE.md round-1 item 2 — the in-kernel comment's ~1.5e-5
     rel bound, measured ~7.6e-6);
  2. the -inf clamp: non-finite table entries (possible from
     dpd.score_value_batch when a value's beta and count are both zero)
     must stay effectively -inf instead of poisoning the split with
     mid = (-inf) - (-inf) = NaN (ADVICE.md round-1 item 1).
"""

import numpy as np

import jax.numpy as jnp


def _split(tables):
    """Mirror of the kernel-side split (pallas_kernels.py:620-626)."""
    t = jnp.maximum(tables, -1e30)
    hi = t.astype(jnp.bfloat16)
    mid = (t - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([hi, mid], axis=0)           # [2V, C]


def _contract(idx, split, V):
    onehot = (idx[:, None] == np.arange(V)[None, :]).astype(jnp.bfloat16)
    onehot2 = jnp.concatenate([onehot, onehot], axis=1)  # [B, 2V]
    return jnp.dot(onehot2, split,
                   preferred_element_type=jnp.float32)   # [B, C]


def test_hi_mid_split_reconstruction_error():
    rng = np.random.RandomState(0)
    V, C, B = 64, 256, 512
    # realistic log-score magnitudes: O(1) to O(1e4) negative values
    tables = -np.exp(rng.uniform(np.log(1e-2), np.log(1e4),
                                 (V, C))).astype(np.float32)
    idx = rng.randint(0, V, B).astype(np.int32)

    got = np.asarray(_contract(idx, _split(jnp.asarray(tables)), V))
    want = tables[idx]                                   # exact f32 gather

    rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-30)
    assert np.all(np.isfinite(got))
    # in-kernel comment claims ~1.5e-5; measured ~7.6e-6.  Pin at 2e-5.
    assert rel.max() < 2e-5, rel.max()


def test_neg_inf_entries_stay_unselectable_not_nan():
    V, C, B = 8, 128, 16
    tables = np.full((V, C), -3.5, np.float32)
    tables[2, :] = -np.inf                # an impossible value everywhere
    tables[3, 5] = -np.inf                # impossible in one component
    idx = np.arange(B, dtype=np.int32) % V

    got = np.asarray(_contract(jnp.asarray(idx),
                               _split(jnp.asarray(tables)), V))
    assert np.all(np.isfinite(got) | np.isneginf(got)) \
        and not np.any(np.isnan(got))
    # rows selecting the -inf value land at the -1e30 floor (bf16 rounds
    # the floor to ~-1.0039e30): far below any real score
    assert np.all(got[idx == 2] < -1e29)
    assert got[3, 5] < -1e29
    # all other entries are exact (bf16-representable constant)
    assert np.allclose(got[idx == 1], -3.5)
