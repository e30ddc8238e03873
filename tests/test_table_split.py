"""CPU-runnable checks for the bf16 hi/mid table split used by the mixed
pallas kernel (ops/pallas_kernels.mixed_score_sample).

The kernel reconstructs f32 table scores from a single bf16 MXU pass:
each f32 [V, C] table is split into hi+mid bf16 halves stacked along V and
contracted against a duplicated one-hot.  These tests pin (a) the
reconstruction error bound and (b) the -inf clamping behavior, without TPU
hardware (ADVICE.md round 1).
"""

import numpy as np
import jax.numpy as jnp


def _split_hi_mid(tables):
    # mirror of mixed_score_sample's table preparation
    tables = jnp.maximum(tables, -1e30)
    hi = tables.astype(jnp.bfloat16)
    mid = (tables - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([hi, mid], axis=0)  # [2V, C]


def _contract(idx, split):
    V = split.shape[0] // 2
    onehot = (idx[:, None] == jnp.arange(V)[None, :]).astype(jnp.bfloat16)
    onehot2 = jnp.concatenate([onehot, onehot], axis=1)  # [B, 2V]
    return jnp.dot(onehot2.astype(jnp.float32),
                   split.astype(jnp.float32))  # f32 accum like the MXU


def test_reconstruction_error_bound():
    rng = np.random.RandomState(0)
    V, C, B = 64, 256, 512
    # realistic log-score magnitudes: a few hundred max
    tables = jnp.asarray(rng.randn(V, C).astype(np.float32) * 50.0)
    idx = jnp.asarray(rng.randint(0, V, B).astype(np.int32))

    got = _contract(idx, _split_hi_mid(tables))
    want = tables[idx]  # direct f32 gather

    rel = np.abs(np.asarray(got) - np.asarray(want)) / (
        np.abs(np.asarray(want)) + 1e-30)
    # hi+mid bf16 carries ~16 mantissa bits -> ~1.5e-5 relative worst case
    # (measured ~7.6e-6 typical; ADVICE.md round 1)
    assert rel.max() < 2e-5, rel.max()


def test_neg_inf_entries_stay_unselectable_not_nan():
    rng = np.random.RandomState(1)
    V, C, B = 16, 32, 64
    tables = rng.randn(V, C).astype(np.float32)
    tables[3, :] = -np.inf       # impossible value, e.g. dpd beta==count==0
    tables = jnp.asarray(tables)
    idx = jnp.asarray(rng.randint(0, V, B).astype(np.int32))
    idx = idx.at[0].set(3)       # one row actually selects the -inf value

    got = np.asarray(_contract(idx, _split_hi_mid(tables)))
    assert np.isfinite(got).all() or not np.isnan(got).any()
    assert not np.isnan(got).any()
    # the clamped row is still an overwhelming -1e30-ish score
    assert (got[0] < -1e29).all()
    # rows not hitting the -inf value are unaffected to the usual tolerance
    finite = np.asarray(idx) != 3
    want = np.asarray(tables)[np.asarray(idx)]
    assert np.allclose(got[finite], want[finite], rtol=2e-5, atol=1e-4)
