"""End-to-end smoke test for the mixture demo (reference
examples/mixture/test.py:28-36: shrink the problem, run all strategies)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def test_demo_all_strategies(monkeypatch=None):
    import jax
    if jax.devices()[0].platform != 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    import main as demo

    key = jax.random.PRNGKey(0)
    key, sub = jax.random.split(key)
    image = demo.default_image(32, 32)
    X = demo.sample_from_image(sub, image, 200)
    model = demo.ImageModel()
    # shrink: small capacity, small block
    model.spec = model.spec._replace(capacity=32)
    demo.BLOCK = 50

    for name in demo.STRATEGIES:
        key, sub = jax.random.split(key)
        state, assignments = demo.STRATEGIES[name](model, X, sub)
        counts = np.asarray(state.counts)
        assert counts.sum() >= 200, (name, counts.sum())
        img = demo.synthesize_image(model, state, 32, 32)
        assert img.shape == (32, 32)
        assert img.dtype == np.uint8


if __name__ == '__main__':
    test_demo_all_strategies()
    print('demo smoke test passed')
