"""Test configuration: run everything on CPU with 8 virtual devices so
multi-chip sharding logic is exercised without TPU hardware.

The ambient environment registers the tunneled axon TPU backend from
sitecustomize and sets JAX_PLATFORMS=axon; unit tests must not claim the
chip, so the platform is forced back to cpu via jax.config (which overrides
the sitecustomize registration) before any backend initializes.
"""

import os

# TEST_ON_TPU=1 leaves the ambient (axon TPU) platform in place, for the
# hardware-only tests in test_tpu_pallas.py
_USE_TPU = os.environ.get('TEST_ON_TPU') == '1'

if not _USE_TPU:
    os.environ['JAX_PLATFORMS'] = 'cpu'
    flags = os.environ.get('XLA_FLAGS', '')
    if 'xla_force_host_platform_device_count' not in flags:
        os.environ['XLA_FLAGS'] = (
            flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ.setdefault('JAX_ENABLE_X64', '0')

import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update('jax_platforms', 'cpu')

import pytest  # noqa: E402

if not _USE_TPU:
    assert jax.devices()[0].platform == 'cpu'


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
