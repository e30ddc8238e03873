"""Time the v2 fused sweep at bench shapes for one sampling variant, with
per-call timing to expose launch/variance effects.

    SAMPLING=cdf|cdf_fast|gumbel|gumbel_fast python profile_fastmath.py

One jit signature per invocation (remote compiles are slow; see
NOTES.md environment hazards).
"""
import os
import time
import numpy as np
import jax
import jax.numpy as jnp

from distributions_tpu import clustering, mixture as mx
from distributions_tpu.models import nich
from distributions_tpu.ops import gibbs

assert jax.devices()[0].platform != 'cpu'

SAMPLING = os.environ.get('SAMPLING', 'cdf_fast')
R = int(os.environ.get('ROWS', 1048576))
C = int(os.environ.get('COMPONENTS', 1024))
BLOCK = int(os.environ.get('BLOCK', 16384))
BR = int(os.environ.get('BR', 512))
FUSE = int(os.environ.get('FUSE', 10))
CALLS = int(os.environ.get('CALLS', 3))

rng = np.random.RandomState(0)
spec = mx.make_spec([(nich, 2)], capacity=C, empties=1)
cl = clustering.PitmanYor.from_dict({'alpha': 100.0, 'd': 0.1})
shareds = (nich.shared_from_dict(
    {'mu': 0., 'kappa': 0.1, 'sigmasq': 0.01, 'nu': 1.}),)
centers = rng.randn(C - 8, 2).astype(np.float32)
labels = rng.randint(0, C - 8, R)
X = centers[labels] + 0.1 * rng.randn(R, 2).astype(np.float32)
values = (jnp.asarray(X, jnp.float32),)
assignments = jnp.asarray(labels, jnp.int32)
state = mx.state_from_assignments(spec, cl, shareds, values, assignments)
cache = gibbs.build_stat_cache(spec, shareds, values, BLOCK, assignments)
key = jax.random.PRNGKey(0)

subkeys = jax.random.split(key, CALLS + 2)
np.asarray(jax.random.key_data(subkeys))


def call(carry, k):
    st, an, ca = carry
    return gibbs.run_sweeps_pallas_fused(
        spec, cl, shareds, st, values, an, BLOCK, BR, k, ca, FUSE, SAMPLING)


t0 = time.time()
carry = call((state, assignments, cache), subkeys[0])
np.asarray(carry[0].counts)
print('compile+run %.1fs' % (time.time() - t0), flush=True)

carry = (state, assignments, cache)
for i in range(CALLS):
    t0 = time.time()
    carry = call(carry, subkeys[i + 1])
    np.asarray(carry[0].counts)
    dt = time.time() - t0
    print('call %d: %7.1f ms total, %6.2f ms/sweep  (%s)' %
          (i, dt * 1e3, dt * 1e3 / FUSE, SAMPLING), flush=True)

cells = float(R) * C * 2
print('last-call rate: %.3g cells/s (%.1fx baseline 9.7e8)' %
      (cells / (dt / FUSE), cells / (dt / FUSE) / 9.7e8))
