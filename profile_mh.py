"""Time the O(1)-per-row MH sweep (ops/mh.sweep_mh) on TPU at bench
shapes, against the equivalent full-scoring rate.

    [ROWS=.. COMPONENTS=.. BLOCK=.. STEPS=..] python profile_mh.py

One jit signature per invocation (NOTES.md environment hazards).
"""
import os
import time
import numpy as np
import jax
import jax.numpy as jnp

from distributions_tpu import clustering, mixture as mx
from distributions_tpu.models import nich
from distributions_tpu.ops import mh

assert jax.devices()[0].platform != 'cpu'

R = int(os.environ.get('ROWS', 1048576))
C = int(os.environ.get('COMPONENTS', 1024))
BLOCK = int(os.environ.get('BLOCK', 65536))
STEPS = int(os.environ.get('STEPS', 8))
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

subkeys = jax.random.split(jax.random.PRNGKey(0), CALLS + 1)
np.asarray(jax.random.key_data(subkeys))

t0 = time.time()
st, an = mh.sweep_mh(spec, cl, shareds, state, values, assignments,
                     BLOCK, STEPS, subkeys[0])
np.asarray(st.counts)
print('compile+run %.1fs' % (time.time() - t0), flush=True)

st, an = state, assignments
for i in range(CALLS):
    t0 = time.time()
    st, an = mh.sweep_mh(spec, cl, shareds, st, values, an, BLOCK, STEPS,
                         subkeys[i + 1])
    np.asarray(st.counts)
    dt = time.time() - t0
    print('call %d: %7.1f ms/sweep (T=%d)' % (i, dt * 1e3, STEPS),
          flush=True)

print('rows/s: %.3g   (full-scoring-equivalent: %.3g cells/s)' %
      (R / dt, float(R) * C * 2 / dt))
