"""Time the v3/v4 fused MIXED sweep on TPU for a chosen spec.

    SPEC=nich1|nich2|bb1|dd1|dpd1|gp1|bnb1|bbddgp|niw2|niw2mix
    [ROWS=.. COMPONENTS=.. BLOCK=.. BR=.. FUSE=.. SAMPLING=cdf]
    python profile_mixed.py

One jit signature per invocation (remote compiles are slow; NOTES.md).
"""
import os
import time
import numpy as np
import jax
import jax.numpy as jnp

from distributions_tpu import clustering, mixture as mx
from distributions_tpu.models import nich, gp as gp_mod, bb as bb_mod
from distributions_tpu.models import dd as dd_mod, niw as niw_mod
from distributions_tpu.ops import gibbs

assert jax.devices()[0].platform != 'cpu'

SPEC = os.environ.get('SPEC', 'niw2')
SAMPLING = os.environ.get('SAMPLING', 'cdf')
R = int(os.environ.get('ROWS', 1048576))
C = int(os.environ.get('COMPONENTS', 1024))
BLOCK = int(os.environ.get('BLOCK', 65536))
BR = int(os.environ.get('BR', 1024))
FUSE = int(os.environ.get('FUSE', 10))
CALLS = int(os.environ.get('CALLS', 3))

rng = np.random.RandomState(0)
labels = rng.randint(0, C - 8, R)

if SPEC in ('nich1', 'nich2'):
    cols = int(SPEC[-1])
    spec = mx.make_spec([(nich, cols)], capacity=C, empties=1)
    shareds = (nich.shared_from_dict(
        {'mu': 0., 'kappa': 0.1, 'sigmasq': 0.01, 'nu': 1.}),)
    centers = rng.randn(C - 8, cols).astype(np.float32)
    values = (jnp.asarray(centers[labels] + 0.1 * rng.randn(R, cols),
                          jnp.float32),)
    feat_cells = cols
elif SPEC == 'bb1':
    spec = mx.make_spec([(bb_mod, 1)], capacity=C, empties=1)
    shareds = (bb_mod.shared_from_dict({'alpha': 0.5, 'beta': 0.5}),)
    values = (jnp.asarray((rng.rand(R) < 0.4)[:, None]),)
    feat_cells = 1
elif SPEC == 'dd1':
    spec = mx.make_spec([(dd_mod, 1)], capacity=C, empties=1)
    shareds = (dd_mod.shared_from_dict(
        {'alphas': [1.0, 0.5, 2.0, 1.5, 0.3, 0.8, 1.2, 0.6]}),)
    values = (jnp.asarray(rng.randint(0, 8, (R, 1)), jnp.int32),)
    feat_cells = 1
elif SPEC == 'dpd1':
    from distributions_tpu.models import dpd as dpd_mod
    spec = mx.make_spec([(dpd_mod, 1)], capacity=C, empties=1)
    sh = dpd_mod.shared_from_dict(
        {'gamma': 1.0, 'alpha': 1.0, 'betas': {}}, cap=64)
    dkey = jax.random.PRNGKey(7)
    for v in range(32):                # realize sticks for values 0..31
        dkey, sub = jax.random.split(dkey)
        sh = dpd_mod.shared_add_value(sub, sh, v)
    shareds = (sh,)
    values = (jnp.asarray(rng.randint(0, 32, (R, 1)), jnp.int32),)
    feat_cells = 1
elif SPEC == 'gp1':
    spec = mx.make_spec([(gp_mod, 1)], capacity=C, empties=1)
    shareds = (gp_mod.shared_from_dict({'alpha': 2.0, 'inv_beta': 1.0}),)
    rates = 1.0 + (labels % 16).astype(np.float64)
    values = (jnp.asarray(rng.poisson(rates)[:, None], jnp.int32),)
    feat_cells = 1
elif SPEC == 'bbddgp':
    spec = mx.make_spec([(bb_mod, 1), (dd_mod, 1), (gp_mod, 1)],
                        capacity=C, empties=1)
    shareds = (
        bb_mod.shared_from_dict({'alpha': 0.5, 'beta': 0.5}),
        dd_mod.shared_from_dict({'alphas': [1.0, 0.5, 2.0, 1.5]}),
        gp_mod.shared_from_dict({'alpha': 2.0, 'inv_beta': 1.0}),
    )
    values = (
        jnp.asarray((rng.rand(R) < 0.4)[:, None]),
        jnp.asarray(rng.randint(0, 4, (R, 1)), jnp.int32),
        jnp.asarray(rng.poisson(1.0 + (labels % 16))[:, None], jnp.int32),
    )
    feat_cells = 3
elif SPEC == 'bnb1':
    from distributions_tpu.models import bnb as bnb_mod
    spec = mx.make_spec([(bnb_mod, 1)], capacity=C, empties=1)
    shareds = (bnb_mod.shared_from_dict(
        {'alpha': 1.0, 'beta': 4.0, 'r': 2}),)
    p = 0.2 + 0.6 * (labels % 8) / 8.0
    values = (jnp.asarray(
        rng.negative_binomial(2, 1.0 - p)[:, None], jnp.int32),)
    feat_cells = 1
elif SPEC in ('niw2', 'niw2mix'):
    d = 2
    blocks = [(niw_mod, 1)]
    centers = 3.0 * rng.randn(C - 8, d).astype(np.float32)
    vals = [jnp.asarray((centers[labels]
                         + 0.3 * rng.randn(R, d))[:, None, :], jnp.float32)]
    shareds = [niw_mod.shared_from_dict(
        {'mu': np.zeros(d), 'kappa': 1.0, 'psi': np.eye(d), 'nu': d + 1.})]
    feat_cells = 1
    if SPEC == 'niw2mix':
        blocks += [(nich, 1), (bb_mod, 1)]
        shareds += [
            nich.shared_from_dict(
                {'mu': 0., 'kappa': .1, 'sigmasq': 1., 'nu': 1.}),
            bb_mod.shared_from_dict({'alpha': 0.5, 'beta': 0.5}),
        ]
        vals += [
            jnp.asarray(rng.randn(R, 1), jnp.float32),
            jnp.asarray((rng.rand(R) < 0.4)[:, None]),
        ]
        feat_cells = 3
    spec = mx.make_spec(blocks, capacity=C, empties=1)
    shareds = tuple(shareds)
    values = tuple(vals)
else:
    raise SystemExit('unknown SPEC=' + SPEC)

assignments = jnp.asarray(labels, jnp.int32)
state = mx.state_from_assignments(
    spec, clustering.PitmanYor.from_dict({'alpha': 100.0, 'd': 0.1}),
    shareds, values, assignments)
cl = clustering.PitmanYor.from_dict({'alpha': 100.0, 'd': 0.1})
cache = gibbs.build_stat_cache(spec, shareds, values, BLOCK, assignments)
key = jax.random.PRNGKey(0)

subkeys = jax.random.split(key, CALLS + 2)
np.asarray(jax.random.key_data(subkeys))


def call(carry, k):
    st, an, ca = carry
    return gibbs.sweep_blocked_pallas_fused_mixed(
        spec, cl, shareds, st, values, an, BLOCK, BR, k, ca,
        sampling=SAMPLING, n_sweeps=FUSE)


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
    print('call %d: %7.1f ms total, %6.2f ms/sweep  (%s %s)' %
          (i, dt * 1e3, dt * 1e3 / FUSE, SPEC, SAMPLING), flush=True)

cells = float(R) * C * feat_cells
print('last-call rate: %.3g cells/s' % (cells / (dt / FUSE)))
