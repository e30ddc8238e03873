"""hp flavor: an INDEPENDENT double-precision numpy/scipy implementation
of the model API.

The reference ships three implementations of one API (dbg: pure python,
hp: Cython, lp: Cython-wrapped C++) and tests them against each other
(reference tests/test_model_flavors.py:40-136).  In this framework the JAX
core (`distributions_tpu.models`, `distributions_tpu.clustering`) is the
production implementation with eager/jit/batched execution modes; this
package restores the reference's INDEPENDENT-IMPLEMENTATION cross-check:
scalar float64, scipy.stats-backed, sharing no code with the JAX core
(no jax imports anywhere under `distributions_tpu.hp` — enforced by
tests/test_flavor_agreement.py).

Surface:
- `hp.models.{bb,bnb,dd,dpd,gp,nich,niw}` — functional model modules with
  the core contract (numpy Generators in place of PRNG keys)
- `hp.clustering.{PitmanYor,LowEntropy}` — sequential-seating scorers and
  an exact partition-function DP
- `hp.random`, `hp.special` — float64 substrate

Class-based migration facades (Shared/Group/Sampler objects) live in
`distributions_tpu.compat`; the `dbg`/`lp` alias namespaces re-export
them.  This package is the numerical oracle, not a facade.
"""

from distributions_tpu.hp import special  # noqa: F401
from distributions_tpu.hp import random  # noqa: F401
from distributions_tpu.hp import clustering  # noqa: F401
from distributions_tpu.hp import models  # noqa: F401
from distributions_tpu.hp.models import MODULES  # noqa: F401
from distributions_tpu.hp.clustering import (  # noqa: F401
    PitmanYor, LowEntropy, count_assignments)
