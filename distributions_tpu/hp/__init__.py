"""Reference-style 'hp' flavor import path (drop-in migration alias).

The reference exposes three flavors (dbg/hp/lp) of one API; here all three
map to the same compat facade over the single JAX core (eager / jit /
batched execution modes).  `from distributions_tpu.hp.models import
nich` works like the reference's `from distributions.hp.models
import nich`.
"""

from distributions_tpu.hp import models  # noqa: F401
from distributions_tpu.compat import clustering  # noqa: F401
from distributions_tpu.compat import rng as random_module
