from distributions_tpu.compat.models import (  # noqa: F401
    bb, bnb, dd, dpd, gp, nich, niw, MODULES)
