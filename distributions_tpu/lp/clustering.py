from distributions_tpu.compat.clustering import (  # noqa: F401
    PitmanYor, LowEntropy, count_assignments)
