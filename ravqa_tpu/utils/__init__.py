from .profiling import StepTimer, annotate, device_memory_stats, trace


def set_seed(seed: int):
    """Seed numpy + python random (jax uses explicit PRNG keys)."""
    import random

    import numpy as np
    random.seed(seed)
    np.random.seed(seed)


__all__ = ["StepTimer", "annotate", "device_memory_stats", "trace",
           "set_seed"]
