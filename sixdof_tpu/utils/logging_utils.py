"""Logging / timing / seeding helpers (reference Utils.py:94-99, :222-229;
src/pose_estimation.py:9-17)."""
from __future__ import annotations

import functools
import importlib
import logging
import random
import time

import numpy as np


def set_logging_format(level=logging.INFO):
    importlib.reload(logging)
    logging.basicConfig(level=level, format="[%(funcName)s()] %(message)s")


def set_seed(random_seed):
    """Seed numpy + python RNGs.  JAX randomness is explicit-key, so nothing
    global to seed there (reference Utils.py:222-229 seeded torch/cudnn)."""
    np.random.seed(random_seed)
    random.seed(random_seed)


def timeit(func):
    """Wall-clock decorator, logging like reference src/pose_estimation.py:9-17."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        start = time.time()
        result = func(*args, **kwargs)
        logging.info(f":: {func.__name__} executed in {time.time() - start:.6f} seconds")
        return result

    return wrapper
