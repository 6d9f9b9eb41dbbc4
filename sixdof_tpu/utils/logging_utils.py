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


def rle_to_mask(rle: dict):
    """Uncompressed RLE -> bool mask (reference Utils.py:442-453)."""
    h, w = rle["size"]
    mask = np.empty(h * w, dtype=bool)
    idx = 0
    parity = False
    for count in rle["counts"]:
        mask[idx : idx + count] = parity
        idx += count
        parity ^= True
    return mask.reshape(w, h).transpose()


def make_yaml_dumpable(D):
    """Recursively coerce numpy types for YAML dumps (reference Utils.py:996-1020)."""
    if isinstance(D, np.ndarray):
        return D.tolist()
    if isinstance(D, dict):
        return {k: make_yaml_dumpable(v) for k, v in D.items()}
    if isinstance(D, (list, tuple)):
        return [make_yaml_dumpable(v) for v in D]
    if isinstance(D, (np.integer,)):
        return int(D)
    if isinstance(D, (np.floating,)):
        return float(D)
    return D
