"""Compiled-executable disk cache (AOT cold-start killer).

The axon remote-compile endpoint compiles server-side and does not read or
populate the local persistent jit cache, so every fresh process used to pay
the full compile for the track (~40-80 s) and fused register (~minutes)
programs (first pose from process start ~100 s, BENCH_r04).  The PJRT
executables themselves, however, DO serialize and deserialize through the
tunnel (`jax.experimental.serialize_executable`; measured: track program
80.5 s compile -> 23 MB on disk -> 0.37 s load in a fresh process,
AOT_EXPERIMENT.json).  This module stores serialized executables keyed by

  (program name, jax version + device kind + a hash of every source file in
   sixdof_tpu/models + sixdof_tpu/ops, the caller's shape/static key)

so any change to the compute-path source invalidates the cache, and a
stale or foreign-device artifact can never be served.  Statics are baked
into the executable; callers invoke the returned `Compiled` with the
runtime arrays/scalars only (statics omitted), exactly as
`jax.stages.Compiled.__call__` expects.

Set SIXDOF_AOT_CACHE to relocate the cache, or to "" to disable.
"""
from __future__ import annotations

import glob
import hashlib
import logging
import os
import pickle

_DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache", "sixdof_aot")
_fp_cache = None


def cache_dir():
    d = os.environ.get("SIXDOF_AOT_CACHE", _DEFAULT_DIR)
    return d or None


def _fingerprint():
    """Environment + source fingerprint (lazy, computed once per process)."""
    global _fp_cache
    if _fp_cache is not None:
        return _fp_cache
    import jax

    h = hashlib.sha256()
    h.update(jax.__version__.encode())
    try:
        h.update(jax.devices()[0].device_kind.encode())
        h.update(jax.devices()[0].platform.encode())
    except Exception:
        pass
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for sub in ("models", "ops"):
        for p in sorted(glob.glob(os.path.join(pkg, sub, "**", "*.py"), recursive=True)):
            with open(p, "rb") as f:
                h.update(f.read())
    _fp_cache = h.hexdigest()[:16]
    return _fp_cache


def _path(name, key):
    d = cache_dir()
    if d is None:
        return None
    kh = hashlib.sha256(repr(key).encode()).hexdigest()[:16]
    return os.path.join(d, f"{name}-{_fingerprint()}-{kh}.pkl")


def has(name, key):
    """True if a serialized executable exists on disk for this key (cheap —
    no deserialization; used to decide whether waiting for a background
    load beats a staged-path detour)."""
    path = _path(name, key)
    return path is not None and os.path.exists(path)


def load(name, key):
    """Deserialize a cached executable, or None (miss/disabled/error)."""
    path = _path(name, key)
    if path is None or not os.path.exists(path):
        return None
    try:
        import time

        from jax.experimental import serialize_executable as se

        t0 = time.perf_counter()
        with open(path, "rb") as f:
            payload, in_tree, out_tree = pickle.load(f)
        comp = se.deserialize_and_load(payload, in_tree, out_tree)
        logging.info(f"aot_cache: loaded {name} executable in "
                     f"{time.perf_counter() - t0:.2f}s ({os.path.getsize(path) >> 20} MB)")
        return comp
    except Exception as e:  # a broken artifact must never take the app down
        logging.warning(f"aot_cache: load of {name} failed ({e}); recompiling")
        try:
            os.remove(path)
        except OSError:
            pass
        return None


def store(name, key, compiled):
    """Serialize an executable to the cache (atomic write; best-effort)."""
    path = _path(name, key)
    if path is None:
        return False
    try:
        from jax.experimental import serialize_executable as se

        payload, in_tree, out_tree = se.serialize(compiled)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump((payload, in_tree, out_tree), f)
        os.replace(tmp, path)
        logging.info(f"aot_cache: stored {name} ({os.path.getsize(path) >> 20} MB)")
        return True
    except Exception as e:
        logging.warning(f"aot_cache: store of {name} failed (non-fatal): {e}")
        return False
