from .logging_utils import set_logging_format, timeit, set_seed
from .colormap import jet_colormap, apply_jet
from . import vis


def force_cpu(n_devices=None):
    """Pin JAX to the CPU backend (the session's axon TPU plugin outranks the
    JAX_PLATFORMS env var, so this must happen at the config level before any
    backend initializes).  Optionally fake n_devices host devices."""
    import os

    if n_devices is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n_devices}"
            ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")


def enable_compile_cache(cache_dir="/tmp/jax_compile_cache", min_secs=1.0):
    """Point JAX at the persistent XLA compile cache every long-running tool
    shares.  The fused pipeline programs take minutes to compile cold; any
    process that skips this pays that in full (the round-3 object-field
    campaigns each burned ~10 min recompiling a program other tools had
    already built)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_secs)
