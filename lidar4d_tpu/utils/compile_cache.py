"""Persistent XLA compilation cache.

Every CLI invocation of the trainer/bench otherwise repays the full compile
tax (~200 s for the train-step variants on v5e). Enabling JAX's persistent
compilation cache stores compiled executables keyed by (HLO, flags, backend)
under a local directory, so repeat invocations with unchanged shapes/configs
skip XLA entirely.

The reference has no analogue (PyTorch eager recompiles nothing), so this is
pure TPU-framework plumbing; call `enable_compilation_cache()` early in every
entry point (CLIs, bench, driver entries).
"""

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/lidar4d_tpu_xla")


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Turn on the persistent compilation cache. Returns the cache dir."""
    import jax

    cache_dir = cache_dir or os.environ.get(
        "LIDAR4D_COMPILE_CACHE", _DEFAULT_DIR
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything that took XLA >1 s to build; skip trivial graphs
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
