"""JAX configuration for sipp-tpu: persistent compilation cache.

Field-kernel graphs are large; XLA compiles dominate cold-start time.  The
persistent cache makes every compile a once-per-machine cost (tests, bench,
and apps all share it).  Imported for its side effect by sipp_tpu/__init__.
"""

import os

import jax

_CACHE_DIR = os.environ.get(
    "SIPP_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/sipp_tpu_xla")
)
if _CACHE_DIR and _CACHE_DIR != "0":
    os.makedirs(_CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
