"""JAX configuration for sipp-tpu: persistent compilation cache.

Field-kernel graphs are large; XLA compiles dominate cold-start time.  The
persistent cache makes every compile a once-per-machine cost (tests, bench,
and apps all share it).  Imported for its side effect by sipp_tpu/__init__.

The cache directory is keyed by machine (hostname + CPU feature hash):
XLA:CPU executables are AOT-compiled for the build host's exact CPU features,
and a blob produced on one machine fails to DEserialize on another with
different features — which both wastes the cache and spams errors on every
lookup (this poisoned the round-1 multichip dryrun).  Per-machine directories
make stale cross-host blobs unreachable instead of load-and-fail.
"""

import hashlib
import os
import socket

import jax


def _machine_key() -> str:
    h = hashlib.sha256()
    h.update(socket.gethostname().encode())
    try:
        with open("/proc/cpuinfo", "rb") as f:
            for line in f:
                if line.startswith(b"flags") or line.startswith(b"model name"):
                    h.update(line)
                    break
    except OSError:
        pass
    return h.hexdigest()[:12]


_CACHE_ROOT = os.environ.get(
    "SIPP_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/sipp_tpu_xla")
)
if _CACHE_ROOT and _CACHE_ROOT != "0":
    _CACHE_DIR = os.path.join(_CACHE_ROOT, _machine_key())
    os.makedirs(_CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
