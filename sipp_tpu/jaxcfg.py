"""JAX configuration for sipp-tpu: persistent compilation cache.

Field-kernel graphs are large; XLA compiles dominate cold-start time.  The
persistent cache makes every compile a once-per-machine cost (tests, bench,
and apps all share it).  Imported for its side effect by sipp_tpu/__init__.

Cache keying (round-3 fix for cross-environment blob poisoning):

* CPU runs: XLA:CPU executables are AOT-compiled for the host's exact CPU
  features, and a blob produced under one feature set fails to DEserialize
  under another — which both wastes the cache and spams "machine feature
  mismatch" errors on every lookup (this polluted the round-1/2 multichip
  dryruns: same hostname + same "model name" line, different feature flags).
  The CPU cache directory is therefore keyed by a hash of ALL /proc/cpuinfo
  feature-flag lines, making foreign blobs unreachable instead of
  load-and-fail.

* TPU/axon runs: executables target the TPU, not the host CPU, so they ARE
  portable across host environments.  The directory is keyed by jax version
  + TPU generation only, so a bench prewarmed in one session hits the cache
  when the driver runs in another (round-2 failure mode: 400+ s tunnel
  compiles inside the driver's bench budget).

The platform is read from JAX_PLATFORMS (set by every entry point in this
repo: conftest, bench children, the driver) WITHOUT initializing a backend —
touching jax.devices() here would open the tunnel at import time.
"""

import hashlib
import os

import jax


def _cache_key() -> str:
    plat = os.environ.get("JAX_PLATFORMS", "")
    if "cpu" not in plat.split(","):
        gen = os.environ.get("PALLAS_AXON_TPU_GEN", "tpu")
        return f"tpu-{gen}-{jax.__version__}"
    h = hashlib.sha256()
    h.update(jax.__version__.encode())
    try:
        with open("/proc/cpuinfo", "rb") as f:
            for line in f:
                if line.startswith((b"flags", b"model name")):
                    h.update(line)
                    if line.startswith(b"flags"):
                        break  # one core's full flag set suffices
    except OSError:
        pass
    return "cpu-" + h.hexdigest()[:12]


_CACHE_ROOT = os.environ.get(
    "SIPP_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/sipp_tpu_xla")
)
if _CACHE_ROOT and _CACHE_ROOT != "0":
    _CACHE_DIR = os.path.join(_CACHE_ROOT, _cache_key())
    os.makedirs(_CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
