"""Probe: does a fresh process hit the persistent cache for the whole-loop
program?  Run AFTER another process has compiled+cached jit__inner_z_fused.
Prints cache events (jax._src.compilation_cache debug logs) and the warmup
wall-clock.  <60 s warmup = hit; ~25 min = miss (today's tunnel speed)."""

import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logging.basicConfig(level=logging.DEBUG)
for name in ("jax._src.compilation_cache", "jax._src.compiler",
             "jax._src.cache_key"):
    logging.getLogger(name).setLevel(logging.DEBUG)

import jax

print("devices:", jax.devices(), flush=True)

from sipp_tpu.pairing import ate as pp
from sipp_tpu.utils.testing import random_instance

print("cache dir:", jax.config.jax_compilation_cache_dir, flush=True)
a, b = random_instance(128, seed=1177)
t = time.time()
z = pp._inner_z_fused(a, b, None)
jax.block_until_ready(z)
print(f"warmup {time.time()-t:.1f}s", flush=True)
