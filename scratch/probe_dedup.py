"""Probe: does the axon backend dedup identical (program, input) executions?

Times the warm whole-loop n=128 program three ways:
  A) 10 reps, SAME input arrays (bench.py's current pattern)
  B) 10 reps, 10 DISTINCT pre-generated inputs
  C) 1 call, fresh input, fully blocked
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from sipp_tpu.pairing import ate as pp  # noqa: E402
from sipp_tpu.utils.testing import random_instance  # noqa: E402

assert jax.default_backend() == "tpu"
N = 128
a, b = random_instance(N, seed=1177)

t = time.time()
z = pp._inner_z_fused(a, b, None)
jax.block_until_ready(z)
print(f"warmup (cache load): {time.time()-t:.1f}s", flush=True)

t = time.time()
for _ in range(10):
    z = pp._inner_z_fused(a, b, None)
jax.block_until_ready(z)
print(f"A same-input x10: {(time.time()-t)/10*1000:.2f} ms/rep", flush=True)

insts = [random_instance(N, seed=2000 + i) for i in range(10)]
insts = jax.block_until_ready(
    [(jax.device_put(x), jax.device_put(y)) for x, y in insts])
t = time.time()
for x, y in insts:
    z = pp._inner_z_fused(x, y, None)
jax.block_until_ready(z)
print(f"B distinct-input x10: {(time.time()-t)/10*1000:.2f} ms/rep", flush=True)

x, y = random_instance(N, seed=31337)
t = time.time()
z = jax.block_until_ready(pp._inner_z_fused(x, y, None))
print(f"C single fresh call: {(time.time()-t)*1000:.2f} ms", flush=True)
