"""Round-2 probe: cold compile + steady-state timing of each bench stage
candidate on the live TPU, in cheapest-first order.  Writes timings to
stdout (flush) so a killed run still yields data."""

import os
import sys
import time

t0 = time.time()


def log(*a):
    print(f"[{time.time()-t0:7.1f}s]", *a, flush=True)


import jax
import jax.numpy as jnp

log("backend", jax.default_backend(), jax.devices())

from sipp_tpu.utils.testing import random_instance

a, b = random_instance(128, seed=1177)
log("inputs ready")

# --- stage candidate 1: XLA-scan miller + host C++ final exp -------------
from sipp_tpu.pairing import ate as pp

t = time.time()
f = pp._miller_product(a, b)
f.block_until_ready()
log(f"XLA-scan miller_product n=128 compile+run {time.time()-t:.1f}s")
t = time.time()
for _ in range(5):
    f = pp._miller_product(a, b)
f.block_until_ready()
log(f"XLA-scan miller_product steady {(time.time()-t)/5*1000:.1f} ms")

t = time.time()
z = pp.final_exp_host(f)
log(f"final_exp_host {time.time()-t:.3f}s")

# --- stage candidate 2: per-step fused kernel ----------------------------
t = time.time()
f2 = pp._product_tree(pp.miller_loop_fused(a, b))
f2.block_until_ready()
log(f"per-step fused miller n=128 compile+run {time.time()-t:.1f}s")
t = time.time()
for _ in range(5):
    f2 = pp._product_tree(pp.miller_loop_fused(a, b))
f2.block_until_ready()
log(f"per-step fused steady {(time.time()-t)/5*1000:.1f} ms")
import numpy as np
assert np.array_equal(np.asarray(f), np.asarray(f2)), "per-step mismatch"

# --- stage candidate 3: fused final exp kernel ---------------------------
from sipp_tpu.ops import pallas_fexp

t = time.time()
z3 = pallas_fexp.final_exp_fused(f2[None])[0]
z3.block_until_ready()
log(f"pallas final_exp_fused B=1 compile+run {time.time()-t:.1f}s")
assert np.array_equal(np.asarray(z3), np.asarray(z)), "fexp mismatch"

# --- stage candidate 4: whole-loop kernel (the headline path) ------------
t = time.time()
z4 = pp._inner_z_fused(a, b, None)
z4.block_until_ready()
log(f"whole-loop _inner_z_fused n=128 compile+run {time.time()-t:.1f}s")
t = time.time()
for _ in range(10):
    z4 = pp._inner_z_fused(a, b, None)
z4.block_until_ready()
dt = (time.time() - t) / 10
log(f"whole-loop steady {dt*1000:.1f} ms = {128/dt:.0f} pairings/s")
assert np.array_equal(np.asarray(z4), np.asarray(z3)), "whole-loop mismatch"

log("ALL OK")
