"""One-process TPU measurement batch (in-process compile cache, partial
results survive a timeout).  Sections ordered by value; each flushes."""
import json
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def section(name):
    print(f"\n=== {name} ===", flush=True)
    log(f"=== {name} ===")


t_start = time.time()
import jax
import jax.numpy as jnp

log("devices:", jax.devices())

from sipp_tpu.pairing import ate as pairing_mod
from sipp_tpu.pairing import inner_product as inner
from sipp_tpu.utils.testing import random_instance



def set_chunk(c):
    """Change the fused-Miller lane chunk AND drop stale jit executables:
    _inner_f/_inner_z_fused are cached per input shape, so without the cache
    clear a chunk change silently reuses the previous chunk's executable."""
    pairing_mod.MILLER_FUSED_CHUNK = c
    pairing_mod._inner_f.clear_cache()
    pairing_mod._inner_z_fused.clear_cache()
    pairing_mod._round_zs_fused.clear_cache()

def timed(fn, reps=10):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


# ---- 1. n=128 headline ----
section("bench n=128 default")
a128, b128 = random_instance(128, seed=1177)
t0 = time.time()
z = inner(a128, b128)
z.block_until_ready()
print(f"warmup(compile) {time.time()-t0:.1f}s", flush=True)
dt = timed(lambda: inner(a128, b128))
print(f"n=128: {dt*1e3:.2f} ms  ({128/dt:.0f} pairings/s)", flush=True)

# ---- 2. kernel split timing at 128 lanes ----
section("kernel split n=128")
try:
    from sipp_tpu.ops.pallas_miller import miller_product_fused
    from sipp_tpu.ops.pallas_fexp import final_exp_fused

    f = miller_product_fused(a128, b128)
    jax.block_until_ready(f)
    dt = timed(lambda: miller_product_fused(a128, b128))
    print(f"miller_product_fused(128): {dt*1e3:.2f} ms", flush=True)
    dt = timed(lambda: final_exp_fused(f[None]))
    print(f"final_exp_fused B=1: {dt*1e3:.2f} ms", flush=True)
    f2 = jnp.stack([f, f])
    dt = timed(lambda: final_exp_fused(f2))
    print(f"final_exp_fused B=2: {dt*1e3:.2f} ms", flush=True)
except Exception as e:
    print("split FAILED:", repr(e)[:500], flush=True)

# ---- 3. n=4096 chunk=128 ----
section("bench n=4096 chunk=128")
a4k, b4k = random_instance(4096, seed=1177)
t0 = time.time()
z = inner(a4k, b4k)
z.block_until_ready()
print(f"warmup {time.time()-t0:.1f}s", flush=True)
dt = timed(lambda: inner(a4k, b4k), reps=5)
print(f"n=4096 chunk=128: {dt*1e3:.1f} ms  ({4096/dt:.0f} pairings/s)", flush=True)

# ---- 4. n=4096 chunk=256 ----
section("bench n=4096 chunk=256")
set_chunk(256)
try:
    t0 = time.time()
    z = inner(a4k, b4k)
    z.block_until_ready()
    print(f"warmup(compile) {time.time()-t0:.1f}s", flush=True)
    dt = timed(lambda: inner(a4k, b4k), reps=5)
    print(f"n=4096 chunk=256: {dt*1e3:.1f} ms  ({4096/dt:.0f} pairings/s)",
          flush=True)
except Exception as e:
    print("chunk=256 FAILED:", repr(e)[:800], flush=True)
finally:
    set_chunk(128)

# ---- 5. n=512 at chunk 128 vs 512 (smaller compile than 4096 path?) ----
section("bench n=512 chunk=512")
set_chunk(512)
a512, b512 = random_instance(512, seed=3)
try:
    t0 = time.time()
    z = inner(a512, b512)
    z.block_until_ready()
    print(f"warmup(compile) {time.time()-t0:.1f}s", flush=True)
    dt = timed(lambda: inner(a512, b512), reps=5)
    print(f"n=512 chunk=512: {dt*1e3:.1f} ms  ({512/dt:.0f} pairings/s)",
          flush=True)
except Exception as e:
    print("chunk=512 FAILED:", repr(e)[:800], flush=True)
finally:
    set_chunk(128)

print(f"\n=== tpu_batch done in {time.time()-t_start:.0f}s ===", flush=True)
