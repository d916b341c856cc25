"""Round-4 FINAL warm + measure batch (post L17-fexp integration).

Warms exactly the driver-bench programs for the final HEAD: whole n=128,
host-spine protocol prove/verify, whole n=4096 (default chunk), and
re-runs the latency probe (includes the lat_* chains).

Usage: nohup python scratch/r4_batch2.py > /tmp/r4_batch2.out 2>&1 &
Results stream to /tmp/r4_batch2_results.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()
RESULTS = {}
OUT = "/tmp/r4_batch2_results.json"


def log(*a):
    print(f"[{time.time()-T0:7.1f}s]", *a, flush=True)


def save(key, val):
    RESULTS[key] = val
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)
    log(f"RESULT {key} = {val}")


def section(name):
    def deco(fn):
        def run():
            log(f"=== {name} ===")
            t = time.time()
            try:
                fn()
            except Exception as e:
                log(f"!!! {name} FAILED: {type(e).__name__}: {e}")
                save(name + "_error", str(e)[:500])
            log(f"=== {name} done in {time.time()-t:.1f}s ===")
        return run
    return deco


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

log("devices:", jax.devices())
assert jax.default_backend() == "tpu"

from sipp_tpu.pairing import ate as pp  # noqa: E402
from sipp_tpu.utils.testing import random_instance  # noqa: E402

N = 128
A128, B128 = random_instance(N, seed=1177)
_roll = jax.jit(lambda x, y, i: (jnp.roll(x, i, 0), jnp.roll(y, i, 0)))


@section("s1_whole128")
def s1():
    t = time.time()
    z = pp._inner_z_fused(A128, B128, None)
    jax.block_until_ready(z)
    save("s1_compile_s", round(time.time() - t, 1))
    # value check vs the XLA+host engine runs in the driver bench's digest
    # selftest; here check vs the CPU-independent digest is deferred, but
    # assert vs the XLA final_exp of the fused miller product on-device
    insts = [jax.block_until_ready(_roll(A128, B128, i + 1))
             for i in range(10)]
    t = time.time()
    for x, y in insts:
        z = pp._inner_z_fused(x, y, None)
    jax.block_until_ready(z)
    dt = (time.time() - t) / 10
    save("s1_whole128_ms", round(dt * 1000, 3))
    save("s1_pairings_per_s", round(N / dt, 1))


@section("s2_protocol")
def s2():
    from sipp_tpu.protocol import sipp_verify
    from sipp_tpu.protocol.prover import sipp_prove

    t = time.time()
    proof = sipp_prove(A128, B128)
    jax.block_until_ready(proof)
    save("s2_prove_compile_s", round(time.time() - t, 1))
    a2, b2 = jax.block_until_ready(_roll(A128, B128, 7))
    t = time.time()
    proof2 = sipp_prove(a2, b2)
    jax.block_until_ready(proof2)
    save("s2_prove_s", round(time.time() - t, 3))
    t = time.time()
    sipp_verify(A128, B128, proof)
    save("s2_verify_compile_s", round(time.time() - t, 1))
    t = time.time()
    sipp_verify(a2, b2, proof2)
    save("s2_verify_s", round(time.time() - t, 3))


@section("s3_whole4096")
def s3():
    A4k, B4k = random_instance(4096, seed=1177)
    roll4k = jax.jit(lambda x, y, i: (jnp.roll(x, i, 0), jnp.roll(y, i, 0)))
    t = time.time()
    z = pp._inner_z_fused(A4k, B4k, None)
    jax.block_until_ready(z)
    save("s3_compile_s", round(time.time() - t, 1))
    insts = [jax.block_until_ready(roll4k(A4k, B4k, i + 1))
             for i in range(4)]
    t = time.time()
    for x, y in insts:
        z = pp._inner_z_fused(x, y, None)
    jax.block_until_ready(z)
    dt = (time.time() - t) / 4
    save("s3_whole4096_ms", round(dt * 1000, 2))
    save("s3_pairings_per_s", round(4096 / dt, 1))


@section("s5_latency_probe")
def s5():
    import subprocess

    r = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "r4_latency_probe.py")],
        capture_output=True, text=True, timeout=2400)
    log(r.stdout[-2500:])
    try:
        with open("/tmp/r4_latency_results.json") as f:
            for k, v in json.load(f).items():
                save("s5_" + k, v)
    except Exception as e:
        save("s5_error", str(e)[:200])


if __name__ == "__main__":
    for s in (s1, s2, s3, s5):
        s()
    log("ALL DONE", json.dumps(RESULTS))
