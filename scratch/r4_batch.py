"""Round-4 TPU warm + measure batch (run AFTER the last trace-path edit).

Covers every program the driver bench + CLI/app paths will hit, in one
process (in-process jit cache + persistent compile cache):

  s1  whole-loop n=128 aggregation (flagship; v2-lite fexp)
  s2  host-spine prove + verify n=128 (protocol stage: fold kernels,
      _round_zs_fused B=2 fexp, verifier validation programs)
  s3  whole n=4096, auto chunk (256) vs pinned chunk 128 comparison
  s4  BLS aggregation e2e n=128
  s5  latency probe chains for the v2-lite ops (cyclo / fq12 mul)

Usage: nohup python scratch/r4_batch.py > /tmp/r4_batch.out 2>&1 &
Results stream to /tmp/r4_batch_results.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()
RESULTS = {}
OUT = "/tmp/r4_batch_results.json"


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


def timeit(fn, reps=10):
    z = fn(A128, B128)
    jax.block_until_ready(z)
    t = time.time()
    insts = [jax.block_until_ready(_roll(A128, B128, i + 1))
             for i in range(reps)]
    t = time.time()
    for x, y in insts:
        z = fn(x, y)
    jax.block_until_ready(z)
    return (time.time() - t) / reps


@section("s1_whole128")
def s1():
    t = time.time()
    z = pp._inner_z_fused(A128, B128, None)
    jax.block_until_ready(z)
    save("s1_compile_s", round(time.time() - t, 1))
    dt = timeit(lambda x, y: pp._inner_z_fused(x, y, None))
    save("s1_whole128_ms", round(dt * 1000, 3))
    save("s1_pairings_per_s", round(N / dt, 1))
    # ADVICE r3 probe case D: bench.py times lane-ROLLED copies of one
    # instance (dedup-defeat scheme); confirm they behave like fully
    # independent instances (if the runtime deduped at finer granularity
    # than whole-(program, input bytes), rolled would read faster)
    indep = [random_instance(N, seed=1000 + i) for i in range(10)]
    t = time.time()
    for x, y in indep:
        z = pp._inner_z_fused(x, y, None)
    jax.block_until_ready(z)
    dt_i = (time.time() - t) / 10
    save("s1_whole128_independent_ms", round(dt_i * 1000, 3))
    save("s1_rolled_vs_independent_ratio", round(dt / dt_i, 3))


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
    sipp_verify(A128, B128, proof)   # includes validation program compiles
    save("s2_verify_compile_s", round(time.time() - t, 1))
    t = time.time()
    sipp_verify(a2, b2, proof2)
    save("s2_verify_s", round(time.time() - t, 3))


@section("s3_whole4096")
def s3():
    A4k, B4k = random_instance(4096, seed=1177)
    roll4k = jax.jit(lambda x, y, i: (jnp.roll(x, i, 0), jnp.roll(y, i, 0)))

    def run_cfg(tag):
        t = time.time()
        z = pp._inner_z_fused(A4k, B4k, None)
        jax.block_until_ready(z)
        save(f"s3_{tag}_compile_s", round(time.time() - t, 1))
        insts = [jax.block_until_ready(roll4k(A4k, B4k, i + 1))
                 for i in range(4)]
        t = time.time()
        for x, y in insts:
            z = pp._inner_z_fused(x, y, None)
        jax.block_until_ready(z)
        dt = (time.time() - t) / 4
        save(f"s3_{tag}_ms", round(dt * 1000, 2))
        save(f"s3_{tag}_pairings_per_s", round(4096 / dt, 1))
        return np.asarray(jax.device_get(z))

    # auto-pick path (chunk 256 for n >= 2048)
    z256 = run_cfg("chunk256")
    # pinned chunk 128 (what round 3 measured) — same-process env read
    # happens at trace time, so clear caches and re-jit
    os.environ["SIPP_MILLER_CHUNK"] = "128"
    jax.clear_caches()
    z128 = run_cfg("chunk128")
    del os.environ["SIPP_MILLER_CHUNK"]
    jax.clear_caches()
    save("s3_chunks_bitequal", bool((z256 == z128).all()))


@section("s4_bls")
def s4():
    from sipp_tpu.apps.bls_aggregation import main as bls_main

    t = time.time()
    bls_main(128)
    save("s4_bls_e2e_s", round(time.time() - t, 1))


@section("s5_latency_probe")
def s5():
    import subprocess

    r = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "r4_latency_probe.py")],
        capture_output=True, text=True, timeout=1800)
    log(r.stdout[-2000:])
    try:
        with open("/tmp/r4_latency_results.json") as f:
            for k, v in json.load(f).items():
                save("s5_" + k, v)
    except Exception as e:
        save("s5_error", str(e)[:200])


if __name__ == "__main__":
    for s in (s1, s2, s3, s4, s5):
        s()
    log("ALL DONE", json.dumps(RESULTS))
