"""Round-3 TPU batch, part 2: warm + measure the remaining driver-bench
programs after r3_batch's s3 (onchip prove) blew the compile budget.

Sections:
  1. host-spine prove/verify n=128 (the bench "protocol" stage path)
  2. n=4096 whole-loop aggregation (chunk 128)
  3. n=4096 chunk-256 variant (NOTES perf item 1)
  4. kernel split timings (miller / final-exp / per-lane exps)
  5. BLS e2e n=128
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()
RESULTS = {}
OUT = "/tmp/r3b_tpu_results.json"


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

log("devices:", jax.devices())
assert jax.default_backend() == "tpu"

from sipp_tpu.pairing import ate as pp  # noqa: E402
from sipp_tpu.utils.testing import random_instance  # noqa: E402

N = 128
A128, B128 = random_instance(N, seed=1177)


def timeit(fn, reps=10):
    z = fn()
    jax.block_until_ready(z)
    t = time.time()
    for _ in range(reps):
        z = fn()
    jax.block_until_ready(z)
    return (time.time() - t) / reps


@section("s1_prove_verify_host")
def s1():
    from sipp_tpu.protocol import sipp_verify
    from sipp_tpu.protocol.prover import sipp_prove

    t = time.time()
    proof = sipp_prove(A128, B128)
    jax.block_until_ready(proof)
    save("prove_host_compile_s", round(time.time() - t, 1))
    t = time.time()
    proof = sipp_prove(A128, B128)
    jax.block_until_ready(proof)
    save("prove_host_n128_s", round(time.time() - t, 3))
    t = time.time()
    sipp_verify(A128, B128, proof)
    save("verify_cold_n128_s", round(time.time() - t, 3))
    t = time.time()
    sipp_verify(A128, B128, proof)
    save("verify_n128_s", round(time.time() - t, 3))


@section("s2_n4096")
def s2():
    a, b = random_instance(4096, seed=42)

    def agg():
        return pp._inner_z_fused(a, b, None)
    t = time.time()
    jax.block_until_ready(agg())
    save("whole4096_compile_s", round(time.time() - t, 1))
    save("whole_n4096_ms", round(timeit(agg, reps=5) * 1e3, 1))


@section("s3_n4096_chunk256")
def s3():
    pp.MILLER_FUSED_CHUNK = 256
    pp._inner_f.clear_cache()
    pp._inner_z_fused.clear_cache()
    try:
        a, b = random_instance(4096, seed=42)

        def agg():
            return pp._inner_z_fused(a, b, None)
        t = time.time()
        jax.block_until_ready(agg())
        save("whole4096_c256_compile_s", round(time.time() - t, 1))
        save("whole_n4096_c256_ms", round(timeit(agg, reps=5) * 1e3, 1))
    finally:
        pp.MILLER_FUSED_CHUNK = 128
        pp._inner_f.clear_cache()
        pp._inner_z_fused.clear_cache()


@section("s4_splits")
def s4():
    from sipp_tpu.ops.pallas_fexp import final_exp_fused
    from sipp_tpu.ops.pallas_miller import miller_product_fused

    t = time.time()
    f = miller_product_fused(A128, B128)
    f.block_until_ready()
    save("miller_kernel_compile_s", round(time.time() - t, 1))
    save("miller_product_n128_ms", round(timeit(
        lambda: miller_product_fused(A128, B128)) * 1e3, 2))
    t = time.time()
    final_exp_fused(f[None]).block_until_ready()
    save("fexp_kernel_compile_s", round(time.time() - t, 1))
    save("final_exp_B1_ms", round(timeit(
        lambda: final_exp_fused(f[None])) * 1e3, 2))
    save("final_exp_B2_ms", round(timeit(
        lambda: final_exp_fused(jnp.stack([f, f]))) * 1e3, 2))


@section("s5_bls")
def s5():
    import subprocess

    r = subprocess.run(
        [sys.executable, "-m", "sipp_tpu.apps.bls_aggregation", "128"],
        capture_output=True, text=True, timeout=3600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    save("bls_e2e_tail", r.stdout.strip().splitlines()[-3:])


for s in (s1, s2, s3, s4, s5):
    s()
log("ALL DONE", json.dumps(RESULTS))
