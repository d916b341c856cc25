"""Round-3 TPU measurement batch: everything in ONE process (shared
in-process + persistent compile cache), priority order, partial-safe.

Primary goals (VERDICT r2): warm the driver-bench program cache (whole,
perstep, protocol, n=4096) so BENCH_r03 captures the flagship number, and
take the ranked perf measurements (miller/fexp split, chunk-256 at n=4096).

Sections (each logs elapsed + result; failures don't stop later sections):
  0. tunnel health + cache probe
  1. whole-loop aggregation n=128  (bench flagship stage)   <- warms cache
  2. perstep aggregation n=128     (bench fallback stage)   <- warms cache
  3. prove/verify wall-clock n=128 (onchip prover)          <- warms cache
  4. kernel split timings (miller / final-exp / folds / per-lane exps)
  5. n=4096 whole-loop aggregation (chunk 128, then 256)    <- warms cache
  6. BLS e2e n=128 (device-path aggregate check, this round's app change)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()
RESULTS = {}
OUT = "/tmp/r3_tpu_results.json"


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
log("cache dir:", jax.config.jax_compilation_cache_dir)

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


@section("s0_health")
def s0():
    t = time.time()
    y = jax.jit(lambda v: (v * v).sum())(jnp.arange(1024.0))
    y.block_until_ready()
    save("tiny_jit_s", round(time.time() - t, 2))


@section("s1_whole")
def s1():
    def agg():
        return pp._inner_z_fused(A128, B128, None)
    t = time.time()
    jax.block_until_ready(agg())
    save("whole_compile_s", round(time.time() - t, 1))
    save("whole_n128_ms", round(timeit(agg) * 1e3, 2))


@section("s2_perstep")
def s2():
    def agg():
        return pp.final_exp_host(
            pp._product_tree(pp.miller_loop_fused(A128, B128)))
    t = time.time()
    jax.block_until_ready(agg())
    save("perstep_compile_s", round(time.time() - t, 1))
    save("perstep_n128_ms", round(timeit(agg) * 1e3, 2))


@section("s3_prove_verify")
def s3():
    from sipp_tpu.protocol import sipp_verify
    from sipp_tpu.protocol.prover import sipp_prove_onchip

    t = time.time()
    proof = sipp_prove_onchip(A128, B128)
    jax.block_until_ready(proof)
    save("prove_onchip_compile_s", round(time.time() - t, 1))
    t = time.time()
    proof = sipp_prove_onchip(A128, B128)
    jax.block_until_ready(proof)
    save("prove_onchip_n128_s", round(time.time() - t, 3))
    t = time.time()
    sipp_verify(A128, B128, proof)
    save("verify_cold_n128_s", round(time.time() - t, 3))
    t = time.time()
    sipp_verify(A128, B128, proof)
    save("verify_n128_s", round(time.time() - t, 3))


@section("s4_splits")
def s4():
    from sipp_tpu.ops.pallas_fexp import final_exp_fused
    from sipp_tpu.ops.pallas_miller import miller_product_fused

    f = miller_product_fused(A128, B128)
    f.block_until_ready()
    save("miller_product_n128_ms", round(timeit(
        lambda: miller_product_fused(A128, B128)) * 1e3, 2))
    save("final_exp_B1_ms", round(timeit(
        lambda: final_exp_fused(f[None])) * 1e3, 2))
    save("final_exp_B2_ms", round(timeit(
        lambda: final_exp_fused(jnp.stack([f, f]))) * 1e3, 2))

    import numpy as np

    from sipp_tpu.ops import pallas_exp

    rng = np.random.default_rng(7)
    bits = jnp.asarray(rng.integers(0, 2, size=(254, N)), jnp.uint32)
    x1, off1 = A128, jnp.roll(A128, 1, axis=0)
    save("exp_g1_fused_n128_ms", round(timeit(
        lambda: pallas_exp.exp_g1_fused(x1, off1, bits)) * 1e3, 2))
    x2, off2 = B128, jnp.roll(B128, 1, axis=0)
    save("exp_g2_fused_n128_ms", round(timeit(
        lambda: pallas_exp.exp_g2_fused(x2, off2, bits)) * 1e3, 2))
    f12 = pp.miller_loop(A128, B128)
    o12 = jnp.roll(f12, 1, axis=0)
    save("exp_fq12_fused_n128_ms", round(timeit(
        lambda: pallas_exp.fq12_exp_fused(f12, o12, bits)) * 1e3, 2))


@section("s5_n4096")
def s5():
    a, b = random_instance(4096, seed=42)

    def agg():
        return pp._inner_z_fused(a, b, None)
    t = time.time()
    jax.block_until_ready(agg())
    save("whole4096_compile_s", round(time.time() - t, 1))
    save("whole_n4096_ms", round(timeit(agg, reps=5) * 1e3, 1))


@section("s6_n4096_chunk256")
def s6():
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


@section("s7_bls")
def s7():
    import subprocess

    r = subprocess.run(
        [sys.executable, "-m", "sipp_tpu.apps.bls_aggregation", "128"],
        capture_output=True, text=True, timeout=2400,
        cwd="/root/repo")
    save("bls_e2e_tail", r.stdout.strip().splitlines()[-4:])


for s in (s0, s1, s2, s3, s4, s5, s6, s7):
    s()
log("ALL DONE", json.dumps(RESULTS))
