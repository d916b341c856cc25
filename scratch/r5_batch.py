"""Round-5 TPU warm + measure batch (run AFTER the last trace-path edit).

Round-5 trace-path changes: pair-product Miller kernel (pallas_miller
pair=True) inside _round_zs_fused and the onchip round body; onchip prover
per-round dispatch (prover.py).  EVERY cached program recompiles this round.

  s1  whole-loop n=128 aggregation (flagship)
  s2  host-spine prove + verify n=128 (protocol fallback path; pair kernel
      correctness rides sipp_verify's final pairing check)
  s2b ONCHIP prove n=128: compile _z_onchip + _round_onchip, measure
      prove_s + per-round latency, assert proof BIT-IDENTICAL to s2's
  s3  whole n=4096 chunk-128
  s4  BLS aggregation e2e n=128
  s5  MSM-vs-ladder verifier finals probe (VERDICT r4 next-8)

Usage: nohup python scratch/r5_batch.py > /tmp/r5_batch.out 2>&1 &
Results stream to /tmp/r5_batch_results.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()
RESULTS = {}
OUT = "/tmp/r5_batch_results.json"


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
                import traceback
                log(f"!!! {name} FAILED: {type(e).__name__}: {e}")
                log(traceback.format_exc()[-2000:])
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
PROOF_HOST = {}


def timeit(fn, reps=10):
    z = fn(A128, B128)
    jax.block_until_ready(z)
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


@section("s2_protocol_hostspine")
def s2():
    from sipp_tpu.protocol import sipp_verify
    from sipp_tpu.protocol.prover import sipp_prove

    t = time.time()
    proof = sipp_prove(A128, B128)
    jax.block_until_ready(proof)
    save("s2_prove_compile_s", round(time.time() - t, 1))
    a2, b2 = jax.block_until_ready(_roll(A128, B128, 63))
    t = time.time()
    proof2 = sipp_prove(a2, b2)
    jax.block_until_ready(proof2)
    save("s2_prove_host_s", round(time.time() - t, 3))
    PROOF_HOST["p"] = np.asarray(jax.device_get(proof))
    PROOF_HOST["p2"] = np.asarray(jax.device_get(proof2))
    t = time.time()
    sipp_verify(A128, B128, proof)   # includes validation program compiles
    save("s2_verify_compile_s", round(time.time() - t, 1))
    t = time.time()
    sipp_verify(a2, b2, proof2)
    save("s2_verify_s", round(time.time() - t, 3))


@section("s2b_onchip")
def s2b():
    from sipp_tpu.protocol.prover import sipp_prove_onchip

    t = time.time()
    proof = sipp_prove_onchip(A128, B128)
    jax.block_until_ready(proof)
    save("s2b_onchip_compile_s", round(time.time() - t, 1))
    if "p" in PROOF_HOST:
        save("s2b_onchip_bitequal_host",
             bool(np.array_equal(np.asarray(jax.device_get(proof)),
                                 PROOF_HOST["p"])))
    a2, b2 = jax.block_until_ready(_roll(A128, B128, 63))
    t = time.time()
    proof2 = sipp_prove_onchip(a2, b2)
    jax.block_until_ready(proof2)
    save("s2b_onchip_prove_s", round(time.time() - t, 3))
    if "p2" in PROOF_HOST:
        save("s2b_onchip_bitequal_host2",
             bool(np.array_equal(np.asarray(jax.device_get(proof2)),
                                 PROOF_HOST["p2"])))
    # per-fold-round latency (BASELINE metric string)
    a3, b3 = jax.block_until_ready(_roll(A128, B128, 29))
    rt = []
    jax.block_until_ready(sipp_prove_onchip(a3, b3, round_times=rt))
    save("s2b_round_latencies_ms", [round(x * 1000, 2) for x in rt])
    if rt:
        save("s2b_fold_round_latency_ms",
             round(sorted(rt)[len(rt) // 2] * 1000, 3))


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


@section("s4_bls")
def s4():
    from sipp_tpu.apps.bls_aggregation import main as bls_main

    t = time.time()
    bls_main(128)
    save("s4_bls_e2e_s", round(time.time() - t, 1))


@section("s5_msm_vs_ladder")
def s5():
    """VERDICT r4 next-8: verifier finals as one MSM vs the ladder MSM.
    n=4096 G1 points with full 254-bit scalars — the exact shape of the
    MSM-form final_A = sum_i c_i A_i (c_i = products of challenges)."""
    from sipp_tpu.curves import G1, scalar_to_bits
    from sipp_tpu.ops import msm

    n = 4096
    a4k, _ = random_instance(n, seed=7)
    rng = np.random.default_rng(9)
    bits = jnp.asarray(np.stack(
        [scalar_to_bits(int.from_bytes(rng.bytes(31), "little"))
         for _ in range(n)], axis=1))          # (254, n) MSB-first

    for name, fn in (("ladder", msm.msm),
                     ("bucket", msm.msm_bucket)):
        t = time.time()
        r = fn(G1, a4k, bits)
        jax.block_until_ready(r)
        save(f"s5_msm_{name}_4096_compile_plus_run_s",
             round(time.time() - t, 1))
        t = time.time()
        r = fn(G1, a4k, bits)
        jax.block_until_ready(r)
        save(f"s5_msm_{name}_4096_s", round(time.time() - t, 3))


STAGES = {"s1": s1, "s2": s2, "s2b": s2b, "s3": s3, "s4": s4, "s5": s5}

if __name__ == "__main__":
    only = sys.argv[1:] or list(STAGES)
    for key in only:
        STAGES[key]()
    log("ALL DONE", json.dumps(RESULTS))
