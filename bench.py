"""Benchmark: BN254 pairing aggregation throughput (SIPP inner product).

Measures the BASELINE.md config-2 workload — n=128 pairing aggregation on a
single chip: one batched Miller loop over 128 lanes, the Fq12 product tree,
and one final exponentiation (the device compute of a SIPP round).

Baseline: the reference's published number is 145.04 s to aggregate 128
pairings via its verifier-SNARK path on an M1 MacBook Pro
(/root/reference/README.md:38-40; BASELINE.md) = 0.8826 pairings/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Diagnostics go to stderr.
"""

import json
import os
import sys
import time

# BENCH_N overrides the workload size (e.g. BENCH_N=4096 for the BASELINE.md
# config-4 single-chip variant); the canonical driver metric is n=128.
N = int(os.environ.get("BENCH_N", "128"))
BASELINE_PAIRINGS_PER_SEC = 128.0 / 145.043526708


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    t0 = time.time()
    import jax

    log("devices:", jax.devices())
    from sipp_tpu.pairing import inner_product as inner
    from sipp_tpu.utils.testing import random_instance

    a, b = random_instance(N, seed=1177)
    log(f"setup {time.time()-t0:.1f}s")

    t0 = time.time()
    z = inner(a, b)
    z.block_until_ready()
    log(f"warmup (compile) {time.time()-t0:.1f}s")

    reps = 10
    t0 = time.time()
    for _ in range(reps):
        z = inner(a, b)
    z.block_until_ready()
    dt = (time.time() - t0) / reps
    value = N / dt
    log(f"steady state: {dt*1000:.1f} ms per n={N} aggregation")

    print(json.dumps({
        "metric": f"bn254_pairings_aggregated_per_sec_n{N}",
        "value": round(value, 3),
        "unit": "pairings/s",
        "vs_baseline": round(value / BASELINE_PAIRINGS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
