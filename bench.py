"""Benchmark: BN254 pairing aggregation throughput (SIPP inner product).

Measures the BASELINE.md config-2 workload — n=128 pairing aggregation on a
single chip: one batched Miller loop over 128 lanes, the Fq12 product tree,
and one final exponentiation (the device compute of a SIPP round).

Baseline: the reference's published number is 145.04 s to aggregate 128
pairings via its verifier-SNARK path on an M1 MacBook Pro
(/root/reference/README.md:38-40; BASELINE.md) = 0.8826 pairings/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Diagnostics go to stderr.

Cold-start discipline (round-1 failure mode: the whole-loop Mosaic kernel
can take 20+ min to compile through a slow tunnel, and the round-1 bench
died in that warmup with nothing printed).  The bench now runs STAGES as
subprocesses under a wall-clock budget (SIPP_BENCH_BUDGET, default 520 s):

  stage 1 "perstep": per-step fused Pallas Miller + host C++ final exp —
          the cheapest-to-compile TPU path (~250 s cold, measured);
  stage 2 "whole":   the whole-loop fused kernel (the fastest path; compiles
          in seconds when the persistent cache is warm, else is killed at
          the budget and stage 1's result stands).

The parent prints the best stage's JSON line and always exits 0 if any
stage produced a measurement.
"""

import json
import os
import subprocess
import sys
import time

N = int(os.environ.get("BENCH_N", "128"))
BASELINE_PAIRINGS_PER_SEC = 128.0 / 145.043526708
BUDGET = float(os.environ.get("SIPP_BENCH_BUDGET", "520"))
REPS = int(os.environ.get("BENCH_REPS", "10"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# --------------------------------------------------------------- child mode

def run_stage(stage: str):
    t0 = time.time()
    import jax

    log(f"[{stage}] devices: {jax.devices()}")
    from sipp_tpu.pairing import ate as pp
    from sipp_tpu.utils.testing import random_instance

    a, b = random_instance(N, seed=1177)
    on_tpu = jax.default_backend() == "tpu"

    if stage == "perstep" or not on_tpu:
        if on_tpu:
            def agg(x, y):
                return pp.final_exp_host(
                    pp._product_tree(pp.miller_loop_fused(x, y)))
        else:
            def agg(x, y):  # CPU fallback: XLA scan miller + host final exp
                return pp.final_exp_host(pp._miller_product(x, y))
    elif stage == "whole":
        def agg(x, y):
            return pp._inner_z_fused(x, y, None)
    else:
        raise SystemExit(f"unknown stage {stage}")

    t = time.time()
    z = agg(a, b)
    jax.block_until_ready(z)
    log(f"[{stage}] warmup (compile) {time.time()-t:.1f}s")

    t = time.time()
    for _ in range(REPS):
        z = agg(a, b)
    jax.block_until_ready(z)
    dt = (time.time() - t) / REPS
    log(f"[{stage}] steady state: {dt*1000:.1f} ms per n={N} aggregation")
    print("RESULT " + json.dumps({"stage": stage, "sec": dt}), flush=True)


# -------------------------------------------------------------- parent mode

def run_child(stage: str, timeout: float):
    log(f"--- stage {stage} (timeout {timeout:.0f}s)")
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--stage", stage],
            capture_output=True, text=True, timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        log(f"--- stage {stage}: killed at budget")
        return None
    sys.stderr.write(proc.stderr[-2000:])
    for line in reversed(proc.stdout.splitlines()):
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    log(f"--- stage {stage}: no result (rc={proc.returncode})")
    return None


def main():
    t0 = time.time()
    results = []
    remaining = lambda: BUDGET - (time.time() - t0) - 10  # noqa: E731

    r = run_child("perstep", max(60, min(remaining(), 420)))
    if r:
        results.append(r)
    if remaining() > 60:
        r = run_child("whole", remaining())
        if r:
            results.append(r)

    if not results:
        log("no stage completed within budget")
        raise SystemExit(1)
    best = min(results, key=lambda r: r["sec"])
    value = N / best["sec"]
    print(json.dumps({
        "metric": f"bn254_pairings_aggregated_per_sec_n{N}",
        "value": round(value, 3),
        "unit": "pairings/s",
        "vs_baseline": round(value / BASELINE_PAIRINGS_PER_SEC, 3),
    }), flush=True)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--stage":
        run_stage(sys.argv[2])
    else:
        main()
