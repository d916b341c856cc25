"""Benchmark: BN254 pairing aggregation throughput (SIPP inner product).

Measures the BASELINE.md config-2 workload — n=128 pairing aggregation on a
single chip: one batched Miller loop over 128 lanes, the Fq12 product tree,
and one final exponentiation (the device compute of a SIPP round).

Baseline: the reference's published number is 145.04 s to aggregate 128
pairings via its verifier-SNARK path on an M1 MacBook Pro
(/root/reference/README.md:38-40; BASELINE.md) = 0.8826 pairings/s.

Prints JSON lines as results land; the LAST line is always the headline
n=128 metric {"metric", "value", "unit", "vs_baseline"} (plus
"prove_s"/"verify_s" wall-clock extras when the budget allowed the protocol
stage).  An n=4096 line (BASELINE config 4) is emitted before it when that
chained stage completes.  Diagnostics go to stderr.

Cold-start discipline (round-1/2 failure mode: the whole-loop Mosaic kernel
can take 20+ min to compile through a slow tunnel, and twice the flagship
stage died in that warmup).  Strategy:

  * stage children run CONCURRENTLY as subprocesses (compiles happen on the
    tunnel server; children overlap compile waits, not chip time):
      "whole":   the whole-loop fused kernel — the flagship path; launched
                 FIRST, compiles in seconds when the persistent compile
                 cache is warm (sipp_tpu.jaxcfg);
      "perstep": per-step fused Pallas Miller + host C++ final exp;
      "cpu":     hermetic CPU fallback so SOME number always lands;
  * the parent prints a JSON line AS SOON AS the first stage reports, then
    upgrades it if a faster stage lands before the budget
    (SIPP_BENCH_BUDGET, default 520 s);
  * once the TPU stages settle, two chained stages use the remaining budget:
    "protocol" (full prove/verify wall-clock, reference
    verifier_native.rs:14-85) and "whole" at BENCH_N=4096 (config 4).

Exit 0 iff at least one stage produced a measurement.
"""

import json
import os
import subprocess
import sys
import time

N = int(os.environ.get("BENCH_N", "128"))
BASELINE_PAIRINGS_PER_SEC = 128.0 / 145.043526708
# Self-budget: with a warm persistent cache every stage lands in ~2 min; the
# headroom exists for a cold cache, where the tunnel compiles the whole-loop
# program in 5-37 min (day-variable; scratch/r3_batch logs).  The driver's
# own external timeout measured ~2400 s (BENCH_r01-r03 all rc=124), so the
# self-budget sits BELOW it: bench.py must reach its own final-emit path
# (kill children, flush protocol extras, selftest) rather than die mid-loop.
# JSON lines stream as stages land, so an external kill at any point still
# leaves the best result so far on stdout (the driver parses the last line).
BUDGET = float(os.environ.get("SIPP_BENCH_BUDGET", "2100"))
REPS = int(os.environ.get("BENCH_REPS", "10"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# --------------------------------------------------------------- child mode

def run_stage(stage: str):
    import jax
    import jax.numpy as jnp

    log(f"[{stage}] devices: {jax.devices()}")
    from sipp_tpu.pairing import ate as pp
    from sipp_tpu.utils.testing import random_instance

    a, b = random_instance(N, seed=1177)
    on_tpu = jax.default_backend() == "tpu"

    # Every measured call gets input bytes the device has NEVER executed
    # before: the remote axon runtime can dedup repeated (program, input)
    # executions, which made a same-input timing loop report dispatch cost
    # (0.05 ms "per aggregation") instead of compute.  Rolling the lane axis
    # keeps the instance valid and the program identical while changing the
    # buffers; the shift is a traced argument so this is ONE tiny program.
    _roll = jax.jit(lambda x, y, i: (jnp.roll(x, i, 0), jnp.roll(y, i, 0)))
    # distinct-inputs guarantee: jnp.roll wraps mod N, so REPS >= N would
    # silently reuse inputs and re-admit the runtime dedup artifact this
    # scheme defeats (ADVICE r3)
    assert REPS < N, f"BENCH_REPS={REPS} must be < BENCH_N={N}"

    def fresh_instances(k):
        return jax.block_until_ready([_roll(a, b, i + 1) for i in range(k)])

    if stage == "protocol":
        from sipp_tpu.protocol import sipp_verify
        from sipp_tpu.protocol.prover import sipp_prove, sipp_prove_onchip

        # on-chip prover (round 5): the whole fold recursion is device-
        # resident — per-round dispatches of ONE shared program, zero host
        # syncs (prover.py sipp_prove_onchip).  The round-4 host-spine
        # prover paid a tunnel round trip + host hash per round (0.40 s at
        # n=128 vs the ~0.1 s the rounds actually compute).  Fallback:
        # SIPP_BENCH_PROVER=host restores the host-spine path.
        use_onchip = (on_tpu and
                      os.environ.get("SIPP_BENCH_PROVER", "onchip") == "onchip")
        prove = sipp_prove_onchip if use_onchip else sipp_prove
        t = time.time()
        proof = prove(a, b)
        jax.block_until_ready(proof)
        log(f"[protocol] prove warmup (compile) {time.time()-t:.1f}s "
            f"({'onchip' if use_onchip else 'host-spine'})")
        (a2, b2), = fresh_instances(1)
        t = time.time()
        proof2 = prove(a2, b2)
        jax.block_until_ready(proof2)
        prove_s = time.time() - t
        # per-fold-round latency (the second half of the BASELINE.json
        # metric string): every fixed-width round dispatched AND blocked
        # individually on a fresh instance; report the median
        fold_ms = None
        if use_onchip:
            (a3, b3), = jax.block_until_ready([_roll(a, b, REPS + 1)])
            rt = []
            jax.block_until_ready(sipp_prove_onchip(a3, b3, round_times=rt))
            if rt:
                fold_ms = sorted(rt)[len(rt) // 2] * 1000.0
                log(f"[protocol] fold rounds (ms): "
                    f"{[round(x * 1000, 2) for x in rt]}")
        sipp_verify(a, b, proof)
        t = time.time()
        sipp_verify(a2, b2, proof2)
        verify_s = time.time() - t
        log(f"[protocol] prove {prove_s:.3f}s verify {verify_s:.3f}s at n={N}")
        res = {"stage": stage, "prove_s": round(prove_s, 3),
               "verify_s": round(verify_s, 3)}
        if fold_ms is not None:
            res["fold_round_latency_ms"] = round(fold_ms, 3)
        print("RESULT " + json.dumps(res), flush=True)
        return
    elif stage == "xla" or not on_tpu:
        # no Mosaic kernels at all — the cheapest program to compile through
        # a slow tunnel (and the CPU fallback for every stage name)
        def agg(x, y):
            return pp.final_exp_host(pp._miller_product(x, y))
    elif stage == "perstep":
        def agg(x, y):
            return pp.final_exp_host(
                pp._product_tree(pp.miller_loop_fused(x, y)))
    elif stage == "whole":
        def agg(x, y):
            return pp._inner_z_fused(x, y, None)
    else:
        raise SystemExit(f"unknown stage {stage}")

    t = time.time()
    z = agg(a, b)
    jax.block_until_ready(z)
    log(f"[{stage}] warmup (compile) {time.time()-t:.1f}s")
    # digest of the warmup aggregation (same seed-1177 instance in every
    # stage): the parent cross-checks fused-TPU == per-step == hermetic-CPU
    # bit-exactly, so kernel correctness on REAL hardware rides the driver
    # artifact every round (VERDICT r3 next-6)
    import hashlib
    import numpy as np
    dig = hashlib.sha256(
        np.asarray(jax.device_get(z)).tobytes()).hexdigest()[:16]

    insts = fresh_instances(REPS)
    t = time.time()
    for x, y in insts:
        z = agg(x, y)
    jax.block_until_ready(z)
    dt = (time.time() - t) / REPS
    log(f"[{stage}] steady state: {dt*1000:.1f} ms per n={N} aggregation")
    print("RESULT " + json.dumps(
        {"stage": stage, "sec": dt, "n": N, "digest": dig,
         "backend": jax.default_backend()}),
        flush=True)


# -------------------------------------------------------------- parent mode

class Child:
    def __init__(self, stage: str, force_cpu: bool = False, env_extra=None,
                 name: str = None):
        self.stage = stage
        self.name = name or stage
        self.err = open(f"/tmp/bench_{self.name}.err", "w+")
        env = dict(os.environ)
        if force_cpu:
            # hermetic CPU: the axon plugin on PYTHONPATH can hang CPU runs,
            # and a dead tunnel hangs device discovery entirely
            env["JAX_PLATFORMS"] = "cpu"
            env["PYTHONPATH"] = ""
            env["BENCH_REPS"] = "2"
        if env_extra:
            env.update(env_extra)
        self.proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--stage", stage],
            stdout=subprocess.PIPE, stderr=self.err, text=True, env=env)
        self.result = None
        self.done = False

    def _stderr_tail(self) -> str:
        if self.err.closed:
            return ""
        self.err.seek(0)
        tail = self.err.read()[-1500:]
        self.err.close()
        return tail

    def poll(self):
        if self.done or self.proc.poll() is None:
            return
        self.done = True
        for line in (self.proc.stdout.read() or "").splitlines():
            if line.startswith("RESULT "):
                self.result = json.loads(line[len("RESULT "):])
        log(f"--- stage {self.name}: rc={self.proc.returncode} "
            f"result={self.result}\n{self._stderr_tail()}")

    def kill(self):
        if self.proc.poll() is None:
            self.proc.kill()
            self.proc.wait()
            self.done = True
            log(f"--- stage {self.name}: killed at budget")
            log(f"--- stage {self.name} stderr tail:\n{self._stderr_tail()}")


def emit(best, extra=None, n=N):
    value = n / best["sec"]
    line = {
        "metric": f"bn254_pairings_aggregated_per_sec_n{n}",
        "value": round(value, 3),
        "unit": "pairings/s",
        "vs_baseline": round(value / BASELINE_PAIRINGS_PER_SEC, 3),
        "backend": best.get("backend", "tpu"),
    }
    if extra:
        line.update(extra)
    print(json.dumps(line), flush=True)


def main():
    t0 = time.time()
    remaining = lambda: BUDGET - (time.time() - t0)  # noqa: E731
    # flagship stage FIRST so a cold tunnel spends its compile bandwidth there
    children = [Child("whole"), Child("perstep"), Child("cpu", force_cpu=True)]
    log(f"--- stages whole+perstep+cpu launched (budget {BUDGET:.0f}s)")

    best = None
    protocol = None
    big = None
    printed_sec = None
    while remaining() > 5:
        time.sleep(2)
        for c in children:
            c.poll()
        agg = [c.result for c in children
               if c.result is not None and c.result.get("n") == N]
        if agg:
            cand = min(agg, key=lambda r: r["sec"])
            if printed_sec is None or cand["sec"] < printed_sec:
                best = cand
                printed_sec = cand["sec"]
                emit(best)
        # chain prove/verify wall-clock + the n=4096 config-4 stage once the
        # two TPU stages settle (the CPU child may still grind; don't wait)
        if (best is not None and protocol is None and remaining() > 90
                and all(c.done for c in children[:2])):
            protocol = Child("protocol")
            big = Child("whole", env_extra={"BENCH_N": "4096",
                                            "BENCH_REPS": "4"},
                        name="whole4096")
            children += [protocol, big]
            log(f"--- stages protocol+whole4096 launched "
                f"({remaining():.0f}s left)")
        if big is not None and big.result and big.result.get("n") == 4096:
            emit(big.result, n=4096)
            big = None  # emit once
        if all(c.done for c in children):
            break

    for c in children:
        c.kill()
        c.poll()
    if big is not None and big.result and big.result.get("n") == 4096:
        emit(big.result, n=4096)

    if best is None:
        log("no stage completed within budget")
        raise SystemExit(1)
    # cross-engine selftest: every n=N stage aggregates the SAME instance
    # through an independent engine (fused TPU kernels / per-step kernels +
    # host C++ final exp / hermetic XLA:CPU); bit-equal digests assert
    # whole-kernel correctness on real hardware in the driver artifact
    digs = {c.name: c.result["digest"] for c in children
            if c.result and c.result.get("n") == N and "digest" in c.result}
    selftest = None
    if len(digs) >= 2:
        selftest = len(set(digs.values())) == 1
        print(json.dumps(
            {"selftest": "aggregation engines bit-equal", "ok": selftest,
             "engines": sorted(digs)}), flush=True)
    # final line = the headline n=128 metric (the driver parses the LAST line)
    extra = {}
    if protocol is not None and protocol.result:
        extra = {k: v for k, v in protocol.result.items()
                 if k not in ("stage", "digest")}
        if "fold_round_latency_ms" in extra:
            print(json.dumps(
                {"metric": f"fold_round_latency_ms_n{N}",
                 "value": extra["fold_round_latency_ms"], "unit": "ms"}),
                flush=True)
    if selftest is not None:
        extra["selftest_ok"] = selftest
    emit(best, extra=extra or None)
    return


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--stage":
        run_stage(sys.argv[2])
    else:
        main()
