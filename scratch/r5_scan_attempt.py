"""LAST-TPU-ACTION probe (tunnel-hazard rule): compile the scanned on-chip
prover (`_rounds_onchip` — all fixed-width rounds as ONE device program,
zero per-round dispatches) and compare against the per-round path.

Round-3 history: the then-monolithic program exceeded 100 min of tunnel
compile.  Round-5 state: the identical round body compiles as the
per-round program in ~344 s, so the scan wrapper is plausibly affordable
now.  Run ONLY after the final driver-style bench dry run has landed.

nohup python scratch/r5_scan_attempt.py > /tmp/r5_scan.out 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

T0 = time.time()


def log(*a):
    print(f"[{time.time()-T0:7.1f}s]", *a, flush=True)


log("devices:", jax.devices())
assert jax.default_backend() == "tpu"

from sipp_tpu.protocol.prover import sipp_prove_onchip  # noqa: E402
from sipp_tpu.utils.testing import random_instance  # noqa: E402

a, b = random_instance(128, seed=1177)

t = time.time()
p_scan = sipp_prove_onchip(a, b, scan=True)
jax.block_until_ready(p_scan)
log(f"scan-variant compile+run {time.time()-t:.1f}s")

t = time.time()
p_scan2 = sipp_prove_onchip(a, b, scan=True)
jax.block_until_ready(p_scan2)
log(f"scan-variant warm prove {time.time()-t:.3f}s")

p_round = sipp_prove_onchip(a, b, scan=False)
log("bit-identical to per-round:",
    bool(np.array_equal(np.asarray(jax.device_get(p_scan)),
                        np.asarray(jax.device_get(p_round)))))
