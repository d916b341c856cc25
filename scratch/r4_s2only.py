"""Warm + measure ONLY the protocol stage (fresh process: picks up the
two-B=1-final-exp round program).  Results to /tmp/r4_s2only.json."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

RES = {}


def save(k, v):
    RES[k] = v
    with open("/tmp/r4_s2only.json", "w") as f:
        json.dump(RES, f, indent=1)
    print(f"RESULT {k} = {v}", flush=True)


print("devices:", jax.devices(), flush=True)
from sipp_tpu.protocol import sipp_verify
from sipp_tpu.protocol.prover import sipp_prove
from sipp_tpu.utils.testing import random_instance

A, B = random_instance(128, seed=1177)
_roll = jax.jit(lambda x, y, i: (jnp.roll(x, i, 0), jnp.roll(y, i, 0)))

t = time.time()
proof = sipp_prove(A, B)
jax.block_until_ready(proof)
save("prove_compile_s", round(time.time() - t, 1))
a2, b2 = jax.block_until_ready(_roll(A, B, 7))
t = time.time()
proof2 = sipp_prove(a2, b2)
jax.block_until_ready(proof2)
save("prove_s", round(time.time() - t, 3))
t = time.time()
sipp_verify(A, B, proof)
save("verify_compile_s", round(time.time() - t, 1))
t = time.time()
sipp_verify(a2, b2, proof2)
save("verify_s", round(time.time() - t, 3))
print("DONE", flush=True)
