"""Round-5 groundwork: THROUGHPUT probe of the L16 vs L17 Fq2 multiply at
Miller-kernel batch (128 lanes), plus the add/normalization patterns.

The Miller loop is now ~6.5 of the 8.3 ms flagship; its step body is ~45
stacked fq2 multiplies + ~60 add/norm ops at full lanes (work-bound, not
latency-bound).  If the lazy-column forms do less WORK per op here, the
round-5 port of dbl/add/mul_line to tmul_lat is justified.

Chains run K dependent ops at (2, L, 128) / (2, NL, 128); per-op time is
work-dominated at full lanes.  Usage: python scratch/r5_miller_block_probe.py
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sipp_tpu.fields import FQ
from sipp_tpu.ops import tmul as t
from sipp_tpu.ops import tmul_lat as lt

L = FQ.L
K = 64
B = 128
OUT = "/tmp/r5_miller_block.json"
RES = {}


def save(k, v):
    RES[k] = v
    with open(OUT, "w") as f:
        json.dump(RES, f, indent=1)
    print(f"RESULT {k} = {v}", flush=True)


def kern(body, lat):
    def k_(c_ref, x_ref, o_ref):
        ctx = lt.bound_consts(c_ref[:]) if lat else t.bound_consts(c_ref[:])
        with ctx:
            o_ref[:] = jax.lax.fori_loop(0, K, lambda i, v: body(v), x_ref[:])
    return k_


@functools.partial(jax.jit, static_argnums=(0,))
def run(name, x):
    body = {
        # L16 production: karatsuba fq2 mul (1 stacked CIOS + ~4 norms)
        "fq2_l16": lambda v: t.fq2_mul(v, v),
        # L17 flat: 1 stacked norm + 1 stacked SOS + 1 canon
        "fq2_l17": lambda v: lt.fq2_mul(v, v),
        # add/normalization pattern comparison at full lanes
        "add_l16": lambda v: t.add(t.double(v), v),
        "xi_l16": t.fq2_mul_xi,
        "xi_l17": lambda v: lt.fq2_mul_xi(v),
    }[name]
    lat = name.endswith("l17")
    consts = lt.CONSTS_NP if lat else t.CONSTS_NP
    return pl.pallas_call(
        kern(body, lat),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(jnp.asarray(consts), x)


def timeit(name, x, reps=30):
    tt = time.time()
    z = run(name, x)
    jax.block_until_ready(z)
    print(f"[{name}] warmup {time.time()-tt:.1f}s", flush=True)
    tt = time.time()
    for _ in range(reps):
        z = run(name, x)
    jax.block_until_ready(z)
    save(name + "_us_per_op", round((time.time() - tt) / reps / K * 1e6, 3))


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(9)
    xs = [int.from_bytes(rng.bytes(40), "little") % FQ.p
          for _ in range(2 * B)]
    a16 = jnp.transpose(FQ.encode(xs).reshape(B, 2, L), (1, 2, 0))
    z = jnp.zeros((2, 1, B), jnp.uint32)
    a17 = jnp.concatenate([a16, z], axis=-2)
    fq16 = a16[0]
    for name, x in [("fq2_l16", a16), ("fq2_l17", a17),
                    ("add_l16", fq16), ("xi_l16", a16), ("xi_l17", a17)]:
        try:
            timeit(name, x)
        except Exception as e:
            save(name + "_error", f"{type(e).__name__}: {e}"[:300])


if __name__ == "__main__":
    main()
