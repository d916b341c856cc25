"""Per-op LATENCY probe for the serial (B=1) final-exp regime on real TPU.

The fexp critical path is ~470 dependent mul-stages (Fermat inversion chain
+ 3 x-power chains + tape); at the measured ~3 ms that's ~6.4 us/stage.
Each stage is one tmul.mul: CIOS with 16 SERIAL limb iterations (the
accumulator/m dependency).  The unused _mul_impl_sos does 3 independent
product passes whose column sums have no cross-iteration dependency — if
Mosaic schedules them shallower, serial chains get proportionally faster
(value-identical: same canonical Montgomery output).

Kernels (all fori_loop bodies -> tiny IR, fast tunnel compiles):
  mulchain_cios : K dependent t.mul          (the production mul)
  mulchain_sos  : K dependent t._mul_impl_sos
  cyclochain    : K dependent fq12_cyclo_sqr (B=1, the x-chain step)
  fq12chain     : K dependent fq12_mul       (B=1, the tape step)

Usage: python scratch/r4_latency_probe.py   (axon TPU)
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
from sipp_tpu.ops import pallas_fexp as PF

L = FQ.L
K = 256
OUT = "/tmp/r4_latency_results.json"
RES = {}


def save(k, v):
    RES[k] = v
    with open(OUT, "w") as f:
        json.dump(RES, f, indent=1)
    print(f"RESULT {k} = {v}", flush=True)


def chain_kernel(body, lat=False):
    import sipp_tpu.ops.tmul_lat as lt

    def kern(c_ref, x_ref, o_ref):
        ctx = lt.bound_consts(c_ref[:]) if lat else t.bound_consts(c_ref[:])
        with ctx:
            o_ref[:] = jax.lax.fori_loop(
                0, K, lambda i, v: body(v), x_ref[:])
    return kern


@functools.partial(jax.jit, static_argnums=(0,))
def run(name, x):
    import sipp_tpu.ops.tmul_lat as lt

    body = {
        "mulchain_cios": lambda v: t.mul(v, v),
        "mulchain_sos": lambda v: t._mul_impl_sos(v, v),
        "cyclochain": PF.fq12_cyclo_sqr,
        "fq12chain": lambda v: PF.fq12_mul(v, v),
        # tmul_lat flat-expansion forms (L=17 domain inputs)
        "lat_cyclochain": lt.fq12_cyclo_sqr,
        "lat_fq12chain": lambda v: lt.fq12_mul(v, v),
        "lat_mulchain": lambda v: lt.mul(v, v),
    }[name]
    lat = name.startswith("lat_")
    consts = lt.CONSTS_NP if lat else t.CONSTS_NP
    return pl.pallas_call(
        chain_kernel(body, lat),
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
    us = (time.time() - tt) / reps / K * 1e6
    save(name + "_us_per_op", round(us, 3))


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(5)
    xs = [int.from_bytes(rng.bytes(40), "little") % FQ.p for _ in range(12)]
    fq1 = jnp.asarray(np.asarray(
        jax.device_get(FQ.encode(xs[:1])).reshape(L, 1)))
    f12 = jnp.transpose(FQ.encode(xs).reshape(1, 2, 3, 2, L), (1, 2, 3, 4, 0))
    # L17-domain inputs: zero-extend one limb (value < p: already "clean")
    z1 = jnp.zeros((1, 1), jnp.uint32)
    fq1_17 = jnp.concatenate([fq1, z1], axis=0)
    z12 = jnp.zeros((2, 3, 2, 1, 1), jnp.uint32)
    f12_17 = jnp.concatenate([f12, z12], axis=-2)
    for name, x in [("mulchain_cios", fq1), ("mulchain_sos", fq1),
                    ("cyclochain", f12), ("fq12chain", f12),
                    ("lat_mulchain", fq1_17),
                    ("lat_cyclochain", f12_17),
                    ("lat_fq12chain", f12_17)]:
        try:
            timeit(name, x)
        except Exception as e:
            save(name + "_error", f"{type(e).__name__}: {e}"[:300])


if __name__ == "__main__":
    main()
