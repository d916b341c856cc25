"""Cost-model probe: stacked Montgomery-mul throughput vs stack width, and
whole-loop Miller kernel scaling vs lane count.  Decides ALU- vs VMEM-bound."""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(*a):
    print(*a, flush=True)


from sipp_tpu.ops import tmul as t
from sipp_tpu.fields import FQ

L = FQ.L
REPS_IN_KERNEL = 50  # chain length inside the kernel (dependent muls)


def _probe_kernel(c_ref, a_ref, b_ref, o_ref):
    with t.bound_consts(c_ref[:]):
        a = a_ref[:]
        b = b_ref[:]

        def body(i, a):
            return t.mul(a, b)

        o_ref[:] = jax.lax.fori_loop(0, REPS_IN_KERNEL, body, a)


@functools.partial(jax.jit, static_argnums=())
def probe(a, b):
    return pl.pallas_call(
        _probe_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(a.shape, jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(jnp.asarray(t.CONSTS_NP), a, b)


def timed(fn, reps=10):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


log("devices:", jax.devices())
rng = np.random.default_rng(7)

B = 128
for S in (1, 3, 6, 12, 18, 36, 45, 90):
    a = jnp.asarray(rng.integers(0, 1 << 16, (S, L, B)), jnp.uint32)
    b = jnp.asarray(rng.integers(0, 1 << 16, (S, L, B)), jnp.uint32)
    dt = timed(lambda: probe(a, b))
    per = dt / REPS_IN_KERNEL
    log(f"S={S:3d} B={B}: {per*1e9:8.0f} ns/stacked-mul "
        f"({per/S*1e9:7.1f} ns/unit, {S*B/per/1e6:8.1f} Mmul/s)")

# lane scaling of the whole-loop kernel
from sipp_tpu.ops.pallas_miller import miller_product_fused
from sipp_tpu.utils.testing import random_instance

for BB in (32, 64, 128):
    a, b = random_instance(BB, seed=5)
    dt = timed(lambda: miller_product_fused(a, b), reps=5)
    log(f"miller_product_fused B={BB}: {dt*1e3:8.2f} ms")

log("probe done")
