"""Hand-written Pallas TPU kernels for batched Fq limb arithmetic.

The XLA path (fields/fp.py) already emits fused vectorized uint32 ops; these
kernels give explicit control of tiling and VMEM residency for the hot
batched multiply (BASELINE north star: limb arithmetic as hand-written
Pallas kernels).  `bench_compare()` measures both on the current backend;
the field layer can be pointed at the Pallas path via SIPP_TPU_USE_PALLAS=1
(see fields/fp.py callers) once it wins on the target chip.

Kernels run the same exact algorithm as Fp.mul (separated Montgomery with
lazy carries + carry-lookahead normalization), so all differential tests
apply unchanged.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import FQ


def _pick_tile(b: int) -> int:
    for t in (2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if b % t == 0:
            return t
    return b


@functools.partial(jax.jit, static_argnums=(2,))
def fq_mul_pallas(a, b, interpret: bool = False):
    """Batched Montgomery Fq multiply: (B, L) x (B, L) -> (B, L)."""
    assert a.shape == b.shape and a.ndim == 2
    B, L = a.shape
    tile = _pick_tile(B)

    def kernel(a_ref, b_ref, out_ref):
        out_ref[:] = FQ._mul_impl(a_ref[:], b_ref[:])

    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(B, tile),),
        in_specs=[
            pl.BlockSpec((tile, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L), jnp.uint32),
        interpret=interpret,
    )(a, b)


def bench_compare(batch: int = 4096, reps: int = 10):
    """Time XLA vs Pallas batched Fq mul on the current backend."""
    import time

    import numpy as np

    rng = np.random.default_rng(0)
    xs = [int.from_bytes(rng.bytes(31), "little") % FQ.p for _ in range(batch)]
    ys = [int.from_bytes(rng.bytes(31), "little") % FQ.p for _ in range(batch)]
    a, b = FQ.encode(xs), FQ.encode(ys)

    results = {}
    for name, fn in [("xla", FQ.mul), ("pallas", fq_mul_pallas)]:
        out = fn(a, b)
        out.block_until_ready()
        t0 = time.time()
        for _ in range(reps):
            out = fn(a, b)
        out.block_until_ready()
        dt = (time.time() - t0) / reps
        results[name] = dt
        print(f"{name}: {dt*1e6:.1f} us / {batch} muls "
              f"({batch/dt/1e6:.2f} M muls/s)")
    ok = bool(jnp.all(FQ.mul(a, b) == fq_mul_pallas(a, b)))
    print("pallas == xla:", ok)
    return results


if __name__ == "__main__":
    bench_compare()
