"""Minimal standalone Pallas kernel for the batched Fq limb multiply.

SUPERSEDED as the production layout: this batch-on-sublanes form hits a
Mosaic `tpu.concatenate` offset-layout bug on lane-axis concatenation, so
the production kernels use the TRANSPOSED limbs-on-sublanes layout of
ops/tmul.py (which needs no lane concatenation and utilizes the VPU
better); fields/fp.py documents the remaining Mosaic-safe rewrites
(prepadded-constant add, Kogge-Stone carries with rolls).

Kept as the self-contained one-op kernel exemplar and the first
interpret-mode differential in tests/test_pallas.py (the exact
Fp._mul_impl algorithm inside a pallas_call with explicit VMEM tiling).
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

    def kernel(a_ref, b_ref, p_ref, np_ref, rpf_ref, out_ref):
        out_ref[:] = FQ._mul_impl(
            a_ref[:], b_ref[:],
            consts=(p_ref[0], np_ref[0], rpf_ref[0]),
        )

    import numpy as np

    const_spec = pl.BlockSpec((1, L), lambda i: (0, 0), memory_space=pltpu.VMEM)
    const2_spec = pl.BlockSpec((1, 2 * L), lambda i: (0, 0), memory_space=pltpu.VMEM)
    rp_full = jnp.concatenate(
        [jnp.zeros((L,), jnp.uint32), FQ.rp_arr])[None]
    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(B, tile),),
        in_specs=[
            pl.BlockSpec((tile, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            const_spec, const_spec, const2_spec,
        ],
        out_specs=pl.BlockSpec((tile, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L), jnp.uint32),
        interpret=interpret,
    )(a, b, FQ.p_arr[None], jnp.asarray(FQ.np_arr_np)[None], rp_full)


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
