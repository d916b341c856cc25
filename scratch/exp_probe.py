"""Validate + time the fused per-lane exp kernels (ops/pallas_exp.py) on TPU.

1. Bit-correctness at B=4 vs the pure-Python host oracle (no XLA-scan
   compiles needed).
2. Perf at B=128 vs the XLA per-lane scan path (the VERDICT task-6 '>=10x'
   comparison) — compiles the scan paths too, so run in background.
"""

import time
import sys

t0 = time.time()


def log(*a):
    print(f"[{time.time()-t0:7.1f}s]", *a, flush=True)


import jax
import jax.numpy as jnp
import numpy as np

log("backend", jax.default_backend())

from sipp_tpu import curves as C, hostref as H, params
from sipp_tpu.fields import tower as T
from sipp_tpu.ops import pallas_exp as PE
from sipp_tpu.utils.testing import random_points

rng = np.random.default_rng(1177)


def bits_of(ks):
    return jnp.stack([C.scalar_to_bits(k) for k in ks], axis=-1)


def rand_ks(n):
    return [int.from_bytes(rng.bytes(40), "little") % params.R
            for _ in range(n)]


# ---------------- correctness at B=4 vs host oracle ----------------------
B = 4
A, Bg2 = random_points(2 * B, seed=71)
xs, offs = A[:B], A[B:]
ks = rand_ks(B)
got = C.g1_decode(PE.exp_g1_fused(C.g1_encode(xs), C.g1_encode(offs),
                                  bits_of(ks)))
want = [H.g1_add(o, H.g1_mul(x, k)) for x, o, k in zip(xs, offs, ks)]
assert got == want, f"exp_g1_fused mismatch\n{got}\n{want}"
log("exp_g1_fused B=4 == host oracle")

xs2, offs2 = Bg2[:B], Bg2[B:]
ks2 = rand_ks(B)
got = C.g2_decode(PE.exp_g2_fused(C.g2_encode(xs2), C.g2_encode(offs2),
                                  bits_of(ks2)))
want = [H.g2_add(o, H.g2_mul(x, k)) for x, o, k in zip(xs2, offs2, ks2)]
assert got == want, "exp_g2_fused mismatch"
log("exp_g2_fused B=4 == host oracle")

fx = [H.pairing(a, b) for a, b in zip(A[:B], Bg2[:B])]
fo = [H.pairing(a, b) for a, b in zip(A[B:], Bg2[B:])]
ks3 = rand_ks(B)
got = T.fq12_decode(PE.fq12_exp_fused(
    jnp.stack([T.fq12_encode(v) for v in fx]), jnp.stack([T.fq12_encode(v) for v in fo]), bits_of(ks3)))
want = [H.fq12_mul(o, H.fq12_pow(x, k)) for x, o, k in zip(fx, fo, ks3)]
assert got == want, "fq12_exp_fused mismatch"
log("fq12_exp_fused B=4 == host oracle")

# ---------------- perf at B=128 vs XLA scan -------------------------------
B = 128
A, Bg2 = random_points(2 * B, seed=72)
ks = rand_ks(B)
bits = bits_of(ks)
ag = C.g1_encode(A[:B]); og = C.g1_encode(A[B:])


def timed(fn, reps=10):
    out = jax.block_until_ready(fn())
    t = time.time()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.time() - t) / reps


dt_fused = timed(lambda: PE.exp_g1_fused(ag, og, bits))
log(f"exp_g1_fused B=128: {dt_fused*1e3:.2f} ms")
dt_xla = timed(lambda: C.G1.to_affine(C.G1.exp_with_offset(ag, og, bits)))
log(f"XLA exp_with_offset G1 B=128: {dt_xla*1e3:.2f} ms "
    f"({dt_xla/dt_fused:.1f}x slower)")
same = np.array_equal(
    np.asarray(PE.exp_g1_fused(ag, og, bits)),
    np.asarray(C.G1.to_affine(C.G1.exp_with_offset(ag, og, bits))))
log("G1 fused == XLA:", same)

bg = C.g2_encode(Bg2[:B]); og2 = C.g2_encode(Bg2[B:])
dt_fused2 = timed(lambda: PE.exp_g2_fused(bg, og2, bits))
log(f"exp_g2_fused B=128: {dt_fused2*1e3:.2f} ms")
dt_xla2 = timed(lambda: C.G2.to_affine(C.G2.exp_with_offset(bg, og2, bits)))
log(f"XLA exp_with_offset G2 B=128: {dt_xla2*1e3:.2f} ms "
    f"({dt_xla2/dt_fused2:.1f}x slower)")

from sipp_tpu.pairing import ate as pp
fdev = pp.miller_loop_fused(ag, bg)
fdev2 = pp.miller_loop_fused(og, og2)
dt_fused3 = timed(lambda: PE.fq12_exp_fused(fdev, fdev2, bits))
log(f"fq12_exp_fused B=128: {dt_fused3*1e3:.2f} ms")
dt_xla3 = timed(lambda: T.fq12_exp_with_offset(fdev, fdev2, bits))
log(f"XLA fq12_exp_with_offset B=128: {dt_xla3*1e3:.2f} ms "
    f"({dt_xla3/dt_fused3:.1f}x slower)")
same3 = np.array_equal(
    np.asarray(PE.fq12_exp_fused(fdev, fdev2, bits)),
    np.asarray(T.fq12_exp_with_offset(fdev, fdev2, bits)))
log("fq12 fused == XLA:", same3)
log("ALL OK")
