"""Bucket-MSM (Pippenger semantics anchor) differentials — own file for
xdist load balancing (the two tests compile ~550s of scan windows).
"""

import numpy as np
import jax.numpy as jnp

from sipp_tpu import hostref as H, params
from sipp_tpu import curves as C
from sipp_tpu.utils.testing import random_points

import pytest


def _bits_short(ks, nbits):
    """(nbits, n) MSB-first bit matrix for small test scalars (keeps the
    bucket windows' compile + run cost CI-sized; msm_bucket is bit-width
    generic)."""
    return jnp.asarray(
        np.array([[(k >> (nbits - 1 - i)) & 1 for k in ks]
                  for i in range(nbits)], dtype=np.uint32))



def test_msm_bucket_g1(rng):
    """Bucket MSM == ladder MSM == host oracle (incl. duplicate digits and a
    zero scalar).  12-bit scalars / c=4: three full windows, real collisions,
    CI-budget compile (the 254-bit variant differs only in scan length)."""
    from sipp_tpu.ops.msm import msm_bucket_g1, msm_g1

    n = 6
    A, _ = random_points(n, seed=47)
    ks = [int(rng.integers(1 << 12)) for _ in range(n - 1)] + [0]
    bits = _bits_short(ks, 12)
    got = C.g1_decode(C.G1.to_affine(msm_bucket_g1(C.g1_encode(A), bits, c=4)[None]))[0]
    ladder = C.g1_decode(C.G1.to_affine(msm_g1(C.g1_encode(A), bits)[None]))[0]
    want = None
    for p, k in zip(A, ks):
        want = H.g1_add(want, H.g1_mul(p, k))
    assert got == want
    assert ladder == want  # bucket == ladder differential (same element)


def test_msm_bucket_g2(rng):
    from sipp_tpu.ops.msm import msm_bucket_g2

    n = 3
    _, B = random_points(n, seed=53)
    ks = [int(rng.integers(1 << 12)) for _ in range(n)]
    got = C.g2_decode(C.G2.to_affine(
        msm_bucket_g2(C.g2_encode(B), _bits_short(ks, 12), c=4)[None]))
    want = None
    for p, k in zip(B, ks):
        want = H.g2_add(want, H.g2_mul(p, k))
    assert got == [want]
