"""Tests for the per-lane exp kernels (starky statement replacements, D7/D8)."""

import numpy as np
import jax.numpy as jnp

from sipp_tpu import hostref as H, params
from sipp_tpu import curves as C
from sipp_tpu.fields import tower as T
from sipp_tpu.utils.testing import random_points


def _bits_per_lane(ks):
    return jnp.stack([C.scalar_to_bits(k) for k in ks], axis=-1)  # (254, n)


def test_g1_exp_with_offset(rng):
    n = 3
    X, _ = random_points(n, seed=21)
    O, _ = random_points(n, seed=22)
    ks = [int.from_bytes(rng.bytes(40), "little") % params.R for _ in range(n)]
    got = C.g1_decode(
        C.G1.to_affine(
            C.G1.exp_with_offset(C.g1_encode(X), C.g1_encode(O), _bits_per_lane(ks))
        )
    )
    want = [H.g1_add(o, H.g1_mul(x, k)) for x, o, k in zip(X, O, ks)]
    assert got == want


def test_g2_exp_with_offset(rng):
    n = 2
    _, X = random_points(n, seed=23)
    _, O = random_points(n, seed=24)
    ks = [int.from_bytes(rng.bytes(40), "little") % params.R for _ in range(n)]
    got = C.g2_decode(
        C.G2.to_affine(
            C.G2.exp_with_offset(C.g2_encode(X), C.g2_encode(O), _bits_per_lane(ks))
        )
    )
    want = [H.g2_add(o, H.g2_mul(x, k)) for x, o, k in zip(X, O, ks)]
    assert got == want


def test_fq12_exp_with_offset(rng):
    n = 2
    A, B = random_points(n, seed=25)
    xs = [H.pairing(p, q) for p, q in zip(A, B)]
    offs = [H.pairing(q_, p_) for q_, p_ in zip(A, list(reversed(B)))]
    ks = [int.from_bytes(rng.bytes(40), "little") % params.R for _ in range(n)]
    got = T.fq12_decode(
        T.fq12_exp_with_offset(
            T.fq12_encode(xs), T.fq12_encode(offs), _bits_per_lane(ks)
        )
    )
    want = [H.fq12_mul(o, H.fq12_pow(x, k)) for x, o, k in zip(xs, offs, ks)]
    assert got == want
