"""Differential tests: JAX G1/G2 Jacobian kernels vs the host oracle."""

import numpy as np

from sipp_tpu import hostref as H, params
from sipp_tpu import curves as C


def rand_scalar(rng):
    return int.from_bytes(rng.bytes(40), "little") % params.R


def rand_g1(rng, n):
    return [H.g1_mul(params.G1_GEN, rand_scalar(rng)) for _ in range(n)]


def rand_g2(rng, n):
    return [H.g2_mul(params.G2_GEN, rand_scalar(rng)) for _ in range(n)]


def test_g1_dbl_add(rng):
    pts = rand_g1(rng, 4)
    qts = rand_g1(rng, 4)
    p = C.G1.jac_from_affine(C.g1_encode(pts))
    q_aff = C.g1_encode(qts)
    got = C.g1_decode(C.G1.to_affine(C.G1.dbl(p)))
    assert got == [H.g1_add(x, x) for x in pts]
    got = C.g1_decode(C.G1.to_affine(C.G1.add_mixed(p, q_aff)))
    assert got == [H.g1_add(x, y) for x, y in zip(pts, qts)]
    # jac+jac
    q = C.G1.jac_from_affine(q_aff)
    got = C.g1_decode(C.G1.to_affine(C.G1.add(C.G1.dbl(p), q)))
    assert got == [H.g1_add(H.g1_add(x, x), y) for x, y in zip(pts, qts)]


def test_g1_edge_cases(rng):
    pts = rand_g1(rng, 3)
    p_aff = C.g1_encode(pts)
    p = C.G1.jac_from_affine(p_aff)
    inf = C.G1.jac_infinity((3,))
    # inf + Q = Q
    assert C.g1_decode(C.G1.to_affine(C.G1.add_mixed(inf, p_aff))) == pts
    # P + P (mixed, doubling case)
    assert C.g1_decode(C.G1.to_affine(C.G1.add_mixed(p, p_aff))) == [
        H.g1_add(x, x) for x in pts
    ]
    # P + (-P) = inf
    neg = C.G1.neg(p_aff)
    got = C.g1_decode(C.G1.to_affine(C.G1.add_mixed(p, neg)))
    assert got == [None] * 3
    # jac: inf + inf
    assert C.g1_decode(C.G1.to_affine(C.G1.add(inf, inf))) == [None] * 3
    # dbl(inf)
    assert C.g1_decode(C.G1.to_affine(C.G1.dbl(inf))) == [None] * 3


def test_g1_scalar_mul(rng):
    pts = rand_g1(rng, 2)
    p_aff = C.g1_encode(pts)
    for k in [1, 2, 3, 5, rand_scalar(rng), params.R - 1]:
        bits = C.scalar_to_bits(k)
        got = C.g1_decode(C.G1.to_affine(C.G1.scalar_mul(p_aff, bits)))
        assert got == [H.g1_mul(x, k) for x in pts], f"k={k}"


def test_g1_fold(rng):
    a1 = rand_g1(rng, 3)
    a2 = rand_g1(rng, 3)
    x = rand_scalar(rng)
    got = C.g1_decode(
        C.G1.to_affine(C.G1.fold(C.g1_encode(a1), C.g1_encode(a2), C.scalar_to_bits(x)))
    )
    assert got == [H.g1_add(p, H.g1_mul(q, x)) for p, q in zip(a1, a2)]


def test_g2_ops(rng):
    pts = rand_g2(rng, 2)
    qts = rand_g2(rng, 2)
    p = C.G2.jac_from_affine(C.g2_encode(pts))
    q_aff = C.g2_encode(qts)
    assert C.g2_decode(C.G2.to_affine(C.G2.dbl(p))) == [H.g2_add(x, x) for x in pts]
    assert C.g2_decode(C.G2.to_affine(C.G2.add_mixed(p, q_aff))) == [
        H.g2_add(x, y) for x, y in zip(pts, qts)
    ]
    k = rand_scalar(rng)
    got = C.g2_decode(C.G2.to_affine(C.G2.scalar_mul(q_aff, C.scalar_to_bits(k))))
    assert got == [H.g2_mul(x, k) for x in qts]


def test_g2_fold(rng):
    b1 = rand_g2(rng, 2)
    b2 = rand_g2(rng, 2)
    x = rand_scalar(rng)
    got = C.g2_decode(
        C.G2.to_affine(C.G2.fold(C.g2_encode(b1), C.g2_encode(b2), C.scalar_to_bits(x)))
    )
    assert got == [H.g2_add(p, H.g2_mul(q, x)) for p, q in zip(b1, b2)]
