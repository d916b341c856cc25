"""Differential tests: batched device pairing vs the host oracle."""

import numpy as np
import jax.numpy as jnp

from sipp_tpu import hostref as H, params
from sipp_tpu import curves as C
from sipp_tpu.fields import tower as T
from sipp_tpu.pairing import final_exp, inner_product, miller_loop, pairing
from sipp_tpu.pairing.ate import final_exp_naive
from sipp_tpu.utils.testing import random_points


def test_pairing_matches_oracle(rng):
    A, B = random_points(2, seed=11)
    got = T.fq12_decode(pairing(C.g1_encode(A), C.g2_encode(B)))
    assert got == [H.pairing(p, q) for p, q in zip(A, B)]


def test_pairing_bilinearity():
    # e(aP, bQ) == e(P, Q)^(ab)
    a, b = 7, 11
    P1 = [H.g1_mul(params.G1_GEN, a)]
    Q1 = [H.g2_mul(params.G2_GEN, b)]
    e1 = T.fq12_decode(pairing(C.g1_encode(P1), C.g2_encode(Q1)))[0]
    e0 = H.pairing(params.G1_GEN, params.G2_GEN)
    assert e1 == H.fq12_pow(e0, a * b)


def test_pairing_infinity():
    A = [params.G1_GEN, None]
    B = [None, params.G2_GEN]
    got = T.fq12_decode(pairing(C.g1_encode(A), C.g2_encode(B)))
    assert got == [H.FQ12_ONE, H.FQ12_ONE]


def test_final_exp_chain_vs_naive(rng):
    A, B = random_points(2, seed=13)
    f = miller_loop(C.g1_encode(A), C.g2_encode(B))
    fast = final_exp(f)
    naive = final_exp_naive(f)
    assert (np.asarray(fast) == np.asarray(naive)).all()


def test_cyclo_sqr_and_mul_line(rng):
    A, B = random_points(2, seed=19)
    es = [H.pairing(p, q) for p, q in zip(A, B)]  # cyclotomic elements
    g = T.fq12_encode(es)
    assert (np.asarray(T.fq12_cyclo_sqr(g))
            == np.asarray(T.fq12_mul(g, g))).all()
    assert (np.asarray(T.fq12_sqr(g)) == np.asarray(T.fq12_mul(g, g))).all()
    from sipp_tpu.pairing.ate import _sparse12
    a, b, c = g[:, 0, 0], g[:, 0, 1], g[:, 0, 2]
    assert (np.asarray(T.fq12_mul_line(g, a, b, c))
            == np.asarray(T.fq12_mul(g, _sparse12(a, b, c)))).all()


def test_inner_product(rng):
    A, B = random_points(4, seed=17)
    z = inner_product(C.g1_encode(A), C.g2_encode(B))
    want = H.FQ12_ONE
    for p, q in zip(A, B):
        want = H.fq12_mul(want, H.pairing(p, q))
    assert T.fq12_decode(z[None])[0] == want
