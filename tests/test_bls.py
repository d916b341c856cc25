"""BLS aggregation application tests (reference bls_aggregation.rs semantics)."""

import numpy as np
import pytest

from sipp_tpu import hostref as H, params
from sipp_tpu.apps import bls_aggregation as BLS


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    keys = [BLS.keygen(rng) for _ in range(3)]
    msgs = [
        (int.from_bytes(rng.bytes(31), "little"),
         int.from_bytes(rng.bytes(31), "little"))
        for _ in range(3)
    ]
    sigs = [BLS.sign(sk, m) for (sk, _), m in zip(keys, msgs)]
    return keys, msgs, sigs


def test_hash_to_g2_torsion():
    h = BLS.hash_to_g2((424242, 171717))
    assert H.g2_is_on_curve(h)
    assert H.g2_mul_raw(h, params.R) is None  # r-torsion after cofactor mul
    # deterministic
    assert BLS.hash_to_g2((424242, 171717)) == h
    assert BLS.hash_to_g2((424243, 171717)) != h


def test_single_sig_verifies(setup):
    keys, msgs, sigs = setup
    sk, pk = keys[0]
    # e(pk, H(m)) == e(G1, sig)
    lhs = H.pairing(pk, BLS.hash_to_g2(msgs[0]))
    rhs = H.pairing(params.G1_GEN, sigs[0])
    assert lhs == rhs


def test_aggregate_roundtrip_with_proof(setup):
    keys, msgs, sigs = setup
    sigma = BLS.aggregate(sigs)
    ok, proof = BLS.verify_bls_aggregation(
        [pk for _, pk in keys], msgs, sigma, prove=True
    )
    assert ok and proof is not None and proof.shape[0] == 5  # n=4: 2*2+1


def test_aggregate_rejects_tamper(setup):
    keys, msgs, sigs = setup
    bad_sigma = H.g2_add(BLS.aggregate(sigs), BLS.hash_to_g2(msgs[0]))
    ok, _ = BLS.verify_bls_aggregation(
        [pk for _, pk in keys], msgs, bad_sigma, prove=False
    )
    assert not ok
    # wrong message
    ok, _ = BLS.verify_bls_aggregation(
        [pk for _, pk in keys], [msgs[1], msgs[0], msgs[2]],
        BLS.aggregate(sigs), prove=False,
    )
    assert not ok
