"""Adversarial-input validation (protocol/validate.py): tamper tests.

Reference parity: arkworks' typed deserialization rejects off-curve /
off-subgroup points on construction (/root/reference/src/prover_native.rs:3)
and the verifier circuit range-asserts limbs
(/root/reference/src/verifier_circuit.rs:258-266).  Here raw uint32 arrays
are the wire format, so sipp_verify/io.load_proof must reject the same
garbage explicitly (VERDICT r3 missing-2).
"""

import numpy as np
import pytest

from sipp_tpu import curves, params
from sipp_tpu.fields import FQ
from sipp_tpu.protocol import validate
from sipp_tpu.protocol.verifier import VerificationError
from sipp_tpu.utils.testing import random_instance


N = 4


@pytest.fixture(scope="module")
def inst():
    return random_instance(N, seed=99)


def test_valid_instance_passes(inst):
    a, b = inst
    validate.check_instance(a, b)


def test_infinity_lanes_pass(inst):
    a, b = inst
    a = np.asarray(a).copy()
    b = np.asarray(b).copy()
    a[1] = 0
    b[2] = 0
    validate.check_instance(a, b)


def test_off_curve_g1_rejected(inst):
    a, b = inst
    a = np.asarray(a).copy()
    a[2, 1] = FQ_plus_one(a[2, 1])
    with pytest.raises(VerificationError, match="A: point off curve"):
        validate.check_instance(a, b)


def test_off_curve_g2_rejected(inst):
    a, b = inst
    b = np.asarray(b).copy()
    b[0, 1, 0] = FQ_plus_one(b[0, 1, 0])
    with pytest.raises(VerificationError, match="B: point off twist"):
        validate.check_instance(a, b)


def FQ_plus_one(limbs):
    """y -> y + 1 (mod p) in Montgomery limb form: adds R mod p."""
    from sipp_tpu.fields import bigint

    v = bigint.limbs16_to_ints_fast(limbs.reshape(1, FQ.L))[0]
    v = (v + FQ.R) % FQ.p
    return bigint.ints_to_limbs([v], FQ.L)[0]


def test_non_16bit_limb_rejected(inst):
    a, b = inst
    a = np.asarray(a).copy()
    a[0, 0, 3] = 1 << 16
    with pytest.raises(VerificationError, match="non-16-bit limb"):
        validate.check_instance(a, b)


def test_non_canonical_value_rejected(inst):
    a, b = inst
    from sipp_tpu.fields import bigint

    a = np.asarray(a).copy()
    # x + p: same residue, non-canonical encoding — must be rejected
    v = bigint.limbs16_to_ints_fast(a[0, 0].reshape(1, FQ.L))[0] + FQ.p
    assert v < 1 << 256
    a[0, 0] = bigint.ints_to_limbs([v], FQ.L)[0]
    with pytest.raises(VerificationError, match="non-canonical"):
        validate.check_instance(a, b)


def test_g2_outside_subgroup_rejected(inst):
    """A point on the twist curve but outside the r-torsion (pre-cofactor
    image of the BLS map) must be rejected by the subgroup ladder."""
    from sipp_tpu.apps.bls_aggregation import map_to_g2_without_cofactor_mul

    a, b = inst
    raw = map_to_g2_without_cofactor_mul((1234, 5678))
    # confirm the test vector is genuinely outside G2 (host oracle)
    from sipp_tpu import hostref

    assert hostref.g2_mul_raw(raw, params.R) is not None
    b = np.asarray(b).copy()
    b[1] = np.asarray(curves.g2_encode([raw]))[0]
    validate.check_instance(a, b, subgroup=False)  # on-curve passes
    with pytest.raises(VerificationError, match="subgroup"):
        validate.check_instance(a, b)


def test_proof_limb_validation(tmp_path, inst):
    from sipp_tpu import io as sio

    a, b = inst
    proof = np.zeros((2 * 2 + 1, 2, 3, 2, FQ.L), np.uint32)
    path = str(tmp_path / "p.npz")
    sio.save_proof(path, a, b, proof)
    sio.load_proof(path)  # zeros are canonical
    proof[0, 0, 0, 0, 0] = 1 << 20
    sio.save_proof(path, a, b, proof)
    with pytest.raises(VerificationError, match="non-16-bit"):
        sio.load_proof(path)


def test_verifier_rejects_tampered_instance(inst):
    """sipp_verify itself rejects an off-curve A before any transcript or
    device work (entry validation)."""
    from sipp_tpu.protocol.prover import sipp_prove
    from sipp_tpu.protocol import sipp_verify

    a, b = inst
    proof = sipp_prove(a, b)
    a_bad = np.asarray(a).copy()
    a_bad[0, 1] = FQ_plus_one(a_bad[0, 1])
    with pytest.raises(VerificationError):
        sipp_verify(a_bad, b, proof)
