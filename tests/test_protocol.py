"""End-to-end SIPP protocol tests (reference test_sipp_native parity + codec)."""

import numpy as np
import pytest

from sipp_tpu import hostref as H, params
from sipp_tpu.fields import tower as T
from sipp_tpu.pairing import inner_product
from sipp_tpu.protocol import (
    SIPPStatement,
    Transcript,
    VerificationError,
    sipp_prove,
    sipp_verify,
)
from sipp_tpu.utils.testing import random_instance, random_points


def test_sipp_roundtrip_n4():
    """Reference test_sipp_native (verifier_native.rs:96-106) at n=4:
    prove -> verify ok, and proof.last() == inner_product(A, B)."""
    a, b = random_instance(4, seed=101)
    proof = sipp_prove(a, b)
    assert proof.shape[0] == 2 * 2 + 1  # 2*log2(n)+1 (SURVEY §2.4.6)
    stmt = sipp_verify(a, b, proof)
    z = inner_product(a, b)
    assert bool(T.fq12_eq(proof[-1], z))
    assert stmt.Z == T.fq12_decode(z[None])[0]
    # the statement's final pairing identity holds on host too
    assert H.pairing(stmt.final_A, stmt.final_B) == stmt.final_Z


def test_sipp_tamper_detected():
    a, b = random_instance(2, seed=103)
    proof = sipp_prove(a, b)
    bad = proof.at[1, 0, 0, 0, 0].set((proof[1, 0, 0, 0, 0] + 1) % 0xFFFF)
    with pytest.raises(VerificationError):
        sipp_verify(a, b, bad)
    # wrong inputs also fail
    a2, b2 = random_instance(2, seed=104)
    with pytest.raises(VerificationError):
        sipp_verify(a2, b2, proof)


def test_prover_verifier_transcripts_agree():
    a, b = random_instance(2, seed=105)
    proof, tr = sipp_prove(a, b, return_transcript=True)
    # replay manually: transcript state after verify must match prover's
    stmt = sipp_verify(a, b, proof)
    tr2 = Transcript()
    for p, q in zip(stmt.A, stmt.B):
        tr2.append_g1(p)
        tr2.append_g2(q)
    tr2.append_fq12(stmt.Z)
    zs = T.fq12_decode(proof[:-1][::-1])
    for z in zs:
        tr2.append_fq12(z)
    assert tr2.state == tr.state


def test_statement_codec_roundtrip():
    n = 2
    A, B = random_points(n, seed=107)
    e = H.pairing(A[0], B[0])
    stmt = SIPPStatement(A=A, B=B, Z=e, final_A=A[1], final_B=B[1], final_Z=e)
    vec = stmt.to_vec()
    assert len(vec) == 48 * n + 240  # SURVEY §2.4.8
    assert all(0 <= v < 2**32 for v in vec)
    back = SIPPStatement.from_vec(n, vec)
    assert back == stmt


def test_verifier_msm_finals_match_fold(monkeypatch):
    """MSM-form finals (VERDICT r4 next-8: final_A = sum c_i A_i with
    product-of-challenge coefficients, verifier._finals_msm_dev) must
    accept the same proof and produce the SAME statement as the fold-ladder
    path — same group elements, canonical affine encoding."""
    a, b = random_instance(8, seed=108)
    proof = sipp_prove(a, b)
    monkeypatch.setenv("SIPP_VERIFY_MSM", "0")
    s_fold = sipp_verify(a, b, proof)
    monkeypatch.setenv("SIPP_VERIFY_MSM", "1")
    s_msm = sipp_verify(a, b, proof)
    assert s_msm.final_A == s_fold.final_A
    assert s_msm.final_B == s_fold.final_B
    assert s_msm.final_Z == s_fold.final_Z
    assert s_msm.to_vec() == s_fold.to_vec()
