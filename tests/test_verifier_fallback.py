"""No-native-lib verifier fallback: the batched-exp device path.

Without csrc/libsipp_host.so the verifier's Z' chain runs on device; round
4 batched its 2*log2(n) single-element Fq12 exps into ONE lane-batched
pow + product tree (VERDICT r3 next-9).  Value-identical to the per-round
chain (commutative product of exact field elements); this differential
pins it: fallback accept == native accept, and tampering still rejects.
"""

import numpy as np
import pytest

from sipp_tpu import native
from sipp_tpu.protocol import sipp_verify
from sipp_tpu.protocol.prover import sipp_prove
from sipp_tpu.protocol.verifier import VerificationError
from sipp_tpu.utils.testing import random_instance


@pytest.fixture
def no_native(monkeypatch):
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)


def test_fallback_roundtrip_and_tamper(no_native):
    assert native.get_lib() is None
    a, b = random_instance(4, seed=3)
    proof = sipp_prove(a, b)
    stmt = sipp_verify(a, b, proof)
    assert stmt.final_Z is not None
    # tamper: flip one proof element -> reject (verifier_native.rs:83)
    bad = np.asarray(proof).copy()
    bad[1, 0, 0, 0, 0] ^= 1
    with pytest.raises(VerificationError):
        sipp_verify(a, b, bad)
