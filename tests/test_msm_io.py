"""MSM kernel + proof/statement IO tests."""

import numpy as np
import jax.numpy as jnp

from sipp_tpu import hostref as H, params
from sipp_tpu import curves as C
from sipp_tpu.ops.msm import msm_g1, msm_g2
from sipp_tpu.utils.testing import random_points


def _bits(ks):
    return jnp.stack([C.scalar_to_bits(k) for k in ks], axis=-1)


def test_msm_g1(rng):
    n = 5
    A, _ = random_points(n, seed=41)
    ks = [int.from_bytes(rng.bytes(40), "little") % params.R for _ in range(n)]
    got = C.g1_decode(C.G1.to_affine(msm_g1(C.g1_encode(A), _bits(ks))[None]))[0]
    want = None
    for p, k in zip(A, ks):
        want = H.g1_add(want, H.g1_mul(p, k))
    assert got == want


def test_msm_g2(rng):
    n = 3
    _, B = random_points(n, seed=43)
    ks = [int.from_bytes(rng.bytes(40), "little") % params.R for _ in range(n)]
    got = C.g2_decode(C.G2.to_affine(msm_g2(C.g2_encode(B), _bits(ks))[None]))
    want = None
    for p, k in zip(B, ks):
        want = H.g2_add(want, H.g2_mul(p, k))
    assert got == [want]


def test_proof_io_roundtrip(tmp_path):
    from sipp_tpu import io
    from sipp_tpu.protocol import sipp_prove, sipp_verify

    from sipp_tpu.utils.testing import random_instance

    a, b = random_instance(2, seed=51)
    proof = sipp_prove(a, b)
    path = str(tmp_path / "proof.npz")
    io.save_proof(path, a, b, proof)
    a2, b2, proof2 = io.load_proof(path)
    assert (np.asarray(a2) == np.asarray(a)).all()
    assert (np.asarray(proof2) == np.asarray(proof)).all()
    stmt = sipp_verify(a2, b2, proof2)
    spath = str(tmp_path / "stmt.u32")
    io.save_statement(spath, stmt)
    back = io.load_statement(spath, 2)
    assert back == stmt
