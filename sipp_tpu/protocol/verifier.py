"""SIPP verifier: transcript replay, fold verification, one final pairing.

Semantics of reference sipp_verify_native
(/root/reference/src/verifier_native.rs:14-85; SURVEY.md §3.2): replays the
transcript, pops the proof from the back, folds A/B with the same challenges
and updates Z' = Z_L^x * Z * Z_R^(x^-1), then checks e(final_A, final_B) ==
final_Z with a single pairing.  The G1/G2 exps and Fq12 exps that the
reference outsources to starky STARK statements (SURVEY.md D7/D8) are here
computed directly by the batched fold/exp kernels.
"""

import jax.numpy as jnp

from .. import curves, params
from ..curves import G1, G2, scalar_to_bits
from ..fields import tower
from ..pairing import pairing
from .statements import SIPPStatement
from .transcript import Transcript


class VerificationError(Exception):
    pass


def sipp_verify(a_g1, b_g2, proof) -> SIPPStatement:
    """Verify a SIPP proof.  proof: (2*log2(n)+1, 2, 3, 2, L) Fq12 array in
    the prover's reversed order.  Returns the accepted SIPPStatement or
    raises VerificationError (reference verifier_native.rs:80-84)."""
    n = a_g1.shape[0]
    assert n & (n - 1) == 0 and n >= 1
    assert proof.shape[0] == 2 * (n.bit_length() - 1) + 1

    a_host = curves.g1_decode(a_g1)
    b_host = curves.g2_decode(b_g2)
    tr = Transcript()
    for a, b in zip(a_host, b_host):
        tr.append_g1(a)
        tr.append_g2(b)

    idx = proof.shape[0] - 1
    z = proof[idx]; idx -= 1              # "pop from the back"
    original_z = z
    tr.append_fq12(tower.fq12_decode(z[None])[0])

    a, b = a_g1, b_g2
    while n > 1:
        m = n // 2
        z_l = proof[idx]; idx -= 1
        tr.append_fq12(tower.fq12_decode(z_l[None])[0])
        z_r = proof[idx]; idx -= 1
        tr.append_fq12(tower.fq12_decode(z_r[None])[0])

        x = tr.get_challenge()
        x_inv = pow(x, -1, params.R)
        xb, xib = scalar_to_bits(x), scalar_to_bits(x_inv)
        a = G1.to_affine(G1.fold(a[:m], a[m:], xb))
        b = G2.to_affine(G2.fold(b[:m], b[m:], xib))
        # Z' = Z_L^x * Z * Z_R^(x^-1)
        zl_x = tower.fq12_pow_bits(z_l, xb)
        zr_xi = tower.fq12_pow_bits(z_r, xib)
        z = tower.fq12_mul(zl_x, tower.fq12_mul(z, zr_xi))
        n = m

    final_a = curves.g1_decode(a)[0]
    final_b = curves.g2_decode(b)[0]
    final_z = tower.fq12_decode(z[None])[0]
    stmt = SIPPStatement(
        A=a_host, B=b_host,
        Z=tower.fq12_decode(original_z[None])[0],
        final_A=final_a, final_B=final_b, final_Z=final_z,
    )

    lhs = pairing(a, b)  # (1, ...) batch of one
    if not bool(tower.fq12_eq(lhs[0], z)):
        raise VerificationError("Verification failed")
    return stmt
