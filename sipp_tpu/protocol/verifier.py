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
    tr.append_points(a_host, b_host)

    idx = proof.shape[0] - 1
    z = proof[idx]; idx -= 1              # "pop from the back"
    original_z = z
    tr.append_fq12(tower.fq12_decode(z[None])[0])

    from .prover import _floor, pad_lanes

    a, b = a_g1, b_g2
    flo = _floor(n)
    while n > 1:
        m = n // 2
        tgt = max(m, flo)
        z_l = proof[idx]; idx -= 1
        tr.append_fq12(tower.fq12_decode(z_l[None])[0])
        z_r = proof[idx]; idx -= 1
        tr.append_fq12(tower.fq12_decode(z_r[None])[0])

        x = tr.get_challenge()
        x_inv = pow(x, -1, params.R)
        xb, xib = scalar_to_bits(x), scalar_to_bits(x_inv)
        a = G1.to_affine(
            G1.fold(pad_lanes(a[:m], tgt), pad_lanes(a[m:], tgt), xb))[:m]
        b = G2.to_affine(
            G2.fold(pad_lanes(b[:m], tgt), pad_lanes(b[m:], tgt), xib))[:m]
        # Z' = Z_L^x * Z * Z_R^(x^-1) — single-element exponentiations are
        # latency-bound, so they run on the host C++ kernel when available
        # (bit-identical; see pairing.final_exp_host rationale).
        from .. import native

        if native.get_lib() is not None:
            import jax

            zl_u = native.fq12_dev_to_u64(jax.device_get(z_l))
            zr_u = native.fq12_dev_to_u64(jax.device_get(z_r))
            z_u = native.fq12_dev_to_u64(jax.device_get(z))
            t = native.fq12_mul(native.fq12_pow(zl_u, x), z_u)
            z_u = native.fq12_mul(t, native.fq12_pow(zr_u, x_inv))
            z = jnp.asarray(native.u64_to_fq12_dev(z_u))
        else:
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

    # final check e(final_A, final_B) == final_Z; the Miller loop is padded
    # to the shared fold-kernel width and only lane 0 is used.
    from ..pairing import final_exp, miller_loop

    f = miller_loop(pad_lanes(a, flo), pad_lanes(b, flo))[0]
    lhs = final_exp(f)
    if not bool(tower.fq12_eq(lhs, z)):
        raise VerificationError("Verification failed")
    return stmt
