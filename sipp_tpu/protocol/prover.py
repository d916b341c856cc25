"""SIPP prover: log2(n) Fiat-Shamir folding rounds, batched on device.

Semantics of reference sipp_prove_native (/root/reference/src/prover_native.rs:26-80),
re-architected TPU-first (SURVEY.md §3.1): the n pairings of Z and the m/2+m/2
cross inner products Z_L/Z_R per round are single batched Miller loops + one
final exponentiation (pairing/pairing.py); the G1/G2 folds A' = A_lo + x*A_hi,
B' = B_lo + x^-1*B_hi are batched shared-scalar ladder kernels (curves/).
Only the hash chain (the serial spine, SURVEY.md §3.5) runs on host.

Fold orientation (SURVEY.md §2.4 item 7): with (lo, hi) = split_at(n/2):
Z_L = <A_hi, B_lo>, Z_R = <A_lo, B_hi>; proof = [Z, Z_L1, Z_R1, ...] REVERSED
so the verifier pops from the back (§2.4 item 6).
"""

import jax.numpy as jnp

from .. import curves, params
from ..curves import G1, G2, scalar_to_bits
from ..fields import tower
from ..pairing import inner_product
from .transcript import Transcript

# Small fold rounds are padded up to this lane count so they share ONE
# compiled kernel instead of recompiling at every halved size (exact:
# infinity lanes contribute 1 to products; padded fold lanes are sliced off).
PAD_FLOOR = 64


def _floor(n0: int) -> int:
    return max(1, min(PAD_FLOOR, n0 // 2))


def pad_lanes(arr, target: int):
    n = arr.shape[0]
    if n >= target:
        return arr
    return jnp.concatenate(
        [arr, jnp.zeros((target - n,) + arr.shape[1:], jnp.uint32)], 0)


def sipp_prove(a_g1, b_g2, return_transcript=False):
    """a_g1: (n, 2, L) G1 affine; b_g2: (n, 2, 2, L) G2 twist affine; n a
    power of two.  Returns proof: (2*log2(n)+1, 2, 3, 2, L) Fq12 array in
    reversed (verifier pop) order."""
    n = a_g1.shape[0]
    assert n == b_g2.shape[0] and n & (n - 1) == 0 and n >= 1

    a_host = curves.g1_decode(a_g1)
    b_host = curves.g2_decode(b_g2)
    tr = Transcript()
    tr.append_points(a_host, b_host)

    z = inner_product(a_g1, b_g2)
    proof = [z]
    tr.append_fq12(tower.fq12_decode(z[None])[0])

    a, b = a_g1, b_g2
    flo = _floor(n)
    while n > 1:
        m = n // 2
        tgt = max(m, flo)
        a_lo, a_hi = a[:m], a[m:]
        b_lo, b_hi = b[:m], b[m:]
        z_l = inner_product(a_hi, b_lo, pad_to=tgt)
        z_r = inner_product(a_lo, b_hi, pad_to=tgt)
        proof.append(z_l)
        tr.append_fq12(tower.fq12_decode(z_l[None])[0])
        proof.append(z_r)
        tr.append_fq12(tower.fq12_decode(z_r[None])[0])

        x = tr.get_challenge()
        x_inv = pow(x, -1, params.R)
        a = G1.to_affine(
            G1.fold(pad_lanes(a_lo, tgt), pad_lanes(a_hi, tgt),
                    scalar_to_bits(x)))[:m]
        b = G2.to_affine(
            G2.fold(pad_lanes(b_lo, tgt), pad_lanes(b_hi, tgt),
                    scalar_to_bits(x_inv)))[:m]
        n = m

    proof.reverse()  # verifier reads back-to-front (prover_native.rs:78)
    out = jnp.stack(proof)
    if return_transcript:
        return out, tr
    return out
