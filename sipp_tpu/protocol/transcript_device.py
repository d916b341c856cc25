"""On-device Fiat-Shamir transcript (SURVEY.md P6; BASELINE north star).

Device twin of protocol/transcript.py: the transcript state lives as
Goldilocks limb arrays on device, appends run the vectorized Poseidon chain
(fields/poseidon.py), and the challenge is reduced into Fr on device — so a
fold round never has to leave the chip.  The host transcript remains the
serial-prologue fast path; both are differentially tested.

The challenge reproduces the reference native path's variable-length
`to_u32_digits` quirk EXACTLY (transcript_native.rs:58-63: each digest
element contributes its little-endian u32 digits with leading zero limbs
dropped, shifting later elements' positions — hit with probability ~2^-32
per challenge): `_digest_to_challenge_limbs` computes the per-element digit
counts and scatters limbs by dynamic offset, so device challenges equal
host challenges bit-for-bit on every input (tested against the host quirk
logic on synthetic zero-limb digests in tests/test_transcript_device.py).
"""

import jax
import jax.numpy as jnp

from .. import params
from ..fields import FGL, FQ, FR, poseidon
from ..fields import tower


@jax.jit
def _u32s_to_goldilocks(u32s):
    """(..., K) uint32 values -> (..., K, 5) Montgomery Goldilocks limbs."""
    limbs = jnp.stack(
        [u32s & 0xFFFF, u32s >> 16]
        + [jnp.zeros_like(u32s)] * (FGL.L - 2),
        axis=-1,
    )
    return FGL.to_mont(limbs)


@jax.jit
def _fq_limbs_to_u32(limbs):
    """(..., 16) canonical 16-bit limbs -> (..., 8) uint32 LE digits."""
    lo = limbs[..., 0::2]
    hi = limbs[..., 1::2]
    return lo | (hi << 16)


def new_state():
    """Initial transcript state: four zero Goldilocks elements (4, 5)."""
    return jnp.zeros((4, FGL.L), jnp.uint32)


@jax.jit
def append_fq12(state, f):
    """state' = hash_no_pad(state || MyFq12-direct(f) as 96 elements)."""
    direct = tower.fq12_to_direct(f)          # (..., 12, 16) canonical
    u32s = _fq_limbs_to_u32(direct)           # (..., 12, 8)
    msg = _u32s_to_goldilocks(u32s.reshape(*u32s.shape[:-2], 96))
    return poseidon.hash_no_pad_device(
        jnp.concatenate([state, msg], axis=-2)
    )


@jax.jit
def append_g1(state, p_aff):
    """p_aff: (..., 2, L) Montgomery -> 16-element append."""
    canon = FQ.from_mont(p_aff)
    u32s = _fq_limbs_to_u32(canon).reshape(*canon.shape[:-2], 16)
    return poseidon.hash_no_pad_device(
        jnp.concatenate([state, _u32s_to_goldilocks(u32s)], axis=-2)
    )


@jax.jit
def append_g2(state, q_aff):
    """q_aff: (..., 2, 2, L) -> 32-element append (x0||x1||y0||y1)."""
    canon = FQ.from_mont(q_aff)
    u32s = _fq_limbs_to_u32(canon).reshape(*canon.shape[:-3], 32)
    return poseidon.hash_no_pad_device(
        jnp.concatenate([state, _u32s_to_goldilocks(u32s)], axis=-2)
    )


@jax.jit
def _digest_to_challenge_limbs(canon):
    """(4, 5) canonical Goldilocks digest limbs -> (16,) 16-bit limbs of the
    quirk-exact concatenated integer (transcript_native.rs:58-63).

    Rust `BigUint::to_u32_digits` drops leading zero u32 limbs per element:
    element k contributes len_k in {0, 1, 2} u32 digits (2 minus one if its
    high u32 is zero, minus one more if the whole value is zero), landing at
    u32 offset c_k = sum_{j<k} len_j.  Scattered with one-hot compares —
    branch-free, bit-identical to the host logic for every digest."""
    l = canon[..., :4]                                  # (4 elems, 4 limbs)
    lo_zero = (l[..., 0] | l[..., 1]) == 0
    hi_zero = (l[..., 2] | l[..., 3]) == 0
    lens = (2 - hi_zero.astype(jnp.int32)
            - (hi_zero & lo_zero).astype(jnp.int32))    # (4,)
    offs = jnp.cumsum(lens) - lens                      # u32 offsets c_k
    i = jnp.arange(16)
    out = jnp.zeros((16,), jnp.uint32)
    for k in range(4):
        base = 2 * offs[k]
        for t_ in range(4):
            present = (lens[k] >= 1) if t_ < 2 else (lens[k] == 2)
            out = out + jnp.where((i == base + t_) & present, l[k, t_], 0)
    return out


@jax.jit
def get_challenge(state):
    """Fr challenge as MSB-first bit array (254,) + canonical Fr limbs.

    b = the quirk-exact digit concatenation of the digest (see
    _digest_to_challenge_limbs), reduced mod r.  Returns (bits, fr_limbs)
    ready to drive the fold/exp kernels on device.  Bit-identical to the
    host Transcript.get_challenge."""
    digest = poseidon.hash_no_pad_device(state)        # (4, 5) Montgomery
    canon = FGL.from_mont(digest)                      # (4, 5) 16-bit limbs
    limbs = _digest_to_challenge_limbs(canon)
    fr = FR.from_mont(FR.to_mont(limbs))               # reduce mod r, canonical
    # bits, MSB first: bit i = limb[(253-i)//16] >> ((253-i)%16) & 1
    idx = (253 - jnp.arange(254)) // 16
    sh = (253 - jnp.arange(254)) % 16
    bits = (fr[..., idx] >> sh.astype(jnp.uint32)) & 1
    return bits, fr
