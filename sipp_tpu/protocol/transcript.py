"""Fiat-Shamir transcript: Poseidon-Goldilocks hash chain.

Bit-exact re-implementation of the reference's transcript semantics
(/root/reference/src/transcript_native.rs; SURVEY.md §2.4):

- state: 4 Goldilocks elements, initially zero (HashOut::default()).
- append(msg): state = hash_no_pad(state[4] || msg)  — a hash *chain*, not a
  sponge absorb (transcript_native.rs:25-30).
- Fq encoding: canonical value -> little-endian u32 digits -> zero-padded to
  exactly 8 limbs -> 8 Goldilocks elements (transcript_native.rs:68-77).
- G1 = x||y (16 elems); G2 = x.c0||x.c1||y.c0||y.c1 (32); Fq12 = the 12
  MyFq12 direct-basis coefficients in order (96) (transcript_native.rs:32-54).
- challenge: digest = hash_no_pad(state[4]); concatenate the *variable-length*
  little-endian u32 digits of the 4 digest elements (Rust BigUint
  to_u32_digits drops leading zero limbs — reproduced exactly, including the
  probability-2^-32 length quirk, transcript_native.rs:56-65); interpret as a
  little-endian integer; reduce mod r.  get_challenge does NOT mutate state.

The host transcript below is the serial spine of the protocol (SURVEY.md
§3.5); the hash chain over the 2n input points is inherently sequential, so
it runs on host (a C++ fast path is provided in csrc/), while a device
(jnp) implementation of the same permutation exists in fields/poseidon.py
for on-device challenge derivation and is differentially tested against this.
"""

from .. import hostref, params
from ..fields import poseidon


def fq_to_elements(x: int) -> list:
    """Fq canonical int -> 8 little-endian u32 digits as Goldilocks elements."""
    assert 0 <= x < params.P
    return [(x >> (32 * i)) & 0xFFFFFFFF for i in range(8)]


def g1_to_elements(pt) -> list:
    x, y = pt
    return fq_to_elements(x) + fq_to_elements(y)


def g2_to_elements(pt) -> list:
    (x0, x1), (y0, y1) = pt
    return (
        fq_to_elements(x0) + fq_to_elements(x1)
        + fq_to_elements(y0) + fq_to_elements(y1)
    )


def fq12_to_elements(f) -> list:
    """f in tower representation -> 96 elements (12 direct-basis coeffs x 8)."""
    out = []
    for c in hostref.fq12_to_direct(f):
        out.extend(fq_to_elements(c))
    return out


def _u32_digits_var(v: int) -> list:
    """Rust BigUint::to_u32_digits: little-endian, no leading zero limbs
    (empty for zero)."""
    out = []
    while v:
        out.append(v & 0xFFFFFFFF)
        v >>= 32
    return out


class Transcript:
    """Host Fiat-Shamir transcript (semantics of transcript_native.rs).

    Uses the C++ fast path (csrc/, ~100x) when available; the pure-Python
    Poseidon is the reference implementation and drop-in fallback."""

    def __init__(self):
        self.state = [0, 0, 0, 0]
        from .. import native

        self._native = native if native.get_lib() is not None else None

    def append(self, msg):
        if self._native is not None:
            self.state = self._native.transcript_absorb(self.state, [list(msg)])
        else:
            self.state = poseidon.hash_no_pad(list(self.state) + list(msg))

    def append_many(self, msgs):
        """Hash-chain a list of messages (the 2n-append prologue fast path)."""
        if self._native is not None:
            self.state = self._native.transcript_absorb(self.state, msgs)
        else:
            for m in msgs:
                self.append(m)

    def append_g1(self, pt):
        self.append(g1_to_elements(pt))

    def append_g2(self, pt):
        self.append(g2_to_elements(pt))

    def append_fq12(self, f):
        self.append(fq12_to_elements(f))

    def append_points(self, a_pts, b_pts):
        """Interleaved (A_i, B_i) prologue (prover_native.rs:36-39).

        With the native engine, the 2n message encodings are built as ONE
        bulk u32-digit array (no per-element Python digit lists) and absorbed
        in a single C++ call — the config-5 prologue (n = 65536) hashes in
        seconds instead of minutes.
        """
        if self._native is not None and len(a_pts) > 16:
            import numpy as np

            from ..fields import bigint

            coords = []
            for a, b in zip(a_pts, b_pts):
                x, y = a if a is not None else (0, 0)
                ((x0, x1), (y0, y1)) = b if b is not None else \
                    ((0, 0), (0, 0))
                coords += [x, y, x0, x1, y0, y1]
            digits = bigint.ints_to_u32x8_array(coords)  # (6n, 8)
            flat = digits.reshape(-1)                    # row-major == msg order
            lens = np.tile(np.asarray([16, 32], np.uintp), len(a_pts))
            self.state = self._native.transcript_absorb_flat(
                self.state, flat, lens)
            return
        msgs = []
        for a, b in zip(a_pts, b_pts):
            msgs.append(g1_to_elements(a))
            msgs.append(g2_to_elements(b))
        self.append_many(msgs)

    def get_challenge(self) -> int:
        """Fr challenge; does not mutate state."""
        if self._native is not None:
            digest = self._native.hash_no_pad(list(self.state))
        else:
            digest = poseidon.hash_no_pad(list(self.state))
        digits = []
        for d in digest:
            digits.extend(_u32_digits_var(d))
        b = 0
        for i, d in enumerate(digits):
            b |= d << (32 * i)
        return b % params.R
