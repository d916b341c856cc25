"""Grain-LFSR round-constant generator for Poseidon-Goldilocks (VERDICT r4
next-4: the final, rigorous attempt to derive plonky2's 360-element
ALL_ROUND_CONSTANTS table offline).

The reference transcript hashes with plonky2's Poseidon permutation
(/root/reference/src/transcript_native.rs:27); plonky2 hardcodes its round
constants in an unvendored git dependency (/root/reference/Cargo.toml:21).
360 = t*(R_F+R_P) = 12*30 exactly matches the output count of the canonical
Poseidon reference generator (`generate_parameters_grain.sage` from the
hadeshash repository), so this module implements that generator faithfully
and sweeps every documented parameterization / bit-order variant.

Canonical algorithm (hadeshash generate_parameters_grain.sage):
  * 80-bit LFSR state, feedback bit = s62 ^ s51 ^ s38 ^ s23 ^ s13 ^ s0,
    shift left by one, new bit enters at position 79.
  * Init state = [field(2 bits) | sbox(4) | field_size n(12) | t(12) |
    R_F(10) | R_P(10) | 30 ones], each field MSB-first; then 160 update
    rounds with outputs discarded.
  * Output bits use the shrinking rule: generate bits in PAIRS; if the
    first bit is 1 emit the second, else discard it.
  * Each constant = field_size output bits assembled MSB-first; values
    >= p are rejected (resampled); (R_F+R_P)*t constants total.

Oracle: the first entries of plonky2's ALL_ROUND_CONSTANTS as recalled
from its public source (poseidon.rs).  These are MEMORY-sourced, not
machine-verified in this offline environment — a sweep "hit" therefore
means "a documented Grain parameterization reproduces the remembered
prefix", upon which the full 360-table is emitted for the
SIPP_POSEIDON_RC_FILE hook and the claim is only as strong as the prefix.
A miss across the whole sweep makes the round-3 conclusion ("the table is
not Grain-derivable with documented parameters") reproducible instead of
asserted.

Run: python tools/grain_poseidon.py            (sweep + report)
     python tools/grain_poseidon.py --emit F   (write table to file F on hit)
"""

import itertools
import sys

GOLDILOCKS_P = 2**64 - 2**32 + 1

# plonky2 ALL_ROUND_CONSTANTS prefix as recalled from the public source
# (plonky2/src/hash/poseidon.rs).  Confidence decreases down the list; the
# sweep scores each variant by how many leading entries match.
RECALLED_PREFIX = [
    0xB585F766F2144405,
    0x7746A55F43921AD7,
    0xB2FB0D31CEE799B4,
    0x0F6760A4803427D7,
    0xE10D666650F4E012,
    0x8CAE14CB07D09BF1,
    0xD438539C95F63E9F,
    0xEF781C7CE35B4C3D,
]


class Grain:
    """80-bit Grain LFSR per the hadeshash reference generator."""

    TAPS = (62, 51, 38, 23, 13, 0)

    def __init__(self, init_bits):
        assert len(init_bits) == 80, len(init_bits)
        self.state = list(init_bits)
        for _ in range(160):
            self._step()

    def _step(self):
        s = self.state
        new = 0
        for t in self.TAPS:
            new ^= s[t]
        s.pop(0)
        s.append(new)
        return new

    def bit(self, shrink=True):
        """One output bit (shrinking rule: emit the 2nd of a pair whose
        1st is 1)."""
        if not shrink:
            return self._step()
        while True:
            b1 = self._step()
            b2 = self._step()
            if b1 == 1:
                return b2

    def field_element(self, nbits, p, msb_first=True, shrink=True,
                      reject_whole=True):
        """nbits-bit integer via rejection sampling into [0, p)."""
        while True:
            bits = [self.bit(shrink) for _ in range(nbits)]
            if not msb_first:
                bits = bits[::-1]
            v = 0
            for b in bits:
                v = (v << 1) | b
            if v < p:
                return v
            if not reject_whole:
                # variant: reduce instead of reject
                return v % p


def _enc(value, width, msb_first=True):
    bits = [(value >> i) & 1 for i in range(width)]
    bits.reverse()  # MSB first
    if not msb_first:
        bits.reverse()
    return bits


def init_sequence(field=1, sbox=0, n=64, t=12, r_f=8, r_p=22,
                  msb_first=True):
    """The documented init layout: 2+4+12+12+10+10 bits + 30 ones = 80."""
    return (_enc(field, 2, msb_first) + _enc(sbox, 4, msb_first)
            + _enc(n, 12, msb_first) + _enc(t, 12, msb_first)
            + _enc(r_f, 10, msb_first) + _enc(r_p, 10, msb_first)
            + [1] * 30)


def generate(num=360, p=GOLDILOCKS_P, field=1, sbox=0, n=64, t=12, r_f=8,
             r_p=22, init_msb=True, out_msb=True, shrink=True,
             reject=True):
    g = Grain(init_sequence(field, sbox, n, t, r_f, r_p, init_msb))
    return [g.field_element(n, p, out_msb, shrink, reject)
            for _ in range(num)]


def sweep(max_gen=8):
    """Every documented-or-plausible parameterization; returns
    [(variant dict, prefix-match count, first values)] sorted by score."""
    results = []
    for (field, sbox, init_msb, out_msb, shrink, reject) in itertools.product(
            (1, 0), (0, 3, 5, 7), (True, False), (True, False),
            (True, False), (True, False)):
        consts = generate(num=max_gen, field=field, sbox=sbox,
                          init_msb=init_msb, out_msb=out_msb,
                          shrink=shrink, reject=reject)
        score = 0
        for a, b in zip(consts, RECALLED_PREFIX):
            if a != b:
                break
            score += 1
        results.append((dict(field=field, sbox=sbox, init_msb=init_msb,
                             out_msb=out_msb, shrink=shrink, reject=reject),
                        score, [hex(c) for c in consts[:4]]))
    results.sort(key=lambda r: -r[1])
    return results


def main():
    emit_path = None
    if len(sys.argv) >= 3 and sys.argv[1] == "--emit":
        emit_path = sys.argv[2]
    results = sweep()
    best = results[0]
    print(f"sweep: {len(results)} variants; best score "
          f"{best[1]}/{len(RECALLED_PREFIX)} prefix matches")
    for var, score, head in results[:6]:
        print(f"  score={score} {var} head={head}")
    if best[1] >= 4:
        print("HIT: a documented Grain parameterization reproduces the "
              "recalled plonky2 prefix.")
        if emit_path:
            consts = generate(num=360, **best[0])
            with open(emit_path, "w") as f:
                f.write("\n".join(str(c) for c in consts) + "\n")
            print(f"wrote 360 constants to {emit_path} "
                  f"(use via SIPP_POSEIDON_RC_FILE)")
    else:
        print("MISS: no documented Grain parameterization reproduces the "
              "recalled prefix — the round-3 'not Grain-derivable' "
              "conclusion is now reproducible (this sweep).")
    return 0 if best[1] >= 4 else 1


if __name__ == "__main__":
    raise SystemExit(main())
