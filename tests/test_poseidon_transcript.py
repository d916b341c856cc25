"""Tests: Poseidon permutation (host vs device) and the FS transcript contract."""

import numpy as np
import jax.numpy as jnp

from sipp_tpu import hostref as H, params
from sipp_tpu.fields import FGL, poseidon
from sipp_tpu.protocol import transcript as TR


def rand_gl(rng, n):
    return [int.from_bytes(rng.bytes(9), "little") % params.GOLDILOCKS_P
            for _ in range(n)]


def test_permute_host_device(rng):
    states = [rand_gl(rng, 12) for _ in range(3)]
    want = [poseidon.permute(s) for s in states]
    enc = jnp.stack([FGL.encode(s) for s in states])  # (3, 12, 5)
    got = FGL.decode(poseidon.permute_device(enc))
    assert got == want


def test_hash_no_pad_host_device(rng):
    for k in (4, 8, 12, 20, 36, 96, 100):
        msg = rand_gl(rng, k)
        want = poseidon.hash_no_pad(msg)
        got = FGL.decode(poseidon.hash_no_pad_device(FGL.encode(msg)))
        assert got == want, f"len {k}"


def test_hash_no_pad_absorb_rule():
    # overwrite-absorb: hash(x) for len<=8 is permute([x, 0-pad capacity])[:4]
    msg = [7, 11]
    state = [0] * 12
    state[:2] = msg
    assert poseidon.hash_no_pad(msg) == poseidon.permute(state)[:4]


def test_transcript_chain_semantics(rng):
    # state' = hash_no_pad(state || msg), initial state zero (SURVEY §2.4.3)
    t = TR.Transcript()
    assert t.state == [0, 0, 0, 0]
    msg = rand_gl(rng, 5)
    t.append(msg)
    assert t.state == poseidon.hash_no_pad([0, 0, 0, 0] + msg)
    s1 = list(t.state)
    msg2 = rand_gl(rng, 3)
    t.append(msg2)
    assert t.state == poseidon.hash_no_pad(s1 + msg2)


def test_transcript_encodings():
    # Fq -> exactly 8 LE u32 digits (SURVEY §2.4.1)
    x = (1 << 250) + 12345
    el = TR.fq_to_elements(x)
    assert len(el) == 8
    assert sum(d << (32 * i) for i, d in enumerate(el)) == x
    # G1 16, G2 32, Fq12 96 elements (SURVEY §2.4.2)
    assert len(TR.g1_to_elements(params.G1_GEN)) == 16
    assert len(TR.g2_to_elements(params.G2_GEN)) == 32
    e = H.pairing(params.G1_GEN, params.G2_GEN)
    el = TR.fq12_to_elements(e)
    assert len(el) == 96
    # first coeff of the direct basis encoding
    assert el[:8] == TR.fq_to_elements(H.fq12_to_direct(e)[0])


def test_challenge_contract(rng):
    t = TR.Transcript()
    t.append_g1(params.G1_GEN)
    t.append_g2(params.G2_GEN)
    c1 = t.get_challenge()
    assert 0 <= c1 < params.R
    # get_challenge must not mutate state (SURVEY §2.4.5)
    assert t.get_challenge() == c1
    # ... and must equal the manual digest computation with variable-length
    # u32 digits
    digest = poseidon.hash_no_pad(list(t.state))
    digits = []
    for d in digest:
        while d:
            digits.append(d & 0xFFFFFFFF)
            d >>= 32
    want = sum(d << (32 * i) for i, d in enumerate(digits)) % params.R
    assert c1 == want
    # appending changes the challenge
    t.append_fq12(H.FQ12_ONE)
    assert t.get_challenge() != c1


def test_append_order_matters(rng):
    a = TR.Transcript()
    b = TR.Transcript()
    a.append([1]); a.append([2])
    b.append([2]); b.append([1])
    assert a.state != b.state
    # chain != single concatenated append
    c = TR.Transcript()
    c.append([1, 2])
    assert c.state != a.state


# --------------------------------------------------------- golden vectors

def test_golden_vectors_pin_round_constants():
    """Golden vectors for the CURRENT (repo-generated) Poseidon constants
    (fields/poseidon.py NOTE ON CONSTANTS).  If plonky2's round-constant
    table is ever obtained, swap it in fields/poseidon.py and REGENERATE
    these three vectors — every other byte of the transcript contract is
    already reference-exact, so the swap is verified by this diff alone."""
    from sipp_tpu.fields import poseidon
    from sipp_tpu.protocol.transcript import Transcript

    assert poseidon.permute(list(range(12))) == [
        15291922079558242668, 4596475250056580112, 7756404356451436354,
        12173079384802484801, 5451107080798026685, 11000581878380300065,
        12341269890716818485, 8761973125421272811, 8399909429665433043,
        6883805088035003483, 11182828734949429114, 14771401194482740389]
    assert poseidon.hash_no_pad(list(range(9))) == [
        148910153054243147, 2041478055866309694,
        14015994219338081082, 4271887656641089057]
    tr = Transcript()
    tr.append_g1((1, 2))
    tr.append_g2(((3, 4), (5, 6)))
    assert tr.state == [
        3323046534250193106, 12477555177529210504,
        6752963573488774072, 14456287363106392219]
    assert tr.get_challenge() == (
        8625129333497398238293035331576978755514716380931424255436670982485764658247)
