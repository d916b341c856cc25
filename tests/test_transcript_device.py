"""Device transcript == host transcript (P6 differential test)."""

import numpy as np
import jax.numpy as jnp

from sipp_tpu import hostref as H, params
from sipp_tpu import curves as C
from sipp_tpu.fields import FGL, tower as T
from sipp_tpu.protocol import Transcript
from sipp_tpu.protocol import transcript_device as TD
from sipp_tpu.utils.testing import random_points


def test_device_transcript_matches_host():
    A, B = random_points(2, seed=31)
    e = H.pairing(A[0], B[0])

    th = Transcript()
    th.append_g1(A[0])
    th.append_g2(B[1])
    th.append_fq12(e)

    st = TD.new_state()
    st = TD.append_g1(st, C.g1_encode(A[0]))
    st = TD.append_g2(st, C.g2_encode(B[1]))
    st = TD.append_fq12(st, T.fq12_encode(e))
    assert FGL.decode(st) == th.state


def test_device_challenge_matches_host():
    A, B = random_points(1, seed=33)
    th = Transcript()
    th.append_g1(A[0])
    th.append_g2(B[0])
    want = th.get_challenge()

    st = TD.new_state()
    st = TD.append_g1(st, C.g1_encode(A[0]))
    st = TD.append_g2(st, C.g2_encode(B[0]))
    bits, fr = TD.get_challenge(st)
    got = sum(int(v) << (16 * i) for i, v in enumerate(np.asarray(fr)))
    # fixed-width layout == host value except the 2^-32 digit-drop quirk
    assert got == want
    # bits array is the MSB-first expansion of the challenge
    val = 0
    for b in np.asarray(bits):
        val = (val << 1) | int(b)
    assert val == got


def test_challenge_digit_quirk_exact():
    """_digest_to_challenge_limbs reproduces the host's variable-length
    to_u32_digits concatenation on synthetic digests that hit the rare
    dropped-limb cases (zero high u32, zero element) the random tests
    never reach."""
    from sipp_tpu.protocol.transcript import _u32_digits_var

    cases = [
        [1, 2, 3, 4],
        [0x1234_5678_9ABC_DEF0, 0xFFFF_FFFF_FFFF_FFFF, 1, 2**63],
        [0x0000_0000_DEAD_BEEF, 5, 0, 0xFFFF_FFFF],          # hi==0, elem==0
        [0, 0, 0, 0],
        [0, 0x1_0000_0000, 0x7FFF_FFFF, 0],
    ]
    for elems in cases:
        digits = []
        for d in elems:
            digits.extend(_u32_digits_var(d))
        want = 0
        for i, d in enumerate(digits):
            want |= d << (32 * i)
        want_limbs = [(want >> (16 * i)) & 0xFFFF for i in range(16)]

        canon = np.zeros((4, FGL.L), np.uint32)
        for k, d in enumerate(elems):
            for t in range(4):
                canon[k, t] = (d >> (16 * t)) & 0xFFFF
        got = TD._digest_to_challenge_limbs(jnp.asarray(canon))
        assert [int(x) for x in got] == want_limbs, elems
