"""Differential tests for the fused transcript-tail kernels
(ops/pallas_transcript.py) against their XLA twins
(protocol/transcript_device.py + FR Fermat inversion) — bit-exact, in
interpret mode (same tests the TPU path relies on; reference semantics:
transcript_native.rs:25-65, SURVEY §2.4)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sipp_tpu.fields import FGL, FR
from sipp_tpu.utils.testing import random_instance

slow = pytest.mark.skipif(
    os.environ.get("SIPP_SLOW_TESTS") != "1",
    reason="interpret-mode Poseidon chains are minutes; SIPP_SLOW_TESTS=1",
)


def _state(seed):
    rng = np.random.default_rng(seed)
    return FGL.encode(
        [int.from_bytes(rng.bytes(8), "little") % FGL.p for _ in range(4)])


def _fq12(seed):
    from sipp_tpu.pairing.ate import miller_loop

    a, b = random_instance(2, seed=seed)
    return miller_loop(a[:1], b[:1])[0]   # a non-trivial Fq12 element


@slow
def test_transcript_append_interpret():
    from sipp_tpu.ops.pallas_transcript import transcript_append_fq12
    from sipp_tpu.protocol import transcript_device as td

    state = _state(21)
    f = _fq12(22)
    got = transcript_append_fq12(state, f, True)
    want = td.append_fq12(state, f)
    assert np.array_equal(np.asarray(got), np.asarray(want))


@slow
def test_transcript_round_tail_interpret():
    from sipp_tpu.ops.pallas_transcript import transcript_round_tail
    from sipp_tpu.protocol import transcript_device as td

    state = _state(31)
    zl, zr = _fq12(32), _fq12(33)
    st2, x, xinv = transcript_round_tail(state, zl, zr, True)

    ref = td.append_fq12(state, zl)
    ref = td.append_fq12(ref, zr)
    ref_bits, ref_x = td.get_challenge(ref)
    ref_xinv = FR.from_mont(FR.inv(FR.to_mont(ref_x)))
    assert np.array_equal(np.asarray(st2), np.asarray(ref))
    assert np.array_equal(np.asarray(x), np.asarray(ref_x))
    assert np.array_equal(np.asarray(xinv), np.asarray(ref_xinv))
