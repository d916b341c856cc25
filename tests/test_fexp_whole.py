"""Whole final-exp kernel differential (interpret mode) — slow-gated.

The fused kernel (easy part in the L16 ops, hard part in the L17
lazy-column domain) must be bit-identical to the XLA tower final_exp.
Fast building-block coverage lives in test_pallas.py/test_tmul_lat.py;
this whole-kernel check interprets ~18k multiplies and is gated like the
other whole-kernel interpret tests (SIPP_SLOW_TESTS=1).  On real TPU the
same property is asserted every driver bench run by the three-engine
digest selftest (bench.py), so this is the CPU-reproducible twin.
"""

import os

import numpy as np
import pytest

slow = pytest.mark.skipif(
    os.environ.get("SIPP_SLOW_TESTS") != "1",
    reason="whole-kernel interpret compile is slow; SIPP_SLOW_TESTS=1",
)


@slow
def test_final_exp_fused_interpret_vs_tower():
    from sipp_tpu.fields import FQ
    from sipp_tpu.ops.pallas_fexp import final_exp_fused
    from sipp_tpu.pairing.ate import final_exp

    rng = np.random.default_rng(11)
    xs = [int.from_bytes(rng.bytes(40), "little") % FQ.p for _ in range(24)]
    f = FQ.encode(xs).reshape(2, 2, 3, 2, FQ.L)
    got = final_exp_fused(f, True)
    want = final_exp(f)
    assert (np.asarray(got) == np.asarray(want)).all()
