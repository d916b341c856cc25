"""Pallas Fq multiply kernel: interpret-mode correctness vs the XLA path."""

import numpy as np

from sipp_tpu.fields import FQ
from sipp_tpu.ops.pallas_fq import fq_mul_pallas


def test_fq_mul_pallas_interpret(rng):
    xs = [int.from_bytes(rng.bytes(40), "little") % FQ.p for _ in range(64)]
    ys = [int.from_bytes(rng.bytes(40), "little") % FQ.p for _ in range(64)]
    a, b = FQ.encode(xs), FQ.encode(ys)
    got = fq_mul_pallas(a, b, interpret=True)
    want = FQ.mul(a, b)
    assert (np.asarray(got) == np.asarray(want)).all()
