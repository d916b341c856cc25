"""Whole compact-fexp kernel (interpret mode) vs pairing.final_exp at B=2,
bit-exact.  Slow (XLA:CPU interpret of ~18k muls).  Run:
  JAX_PLATFORMS=cpu PYTHONPATH= python scratch/r4_fexp_interp_check.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from sipp_tpu.fields import FQ
from sipp_tpu.pairing.ate import final_exp
from sipp_tpu.ops.pallas_fexp import final_exp_fused

rng = np.random.default_rng(11)
xs = [int.from_bytes(rng.bytes(40), "little") % FQ.p for _ in range(24)]
f = FQ.encode(xs).reshape(2, 2, 3, 2, FQ.L)
got = final_exp_fused(f, True)
want = final_exp(f)
ok = (np.asarray(got) == np.asarray(want)).all()
print("fexp fused interpret == xla:", ok)
assert ok
