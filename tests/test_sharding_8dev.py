"""8-device sharded prove (own file: the longest-compiling test gets its
own xdist worker so it IS the suite critical path, not an addition to it).
"""

import numpy as np

from sipp_tpu.parallel import make_mesh, sipp_prove_sharded
from sipp_tpu.protocol import sipp_verify
from sipp_tpu.utils.testing import random_instance


def test_sharded_prove_8dev():
    mesh = make_mesh(8)
    a, b = random_instance(16, seed=6)
    proof = sipp_prove_sharded(a, b, mesh)
    sipp_verify(a, b, proof)
