"""P4 sharded bucket MSM differential: per-shard buckets + cross-mesh
bucket-wise combine == single-device bucket MSM == ladder MSM == host oracle
(SURVEY.md §2.3 P4; the reference's starky exp-statement workloads,
verifier_circuit.rs:133-134, are the single-host analogue).  Own file for
xdist load balancing (scan-window compiles dominate)."""

import numpy as np
import jax.numpy as jnp

from sipp_tpu import hostref as H
from sipp_tpu import curves as C


def _bits_short(ks, nbits):
    return jnp.asarray(
        np.array([[(k >> (nbits - 1 - i)) & 1 for k in ks]
                  for i in range(nbits)], dtype=np.uint32))


def test_msm_bucket_sharded_g1(rng):
    from sipp_tpu.ops.msm import msm_bucket, msm_bucket_sharded, msm_g1
    from sipp_tpu.parallel import make_mesh
    from sipp_tpu.utils.testing import random_points

    mesh = make_mesh(8)
    n = 16  # 2 points per shard; includes zero scalar + duplicate digits
    A, _ = random_points(n, seed=61)
    ks = [int(rng.integers(1 << 12)) for _ in range(n - 1)] + [0]
    bits = _bits_short(ks, 12)
    pts = C.g1_encode(A)

    shard = C.g1_decode(C.G1.to_affine(
        msm_bucket_sharded(C.G1, pts, bits, mesh, c=4)[None]))[0]
    single = C.g1_decode(C.G1.to_affine(
        msm_bucket(C.G1, pts, bits, c=4)[None]))[0]
    ladder = C.g1_decode(C.G1.to_affine(msm_g1(pts, bits)[None]))[0]
    want = None
    for p, k in zip(A, ks):
        want = H.g1_add(want, H.g1_mul(p, k))
    assert shard == want
    assert single == want
    assert ladder == want
