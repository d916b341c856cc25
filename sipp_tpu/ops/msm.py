"""Multi-scalar multiplication: sum_i [k_i] P_i (SURVEY.md P4 / D7).

TPU-first design note.  Classic Pippenger bucket MSM serializes over the n
input points (each bucket update is a data-dependent EC add) and parallelizes
only across ~32 windows — exactly backwards for a VPU that wants thousands of
independent lanes and hates serial chains.  On TPU the winning layout for
n up to ~10^5 is the transpose: a 254-step shared ladder where EVERY step is
an n-wide batched Jacobian op (scalar_mul_per_lane), followed by a log2(n)
complete-addition tree.  Total work is higher (381n vs n + c*2^c EC ops) but
wall-clock is depth-bound: 254 + log2(n) wide steps vs n serial bucket
updates.  A Pallas bucket variant (per-shard buckets + psum, for the
multi-host n >> 10^6 regime) is the documented follow-up.

Sharded use: msm composes with shard_map — per-shard partial sums then a
cross-device gathered tree (see parallel/sharded.py patterns).
"""

import jax.numpy as jnp

from ..curves import G1, G2


def _tree_sum(curve, pts):
    """Complete-addition tree reduction over the leading axis."""
    n = pts.shape[0]
    while n > 1:
        half = n // 2
        if n % 2:
            rest = pts[n - 1 : n]
            pts = jnp.concatenate(
                [curve.add(pts[:half], pts[half : 2 * half]), rest], 0)
            n = half + 1
        else:
            pts = curve.add(pts[:half], pts[half:])
            n = half
    return pts[0]


def msm(curve, points_aff, bits):
    """sum_i [k_i] P_i.  points_aff: (n, ...) affine; bits: (254, n) MSB-first
    per-lane scalar bits.  Returns a Jacobian point."""
    per_lane = curve.scalar_mul_per_lane(points_aff, bits)
    return _tree_sum(curve, per_lane)


def msm_g1(points_aff, bits):
    return msm(G1, points_aff, bits)


def msm_g2(points_aff, bits):
    return msm(G2, points_aff, bits)
