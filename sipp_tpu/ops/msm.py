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

import jax
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


# --------------------------------------------------- fixed-window bucket MSM

def _segment_scan_points(curve, keys, jac):
    """Inclusive segmented-sum scan over SORTED int keys: position i holds
    the Jacobian sum of all points j <= i with keys[j] == keys[i].

    TPU-first formulation of Pippenger's bucket accumulation: instead of n
    serial data-dependent bucket updates (the GPU/CPU layout), sort once and
    run one log2(n)-depth associative scan whose every level is an n-wide
    batched complete addition.  The segmented-sum combine is associative on
    contiguous ranges of a sorted key sequence, which is exactly what
    lax.associative_scan forms."""

    def combine(a, b):
        ka, pa = a
        kb, pb = b
        merged = curve.add(pa, pb)
        same = curve._expand_pt(ka == kb)
        return kb, jnp.where(same, merged, pb)

    _, out = jax.lax.associative_scan(combine, (keys, jac))
    return out


def msm_bucket(curve, points_aff, bits, c: int = 8):
    """sum_i [k_i] P_i via fixed-window buckets (the north-star "bucket MSM"
    formulation; reference analogue: the starky exp statements' batched
    scalar-mul workloads, SURVEY.md D7/P4).

    Per window: c-bit digits -> argsort -> gathered points -> segmented-scan
    bucket sums -> segment-end gather into 2^c buckets -> suffix associative
    scan (the sum_k k*B_k identity) -> one tree sum.  Windows combine by
    Horner with c batched doublings per window.  Every stage is a wide
    batched curve op or a log-depth scan; nothing serializes over n.

    Cost honesty: this scan formulation does MORE work than the ladder at
    scale — W*n*log2(n) complete adds (W = ceil(254/c) windows) vs the
    ladder's ~2*254*n, so the ladder wins whenever log2(n) > ~16/W-adjusted,
    i.e. for every n this framework targets — and its serial depth
    W*(log2(n) + c + 2^c-suffix) also exceeds the ladder's 254 at large n.
    It exists as the semantics anchor for the Pippenger formulation (exact
    bucket/window decomposition, oracle-tested) that the per-shard-bucket
    Pallas variant described in the module header would implement for the
    n >> 10^6 multi-host regime; msm() remains the production path.

    points_aff: (n, ...) affine; bits: (254, n) MSB-first.  Jacobian result.
    Same group element as msm() (differential test in tests/test_msm_io.py).
    """
    nbits, n = bits.shape
    w = -(-nbits // c)  # windows, MSB-first; first window may be short
    pad = w * c - nbits
    if pad:
        bits = jnp.concatenate([jnp.zeros((pad, n), bits.dtype), bits], 0)
    digits = jnp.zeros((w, n), jnp.int32)
    for j in range(c):
        digits = (digits << 1) + bits[j::c].astype(jnp.int32)

    acc = curve.jac_infinity(())

    def window(acc, dig):
        perm = jnp.argsort(dig)
        d_s = dig[perm]
        jac = curve.jac_from_affine(points_aff[perm])
        # zero-digit lanes contribute nothing: mask them to infinity so the
        # scan and the bucket-0 slot both stay inert
        jac = jnp.where(curve._expand_pt(d_s == 0), jnp.zeros_like(jac), jac)
        sums = _segment_scan_points(curve, d_s, jac)
        # Segment-end GATHER (scatter-free: jitted dynamic scatters miscompile
        # on some XLA:CPU hosts — see fields/fp.py Montgomery reduction note):
        # keys are sorted, so searchsorted(right)-1 is the last index of each
        # bucket's segment, where the inclusive scan holds the full sum.
        ks = jnp.arange(1, 1 << c)
        pos = jnp.clip(jnp.searchsorted(d_s, ks, side="right") - 1, 0, n - 1)
        hit = jnp.take(d_s, pos) == ks
        buckets = jnp.where(curve._expand_pt(hit), jnp.take(sums, pos, axis=0),
                            curve.jac_infinity((ks.shape[0],)))
        # T = sum_{k>=1} k * B_k = sum of suffix sums over buckets (k=1..2^c-1)
        suffix = jax.lax.associative_scan(curve.add, buckets, reverse=True)
        t_w = _tree_sum(curve, suffix)
        for _ in range(c):
            acc = curve.dbl(acc)
        return curve.add(acc, t_w), None

    acc, _ = jax.lax.scan(window, acc, digits)
    return acc


def msm_bucket_g1(points_aff, bits, c: int = 8):
    return msm_bucket(G1, points_aff, bits, c)


def msm_bucket_g2(points_aff, bits, c: int = 8):
    return msm_bucket(G2, points_aff, bits, c)
