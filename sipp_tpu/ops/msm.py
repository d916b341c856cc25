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


def _digits(bits, c: int):
    """(nbits, n) MSB-first bits -> (w, n) c-bit window digits, MSB window
    first (the first window zero-padded when c doesn't divide nbits)."""
    nbits, n = bits.shape
    w = -(-nbits // c)
    pad = w * c - nbits
    if pad:
        bits = jnp.concatenate([jnp.zeros((pad, n), bits.dtype), bits], 0)
    digits = jnp.zeros((w, n), jnp.int32)
    for j in range(c):
        digits = (digits << 1) + bits[j::c].astype(jnp.int32)
    return digits


def _window_buckets(curve, points_aff, dig, c: int):
    """One window's (2^c - 1, ...) Jacobian bucket sums B_k = sum of points
    with digit k (k = 1..2^c-1), every stage a wide batched op:
    argsort -> gathered points -> segmented-scan partial sums -> segment-end
    gather.  Scatter-free: jitted dynamic scatters miscompile on some
    XLA:CPU hosts (see fields/fp.py Montgomery reduction note); keys are
    sorted, so searchsorted(right)-1 is the last index of each bucket's
    segment, where the inclusive scan holds the full sum."""
    n = dig.shape[0]
    perm = jnp.argsort(dig)
    d_s = dig[perm]
    jac = curve.jac_from_affine(points_aff[perm])
    # zero-digit lanes contribute nothing: mask them to infinity so the
    # scan and the bucket-0 slot both stay inert
    jac = jnp.where(curve._expand_pt(d_s == 0), jnp.zeros_like(jac), jac)
    sums = _segment_scan_points(curve, d_s, jac)
    ks = jnp.arange(1, 1 << c)
    pos = jnp.clip(jnp.searchsorted(d_s, ks, side="right") - 1, 0, n - 1)
    hit = jnp.take(d_s, pos) == ks
    return jnp.where(curve._expand_pt(hit), jnp.take(sums, pos, axis=0),
                     curve.jac_infinity((ks.shape[0],)))


def _horner_windows(curve, buckets_all, c: int):
    """Combine per-window buckets (w, 2^c-1, ...) into the MSM result:
    per window the suffix associative scan (sum_k k*B_k identity) + one tree
    sum; windows combine by Horner with c batched doublings."""

    def window(acc, buckets):
        suffix = jax.lax.associative_scan(curve.add, buckets, reverse=True)
        t_w = _tree_sum(curve, suffix)
        for _ in range(c):
            acc = curve.dbl(acc)
        return curve.add(acc, t_w), None

    acc, _ = jax.lax.scan(window, curve.jac_infinity(()), buckets_all)
    return acc


def msm_bucket(curve, points_aff, bits, c: int = 8):
    """sum_i [k_i] P_i via fixed-window buckets (the north-star "bucket MSM"
    formulation; reference analogue: the starky exp statements' batched
    scalar-mul workloads, SURVEY.md D7/P4).

    Per window: c-bit digits -> bucket sums (_window_buckets) -> suffix
    associative scan -> tree sum; windows combine by Horner (_horner_windows).
    Every stage is a wide batched curve op or a log-depth scan; nothing
    serializes over n.

    Cost honesty: this scan formulation does MORE work than the ladder at
    scale — W*n*log2(n) complete adds (W = ceil(254/c) windows) vs the
    ladder's ~2*254*n, so the ladder wins whenever log2(n) > ~16/W-adjusted,
    i.e. for every n this framework targets — and its serial depth
    W*(log2(n) + c + 2^c-suffix) also exceeds the ladder's 254 at large n.
    It is the semantics anchor for the Pippenger formulation (exact
    bucket/window decomposition, oracle-tested); msm() remains the
    single-device production path, and msm_bucket_sharded composes the same
    windows over a device mesh for the multi-host regime (SURVEY P4).

    points_aff: (n, ...) affine; bits: (254, n) MSB-first.  Jacobian result.
    Same group element as msm() (differential test in tests/test_msm_io.py).
    """
    digits = _digits(bits, c)

    def window(acc, dig):
        buckets = _window_buckets(curve, points_aff, dig, c)
        suffix = jax.lax.associative_scan(curve.add, buckets, reverse=True)
        t_w = _tree_sum(curve, suffix)
        for _ in range(c):
            acc = curve.dbl(acc)
        return curve.add(acc, t_w), None

    acc, _ = jax.lax.scan(window, curve.jac_infinity(()), digits)
    return acc


def msm_bucket_sharded(curve, points_aff, bits, mesh, c: int = 8):
    """SURVEY P4 / BASELINE config 4: per-SHARD bucket accumulation composed
    over a device mesh.  Each device buckets only its own n/d points per
    window (the wide data-parallel stage, zero communication), then the
    (w, 2^c-1) bucket tables are combined bucket-WISE across the mesh — the
    only collective, one all_gather of 2^c-1 Jacobian points per window —
    and the cheap window combine (suffix scan + Horner, 2^c-wide) runs
    replicated.  Cross-device traffic is O(w * 2^c) points, independent of n;
    the EC "reduction" rides the gather + a log2(d) batched add tree because
    Jacobian addition is not a psum-able monoid on coordinates.

    points_aff: (n, ...) affine, n divisible by mesh size; bits: (nbits, n)
    MSB-first.  Returns a replicated Jacobian point == msm_bucket(...) ==
    msm(...) (differential: tests/test_msm_sharded.py)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    digits = _digits(bits, c)

    def body(pts, digs):
        def one(dig):
            return _window_buckets(curve, pts, dig, c)

        local = jax.lax.map(one, digs)            # (w, 2^c-1, ...)
        allb = jax.lax.all_gather(local, axis)    # (d, w, 2^c-1, ...)
        comb = allb
        while comb.shape[0] > 1:                  # bucket-wise add tree
            half = comb.shape[0] // 2
            rest = comb[2 * half:]
            comb = jnp.concatenate(
                [curve.add(comb[:half], comb[half: 2 * half]), rest], 0)
        return _horner_windows(curve, comb[0], c)

    # check_vma=False: the post-all_gather combine is replicated by
    # construction (same convention as parallel/sharded._round_kernels)
    fn = shard_map(body, mesh=mesh, in_specs=(P(axis), P(None, axis)),
                   out_specs=P(), check_vma=False)
    return jax.jit(fn)(points_aff, digits)


def msm_bucket_g1(points_aff, bits, c: int = 8):
    return msm_bucket(G1, points_aff, bits, c)


def msm_bucket_g2(points_aff, bits, c: int = 8):
    return msm_bucket(G2, points_aff, bits, c)
