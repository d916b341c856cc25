"""Latency-optimized Fq/tower primitives for SERIAL (small-B) Pallas tails.

Motivation (round-4 probe, scratch/r4_latency_probe.py on v5e): in the
final-exponentiation regime (B=1, ~470 dependent stages) the production
tmul ops are ADD/NORM-latency-bound, not multiply-bound:

    t.mul (CIOS)        5.24 us   (16 serial limb iterations)
    t._mul_impl_sos     3.35 us   (3 independent product passes)
    fq12_cyclo_sqr     12.34 us   (1 stacked mul stage + ~15 norm-ops)
    fq12_mul           16.32 us   (1 stacked mul stage + ~15 norm-ops)

Every t.add/sub/double/mul9 pays a Kogge-Stone normalization + mod-p
canonicalization because the L=16-limb Montgomery domain (R16 = 2^256,
R16/p = 5.29) leaves no lazy headroom.  This module widens the domain by
ONE 16-bit limb:

    NL = 17 limbs, R17 = 2^272,  R17/p = 346,700

and works with three value classes:

    raw   — uint32 COLUMN arrays (..., 17, B), value = sum c_i 2^16i,
            columns < 2^31; adds/doubles/9x are plain column arithmetic
            with ZERO normalization;
    clean — 16-bit limbs, value < 2p (every `mul` output).  The only legal
            SUBTRAHEND form: x - y rides the 2^256-complement of y's low
            16 limbs plus the constant (1 - 2^256) mod p, inflating the
            raw bound by just ~6.3p (y < 4p keeps y's limb 16 zero);
    canonical — < p (kernel-exit form, bit-compatible with tmul).

`mul` is the SOS form (independent product passes — the shallow-latency
variant) WITHOUT the trailing conditional subtract: inputs are 16-bit limb
arrays with value_a * value_b < p * R17 (~580p each), output clean (< 2p).
Tower ops norm raw accumulations ONCE per multiply stage, and exit through
`canon_k` — one stacked norm over [v - k*p] candidates (the +(R17 - p)
overflow trick, generalized) — so every op is value-exact mod p and ops
compose without bound growth.  Swapping these ops under a fixed schedule is
therefore bit-invisible at the kernel boundary (`from_l16`/`to_l16`
convert domains by one Montgomery multiply each).

Layout matches ops/tmul.py: limbs on sublanes (axis -2), batch on lanes;
constants ride a packed table bound with `bound_consts`.
"""

import contextlib

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from ..fields import FQ

NL = 17                      # limbs
R17 = 1 << (16 * NL)         # Montgomery radix 2^272
P = FQ.p
U32 = jnp.uint32

assert FQ.L == 16


def _limbs(v: int, n: int = NL) -> np.ndarray:
    return np.array([(v >> (16 * i)) & 0xFFFF for i in range(n)], np.uint32)


_NP17 = (-pow(P, -1, R17)) % R17     # -p^-1 mod R17 (SOS m-step)
_CSUB = (1 - (1 << 256)) % P         # 2^256-complement correction
_FROM16 = pow(2, 272 + 16, P)        # Mont17 mult taking R16-form -> R17-form
_TO16 = pow(2, 256, P)               # Mont17 mult taking R17-form -> R16-form

CONSTS_NP = np.stack([
    _limbs(P),          # 0
    _limbs(_NP17),      # 1
    _limbs(R17 - P),    # 2  (canon candidate step)
    _limbs(_CSUB),      # 3
    _limbs(_FROM16),    # 4
    _limbs(_TO16),      # 5
])
NCONST = CONSTS_NP.shape[0]

_BOUND = None


@contextlib.contextmanager
def bound_consts(consts):
    global _BOUND
    prev = _BOUND
    _BOUND = consts
    try:
        yield
    finally:
        _BOUND = prev


def _c(row: int):
    assert _BOUND is not None, "tmul_lat ops need `with bound_consts(...)`"
    return _BOUND[row][..., None]


def _shift_up(x, s: int):
    if s == 0:
        return x
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 2)
    return jnp.where(idx >= s, pltpu.roll(x, s, axis=x.ndim - 2), 0)


def norm_raw(cols, num_out: int):
    """Kogge-Stone carry propagation (tmul.norm, NL-parameterized).
    Returns (16-bit limbs of value mod 2^(16*num_out), carry)."""
    t = cols[..., :num_out, :]
    r = t & 0xFFFF
    b = t >> 16
    b_shift = _shift_up(b, 1)
    u = r + b_shift
    g = u >> 16
    p_ = (u == 0xFFFF).astype(U32)
    e, pp, s = g, p_, 1
    while s < num_out:
        e = e | (pp & _shift_up(e, s))
        pp = pp & _shift_up(pp, s)
        s *= 2
    c = b_shift + _shift_up(e, 1)
    limbs = (r + c) & 0xFFFF
    carry = b[..., num_out - 1, :] + e[..., num_out - 1, :]
    return limbs, carry


def norm(cols):
    """Raw cols (value < R17) -> 16-bit limbs, exact value."""
    limbs, _ = norm_raw(cols, NL)
    return limbs


def canon_k(cols, K: int):
    """Raw cols with value < K*p -> CANONICAL (< p) 16-bit limbs: ONE
    stacked norm over candidates v + k*(R17 - p); candidate k's carry
    equals k iff v >= k*p (k*(R17-p) adds k overflows of the 17-limb
    window minus k*p; |v - k*p| << R17 keeps the floor exact)."""
    step = _c(2)
    cands = jnp.stack([cols + k * step for k in range(K)])
    limbs, carry = norm_raw(cands, NL)
    out = limbs[0]
    for k in range(1, K):
        out = jnp.where((carry[k] >= k)[..., None, :], limbs[k], out)
    return out


def mul(a, b):
    """Montgomery product a*b*R17^-1 mod p in SOS form, NO trailing
    conditional subtract: output CLEAN (< 2p, 16-bit limbs).  Inputs:
    16-bit limb arrays with value_a * value_b < p * R17 (~580p each)."""
    if a.shape != b.shape:
        a, b = jnp.broadcast_arrays(a, b)
    b_wide = jnp.concatenate([b, jnp.zeros_like(b)], axis=-2)
    acc = None
    for i in range(NL):
        t = a[..., i : i + 1, :] * b_wide
        lo = t & 0xFFFF
        hi = t >> 16
        term = pltpu.roll(lo, i, axis=lo.ndim - 2) if i else lo
        term = term + pltpu.roll(hi, i + 1, axis=hi.ndim - 2)
        acc = term if acc is None else acc + term
    t_cols = acc                                   # 2NL cols, each < 2^22
    t_lo, _ = norm_raw(t_cols, NL)                 # T mod R17
    np_c = _c(1)
    m_acc = None
    for i in range(NL):
        t = t_lo[..., i : i + 1, :] * np_c
        term = _shift_up(t & 0xFFFF, i) + _shift_up(t >> 16, i + 1)
        m_acc = term if m_acc is None else m_acc + term
    m_limbs, _ = norm_raw(m_acc, NL)               # m = T*N' mod R17
    p_wide = jnp.concatenate(
        [jnp.broadcast_to(_c(0), m_limbs.shape), jnp.zeros_like(m_limbs)],
        axis=-2)
    u_acc = t_cols
    for i in range(NL):
        t = m_limbs[..., i : i + 1, :] * p_wide
        lo = t & 0xFFFF
        hi = t >> 16
        term = pltpu.roll(lo, i, axis=lo.ndim - 2) if i else lo
        term = term + pltpu.roll(hi, i + 1, axis=hi.ndim - 2)
        u_acc = u_acc + term
    limbs, _ = norm_raw(u_acc, 2 * NL)             # (T + m*p): low NL zero
    return limbs[..., NL:, :]                      # / R17  (< p + ab/R17)


def sub(a, b):
    """a - b mod p as RAW cols.  a: raw cols; b: 16-bit limbs with value
    < 4p (limb 16 is then 0 and the low-16-limb 2^256-complement is exact).
    Adds < 6.3p to a's value bound (2^256 - b + CSUB)."""
    idx = jax.lax.broadcasted_iota(jnp.int32, b.shape, b.ndim - 2)
    comp = jnp.where(idx < 16, 0xFFFF - b, 0)
    return a + comp + _c(3)


def mul9(a):
    """9*a, raw in raw out (columns *9 < 2^31 for columns < 2^27)."""
    return (a << 3) + a


# ------------------------------------------------------------- conversions

def from_l16(a16):
    """tmul-domain (..., 16, B) Montgomery-R16 limbs (canonical or < 2p)
    -> clean L17 (< 2p): one Montgomery multiply by 2^288 mod p."""
    z = jnp.zeros(a16.shape[:-2] + (1,) + a16.shape[-1:], U32)
    a17 = jnp.concatenate([a16, z], axis=-2)
    return mul(a17, jnp.broadcast_to(_c(4), a17.shape))


def to_l16(a):
    """Clean/16-bit-limb L17 value -> CANONICAL tmul-domain (..., 16, B)."""
    r = mul(a, jnp.broadcast_to(_c(5), a.shape))   # < 2p, R16-form * 2^16
    return canon_k(r, 2)[..., :16, :]


# --------------------------------------------------------------- Fq2 layer
# Fq2: (..., 2, NL, B); "clean" element = both coeffs clean (< 2p).

def fq2_mul(a, b):
    """Karatsuba over clean inputs -> clean output.  ONE stacked norm is
    needed only for the cross sums (a0+a1 < 4p as cols -> 16-bit limbs);
    the final combines exit through a stacked canon (c0 = v0 - v1 + shift:
    raw < 2p + 6.3p; c1 = t - v0 - v1 raw < 2p + 12.6p)."""
    a0, a1 = a[..., 0, :, :], a[..., 1, :, :]
    b0, b1 = b[..., 0, :, :], b[..., 1, :, :]
    s = norm(jnp.stack([a0 + a1, b0 + b1]))        # < 4p each
    x = jnp.stack([a0, a1, s[0]])
    y = jnp.stack([b0, b1, s[1]])
    v = mul(x, y)                                  # < 2p; cross < (4p)^2/R17+p
    c0 = sub(v[0], v[1])                           # raw < 8.3p
    c1 = sub(sub(v[2], v[0]), v[1])                # raw < 14.6p
    return jnp.moveaxis(canon_k(jnp.stack([c0, c1]), 15), 0, -3)


def fq2_sqr(a):
    return fq2_mul(a, a)


def fq2_mul_xi(a):
    """(9+u) * a for a CLEAN input -> clean-ish (< p after canon).
    9a0 - a1: raw 18p + 6.3p; 9a1 + a0: raw 20p."""
    a0, a1 = a[..., 0, :, :], a[..., 1, :, :]
    lo = sub(mul9(a0), a1)
    hi = mul9(a1) + a0
    return jnp.moveaxis(canon_k(jnp.stack([lo, hi]), 25), 0, -3)


def fq2_conj(a):
    """(a0, -a1) for a clean input: 0 - a1 via sub, canon'd."""
    a0, a1 = a[..., 0, :, :], a[..., 1, :, :]
    na1 = canon_k(sub(jnp.zeros_like(a1), a1), 8)
    return jnp.stack([a0, na1], axis=-3)
