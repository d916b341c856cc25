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


# ---------------------------------------------------------- lane merging
# The serial tails run with ONE real lane (B=1) and stacks on LEADING axes
# ((54, NL, 1) multiplicand stacks etc.).  Without merging, every vector
# op runs at 1/128 lane utilization and the flat-expansion ops LOSE to the
# L16 forms (measured in-flow, round 4).  mul/norm/canon therefore flatten
# leading stack axes into the lane axis around their compute (the
# tmul.mul stacked-lead pattern); raw column adds stay unmerged (cheap).

def _to_lanes(x):
    lead = x.shape[:-2]
    S = int(np.prod(lead)) if lead else 1
    if S > 1 and x.shape[-1] == 1:
        return jnp.transpose(x.reshape(S, x.shape[-2]), (1, 0)), lead
    return x, None


def _from_lanes(x, lead):
    if lead is None:
        return x
    return jnp.transpose(x, (1, 0)).reshape(*lead, x.shape[-2], 1)


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
    """Raw cols (value < R17) -> 16-bit limbs, exact value (lane-merged)."""
    m, lead = _to_lanes(cols)
    limbs, _ = norm_raw(m, NL)
    return _from_lanes(limbs, lead)


def canon_k(cols, K: int):
    """Raw cols with value < K*p -> CANONICAL (< p) 16-bit limbs: ONE
    stacked norm over candidates v + k*(R17 - p); candidate k's carry
    equals k iff v >= k*p (k*(R17-p) adds k overflows of the 17-limb
    window minus k*p; |v - k*p| << R17 keeps the floor exact).
    Lane-merged around the candidate norm."""
    m, lead = _to_lanes(cols)
    step = _c(2)
    cands = jnp.stack([m + k * step for k in range(K)])
    limbs, carry = norm_raw(cands, NL)
    out = limbs[0]
    for k in range(1, K):
        out = jnp.where((carry[k] >= k)[..., None, :], limbs[k], out)
    return _from_lanes(out, lead)


def mul(a, b):
    """Montgomery product a*b*R17^-1 mod p in SOS form, NO trailing
    conditional subtract: output CLEAN (< 2p, 16-bit limbs).  Inputs:
    16-bit limb arrays with value_a * value_b < p * R17 (~580p each).
    Lane-merged (stacked-lead flatten, tmul.mul pattern)."""
    if a.shape != b.shape:
        a, b = jnp.broadcast_arrays(a, b)
    a, lead = _to_lanes(a)
    b, _ = _to_lanes(b)
    return _from_lanes(_mul_merged(a, b), lead)


def _mul_merged(a, b):
    """mul core on already-lane-merged operands."""
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


# ===================================================================
# Flat-expansion Fq12 layer: each tower multiply runs as
#   (1) ONE stacked norm of the Fq-lane multiplicand stacks (linear
#       pre-combinations of the input coefficients, built raw),
#   (2) ONE stacked Montgomery multiply over all product lanes,
#   (3) raw-column linear reconstruction of the output coefficients
#       (negative terms ride coeff * (2^256-complement + CSUB)),
#   (4) ONE two-stage exit canonicalization (fold the 2^256-overflow
#       limb back via 2^256 mod p, then canon_k).
# The lane tables (which linear combination feeds each multiplicand
# lane; which signed combination of products forms each output) are
# DERIVED at import time by running the production tower formulas
# (pallas_fexp/pallas_miller structure) over a symbolic Fq whose
# elements are {term: coeff} dicts — no hand-derived coefficient
# tables to get wrong, and differential tests pin the result.
# ===================================================================

class _Sym:
    """Symbolic Fq element: {basis_key: int_coeff} linear combination."""

    __slots__ = ("d",)

    def __init__(self, d):
        self.d = {k: v for k, v in d.items() if v}

    @staticmethod
    def var(key):
        return _Sym({key: 1})

    def __add__(self, o):
        d = dict(self.d)
        for k, v in o.d.items():
            d[k] = d.get(k, 0) + v
        return _Sym(d)

    def __sub__(self, o):
        d = dict(self.d)
        for k, v in o.d.items():
            d[k] = d.get(k, 0) - v
        return _Sym(d)

    def scale(self, c):
        return _Sym({k: c * v for k, v in self.d.items()})


class _SymFq2:
    """Symbolic Fq2: pair of _Sym; mirrors the tmul fq2 helpers."""

    def __init__(self, c0, c1):
        self.c = (c0, c1)

    def __add__(self, o):
        return _SymFq2(self.c[0] + o.c[0], self.c[1] + o.c[1])

    def __sub__(self, o):
        return _SymFq2(self.c[0] - o.c[0], self.c[1] - o.c[1])

    def double(self):
        return _SymFq2(self.c[0].scale(2), self.c[1].scale(2))

    def mul_xi(self):
        return _SymFq2(self.c[0].scale(9) - self.c[1],
                       self.c[1].scale(9) + self.c[0])


class _Expander:
    """Collects Fq2 products of linear input combinations; karatsuba at
    the Fq level: each Fq2 product (x, y) contributes THREE Fq lanes
    (x0*y0, x1*y1, (x0+x1)*(y0+y1)) and reconstructs as
    c0 = l0 - l1, c1 = l2 - l0 - l1."""

    def __init__(self):
        self.lanes = []          # (x_sym, y_sym) Fq multiplicand pairs

    def fq2_mul(self, x, y):
        i = len(self.lanes)
        self.lanes += [
            (x.c[0], y.c[0]),
            (x.c[1], y.c[1]),
            (x.c[0] + x.c[1], y.c[0] + y.c[1]),
        ]
        l0, l1, l2 = (_Sym.var(("v", i + k)) for k in range(3))
        return _SymFq2(l0 - l1, l2 - l0 - l1)


def _derive_fq12_mul():
    """Lane tables for fq12_mul: 3-way fq6 karatsuba of 6-way fq2
    toom-karatsuba (mirrors pallas_fexp.fq12_mul / fq6_mul exactly)."""
    ex = _Expander()

    def var6(name):
        return [
            _SymFq2(_Sym.var((name, j, 0)), _Sym.var((name, j, 1)))
            for j in range(3)
        ]

    def fq6_mul(a, b):
        x = [a[0], a[1], a[2], a[1] + a[2], a[0] + a[1], a[0] + a[2]]
        y = [b[0], b[1], b[2], b[1] + b[2], b[0] + b[1], b[0] + b[2]]
        v = [ex.fq2_mul(xi_, yi_) for xi_, yi_ in zip(x, y)]
        v0, v1, v2, t12, t01, t02 = v
        c0 = v0 + (t12 - (v1 + v2)).mul_xi()
        c1 = (t01 - (v0 + v1)) + v2.mul_xi()
        c2 = (t02 - (v0 + v2)) + v1
        return [c0, c1, c2]

    def fq6_mul_by_v(a):
        return [a[2].mul_xi(), a[0], a[1]]

    a0, a1 = var6("a0"), var6("a1")
    b0, b1 = var6("b0"), var6("b1")
    s_a = [x + y for x, y in zip(a0, a1)]
    s_b = [x + y for x, y in zip(b0, b1)]
    v0 = fq6_mul(a0, b0)
    v1 = fq6_mul(a1, b1)
    v2 = fq6_mul(s_a, s_b)
    c0 = [x + y for x, y in zip(v0, fq6_mul_by_v(v1))]
    c1 = [v2[j] - (v0[j] + v1[j]) for j in range(3)]
    outs = []
    for half in (c0, c1):
        for f2 in half:
            outs += [f2.c[0], f2.c[1]]
    return ex.lanes, outs


def _derive_cyclo():
    """Lane tables for the Granger-Scott cyclotomic squaring (mirrors
    pallas_fexp.fq12_cyclo_sqr: products of the 9-lane z stack, outputs
    3T +/- 2z linear in products AND inputs)."""
    ex = _Expander()
    z = [_SymFq2(_Sym.var(("z", i, 0)), _Sym.var(("z", i, 1)))
         for i in range(6)]
    z0, z4, z3, z2, z1, z5 = z[0], z[1], z[2], z[3], z[4], z[5]
    pairs = [(z0, z0), (z1, z1), (z0, z1),
             (z2, z2), (z3, z3), (z2, z3),
             (z4, z4), (z5, z5), (z4, z5)]
    v = [ex.fq2_mul(x, y) for x, y in pairs]
    a2 = [v[0], v[3], v[6]]
    b2 = [v[1], v[4], v[7]]
    ab = [v[2], v[5], v[8]]
    t_ = [x + y.mul_xi() for x, y in zip(a2, b2)]
    u_ = [x.double() for x in ab]
    # production wiring (pallas_fexp.fq12_cyclo_sqr): the stacked unpack
    # (t0_, u0, s0) is the t-triple over pairs, (t1_, u1, s1) the u-triple;
    # its T6 = [t0_, u0, s0, xi(s1), t1_, u1] is therefore
    T6 = [t_[0], t_[1], t_[2], u_[2].mul_xi(), u_[0], u_[1]]
    Z6 = [z0, z4, z3, z2, z1, z5]
    r3 = [x.double() + x for x in T6]
    d2 = [x.double() for x in Z6]
    lo = [r3[k] - d2[k] for k in range(3)]
    hi = [r3[3 + k] + d2[3 + k] for k in range(3)]
    outs = []
    for f2 in lo + hi:
        outs += [f2.c[0], f2.c[1]]
    return ex.lanes, outs


def canon_big(cols, bound_p: float):
    """Raw cols with value < bound_p * p -> canonical.  Small bounds use
    canon_k directly; larger ones fold the 2^256-overflow limb back via
    2^256 mod p (= the _TO16 constant, < 0.3p) until < ~8p remains —
    each fold: one norm + one broadcast multiply-add, value-exact.
    Lane-merged across the folds + final canon."""
    cols, lead = _to_lanes(cols)
    while bound_p + 2 > 9:
        limbs, _ = norm_raw(cols, NL)
        idx = jax.lax.broadcasted_iota(
            jnp.int32, limbs.shape, limbs.ndim - 2)
        lo = jnp.where(idx == 16, 0, limbs)
        h = limbs[..., 16:17, :]           # value h * 2^256, h < 2^16
        cols = lo + h * _c(5)
        bound_p = (1 << 256) / P + (bound_p * P / (1 << 256) + 1) * 0.3
    return _from_lanes(canon_k(cols, int(bound_p) + 2), lead)


def _index_of(key):
    """Symbolic basis key -> (which_input, flat Fq index).  Fq2 coeff c of
    the i-th Fq2 in a flat (..., 2*n2, NL, B) input sits at 2*i + c."""
    if key[0] == "v":
        return ("v", key[1])
    name = key[0]
    if name == "z":
        return ("a", 2 * key[1] + key[2])
    half = 0 if name in ("a0", "b0") else 6
    src = "a" if name.startswith("a") else "b"
    return (src, half + 2 * key[1] + key[2])


def _exec_table(lanes, outs, a_flat, b_flat=None):
    """Run a derived lane table: ONE stacked norm of the multiplicand
    lanes, ONE stacked Montgomery multiply, raw linear reconstruction
    (negative terms via coeff * (complement + CSUB)), ONE exit canon.
    a_flat/b_flat: (n_coeff, NL, B) CLEAN (< 2p) 16-bit limb stacks.
    Returns (n_out, NL, B) canonical (< p)."""
    src = {"a": a_flat, "b": b_flat if b_flat is not None else a_flat}

    def pick(which, i):
        return src[which][..., i, :, :]      # coeff axis -3 (leading B ok)

    def gather(sym):
        acc = None
        for key, c in sym.d.items():
            which, i = _index_of(key)
            term = pick(which, i)
            term = term * np.uint32(c) if c != 1 else term
            acc = term if acc is None else acc + term
        return acc

    # lane-merge ONCE around the stacked norm + multiply (the product
    # lanes ride the VPU lane axis; reconstruction below is cheap raw adds
    # in the sublane-stacked layout)
    x = jnp.stack([gather(xs) for xs, _ in lanes])
    y = jnp.stack([gather(ys) for _, ys in lanes])
    xm, lead = _to_lanes(x)
    ym, _ = _to_lanes(y)
    xn, _ = norm_raw(xm, NL)
    yn, _ = norm_raw(ym, NL)
    v = _from_lanes(_mul_merged(xn, yn), lead)

    outs_cols = []
    bounds = []
    for sym in outs:
        acc = None
        ncsub = 0
        bound = 0.0
        for key, c in sym.d.items():
            which, i = _index_of(key)
            opnd = v[i] if which == "v" else pick(which, i)
            if c > 0:
                term = opnd * np.uint32(c) if c != 1 else opnd
                bound += 2.0 * c
            else:
                idx = jax.lax.broadcasted_iota(
                    jnp.int32, opnd.shape, opnd.ndim - 2)
                comp = jnp.where(idx < 16, 0xFFFF - opnd, 0)
                term = comp * np.uint32(-c) if c != -1 else comp
                ncsub += -c
                bound += 5.3 * (-c)
            acc = term if acc is None else acc + term
        if ncsub:
            acc = acc + np.uint32(ncsub) * _c(3)
            bound += 1.0
        outs_cols.append(acc)
        bounds.append(bound)
    stacked = jnp.stack(outs_cols)
    # out-coeff axis back to -3 so leading batch axes pass through
    return jnp.moveaxis(canon_big(stacked, max(bounds)), 0, -3)


_FQ12_LANES, _FQ12_OUTS = _derive_fq12_mul()
_CYC_LANES, _CYC_OUTS = _derive_cyclo()


def _to_flat(a):
    """(..., 2, 3, 2, NL, B) -> (..., 12, NL, B)."""
    return a.reshape(*a.shape[:-5], 12, *a.shape[-2:])


def _from_flat(f):
    return f.reshape(*f.shape[:-3], 2, 3, 2, *f.shape[-2:])


def fq12_mul(a, b):
    """Fq12 Karatsuba multiply, flat-expansion form: 54 product lanes,
    one norm + one multiply + one exit canon.  a, b: (2, 3, 2, NL, B)
    clean; returns canonical."""
    out = _exec_table(_FQ12_LANES, _FQ12_OUTS, _to_flat(a), _to_flat(b))
    return _from_flat(out)


def fq12_cyclo_sqr(g):
    """Granger-Scott cyclotomic squaring, flat-expansion form: 9 product
    lanes, one norm + one multiply + one exit canon."""
    return _from_flat(_exec_table(_CYC_LANES, _CYC_OUTS, _to_flat(g)))


def neg_clean(x):
    """-x mod p for CLEAN x (< 4p), canonical out: one stacked canon."""
    return canon_k(sub(jnp.zeros_like(x), x), 8)


def fq12_conj(a):
    """f^(p^6): negate the w half.  a: (..., 2, 3, 2, NL, B) clean."""
    return jnp.concatenate(
        [a[..., 0:1, :, :, :, :], neg_clean(a[..., 1:2, :, :, :, :])],
        axis=-5)


def l17_mont_table(vals_l16_mont):
    """Host helper: an L16-Montgomery uint32 limb table (..., 16) ->
    L17-Montgomery 17-limb table (for constant inputs like the Frobenius
    coefficients).  numpy, import/trace-time only."""
    arr = np.asarray(vals_l16_mont, np.uint64)
    flat = arr.reshape(-1, 16)
    out = np.zeros((flat.shape[0], NL), np.uint32)
    r16inv = pow(1 << 256, -1, P)
    for i, limbs16 in enumerate(flat):
        v = 0
        for j in range(15, -1, -1):
            v = (v << 16) | int(limbs16[j])
        plain = (v * r16inv) % P           # decode L16 Montgomery
        out[i] = _limbs((plain * R17) % P)  # encode L17 Montgomery
    return out.reshape(arr.shape[:-1] + (NL,))


def fq12_frob(a, frob17, k: int):
    """a^(p^k), k in {1,2,3}; frob17: (3, 6, 2, NL) L17-Montgomery
    constant table (l17_mont_table of pallas_fexp.FROB_NP), passed as a
    kernel input.  Mirrors pallas_fexp.fq12_frob: per-Fq2 conjugation for
    odd k, then an Fq2 multiply by the constant."""
    if k % 2:
        a = jnp.concatenate(
            [a[..., 0:1, :, :], neg_clean(a[..., 1:2, :, :])], axis=-3)
    c = a.reshape(*a.shape[:-5], 6, 2, NL, a.shape[-1])
    out = fq2_mul(c, jnp.broadcast_to(frob17[k - 1][..., None], c.shape))
    return out.reshape(a.shape)
