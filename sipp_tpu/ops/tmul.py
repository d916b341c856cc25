"""Transposed-layout Fq/tower primitives for Pallas TPU kernels.

Layout: an Fq element is (..., L, B) uint32 — limbs on the SUBLANE axis
(axis -2), batch on the LANE axis (axis -1).  This is the round-1 "round-2
fix" recorded in ops/pallas_fq.py: every limb shift becomes a sublane
`pltpu.roll`, and no lane-axis concatenate/pad/slice ever occurs, which
sidesteps the Mosaic `tpu.concatenate` offset-layout bug that blocked the
batch-on-sublanes kernel.  The lane axis carries only independent batch
elements, exactly what the VPU wants.

Everything here is plain jnp + pltpu.roll, so the same functions run
  - inside pallas_call kernels (Mosaic), the production path, and
  - under pallas interpret mode for CPU differential tests.

Pallas kernels cannot capture array constants (they must be inputs), so the
field constants are packed into ONE (NCONST, 2L) uint32 array (`CONSTS_NP`);
kernels take it as an input ref and bind it around the math with
`with bound_consts(ref[:]): ...`.  Outside kernels, `bound_consts(CONSTS_NP)`
works directly.

Semantics are bit-identical to fields/fp.py (same separated-Montgomery SOS
algorithm, same fused conditional subtraction); differentially tested against
it in tests/test_pallas.py.  Reference semantics: ark-bn254 Fq/Fq2/Fq6/Fq12
(SURVEY.md D1; /root/reference/src/prover_native.rs:3).
"""

import contextlib

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import FQ

L = FQ.L
U32 = jnp.uint32

# Packed constant table: one (NCONST, 2L) uint32 array -> kernel input.
# Row layout (each used as a (., 1) column broadcast over lanes):
#   0: p limbs        ‖ zeros          (rows give both L- and 2L-wide views)
#   1: N' limbs       ‖ zeros
#   2: R-p limbs      ‖ zeros
#   3: zeros          ‖ R-p limbs      ((R-p) << 16L, for the fused mul cond-sub)
_p = np.array(FQ.p_limbs, dtype=np.uint32)
_np_ = FQ.np_arr_np.astype(np.uint32)
_rp = np.asarray(jax.device_get(FQ.rp_arr), dtype=np.uint32)
_one = np.asarray(jax.device_get(FQ.one_mont), dtype=np.uint32)
_z = np.zeros(L, np.uint32)
CONSTS_NP = np.stack([
    np.concatenate([_p, _z]),
    np.concatenate([_np_, _z]),
    np.concatenate([_rp, _z]),
    np.concatenate([_z, _rp]),
    np.concatenate([_one, _z]),      # 4: Montgomery one (R mod p)
])
NCONST = CONSTS_NP.shape[0]

_BOUND = None  # (NCONST, 2L) array value bound inside the current trace


@contextlib.contextmanager
def bound_consts(consts):
    """Bind the packed constant table for the tmul ops in this trace."""
    global _BOUND
    prev = _BOUND
    _BOUND = consts
    try:
        yield
    finally:
        _BOUND = prev


def _c(row: int, wide: bool = False):
    """Constant row as a (K, 1) column (K = L or 2L)."""
    assert _BOUND is not None, "tmul ops need `with bound_consts(...)`"
    k = 2 * L if wide else L
    return _BOUND[row, :k][..., None]


def _shift_up(x, s: int):
    """Shift limbs toward higher index along axis -2, zero-filling below.

    x: (..., K, B).  s static.  Mirrors fields/fp.py _normalize_mosaic's
    shift_right but on the sublane axis.
    """
    if s == 0:
        return x
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 2)
    return jnp.where(idx >= s, pltpu.roll(x, s, axis=x.ndim - 2), 0)


def norm(cols, num_out: int):
    """Exact carry propagation of (..., K, B) uint32 columns (< 2^31) into
    num_out 16-bit limbs.  Kogge-Stone carry-lookahead along the sublane
    axis (see fields/fp.py _normalize for the derivation).

    Returns (limbs (..., num_out, B), carry_out (..., B)).
    """
    t = cols[..., :num_out, :]
    r = t & 0xFFFF
    b = t >> 16
    b_shift = _shift_up(b, 1)
    u = r + b_shift
    g = u >> 16                      # in {0, 1}
    p = (u == 0xFFFF).astype(U32)
    e, pp, s = g, p, 1
    while s < num_out:
        e = e | (pp & _shift_up(e, s))
        pp = pp & _shift_up(pp, s)
        s *= 2
    c = b_shift + _shift_up(e, 1)
    limbs = (r + c) & 0xFFFF
    carry = b[..., num_out - 1, :] + e[..., num_out - 1, :]
    return limbs, carry


def _prod_full(a, b_wide):
    """Full product columns of a (..., L, B) with b_wide (..., 2L, B)
    (top half zero).  Returns (..., 2L, B) columns, each < 2^21."""
    acc = None
    for i in range(L):
        t = a[..., i : i + 1, :] * b_wide        # exact: both limbs < 2^16
        lo = t & 0xFFFF
        hi = t >> 16
        # contributions: lo -> columns i..i+L-1, hi -> i+1..i+L; the top-L
        # zeros of b_wide make the roll wraparound safe (shift <= L).
        term = pltpu.roll(lo, i, axis=lo.ndim - 2) if i else lo
        term = term + pltpu.roll(hi, i + 1, axis=hi.ndim - 2)
        acc = term if acc is None else acc + term
    return acc


def _prod_low(a, b):
    """Low L columns of the product of two (..., L, B) operands (mod R).
    Masked shifts discard contributions to columns >= L."""
    acc = None
    for i in range(L):
        t = a[..., i : i + 1, :] * b
        term = _shift_up(t & 0xFFFF, i) + _shift_up(t >> 16, i + 1)
        acc = term if acc is None else acc + term
    return acc


def _widen(b):
    """(..., L, B) -> (..., 2L, B) with top half zero (sublane concat)."""
    return jnp.concatenate([b, jnp.zeros_like(b)], axis=-2)


def mul(a, b):
    """Montgomery product a*b*R^-1 mod p, fully reduced (< p).

    Bit-identical to fields/fp.py Fp._mul_impl: T = a*b; m = T*N' mod R;
    U = T + m*p; result = U >> 16L with fused conditional subtract.

    Latency-bound single-lane calls (B == 1) with a stacked leading axis
    flatten the stack into the LANE axis around the multiply: a (S, L, 1)
    operand occupies 1/128 of every vreg, so the S independent muls of a
    tower op would otherwise serialize at 1-lane utilization.  Measured on
    v5e: 67 -> 28 us per B=1 Fq12 multiply (the final-exp tail regime).
    B == 1 only: the (L, B, S) -> (L, B*S) lane merge is a Mosaic
    "unsupported shape cast" for B > 1 (non-unit minor dims).
    """
    if a.shape != b.shape:
        a, b = jnp.broadcast_arrays(a, b)
    lead = a.shape[:-2]
    B = a.shape[-1]
    S = int(np.prod(lead)) if lead else 1
    if S > 1 and B == 1:
        ar = jnp.transpose(a.reshape(S, L), (1, 0))
        br = jnp.transpose(b.reshape(S, L), (1, 0))
        r = _mul_impl(ar, br)
        return jnp.transpose(r, (1, 0)).reshape(a.shape)
    return _mul_impl(a, b)


def _mul_impl(a, b):
    """CIOS with lazy columns: interleave one a-limb row of the product with
    one Montgomery-reduction limb per iteration, shifting the accumulator
    down a column each time.  Columns stay lazy (< 2^22, exact in uint32:
    per surviving iteration a column gains lo+hi of a_i*b and of m_i*p,
    <= 4*(2^16-1), over <= L iterations, plus tiny shifted-down carries), so
    carry propagation happens ONCE at the end.  The high halves of both
    per-iteration products are deferred to the next iteration: after the
    one-column shift-down their natural alignment (columns 1..L) lands at
    columns 0..L-1, i.e. they add in UNSHIFTED — no roll/iota/select in the
    loop at all.  m_i needs only the true low 16 bits of the running value,
    which is acc[0] mod 2^16 (wraparound uint32 products preserve them).

    ~3.5x fewer vector ops than the separated SOS form it replaces
    (3 full product passes + 3 normalizations); output is the SAME canonical
    Montgomery representative, so the switch is bit-invisible.  Same
    contract as before: inputs may be lazy (< 2p) since (2p)^2 < p*R.
    """
    if a.ndim < b.ndim:
        a = jnp.broadcast_to(a, b.shape)
    elif b.ndim < a.ndim:
        b = jnp.broadcast_to(b, a.shape)
    p_col = _c(0)
    np0 = _BOUND[1, 0:1][..., None]          # (1, 1): N' mod 2^16
    acc = jnp.zeros(jnp.broadcast_shapes(a.shape, b.shape), U32)
    zrow = jnp.zeros(acc.shape[:-2] + (1,) + acc.shape[-1:], U32)
    for i in range(L):
        t = a[..., i : i + 1, :] * b
        acc = acc + (t & 0xFFFF)
        m = (acc[..., 0:1, :] * np0) & 0xFFFF
        u = m * p_col
        acc = acc + (u & 0xFFFF)
        # shift down one column (acc[0] ≡ 0 mod 2^16 by choice of m), then
        # add the two hi halves: their creation-frame columns 1..L are
        # exactly 0..L-1 in the post-shift frame
        carry0 = acc[..., 0:1, :] >> 16
        acc = jnp.concatenate(
            [acc[..., 1:2, :] + carry0, acc[..., 2:, :], zrow], axis=-2)
        acc = acc + (t >> 16) + (u >> 16)
    cols = jnp.stack([acc, acc + _c(2)])
    limbs, carry = norm(cols, L)
    return jnp.where((carry[1] != 0)[..., None, :], limbs[1], limbs[0])


def _mul_impl_sos(a, b):
    t_cols = _prod_full(a, _widen(b))
    # m needs only T mod R: normalize the LOW L columns (carries out of
    # column L-1 are irrelevant mod R); U accumulates the RAW t columns
    # (< 2^21 each, sum < 2^22 — exact), skipping the high-half norm of T.
    t_lo, _ = norm(t_cols[..., :L, :], L)
    m_cols = _prod_low(t_lo, _c(1))
    m_limbs, _ = norm(m_cols, L)
    u_cols = _prod_full(m_limbs, _c(0, wide=True)) + t_cols
    u2 = u_cols + _c(3, wide=True)
    limbs, carry = norm(jnp.stack([u_cols, u2]), 2 * L)
    return jnp.where(
        (carry[1] != 0)[..., None, :],
        limbs[1, ..., L:, :],
        limbs[0, ..., L:, :],
    )


def add(a, b):
    """(a + b) mod p; fused conditional subtract (fields/fp.py add)."""
    s = a + b
    cols = jnp.stack([s, s + _c(2)])
    limbs, carry = norm(cols, L)
    return jnp.where((carry[1] != 0)[..., None, :], limbs[1], limbs[0])


def add_lazy(a, b):
    """a + b as normalized 16-bit limbs WITHOUT the mod-p conditional
    subtract: VALUE is the full sum (< 2p for canonical inputs), so this is
    only safe feeding ops that canonicalize — Montgomery `mul` reduces any
    inputs with bound(a)*bound(b) <= 4p^2 to the SAME canonical (< p) limbs
    as canonical inputs would give (a 2p x 2p product is 4p^2 < p*R since
    4p < R for BN254), making chains through mul bit-identical while
    skipping ~half of add's normalization work (the stacked +R-p candidate
    and its select)."""
    limbs, _ = norm(a + b, L)
    return limbs


def sub(a, b):
    """(a - b) mod p via two's complement (fields/fp.py sub)."""
    idx = jax.lax.broadcasted_iota(jnp.int32, a.shape, a.ndim - 2)
    one = jnp.where(idx == 0, 1, 0).astype(U32)
    d = a + (0xFFFF - b) + one
    cols = jnp.stack([d, d + _c(0)])
    limbs, carry = norm(cols, L)
    return jnp.where((carry[0] != 0)[..., None, :], limbs[0], limbs[1])


def neg(a):
    return sub(jnp.zeros_like(a), a)


def double(a):
    return add(a, a)


def mul9(a):
    return add(double(double(double(a))), a)


def pow_bits_ref(a, bits_ref, nbits: int):
    """a^e with e given as MSB-first bits in a (nbits,) SMEM ref whose leading
    bit is 1 (so acc starts at a).  Square-and-multiply with a branch-free
    lane select; runs inside kernels (fori_loop + dynamic SMEM scalar read)."""

    def body(i, acc):
        acc = mul(acc, acc)
        return jnp.where(bits_ref[i] != 0, mul(acc, a), acc)

    return jax.lax.fori_loop(1, nbits, body, a)


def pow_tree(a, bits, sqrfn=None, mulfn=None):
    """a^e for a STATIC exponent (bits: MSB-first numpy 0/1 array with
    bits[0] == 1): a fori_loop squaring chain stored to a scoped VMEM
    scratch, then ONE static stacked product tree over the set-bit powers.

    Value-identical to pow_bits_ref square-and-multiply (the tree reorders
    a commutative product of exact field elements; outputs stay canonical
    Montgomery), at ~half the serial depth AND ~30% less work for e = p-2:
    nbits squarings + ceil(log2(weight)) stacked tree stages replace nbits
    squarings + nbits multiplies (zero bits paid a discarded multiply, set
    bits now ride stacked stages).  a^0-input convention: every stored
    power of 0 is 0, so inv(0) == 0 still holds."""
    sqrfn = sqrfn or (lambda s: mul(s, s))
    mulfn = mulfn or mul
    bits = np.asarray(bits)
    nbits = len(bits)
    assert bits[0] == 1, "exponent must have its MSB set"
    # chain index j holds a^(2^j); set bits of e are at j = nbits-1-k
    set_pows = [nbits - 1 - k for k in range(nbits) if bits[k]]
    if len(set_pows) == 1:  # e = 2^(nbits-1): pure squaring chain
        return jax.lax.fori_loop(0, nbits - 1, lambda i, s: sqrfn(s), a)

    def scoped(sq_ref):
        def body(i, s):
            sq_ref[pl.ds(i, 1)] = s[None]
            return sqrfn(s)

        last = jax.lax.fori_loop(0, nbits - 1, body, a)  # a^(2^(nbits-1))
        vals = [last if j == nbits - 1 else sq_ref[pl.ds(j, 1)][0]
                for j in set_pows]
        while len(vals) > 1:
            h = len(vals) // 2
            prod = mulfn(jnp.stack(vals[:h]), jnp.stack(vals[h : 2 * h]))
            vals = [prod[i] for i in range(h)] + vals[2 * h :]
        return vals[0]

    return pl.run_scoped(
        scoped, pltpu.VMEM((nbits - 1,) + a.shape, jnp.uint32))


_PM2_BITS_NP = np.array([int(b) for b in bin(FQ.p - 2)[2:]], dtype=np.uint32)


def inv(a):
    """Fermat inversion a^(p-2) (Montgomery in, Montgomery out; inv(0)=0).
    Static-exponent pow_tree path: 253 squarings + a 110-leaf product tree."""
    return pow_tree(a, _PM2_BITS_NP)


def fq2_inv(a):
    """Fq2 inversion via the norm map (one Fq Fermat inversion)."""
    a0, a1 = a[..., 0, :, :], a[..., 1, :, :]
    sq = mul(jnp.stack([a0, a1]), jnp.stack([a0, a1]))
    ninv = inv(add(sq[0], sq[1]))
    return jnp.stack([mul(a0, ninv), neg(mul(a1, ninv))], axis=-3)


# ------------------------------------------------------------- tower (Fq2)
# Fq2 element: (..., 2, L, B) — coefficient axis at -3.

def fq2_mul(a, b):
    """Karatsuba Fq2 multiply, one stacked Fq mul (3 lanes).  The pre-mul
    cross sums are LAZY (< 2p): mul canonicalizes them bit-identically
    (add_lazy rationale) — requires canonical (< p) inputs, which every
    tower caller satisfies (mul/add/sub outputs are < p)."""
    a0, a1 = a[..., 0, :, :], a[..., 1, :, :]
    b0, b1 = b[..., 0, :, :], b[..., 1, :, :]
    x = jnp.stack([a0, a1, add_lazy(a0, a1)])
    y = jnp.stack([b0, b1, add_lazy(b0, b1)])
    v = mul(x, y)
    c0 = sub(v[0], v[1])
    c1 = sub(v[2], add(v[0], v[1]))
    return jnp.stack([c0, c1], axis=-3)


def fq2_sqr(a):
    return fq2_mul(a, a)


def fq2_add(a, b):
    return add(a, b)


def fq2_sub(a, b):
    return sub(a, b)


def fq2_neg(a):
    return neg(a)


def fq2_double(a):
    return add(a, a)


def fq2_mul_xi(a):
    """(9+u) * a = (9 a0 - a1) + (9 a1 + a0) u."""
    a0, a1 = a[..., 0, :, :], a[..., 1, :, :]
    return jnp.stack([sub(mul9(a0), a1), add(mul9(a1), a0)], axis=-3)


def fq2_scale(a, s):
    """Multiply both Fq2 coefficients by an Fq element s (..., L, B)."""
    return mul(a, s[..., None, :, :])


# --------------------------------------------------------- layout transforms

def to_t(x):
    """Standard layout (..., L) -> transposed (..., L, B=flat batch).

    Flattens ALL leading axes into the lane axis.  Host-side helper for
    tests and kernel I/O staging (runs in XLA, not Mosaic)."""
    flat = x.reshape(-1, L)
    return jnp.transpose(flat, (1, 0))


def from_t(xt, batch_shape):
    """Transposed (L, B) -> standard (*batch_shape, L)."""
    return jnp.transpose(xt, (1, 0)).reshape(*batch_shape, L)
