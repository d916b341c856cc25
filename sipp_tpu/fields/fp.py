"""Generic vectorized prime-field arithmetic over 16-bit limbs in uint32 lanes.

TPU-first design (SURVEY.md D1/D2/D12): a field element is a little-endian
vector of L 16-bit limbs stored as uint32, with arbitrary leading batch dims.
Every operation uses only uint32 multiply/add/shift/compare — no 64-bit
arithmetic — so it lowers to native TPU VPU int ops (XLA emulates 64-bit ints
on TPU; 16-bit limbs keep every intermediate product exact in uint32).

Multiplication is separated Montgomery (SOS): one broadcast outer product of
limb vectors, column reduction by statically-shifted adds with *lazy carries*
(each 32-bit partial product splits into (lo16, hi16) accumulated into uint32
columns that stay < 2^22), then a full-width REDC using N' = -p^-1 mod R and a
single exact carry-propagation chain.  This shape — a few large vectorized ops
plus one short serial carry chain — is what the TPU VPU wants, and it keeps the
emitted HLO per multiply small (~2k lines) so XLA compile times stay sane.

Replaces the role of the reference's ark-ff field backends
(/root/reference/src/prover_native.rs:3; SURVEY.md §2.2 D1).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import bigint

LIMB_BITS = 16
U32 = jnp.uint32


class Fp:
    """A prime field GF(p) with vectorized limb arithmetic.

    Elements are jnp arrays of shape (..., L), dtype uint32, each limb < 2^16.
    Montgomery form is used internally for multiplication; `to_mont`/`from_mont`
    convert.  All methods are pure and jit/vmap/shard_map-compatible.
    """

    def __init__(self, p: int, num_limbs: int = None, name: str = "Fp"):
        self.p = p
        self.name = name
        bits = p.bit_length()
        L = num_limbs or -(-bits // LIMB_BITS)
        # CIOS output < 2p needs p < R/4 with R = 2^(16L); bump L if violated.
        while p >= (1 << (LIMB_BITS * L)) // 4:
            L += 1
        self.L = L
        self.R = 1 << (LIMB_BITS * L)
        self.R2 = (self.R * self.R) % p
        self.R3 = (self.R2 * self.R) % p
        # N' = -p^{-1} mod R (full-width, for separated Montgomery reduction)
        self.n_prime_full = (-pow(p, -1, self.R)) % self.R
        self.np_arr_np = np.asarray(bigint.int_to_limbs(self.n_prime_full, L))
        self.p_limbs = [int(v) for v in bigint.int_to_limbs(p, L)]
        self.p_arr = jnp.asarray(np.array(self.p_limbs, dtype=np.uint32))
        # Frequently used constants (Montgomery form).
        self.zero_limbs = jnp.zeros((L,), U32)
        self.one_mont = self.const(1)
        self.r2_limbs = jnp.asarray(bigint.int_to_limbs(self.R2, L))
        # R - p as limbs (for fused conditional-subtract normalization), plus
        # the 2L-column prepadded form (R-p) << 16L used inside the Montgomery
        # reduction — a plain broadcast add, never a scatter (XLA:CPU
        # miscompiles jitted .at[].add on >=3-d batches on some hosts).
        self.rp_arr = jnp.asarray(bigint.int_to_limbs(self.R - p, L))
        self.rp_full_arr = jnp.asarray(
            np.concatenate([np.zeros(L, np.uint32),
                            np.asarray(bigint.int_to_limbs(self.R - p, L))]))

    # ---------------------------------------------------------------- helpers

    def const(self, value: int) -> jnp.ndarray:
        """Montgomery-form constant as a (L,) uint32 array."""
        return jnp.asarray(bigint.int_to_limbs((value * self.R) % self.p, self.L))

    def const_raw(self, value: int) -> jnp.ndarray:
        """Canonical (non-Montgomery) constant as a (L,) uint32 array."""
        return jnp.asarray(bigint.int_to_limbs(value % self.p, self.L))

    def zeros(self, batch_shape=()) -> jnp.ndarray:
        return jnp.zeros(tuple(batch_shape) + (self.L,), U32)

    def ones(self, batch_shape=()) -> jnp.ndarray:
        return jnp.broadcast_to(self.one_mont, tuple(batch_shape) + (self.L,))

    # Host codecs -----------------------------------------------------------

    def encode(self, values, mont: bool = True) -> jnp.ndarray:
        """Python int(s) -> device limb array (Montgomery form by default)."""
        if isinstance(values, int):
            v = (values % self.p)
            if mont:
                v = (v * self.R) % self.p
            return jnp.asarray(bigint.int_to_limbs(v, self.L))
        vs = [((v % self.p) * self.R) % self.p if mont else v % self.p for v in values]
        return jnp.asarray(bigint.ints_to_limbs(vs, self.L))

    def decode(self, arr, mont: bool = True):
        """Device limb array -> Python int(s). Applies from_mont if mont."""
        if mont:
            arr = self.from_mont(arr)
        arr = np.asarray(jax.device_get(arr))
        return bigint.limbs_to_ints(arr)

    # Limb-level primitives -------------------------------------------------

    def _normalize_mosaic(self, cols, num_out: int):
        """Mosaic-safe twin of _normalize for Pallas kernels: a Kogge-Stone
        carry-lookahead built from pltpu.roll + iota masks (log-depth inside
        the kernel, where the sequential chain would serialize the VPU),
        avoiding constructs Mosaic cannot lower (see ops/pallas_fq.py).
        Bit-identical results to the sequential _normalize below."""
        from jax.experimental.pallas import tpu as pltpu

        M = U32(0xFFFF)
        t = cols[..., :num_out]
        r = t & M
        b = t >> 16
        idx = jax.lax.broadcasted_iota(jnp.int32, t.shape, t.ndim - 1)

        def shift_right(x, s):
            return jnp.where(idx >= s, pltpu.roll(x, s, axis=x.ndim - 1),
                             U32(0))

        b_shift = shift_right(b, 1)
        u = r + b_shift
        g = u >> 16
        p = (u == M).astype(U32)
        e, pp, s = g, p, 1
        while s < num_out:
            e = e | (pp & shift_right(e, s))
            pp = pp & shift_right(pp, s)
            s *= 2
        e_shift = shift_right(e, 1)
        c = b_shift + e_shift
        limbs = (r + c) & M
        # positive static index: negative indexing lowers to dynamic_slice,
        # which Mosaic cannot lower
        carry = b[..., num_out - 1] + e[..., num_out - 1]
        return limbs, carry

    def _sub_limbs(self, a, b):
        """(a - b) over L limbs; returns (diff_limbs, borrow (...,) in {0,1})."""
        # two's complement: a - b = a + (M - b) + 1 over 16-bit limbs
        cols = a + (U32(0xFFFF) - b)
        one_hot = jnp.zeros((self.L,), U32).at[0].set(1)
        limbs, carry = self._normalize(cols + one_hot, self.L)
        return limbs, U32(1) - carry

    def _add_limbs(self, a, b):
        """(a + b) over L limbs mod 2^(16L); returns (sum_limbs, carry_out)."""
        return self._normalize(a + b, self.L)

    def _cond_sub_p(self, x):
        """x - p if x >= p else x (x < 2p, normalized limbs)."""
        diff, borrow = self._sub_limbs(x, self.p_arr)
        return jnp.where((borrow == 0)[..., None], diff, x)

    # Field ops -------------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=(0,))
    def add(self, a, b):
        # Fused add + conditional subtract: normalize [a+b, a+b+(R-p)] in one
        # stacked pass; the second lane carries out of R exactly when
        # a+b >= p, in which case its limbs are (a+b-p).
        s = a + b
        cols = jnp.stack([s, s + self.rp_arr])
        limbs, carry = self._normalize(cols, self.L)
        return jnp.where((carry[1] != 0)[..., None], limbs[1], limbs[0])

    @functools.partial(jax.jit, static_argnums=(0,))
    def sub(self, a, b):
        # a - b via two's complement; second lane adds p back for the
        # borrow case.  One stacked normalization, one select.
        one_hot = jnp.zeros((self.L,), U32).at[0].set(1)
        d = a + (U32(0xFFFF) - b) + one_hot
        cols = jnp.stack([d, d + self.p_arr])
        limbs, carry = self._normalize(cols, self.L)
        return jnp.where((carry[0] != 0)[..., None], limbs[0], limbs[1])

    @functools.partial(jax.jit, static_argnums=(0,))
    def neg(self, a):
        return self.sub(jnp.zeros_like(a), a)

    @functools.partial(jax.jit, static_argnums=(0,))
    def double(self, a):
        return self.add(a, a)

    def _prod_cols(self, a, b, low_only: bool = False, use_reduce: bool = True):
        """Schoolbook product column sums of two limb vectors.

        Computes cols[k] = sum_{i+j=k} lo16(a_i*b_j) + sum_{i+j=k-1} hi16(a_i*b_j)
        as one broadcast outer product followed by L statically-shifted adds —
        all exact uint32 integer ops (column sums < 2^22).  Returns (..., 2L)
        unnormalized uint32 columns, or (..., L) if low_only (product mod R).
        """
        L = self.L
        MASK = U32(0xFFFF)
        p = a[..., :, None] * b[..., None, :]          # uint32, exact
        lo = p & MASK
        hi = p >> 16
        width = L if low_only else 2 * L
        # Row i of lo contributes to columns i..i+L-1, row i of hi to
        # i+1..i+L.
        if not use_reduce:
            # Mosaic (Pallas) path: no unsigned reductions, and jnp.pad's
            # width-1 intermediate concats hit a Mosaic layout bug.  Widen by
            # an equal-half concat and shift with pltpu.roll (the wrapped-in
            # top half is all zeros for shifts <= L), accumulating with
            # chained adds.
            from jax.experimental.pallas import tpu as pltpu

            z = jnp.zeros_like(lo[..., 0, :])
            acc = None
            for i in range(L):
                lo32 = jnp.concatenate([lo[..., i, :], z], axis=-1)
                hi32 = jnp.concatenate([hi[..., i, :], z], axis=-1)
                term = pltpu.roll(lo32, i, axis=lo32.ndim - 1) + \
                    pltpu.roll(hi32, i + 1, axis=hi32.ndim - 1)
                acc = term if acc is None else acc + term
            return acc[..., :width]
        rows = []
        for i in range(L):
            lo_row = jnp.pad(lo[..., i, :], [(0, 0)] * (lo.ndim - 2) + [(i, L - i)])
            hi_row = jnp.pad(hi[..., i, :], [(0, 0)] * (hi.ndim - 2) + [(i + 1, L - i - 1)])
            rows.append(lo_row)
            rows.append(hi_row)
        acc = jnp.sum(jnp.stack(rows), axis=0)          # (..., 2L), sums < 2^22
        return acc[..., :width]

    def _normalize(self, cols, num_out: int):
        """Exact carry propagation of (..., K) columns (< 2^31 each) to num_out
        16-bit limbs; returns (limbs, carry_out)."""
        out = []
        carry = jnp.zeros(cols.shape[:-1], U32)
        K = cols.shape[-1]
        for k in range(num_out):
            t = (cols[..., k] if k < K else 0) + carry
            out.append(t & U32(0xFFFF))
            carry = t >> 16
        return jnp.stack(out, axis=-1), carry

    @functools.partial(jax.jit, static_argnums=(0,))
    def mul(self, a, b):
        return self._mul_impl(a, b)

    def _mul_impl(self, a, b, consts=None):
        """Montgomery product a*b*R^{-1} mod p (separated SOS reduction).
        Raw (un-jitted) implementation, callable inside Pallas kernels —
        pass consts=(p_arr, np_arr, rp_arr) there, since Pallas kernels
        cannot capture traced constants."""
        assert a.shape[-1] == self.L and b.shape[-1] == self.L, (
            f"expected {self.L} limbs, got {a.shape} x {b.shape}")
        L = self.L
        if consts is not None:
            p_arr, np_arr, rp_full = consts
            use_reduce = False
            norm = self._normalize_mosaic
        else:
            p_arr, np_arr = self.p_arr, jnp.asarray(self.np_arr_np)
            use_reduce = True
            norm = self._normalize
        # T = a*b  (exact 2L limbs; T < p^2 < R^2)
        t_limbs, _ = norm(
            self._prod_cols(a, b, use_reduce=use_reduce), 2 * L)
        # m = (T mod R) * N' mod R
        m_limbs, _ = norm(
            self._prod_cols(t_limbs[..., :L], np_arr, low_only=True,
                            use_reduce=use_reduce), L)
        # U = T + m*p ; low L limbs cancel; result = U >> 16L < 2p.
        # Fused final conditional subtract: second stacked lane adds
        # (R-p) << 16L, whose carry-out flags result >= p.
        u_cols = self._prod_cols(m_limbs, p_arr, use_reduce=use_reduce)
        u_cols = u_cols + t_limbs  # t_limbs are normalized 16-bit limbs
        # Add (R-p) << 16L as a prepadded 2L-wide constant (broadcast add;
        # the previous .at[..., L:].add scatter miscompiled under jit on
        # XLA:CPU for >=3-d batch shapes on some hosts).
        u2 = u_cols + (rp_full if consts is not None else self.rp_full_arr)
        cols = jnp.stack([u_cols, u2])
        u_limbs, carry = norm(cols, 2 * L)
        return jnp.where(
            (carry[1] != 0)[..., None], u_limbs[1, ..., L:], u_limbs[0, ..., L:]
        )

    @functools.partial(jax.jit, static_argnums=(0,))
    def sqr(self, a):
        return self.mul(a, a)

    @functools.partial(jax.jit, static_argnums=(0,))
    def to_mont(self, a):
        return self.mul(a, self.r2_limbs)

    @functools.partial(jax.jit, static_argnums=(0,))
    def from_mont(self, a):
        one = jnp.zeros((self.L,), U32).at[0].set(1)
        return self.mul(a, one)

    def select(self, cond, a, b):
        """cond (...,) bool/int -> a where cond else b."""
        return jnp.where(cond[..., None] if cond.ndim == a.ndim - 1 else cond, a, b)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=-1)

    def eq(self, a, b):
        return jnp.all(a == b, axis=-1)

    # Exponentiation --------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=(0, 2,))
    def pow_static(self, x, e: int):
        """x^e for a static Python-int exponent, via MSB-first square-multiply
        driven by a lax.scan over the static bit array (shared across lanes —
        uniform control flow, TPU-friendly)."""
        if e == 0:
            return jnp.broadcast_to(self.one_mont, x.shape)
        bits = [int(b) for b in bin(e)[2:]]
        bits_arr = jnp.asarray(np.array(bits, dtype=np.uint32))
        init = jnp.broadcast_to(self.one_mont, x.shape)

        def body(acc, bit):
            acc = self.sqr(acc)
            acc_mul = self.mul(acc, x)
            return jnp.where((bit != 0), acc_mul, acc), None

        out, _ = jax.lax.scan(body, init, bits_arr)
        return out

    @functools.partial(jax.jit, static_argnums=(0,))
    def inv(self, x):
        """Batched inversion via Fermat: x^(p-2).  0 maps to 0."""
        return self.pow_static(x, self.p - 2)

    @functools.partial(jax.jit, static_argnums=(0,))
    def batch_inv(self, x):
        """Montgomery batch inversion over the leading axis: one Fermat
        inversion amortized over the whole batch (3 muls/element).

        x: (N, ..., L); zero elements map to zero (like ark's behavior is an
        error; here we define inv(0)=0 for maskable lanes)."""
        n = x.shape[0]
        if n == 1:
            return self.inv(x)
        one = jnp.broadcast_to(self.one_mont, x.shape[1:])
        safe = jnp.where(self.is_zero(x)[..., None], one, x)

        def fwd(carry, xi):
            nxt = self.mul(carry, xi)
            return nxt, carry  # prefix product *before* xi

        total, prefixes = jax.lax.scan(fwd, one, safe)
        inv_total = self.inv(total)

        def bwd(carry, inp):
            xi, prefix = inp
            out = self.mul(carry, prefix)  # inv of xi
            carry = self.mul(carry, xi)    # inv of prefix product
            return carry, out

        _, invs = jax.lax.scan(bwd, inv_total, (safe, prefixes), reverse=True)
        return jnp.where(self.is_zero(x)[..., None], jnp.zeros_like(x), invs)


@functools.lru_cache(maxsize=None)
def field(p: int, name: str = "Fp") -> Fp:
    return Fp(p, name=name)
