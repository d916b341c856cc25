"""Batched short-Weierstrass (a=0) Jacobian curve arithmetic over Fq or Fq2.

Replaces ark-ec's G1/G2 group ops as used by the reference
(/root/reference/src/prover_native.rs:60-69 fold `a1 + a2.mul(x)`;
SURVEY.md D3/D4).  One generic implementation parameterized by a field
adapter; G1 instantiates it over Fq, G2 over Fq2 (see curves/__init__).

Representations (uint32 limb arrays, arbitrary leading batch dims):
    affine:   (..., 2, *coeff)   [x, y]
    jacobian: (..., 3, *coeff)   [X, Y, Z], point at infinity iff Z == 0
where *coeff = (L,) for Fq and (2, L) for Fq2.

Design notes (TPU-first):
- No data-dependent branches: edge cases (infinity, P == Q, P == -Q) are
  handled with vectorized selects; P == -Q falls out automatically (Z3 = 0).
- Independent field muls inside a formula are stacked into single batched
  multiplies (the op-stacking pattern; see fields/tower.py).
- The double-and-add ladder never hits the doubling edge case (accumulator is
  k*Q with even 2k vs +1 add), so scalar_mul uses the cheaper incomplete
  mixed addition; bucket-style accumulation uses the complete variant.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


class CurveOps:
    def __init__(self, field, name: str):
        """field: adapter with mul/add/sub/neg/double/sqr/is_zero/expand/one/zero."""
        self.f = field
        self.name = name

    # -------------------------------------------------------------- helpers

    def _c(self, p, i):
        """Select coordinate i (x/y or X/Y/Z) of a point array."""
        return jnp.take(p, i, axis=-(1 + self.f.ndim))

    def _pt(self, *coords):
        return jnp.stack(coords, axis=-1 - self.f.ndim)

    def jac_from_affine(self, p):
        x, y = self._c(p, 0), self._c(p, 1)
        one = jnp.broadcast_to(self.f.one(), x.shape)
        return self._pt(x, y, one)

    def jac_infinity(self, batch_shape=()):
        z = self.f.zero()
        shape = tuple(batch_shape) + (3,) + z.shape
        return jnp.zeros(shape, jnp.uint32)

    def is_infinity(self, p):
        return self.f.is_zero(self._c(p, 2))

    # --------------------------------------------------------------- dbl/add

    @functools.partial(jax.jit, static_argnums=0)
    def dbl(self, p):
        """Jacobian doubling, a=0 curve.  Infinity-safe (Z3 = 2YZ = 0)."""
        f = self.f
        X, Y, Z = self._c(p, 0), self._c(p, 1), self._c(p, 2)
        v = f.mul(jnp.stack([X, Y, Y]), jnp.stack([X, Y, Z]))
        A, B, YZ = v[0], v[1], v[2]
        v = f.mul(jnp.stack([B, f.add(X, B)]), jnp.stack([B, f.add(X, B)]))
        C, D = v[0], v[1]
        S = f.double(f.sub(f.sub(D, A), C))          # 2*(2XB) = 4XY^2
        M = f.add(f.double(A), A)                    # 3X^2
        X3 = f.sub(f.mul(M, M), f.double(S))
        C8 = f.double(f.double(f.double(C)))
        Y3 = f.sub(f.mul(M, f.sub(S, X3)), C8)
        Z3 = f.double(YZ)
        return self._pt(X3, Y3, Z3)

    @functools.partial(jax.jit, static_argnums=(0, 3))
    def add_mixed(self, p, q_aff, handle_double: bool = True):
        """p (jacobian) + q (affine).  Infinity-safe for p; P == -Q gives
        infinity automatically; P == Q handled iff handle_double."""
        f = self.f
        X, Y, Z = self._c(p, 0), self._c(p, 1), self._c(p, 2)
        x2, y2 = self._c(q_aff, 0), self._c(q_aff, 1)
        ZZ = f.mul(Z, Z)
        v = f.mul(jnp.stack([ZZ, x2]), jnp.stack([Z, ZZ]))
        ZZZ, U2 = v[0], v[1]
        S2 = f.mul(y2, ZZZ)
        H = f.sub(U2, X)
        R = f.sub(S2, Y)
        v = f.mul(jnp.stack([H, R]), jnp.stack([H, R]))
        HH, RR = v[0], v[1]
        v = f.mul(jnp.stack([H, X, Z]), jnp.stack([HH, HH, H]))
        HHH, V, Z3 = v[0], v[1], v[2]
        X3 = f.sub(f.sub(RR, HHH), f.double(V))
        v = f.mul(jnp.stack([R, Y]), jnp.stack([f.sub(V, X3), HHH]))
        Y3 = f.sub(v[0], v[1])
        out = self._pt(X3, Y3, Z3)
        if handle_double:
            dbl_case = jnp.logical_and(
                jnp.logical_and(f.is_zero(H), f.is_zero(R)),
                jnp.logical_not(f.is_zero(Z)),
            )
            out = jnp.where(self._expand_pt(dbl_case),
                            self.dbl(self.jac_from_affine(q_aff)), out)
        # p == infinity -> q
        out = jnp.where(self._expand_pt(f.is_zero(Z)),
                        self.jac_from_affine(q_aff), out)
        return out

    def _expand_pt(self, cond):
        """(...,) bool -> broadcastable over (..., 3, *coeff)."""
        for _ in range(self.f.ndim + 1):
            cond = cond[..., None]
        return cond

    @functools.partial(jax.jit, static_argnums=0)
    def add(self, p, q):
        """Full Jacobian + Jacobian addition, complete via selects."""
        f = self.f
        X1, Y1, Z1 = self._c(p, 0), self._c(p, 1), self._c(p, 2)
        X2, Y2, Z2 = self._c(q, 0), self._c(q, 1), self._c(q, 2)
        v = f.mul(jnp.stack([Z1, Z2]), jnp.stack([Z1, Z2]))
        Z1Z1, Z2Z2 = v[0], v[1]
        v = f.mul(
            jnp.stack([X1, X2, Y1, Y2]),
            jnp.stack([Z2Z2, Z1Z1, Z2Z2, Z1Z1]),
        )
        U1, U2, S1p, S2p = v[0], v[1], v[2], v[3]
        v = f.mul(jnp.stack([S1p, S2p]), jnp.stack([Z2, Z1]))
        S1, S2 = v[0], v[1]
        H = f.sub(U2, U1)
        R = f.sub(S2, S1)
        v = f.mul(jnp.stack([H, R]), jnp.stack([H, R]))
        HH, RR = v[0], v[1]
        v = f.mul(jnp.stack([H, U1, Z1]), jnp.stack([HH, HH, Z2]))
        HHH, V, Z1Z2 = v[0], v[1], v[2]
        X3 = f.sub(f.sub(RR, HHH), f.double(V))
        v = f.mul(jnp.stack([R, S1, Z1Z2]), jnp.stack([f.sub(V, X3), HHH, H]))
        Y3 = f.sub(v[0], v[1])
        Z3 = v[2]
        out = self._pt(X3, Y3, Z3)
        dbl_case = jnp.logical_and(
            jnp.logical_and(f.is_zero(H), f.is_zero(R)),
            jnp.logical_and(
                jnp.logical_not(f.is_zero(Z1)), jnp.logical_not(f.is_zero(Z2))
            ),
        )
        out = jnp.where(self._expand_pt(dbl_case), self.dbl(p), out)
        out = jnp.where(self._expand_pt(f.is_zero(Z1)), q, out)
        out = jnp.where(self._expand_pt(f.is_zero(Z2)), p, out)
        return out

    def neg(self, p):
        """Negate (affine or jacobian: flips Y)."""
        coords = [self._c(p, i) for i in range(p.shape[-1 - self.f.ndim])]
        coords[1] = self.f.neg(coords[1])
        return self._pt(*coords)

    # ---------------------------------------------------------- scalar muls

    @functools.partial(jax.jit, static_argnums=0)
    def scalar_mul(self, q_aff, bits):
        """[k]Q for affine Q (batched) and a shared scalar given as an
        MSB-first uint32 bit array (the SIPP fold challenge: same scalar
        across all lanes — uniform control flow).  Returns jacobian."""
        acc0 = self.jac_infinity(q_aff.shape[: -(1 + self.f.ndim)])

        def body(acc, bit):
            acc = self.dbl(acc)
            added = self.add_mixed(acc, q_aff, handle_double=False)
            return jnp.where(bit != 0, added, acc), None

        out, _ = jax.lax.scan(body, acc0, bits)
        return out

    @functools.partial(jax.jit, static_argnums=0)
    def scalar_mul_per_lane(self, q_aff, bits):
        """[k_i]Q_i with per-lane scalars: bits (254, ...batch) MSB-first.
        The compute of the reference's starky g1/g2 exp statements
        (SURVEY.md D7): each input has its own exponent."""
        acc0 = self.jac_infinity(q_aff.shape[: -(1 + self.f.ndim)])

        def body(acc, bit):
            acc = self.dbl(acc)
            added = self.add_mixed(acc, q_aff, handle_double=False)
            return jnp.where(self._expand_pt(bit != 0), added, acc), None

        out, _ = jax.lax.scan(body, acc0, bits)
        return out

    @functools.partial(jax.jit, static_argnums=0)
    def exp_with_offset(self, x_aff, offset_aff, bits):
        """offset + [k]x per lane — the exact interface of the reference's
        starky ExpInput{x, offset, exp_val} statements
        (/root/reference/src/verifier_circuit.rs:92-135; SURVEY.md D7)."""
        return self.add_mixed(
            self.scalar_mul_per_lane(x_aff, bits), offset_aff,
            handle_double=True,
        )

    @functools.partial(jax.jit, static_argnums=0)
    def fold(self, a1_aff, a2_aff, bits):
        """SIPP fold step: a1 + [x]a2 (jacobian result), the per-round op of
        reference prover_native.rs:60-69."""
        return self.add_mixed(self.scalar_mul(a2_aff, bits), a1_aff,
                              handle_double=False)

    # ------------------------------------------------------------- affine

    @functools.partial(jax.jit, static_argnums=0)
    def to_affine(self, p):
        """Jacobian -> affine; infinity maps to (0, 0)."""
        f = self.f
        X, Y, Z = self._c(p, 0), self._c(p, 1), self._c(p, 2)
        zinv = f.inv(Z)
        zinv2 = f.mul(zinv, zinv)
        v = f.mul(jnp.stack([X, zinv2]), jnp.stack([zinv2, zinv]))
        x, zinv3 = v[0], v[1]
        y = f.mul(Y, zinv3)
        inf = f.is_zero(Z)
        for _ in range(f.ndim + 1):
            inf = inf[..., None]
        return jnp.where(inf, jnp.zeros_like(self._pt(x, y)), self._pt(x, y))
