"""Vectorized BN254 tower fields Fq2/Fq6/Fq12 over the limb Fq core.

Layouts (all uint32, L = FQ.L = 16 limbs, arbitrary leading batch dims):
    Fq2  : (..., 2, L)        c0 + c1*u,        u^2 = -1
    Fq6  : (..., 3, 2, L)     c0 + c1*v + c2*v2, v^3 = xi = 9+u
    Fq12 : (..., 2, 3, 2, L)  c0 + c1*w,        w^2 = v

TPU-first op-stacking design: every tower multiply lowers to exactly ONE
batched Fq multiply on a stacked operand (3x for Fq2, 18x for Fq6, 54x for
Fq12 via Karatsuba at each level).  This keeps emitted HLO small (compile
time) and gives the VPU one long vectorized op instead of dozens of small
ones.  Replaces ark-bn254's Fq2/Fq6/Fq12 (SURVEY.md D1); Frobenius constants
are derived from the host oracle (hostref.py) at import time, not hard-coded.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import hostref, params
from . import FQ

F = FQ
L = F.L


def _b2(a, b):
    """Broadcast two coefficient arrays to a common shape."""
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    return jnp.broadcast_to(a, shape), jnp.broadcast_to(b, shape)


def _mul9(a):
    return F.add(F.double(F.double(F.double(a))), a)


# ------------------------------------------------------------------------ Fq2

def fq2_encode(vals):
    """Host (c0, c1) tuple(s) -> (..., 2, L) Montgomery limb array."""
    if isinstance(vals, tuple) and isinstance(vals[0], int):
        return F.encode(list(vals))
    return jnp.stack([fq2_encode(v) for v in vals])


def fq2_decode(arr):
    flat = F.decode(arr.reshape(-1, L))
    out = np.array(flat, dtype=object).reshape(arr.shape[:-1])
    def rec(x):
        if x.ndim == 1:
            return (int(x[0]), int(x[1]))
        return [rec(v) for v in x]
    return rec(out)


def fq2_add(a, b):
    return F.add(a, b)


def fq2_sub(a, b):
    return F.sub(a, b)


def fq2_neg(a):
    return F.neg(a)


@jax.jit
def fq2_mul(a, b):
    a, b = _b2(a, b)
    a0, a1 = a[..., 0, :], a[..., 1, :]
    b0, b1 = b[..., 0, :], b[..., 1, :]
    x = jnp.stack([a0, a1, F.add(a0, a1)])
    y = jnp.stack([b0, b1, F.add(b0, b1)])
    v = F.mul(x, y)
    v0, v1, t = v[0], v[1], v[2]
    c0 = F.sub(v0, v1)
    c1 = F.sub(t, F.add(v0, v1))
    return jnp.stack([c0, c1], axis=-2)


fq2_sqr = lambda a: fq2_mul(a, a)


def fq2_conj(a):
    return jnp.stack([a[..., 0, :], F.neg(a[..., 1, :])], axis=-2)


@jax.jit
def fq2_mul_xi(a):
    """(9+u) * a = (9 a0 - a1) + (9 a1 + a0) u."""
    a0, a1 = a[..., 0, :], a[..., 1, :]
    return jnp.stack([F.sub(_mul9(a0), a1), F.add(_mul9(a1), a0)], axis=-2)


@jax.jit
def fq2_scale(a, s):
    """Multiply both coefficients by an Fq element s (..., L)."""
    return F.mul(a, s[..., None, :])


@jax.jit
def fq2_inv(a):
    """Batched Fq2 inversion via the norm map (one Fermat Fq inversion)."""
    a0, a1 = a[..., 0, :], a[..., 1, :]
    sq = F.mul(jnp.stack([a0, a1]), jnp.stack([a0, a1]))
    norm = F.add(sq[0], sq[1])
    ninv = F.inv(norm)
    return jnp.stack([F.mul(a0, ninv), F.neg(F.mul(a1, ninv))], axis=-2)


def fq2_is_zero(a):
    return jnp.all(a == 0, axis=(-1, -2))


# ------------------------------------------------------------------------ Fq6

def fq6_encode(vals):
    if isinstance(vals[0][0], int):
        return jnp.stack([fq2_encode(v) for v in vals])
    return jnp.stack([fq6_encode(v) for v in vals])


def fq6_add(a, b):
    return F.add(a, b)


def fq6_sub(a, b):
    return F.sub(a, b)


def fq6_neg(a):
    return F.neg(a)


@jax.jit
def fq6_mul(a, b):
    a, b = _b2(a, b)
    a0, a1, a2 = a[..., 0, :, :], a[..., 1, :, :], a[..., 2, :, :]
    b0, b1, b2 = b[..., 0, :, :], b[..., 1, :, :], b[..., 2, :, :]
    x = jnp.stack([a0, a1, a2, F.add(a1, a2), F.add(a0, a1), F.add(a0, a2)])
    y = jnp.stack([b0, b1, b2, F.add(b1, b2), F.add(b0, b1), F.add(b0, b2)])
    v = fq2_mul(x, y)
    v0, v1, v2, t12, t01, t02 = (v[i] for i in range(6))
    c0 = F.add(v0, fq2_mul_xi(F.sub(t12, F.add(v1, v2))))
    c1 = F.add(F.sub(t01, F.add(v0, v1)), fq2_mul_xi(v2))
    c2 = F.add(F.sub(t02, F.add(v0, v2)), v1)
    return jnp.stack([c0, c1, c2], axis=-3)


def fq6_mul_by_v(a):
    """v * (c0 + c1 v + c2 v^2) = xi*c2 + c0 v + c1 v^2."""
    return jnp.concatenate(
        [fq2_mul_xi(a[..., 2, :, :])[..., None, :, :], a[..., 0:2, :, :]], axis=-3
    )


@jax.jit
def fq6_inv(a):
    a0, a1, a2 = a[..., 0, :, :], a[..., 1, :, :], a[..., 2, :, :]
    # A = a0^2 - xi a1 a2 ; B = xi a2^2 - a0 a1 ; C = a1^2 - a0 a2
    prods = fq2_mul(
        jnp.stack([a0, a1, a2, a1, a0, a0]),
        jnp.stack([a0, a1, a2, a2, a1, a2]),
    )
    s0, s1, s2, p12, p01, p02 = (prods[i] for i in range(6))
    A = F.sub(s0, fq2_mul_xi(p12))
    B = F.sub(fq2_mul_xi(s2), p01)
    C = F.sub(s1, p02)
    # t = a0 A + xi (a2 B + a1 C)
    u = fq2_mul(jnp.stack([a0, a2, a1]), jnp.stack([A, B, C]))
    t = F.add(u[0], fq2_mul_xi(F.add(u[1], u[2])))
    tinv = fq2_inv(t)
    out = fq2_mul(jnp.stack([A, B, C]), tinv[None])
    return jnp.moveaxis(out, 0, -3)


# ----------------------------------------------------------------------- Fq12

def fq12_encode(vals):
    """Host tower tuple -> (..., 2, 3, 2, L)."""
    if isinstance(vals[0][0][0], int):
        return jnp.stack([fq6_encode(v) for v in vals])
    return jnp.stack([fq12_encode(v) for v in vals])


def fq12_decode(arr):
    """(..., 2, 3, 2, L) -> host tower tuple(s)."""
    arr = np.asarray(jax.device_get(F.from_mont(arr.reshape(-1, L)))).reshape(
        arr.shape
    )
    from . import bigint

    def rec(x):
        if x.ndim == 4:  # (2,3,2,L)
            return tuple(
                tuple(
                    (bigint.limbs_to_int(x[i, j, 0]), bigint.limbs_to_int(x[i, j, 1]))
                    for j in range(3)
                )
                for i in range(2)
            )
        return [rec(v) for v in x]
    return rec(arr)


def fq12_ones(batch_shape=()):
    one = fq12_encode(hostref.FQ12_ONE)
    return jnp.broadcast_to(one, tuple(batch_shape) + one.shape)


def fq12_add(a, b):
    return F.add(a, b)


@jax.jit
def fq12_mul(a, b):
    a, b = _b2(a, b)
    a0, a1 = a[..., 0, :, :, :], a[..., 1, :, :, :]
    b0, b1 = b[..., 0, :, :, :], b[..., 1, :, :, :]
    x = jnp.stack([a0, a1, F.add(a0, a1)])
    y = jnp.stack([b0, b1, F.add(b0, b1)])
    v = fq6_mul(x, y)
    v0, v1, t = v[0], v[1], v[2]
    c0 = F.add(v0, fq6_mul_by_v(v1))
    c1 = F.sub(t, F.add(v0, v1))
    return jnp.stack([c0, c1], axis=-4)


@jax.jit
def fq12_sqr(a):
    """Complex squaring for the quadratic extension: (c0 + c1 w)^2 via
    t = c0 c1, u = (c0+c1)(c0 + v c1):  c0' = u - t - v t, c1' = 2t.
    Two stacked Fq6 muls instead of three (1.5x fewer Fq muls than mul)."""
    a0, a1 = a[..., 0, :, :, :], a[..., 1, :, :, :]
    x = jnp.stack([a0, F.add(a0, a1)])
    y = jnp.stack([a1, F.add(a0, fq6_mul_by_v(a1))])
    v = fq6_mul(x, y)
    t = v[0]                                          # c0 c1
    u = v[1]                                          # (c0+c1)(c0 + v c1)
    c0 = F.sub(u, F.add(t, fq6_mul_by_v(t)))
    c1 = F.double(t)
    return jnp.stack([c0, c1], axis=-4)


@jax.jit
def fq12_cyclo_sqr(g):
    """Granger-Scott cyclotomic squaring: g^2 for g in the cyclotomic
    subgroup (all final-exponentiation intermediates).  9 stacked Fq2 muls
    vs 36 for the generic complex squaring.  Host-verified against the
    oracle; only valid for unitary/cyclotomic inputs."""
    z0 = g[..., 0, 0, :, :]; z4 = g[..., 0, 1, :, :]; z3 = g[..., 0, 2, :, :]
    z2 = g[..., 1, 0, :, :]; z1 = g[..., 1, 1, :, :]; z5 = g[..., 1, 2, :, :]
    x = jnp.stack([z0, z1, z0, z2, z3, z2, z4, z5, z4])
    y = jnp.stack([z0, z1, z1, z2, z3, z3, z4, z5, z5])
    v = fq2_mul(x, y)

    def fp4(a2, b2, ab):
        return F.add(a2, fq2_mul_xi(b2)), F.double(ab)

    t0, t1 = fp4(v[0], v[1], v[2])
    u0, u1 = fp4(v[3], v[4], v[5])
    s0, s1 = fp4(v[6], v[7], v[8])

    def tri(t, z, plus):
        r = F.add(F.double(t), t)
        return F.add(r, F.double(z)) if plus else F.sub(r, F.double(z))

    z0n = tri(t0, z0, False)
    z1n = tri(t1, z1, True)
    z4n = tri(u0, z4, False)
    z5n = tri(u1, z5, True)
    z2n = tri(fq2_mul_xi(s1), z2, True)
    z3n = tri(s0, z3, False)
    lo = jnp.stack([z0n, z4n, z3n], axis=-3)
    hi = jnp.stack([z2n, z1n, z5n], axis=-3)
    return jnp.stack([lo, hi], axis=-4)


@jax.jit
def fq12_mul_line(f, a, b, c):
    """f * (a + b*w + c*v*w) with a, b, c in Fq2 — the Miller-loop sparse
    multiply.  15 stacked Fq2 muls (Karatsuba across w with sparse halves)
    vs 18 for the generic fq12_mul; differentially tested against it."""
    f0, f1 = f[..., 0, :, :, :], f[..., 1, :, :, :]
    f00, f01, f02 = f0[..., 0, :, :], f0[..., 1, :, :], f0[..., 2, :, :]
    f10, f11, f12 = f1[..., 0, :, :], f1[..., 1, :, :], f1[..., 2, :, :]
    s0, s1, s2 = F.add(f00, f10), F.add(f01, f11), F.add(f02, f12)
    ab = F.add(a, b)
    x = jnp.stack([f00, f01, f02, f10, f11, f12, f10, f11, f12,
                   s0, s1, s2, s0, s1, s2])
    y = jnp.stack(jnp.broadcast_arrays(a, a, a, b, b, b, c, c, c,
                                       ab, ab, ab, c, c, c))
    v = fq2_mul(x, y)
    v00, v01, v02 = v[0], v[1], v[2]                    # f0 * a
    r0 = F.add(v[3], fq2_mul_xi(v[8]))                  # f1 * (b + c v)
    r1 = F.add(v[4], v[6])
    r2 = F.add(v[5], v[7])
    t0 = F.add(v[9], fq2_mul_xi(v[14]))                 # (f0+f1)(a+b + c v)
    t1 = F.add(v[10], v[12])
    t2 = F.add(v[11], v[13])
    c00 = F.add(v00, fq2_mul_xi(r2))                    # c0 = f0*a + v*r
    c01 = F.add(v01, r0)
    c02 = F.add(v02, r1)
    c10 = F.sub(t0, F.add(v00, r0))                     # c1 = t - f0*a - r
    c11 = F.sub(t1, F.add(v01, r1))
    c12 = F.sub(t2, F.add(v02, r2))
    lo = jnp.stack([c00, c01, c02], axis=-3)
    hi = jnp.stack([c10, c11, c12], axis=-3)
    return jnp.stack([lo, hi], axis=-4)


def fq12_conj(a):
    """f^(p^6): negate the w part (unitary inverse after the easy part)."""
    return jnp.stack([a[..., 0, :, :, :], F.neg(a[..., 1, :, :, :])], axis=-4)


@jax.jit
def fq12_inv(a):
    a0, a1 = a[..., 0, :, :, :], a[..., 1, :, :, :]
    sq = fq6_mul(jnp.stack([a0, a1]), jnp.stack([a0, a1]))
    t = fq6_inv(F.sub(sq[0], fq6_mul_by_v(sq[1])))
    return jnp.stack([fq6_mul(a0, t), fq6_neg(fq6_mul(a1, t))], axis=-4)


def fq12_eq(a, b):
    return jnp.all(a == b, axis=(-1, -2, -3, -4))


# Frobenius: pi^k acts per Fq2 coefficient at position (i, j) [w^i v^j = w^(2j+i)]
# as  sigma^k(a_ij) * xi^((p^k - 1)(2j+i)/6)  with sigma = Fq2 conjugation.
def _frob_consts(k: int):
    cs = []
    for i in range(2):
        for j in range(3):
            m = 2 * j + i
            cs.append(hostref.fq2_pow(params.XI, (params.P**k - 1) * m // 6))
    return fq2_encode(cs).reshape(2, 3, 2, L)


_FROB_C = {k: _frob_consts(k) for k in (1, 2, 3)}


@functools.partial(jax.jit, static_argnums=(1,))
def fq12_frob(a, k: int = 1):
    """a^(p^k) for k in {1, 2, 3}."""
    coeffs = a if k % 2 == 0 else jnp.concatenate(
        [a[..., 0:1, :], F.neg(a[..., 1:2, :])], axis=-2
    )
    return fq2_mul(
        coeffs.reshape(*a.shape[:-4], 6, 2, L), _FROB_C[k].reshape(6, 2, L)
    ).reshape(a.shape)


@jax.jit
def fq12_pow_bits(a, bits):
    """a^e with e as an MSB-first uint32 bit array: (254,) for a shared
    exponent (the verifier's Z_L^x / Z_R^(x^-1), verifier_native.rs:61) or
    (254, ...batch) for per-lane exponents (the starky fq12 exp statement
    workload, SURVEY.md D8)."""
    one = fq12_ones(a.shape[:-4])

    def body(acc, bit):
        acc = fq12_sqr(acc)
        acc_mul = fq12_mul(acc, a)
        cond = bit[..., None, None, None, None] if bit.ndim else bit
        return jnp.where(cond != 0, acc_mul, acc), None

    out, _ = jax.lax.scan(body, one, bits)
    return out


@jax.jit
def fq12_exp_with_offset(x, offset, bits):
    """offset * x^e per lane — the reference's starky Fq12ExpInput statement
    (/root/reference/src/verifier_circuit.rs:135; SURVEY.md D8)."""
    return fq12_mul(offset, fq12_pow_bits(x, bits))


def fq12_pow_static(a, e: int):
    """a^e for a static Python-int exponent."""
    bits = jnp.asarray(np.array([int(b) for b in bin(e)[2:]], dtype=np.uint32))
    return fq12_pow_bits(a, bits)


# ------------------------------------------------- MyFq12 direct-basis codec

@jax.jit
def fq12_to_direct(a):
    """Tower -> 12 direct-basis Fq coeffs (..., 12, L), canonical (non-Mont.)
    order matching the reference's MyFq12 (transcript_native.rs:32-40):
    direct[2j+i] = c0 - 9 c1, direct[2j+i+6] = c1 for tower coeff (w^i v^j)."""
    flat = jnp.einsum("...ijkl->...jikl", a).reshape(*a.shape[:-4], 6, 2, L)
    c0, c1 = flat[..., 0, :], flat[..., 1, :]
    lo = F.sub(c0, _mul9(c1))
    out = jnp.concatenate([lo, c1], axis=-2)  # (..., 12, L) Montgomery
    return F.from_mont(out)
