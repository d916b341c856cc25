"""Batched BN254 optimal-ate pairing: inversion-free Miller loop + final exp.

TPU-native replacement for the reference's per-pair `pairing` calls
(/root/reference/src/prover_native.rs:20, verifier_native.rs:80; SURVEY.md D5).

Key design choices (TPU-first, not a translation):
- The Miller loop is *batched across the pairing vector*: one lax.scan over
  the static NAF digits of 6x+2, uniform control flow for every lane (the ate
  schedule is lane-independent), all field ops vectorized over the batch.
- G2 points use Jacobian coordinates on the twist and *scaled* line
  evaluations, making the whole loop inversion-free: the line through psi(T)
  may be multiplied by any Fq2 scalar (Fq2 is in a proper subfield of Fq12,
  killed by the final exponentiation), so we clear denominators:
      dbl:  L = 2YZ^3*yp  - 3X^2Z^2*xp w  + (3X^3 - 2Y^2) vw
      add:  L = Z3*yp     - theta*xp w    + (theta*x2 - Z3*y2) vw,
            theta = y2 Z^3 - Y,  Z3 = Z*(x2 Z^2 - X)
- inner_product fuses the product: Z = FE(prod_i miller(A_i, B_i)) — the
  final exponentiation is a power map, so one FE after a product tree replaces
  the reference's n per-pair final exponentiations (same value, reference
  prover_native.rs:15-23).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import hostref, params
from ..fields import FQ, tower as T

F = FQ
L = F.L

# NAF digits of 6x+2, processed MSB-1 downward: encode {0:0, 1:1, -1:2}.
_DIGITS = np.array(
    [{0: 0, 1: 1, -1: 2}[d] for d in reversed(params.ATE_NAF[:-1])], dtype=np.uint32
)

# Twist Frobenius constants (Fq2), derived from the host oracle.
_TWF_X = T.fq2_encode(hostref.TWIST_FROB_X)
_TWF_Y = T.fq2_encode(hostref.TWIST_FROB_Y)


def _sparse12(a, b, c):
    """Build the Fq12 element a + b*w + c*v*w from Fq2 coeffs (..., 2, L)."""
    z = jnp.zeros_like(a)
    c0 = jnp.stack([a, z, z], axis=-3)
    c1 = jnp.stack([b, c, z], axis=-3)
    return jnp.stack([c0, c1], axis=-4)


def _dbl_step(t, xp, yp):
    """Fused Jacobian doubling + scaled line coefficients.

    t: (..., 3, 2, L) G2 Jacobian; xp, yp: (..., L) G1 affine coords.
    Returns (t2, line) with line an Fq12 element.
    """
    X, Y, Z = t[..., 0, :, :], t[..., 1, :, :], t[..., 2, :, :]
    v = T.fq2_mul(jnp.stack([X, Y, Z, Y]), jnp.stack([X, Y, Z, Z]))
    A, B, ZZ, YZ = v[0], v[1], v[2], v[3]
    XB = F.add(X, B)
    v = T.fq2_mul(
        jnp.stack([B, XB, YZ, A, X]),
        jnp.stack([B, XB, ZZ, ZZ, A]),
    )
    C, D, T1, T2, T3 = v[0], v[1], v[2], v[3], v[4]
    S = F.double(F.sub(F.sub(D, A), C))         # 4 X Y^2
    M = F.add(F.double(A), A)                   # 3 X^2
    MM = T.fq2_mul(M, M)
    X3 = F.sub(MM, F.double(S))
    Y3a = T.fq2_mul(M, F.sub(S, X3))
    C8 = F.double(F.double(F.double(C)))
    Y3 = F.sub(Y3a, C8)
    Z3 = F.double(YZ)
    t2 = jnp.stack([X3, Y3, Z3], axis=-3)
    # line: a = 2YZ^3 * yp ; b = -3X^2 Z^2 * xp ; c = 3X^3 - 2Y^2
    a = T.fq2_scale(F.double(T1), yp)
    b = F.neg(T.fq2_scale(F.add(F.double(T2), T2), xp))
    c = F.sub(F.add(F.double(T3), T3), F.double(B))
    return t2, _sparse12(a, b, c)


def _add_step(t, q, xp, yp):
    """Fused mixed addition T + Q + scaled line through T and Q."""
    X, Y, Z = t[..., 0, :, :], t[..., 1, :, :], t[..., 2, :, :]
    x2, y2 = q[..., 0, :, :], q[..., 1, :, :]
    ZZ = T.fq2_mul(Z, Z)
    v = T.fq2_mul(jnp.stack([ZZ, x2]), jnp.stack([Z, ZZ]))
    ZZZ, U2 = v[0], v[1]
    S2 = T.fq2_mul(y2, ZZZ)
    H = F.sub(U2, X)      # beta
    R = F.sub(S2, Y)      # theta
    v = T.fq2_mul(jnp.stack([H, R]), jnp.stack([H, R]))
    HH, RR = v[0], v[1]
    v = T.fq2_mul(jnp.stack([H, X, Z]), jnp.stack([HH, HH, H]))
    HHH, V, Z3 = v[0], v[1], v[2]
    X3 = F.sub(F.sub(RR, HHH), F.double(V))
    v = T.fq2_mul(jnp.stack([R, Y]), jnp.stack([F.sub(V, X3), HHH]))
    Y3 = F.sub(v[0], v[1])
    t3 = jnp.stack([X3, Y3, Z3], axis=-3)
    # line: a = Z3 * yp ; b = -theta * xp ; c = theta*x2 - Z3*y2
    v = T.fq2_mul(jnp.stack([R, Z3]), jnp.stack([x2, y2]))
    c = F.sub(v[0], v[1])
    a = T.fq2_scale(Z3, yp)
    b = F.neg(T.fq2_scale(R, xp))
    return t3, _sparse12(a, b, c)


def _twist_frob(q):
    """G2 Frobenius on twist affine coords (reference hostref.twist_frob)."""
    x, y = q[..., 0, :, :], q[..., 1, :, :]
    return jnp.stack(
        [T.fq2_mul(T.fq2_conj(x), _TWF_X), T.fq2_mul(T.fq2_conj(y), _TWF_Y)],
        axis=-3,
    )


@jax.jit
def miller_loop(p_aff, q_aff):
    """Batched Miller function f_{6x+2,Q}(P) * frobenius line corrections.

    p_aff: (..., 2, L) G1 affine; q_aff: (..., 2, 2, L) G2 twist affine.
    Infinity inputs ((0,0) coords) yield f = 1.
    """
    xp, yp = p_aff[..., 0, :], p_aff[..., 1, :]
    q_neg = q_aff.at[..., 1, :, :].set(F.neg(q_aff[..., 1, :, :]))
    t0 = jnp.concatenate(
        [q_aff, jnp.broadcast_to(T.fq2_encode((1, 0)), q_aff[..., :1, :, :].shape)],
        axis=-3,
    )
    f0 = T.fq12_ones(p_aff.shape[:-2])
    digits = jnp.asarray(_DIGITS)

    def body(carry, digit):
        f, t = carry
        f = T.fq12_mul(f, f)
        t, line = _dbl_step(t, xp, yp)
        f = T.fq12_mul(f, line)
        q_sel = jnp.where(digit == 1, q_aff, q_neg)
        t_add, line_add = _add_step(t, q_sel, xp, yp)
        f_add = T.fq12_mul(f, line_add)
        use_add = digit != 0
        f = jnp.where(use_add, f_add, f)
        t = jnp.where(use_add, t_add, t)
        return (f, t), None

    (f, t), _ = jax.lax.scan(body, (f0, t0), digits)

    # Frobenius correction lines: +pi(Q), then -pi^2(Q).
    q1 = _twist_frob(q_aff)
    q2 = _twist_frob(q1)
    nq2 = q2.at[..., 1, :, :].set(F.neg(q2[..., 1, :, :]))
    t, line = _add_step(t, q1, xp, yp)
    f = T.fq12_mul(f, line)
    _, line = _add_step(t, nq2, xp, yp)
    f = T.fq12_mul(f, line)

    # infinity handling: e(O, Q) = e(P, O) = 1
    inf_p = jnp.all(p_aff == 0, axis=(-1, -2))
    inf_q = jnp.all(q_aff == 0, axis=(-1, -2, -3))
    inf = jnp.logical_or(inf_p, inf_q)[..., None, None, None, None]
    return jnp.where(inf, f0, f)


# Hard-part exponent (p^4 - p^2 + 1) / r  (naive but always-correct schedule;
# the optimized x-chain is a later, differential-tested swap-in).
_HARD_EXP = (params.P**4 - params.P**2 + 1) // params.R


@jax.jit
def final_exp(f):
    """f^((p^12-1)/r), batched."""
    # easy part: f^(p^6 - 1) then ^(p^2 + 1)
    g = T.fq12_mul(T.fq12_conj(f), T.fq12_inv(f))
    g = T.fq12_mul(T.fq12_frob(g, 2), g)
    # hard part
    return T.fq12_pow_static(g, _HARD_EXP)


def pairing(p_aff, q_aff):
    """Batched optimal ate pairing e(P, Q); matches hostref.pairing bit-exactly."""
    return final_exp(miller_loop(p_aff, q_aff))


@functools.partial(jax.jit, static_argnums=())
def inner_product(a_g1, b_g2):
    """Z = prod_i e(A_i, B_i) over the leading batch axis.

    Semantics of reference prover_native.rs:15-23; computed as one batched
    Miller loop, a product tree over lanes, and a single final exponentiation.
    """
    f = miller_loop(a_g1, b_g2)
    n = f.shape[0]
    while n > 1:
        half = n // 2
        if n % 2:
            last = f[n - 1 : n]
            f = jnp.concatenate([T.fq12_mul(f[:half], f[half : 2 * half]), last], 0)
            n = half + 1
        else:
            f = T.fq12_mul(f[:half], f[half:])
            n = half
    return final_exp(f[0])
