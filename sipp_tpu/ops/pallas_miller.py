"""Fused Pallas TPU kernel for one Miller-loop step (square + double + line
multiply [+ conditional add step]).

Round-1 measurement (NOTES_NEXT.md): the n=128 Miller loop costs ~40 ms as
64 lax.scan steps of ~30 XLA ops each — per-op dispatch dominates at small
batch.  This module fuses the ENTIRE step body into one pallas_call using the
transposed limb layout of ops/tmul.py (limbs on sublanes, batch on lanes), so
a scan step is ONE device op.

The field/tower math mirrors pairing/pairing.py's _dbl_step/_add_step/
fq12_sqr/fq12_mul_line formulas exactly (same Jacobian doubling, same scaled
line coefficients — reference semantics SURVEY.md D5,
/root/reference/src/prover_native.rs:20) and is differentially tested
bit-exact against them (tests/test_pallas.py).

Layouts inside the kernel (uint32, L=16 limbs, B batch lanes):
    Fq   : (..., L, B)
    Fq2  : (..., 2, L, B)
    Fq12 : (2, 3, 2, L, B)
    G2 Jacobian: (3, 2, L, B); G2 affine: (2, 2, L, B)
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import hostref
from ..fields import FQ, tower
from . import tmul as t

L = FQ.L

# Twist Frobenius constants (2 Fq2 elements, Montgomery limbs) — same values
# as pairing._TWF_X/_TWF_Y.
# ensure_compile_time_eval: this module is imported lazily, sometimes from
# inside a jit trace — the encodes must stay concrete, not become tracers.
with jax.ensure_compile_time_eval():
    TWF_NP = np.stack([
        np.asarray(jax.device_get(tower.fq2_encode(hostref.TWIST_FROB_X))),
        np.asarray(jax.device_get(tower.fq2_encode(hostref.TWIST_FROB_Y))),
    ])


# ------------------------------------------------------------- Fq6 / Fq12

def fq6_mul(a, b):
    """Toom/Karatsuba Fq6 multiply (mirror of tower.fq6_mul)."""
    a0, a1, a2 = a[..., 0, :, :, :], a[..., 1, :, :, :], a[..., 2, :, :, :]
    b0, b1, b2 = b[..., 0, :, :, :], b[..., 1, :, :, :], b[..., 2, :, :, :]
    x = jnp.stack([a0, a1, a2, t.add(a1, a2), t.add(a0, a1), t.add(a0, a2)])
    y = jnp.stack([b0, b1, b2, t.add(b1, b2), t.add(b0, b1), t.add(b0, b2)])
    v = t.fq2_mul(x, y)
    v0, v1, v2, t12, t01, t02 = (v[i] for i in range(6))
    c0 = t.add(v0, t.fq2_mul_xi(t.sub(t12, t.add(v1, v2))))
    c1 = t.add(t.sub(t01, t.add(v0, v1)), t.fq2_mul_xi(v2))
    c2 = t.add(t.sub(t02, t.add(v0, v2)), v1)
    return jnp.stack([c0, c1, c2], axis=-4)


def fq6_mul_by_v(a):
    """v * (c0 + c1 v + c2 v^2) = xi*c2 + c0 v + c1 v^2."""
    return jnp.concatenate(
        [t.fq2_mul_xi(a[..., 2, :, :, :])[..., None, :, :, :],
         a[..., 0:2, :, :, :]],
        axis=-4,
    )


def fq12_sqr(a):
    """Complex squaring (mirror of tower.fq12_sqr)."""
    a0, a1 = a[..., 0, :, :, :, :], a[..., 1, :, :, :, :]
    x = jnp.stack([a0, t.add(a0, a1)])
    y = jnp.stack([a1, t.add(a0, fq6_mul_by_v(a1))])
    v = fq6_mul(x, y)
    tt = v[0]
    u = v[1]
    c0 = t.sub(u, t.add(tt, fq6_mul_by_v(tt)))
    c1 = t.double(tt)
    return jnp.stack([c0, c1], axis=-5)


def fq12_mul_line(f, a, b, c):
    """f * (a + b*w + c*v*w) sparse multiply (mirror of tower.fq12_mul_line)."""
    f0, f1 = f[..., 0, :, :, :, :], f[..., 1, :, :, :, :]
    f00, f01, f02 = f0[..., 0, :, :, :], f0[..., 1, :, :, :], f0[..., 2, :, :, :]
    f10, f11, f12 = f1[..., 0, :, :, :], f1[..., 1, :, :, :], f1[..., 2, :, :, :]
    s0, s1, s2 = t.add(f00, f10), t.add(f01, f11), t.add(f02, f12)
    ab = t.add(a, b)
    x = jnp.stack([f00, f01, f02, f10, f11, f12, f10, f11, f12,
                   s0, s1, s2, s0, s1, s2])
    y = jnp.stack(jnp.broadcast_arrays(a, a, a, b, b, b, c, c, c,
                                       ab, ab, ab, c, c, c))
    v = t.fq2_mul(x, y)
    v00, v01, v02 = v[0], v[1], v[2]
    r0 = t.add(v[3], t.fq2_mul_xi(v[8]))
    r1 = t.add(v[4], v[6])
    r2 = t.add(v[5], v[7])
    t0 = t.add(v[9], t.fq2_mul_xi(v[14]))
    t1 = t.add(v[10], v[12])
    t2 = t.add(v[11], v[13])
    c00 = t.add(v00, t.fq2_mul_xi(r2))
    c01 = t.add(v01, r0)
    c02 = t.add(v02, r1)
    c10 = t.sub(t0, t.add(v00, r0))
    c11 = t.sub(t1, t.add(v01, r1))
    c12 = t.sub(t2, t.add(v02, r2))
    lo = jnp.stack([c00, c01, c02], axis=-4)
    hi = jnp.stack([c10, c11, c12], axis=-4)
    return jnp.stack([lo, hi], axis=-5)


# ------------------------------------------------------------- curve steps

def dbl_step(tj, xp, yp):
    """Fused Jacobian doubling + scaled line (mirror of pairing._dbl_step).

    Restructured for stack ILP: a single (L, 128) mul is LATENCY-bound on
    the VPU (RESULTS.md), so the serial MM = M^2 / Y3a = M*(S - X3) pair of
    the textbook formula is replaced by the exact identity
    Y3 = 3*M*S - M^3 - 8C, letting W = M^2 ride the second stacked multiply
    and (M^3, M*S) the third — three stacked muls, zero singles, per step.
    Bit-identical: every op canonicalizes mod p, and the identity is exact.
    """
    X, Y, Z = tj[..., 0, :, :, :], tj[..., 1, :, :, :], tj[..., 2, :, :, :]
    v = t.fq2_mul(jnp.stack([X, Y, Z, Y]), jnp.stack([X, Y, Z, Z]))
    A, B, ZZ, YZ = v[0], v[1], v[2], v[3]
    XB = t.add(X, B)
    M = t.add(t.double(A), A)
    v = t.fq2_mul(
        jnp.stack([B, XB, YZ, A, X, M]),
        jnp.stack([B, XB, ZZ, ZZ, A, M]),
    )
    C, D, T1, T2, T3, W = (v[i] for i in range(6))
    S = t.double(t.sub(t.sub(D, A), C))
    v = t.fq2_mul(jnp.stack([M, M]), jnp.stack([W, S]))
    M3, MS = v[0], v[1]
    X3 = t.sub(W, t.double(S))
    C8 = t.double(t.double(t.double(C)))
    Y3 = t.sub(t.sub(t.add(t.double(MS), MS), M3), C8)
    Z3 = t.double(YZ)
    t2 = jnp.stack([X3, Y3, Z3], axis=-4)
    a = t.fq2_scale(t.double(T1), yp)
    b = t.neg(t.fq2_scale(t.add(t.double(T2), T2), xp))
    c = t.sub(t.add(t.double(T3), T3), t.double(B))
    return t2, (a, b, c)


def add_step(tj, q, xp, yp):
    """Fused mixed addition + line (mirror of pairing._add_step).  Stacked
    to avoid latency-bound single muls: S2 = y2*Z^3 is computed as
    (y2*Z)*(Z*Z), letting y2*Z join the first stack (dbl_step rationale)."""
    X, Y, Z = tj[..., 0, :, :, :], tj[..., 1, :, :, :], tj[..., 2, :, :, :]
    x2, y2 = q[..., 0, :, :, :], q[..., 1, :, :, :]
    v = t.fq2_mul(jnp.stack([Z, y2]), jnp.stack([Z, Z]))
    ZZ, Y2Z = v[0], v[1]
    v = t.fq2_mul(jnp.stack([x2, Y2Z]), jnp.stack([ZZ, ZZ]))
    U2, S2 = v[0], v[1]
    H = t.sub(U2, X)
    R = t.sub(S2, Y)
    v = t.fq2_mul(jnp.stack([H, R]), jnp.stack([H, R]))
    HH, RR = v[0], v[1]
    v = t.fq2_mul(jnp.stack([H, X, Z]), jnp.stack([HH, HH, H]))
    HHH, V, Z3 = v[0], v[1], v[2]
    X3 = t.sub(t.sub(RR, HHH), t.double(V))
    v = t.fq2_mul(jnp.stack([R, Y]), jnp.stack([t.sub(V, X3), HHH]))
    Y3 = t.sub(v[0], v[1])
    t3 = jnp.stack([X3, Y3, Z3], axis=-4)
    v = t.fq2_mul(jnp.stack([R, Z3]), jnp.stack([x2, y2]))
    c = t.sub(v[0], v[1])
    a = t.fq2_scale(Z3, yp)
    b = t.neg(t.fq2_scale(R, xp))
    return t3, (a, b, c)


# ---------------------------------------------------- fq12 generic + frob

def fq12_mul(a, b):
    """Karatsuba Fq12 multiply (mirror of tower.fq12_mul)."""
    a0, a1 = a[..., 0, :, :, :, :], a[..., 1, :, :, :, :]
    b0, b1 = b[..., 0, :, :, :, :], b[..., 1, :, :, :, :]
    x = jnp.stack([a0, a1, t.add(a0, a1)])
    y = jnp.stack([b0, b1, t.add(b0, b1)])
    v = fq6_mul(x, y)
    c0 = t.add(v[0], fq6_mul_by_v(v[1]))
    c1 = t.sub(v[2], t.add(v[0], v[1]))
    return jnp.stack([c0, c1], axis=-5)


def fq2_conj(a):
    return jnp.stack([a[..., 0, :, :], t.neg(a[..., 1, :, :])], axis=-3)


def twist_frob(q, twf):
    """G2 twist-coordinate Frobenius: (conj(x)*cx, conj(y)*cy); q: (2,2,L,B),
    twf: (2,2,L) constants (mirror of pairing._twist_frob)."""
    x, y = q[..., 0, :, :, :], q[..., 1, :, :, :]
    return jnp.stack(
        [t.fq2_mul(fq2_conj(x), twf[0][..., None]),
         t.fq2_mul(fq2_conj(y), twf[1][..., None])],
        axis=-4,
    )


# ------------------------------------------- whole-loop + product kernel

def _full_kernel(pair, c_ref, twf_ref, dig_ref, p_ref, q_ref, o_ref, f_ref,
                 t_ref):
    """ENTIRE Miller loop (digit tape in SMEM), Frobenius correction lines,
    infinity masking, and the cross-lane Fq12 product — one pallas_call.
    Output: every lane of o_ref holds prod_i f_i (hypercube reduction).

    pair (static): stop the hypercube at stride 2.  Every roll stride is
    then even, so lane parity classes never mix: lane 0 ends up holding the
    product of all EVEN lanes and lane 1 the product of all ODD lanes — two
    independent m-wide pairing products (a fold round's Z_L/Z_R cross
    products, interleaved by the caller) from ONE kernel at full lane
    utilization instead of two half-empty launches."""
    with t.bound_consts(c_ref[:]):
        B = p_ref.shape[-1]
        xp, yp = p_ref[0], p_ref[1]
        q_aff = q_ref[:]
        q_neg = jnp.stack(
            [q_aff[..., 0, :, :, :], t.neg(q_aff[..., 1, :, :, :])], axis=-4)
        one = jnp.broadcast_to(_c_one(), (L, B))
        zero = jnp.zeros((L, B), jnp.uint32)
        one2 = jnp.stack([one, zero])                      # Fq2 one
        # f0 = 1 in Fq12: coefficient (0,0) = one, rest 0
        f_ref[:] = jnp.stack(
            [jnp.stack([one2, jnp.stack([zero, zero]), jnp.stack([zero, zero])]),
             jnp.zeros((3, 2, L, B), jnp.uint32)])
        t_ref[:] = jnp.concatenate([q_aff, one2[None]], axis=0)

        def body(i, carry):
            f = fq12_sqr(f_ref[:])
            t2, line = dbl_step(t_ref[:], xp, yp)
            f_ref[:] = fq12_mul_line(f, *line)
            t_ref[:] = t2

            @pl.when(dig_ref[i] != 0)
            def _():
                qs = jnp.where(dig_ref[i] == 1, q_aff, q_neg)
                t3, line2 = add_step(t_ref[:], qs, xp, yp)
                f_ref[:] = fq12_mul_line(f_ref[:], *line2)
                t_ref[:] = t3

            return carry

        jax.lax.fori_loop(0, dig_ref.shape[0], body, 0)

        # Frobenius correction lines: +pi(Q), then -pi^2(Q)
        twf = twf_ref[:]
        q1 = twist_frob(q_aff, twf)
        q2 = twist_frob(q1, twf)
        nq2 = jnp.stack(
            [q2[..., 0, :, :, :], t.neg(q2[..., 1, :, :, :])], axis=-4)
        t3, line = add_step(t_ref[:], q1, xp, yp)
        f = fq12_mul_line(f_ref[:], *line)
        _, line = add_step(t3, nq2, xp, yp)
        f = fq12_mul_line(f, *line)

        # infinity lanes (e(O, Q) = e(P, O) = 1) contribute 1 to the product
        inf_p = jnp.all(p_ref[:] == 0, axis=(0, 1))        # (B,)
        inf_q = jnp.all(q_aff == 0, axis=(0, 1, 2))
        f_one = jnp.stack(
            [jnp.stack([one2, jnp.stack([zero, zero]), jnp.stack([zero, zero])]),
             jnp.zeros((3, 2, L, B), jnp.uint32)])
        f = jnp.where(jnp.logical_or(inf_p, inf_q), f_one, f)

        # cross-lane product: hypercube reduction by lane rotations — after
        # log2(B) rounds EVERY lane holds the full product (no lane slicing,
        # which Mosaic mislays; rolls are native)
        s = B // 2
        while s >= (2 if pair else 1):
            f = fq12_mul(f, pltpu.roll(f, s, axis=f.ndim - 1))
            s //= 2
        o_ref[:] = f


def _c_one():
    """(L, 1) Montgomery one column from the packed constant table."""
    return t._c(4)


@functools.partial(jax.jit, static_argnums=(2, 3))
def miller_product_fused(p_aff, q_aff, interpret: bool = False,
                         pair: bool = False):
    """prod_i miller(P_i, Q_i) over the batch: the whole loop, tail, and
    product tree as ONE kernel launch.  p_aff: (B, 2, L); q_aff:
    (B, 2, 2, L); B a power of two <= 128 (VMEM).  Returns (2, 3, 2, L).
    Bit-identical to _product_tree(miller_loop(...)) — differentially
    tested (the product order of the lane hypercube equals the halving
    tree's: both multiply index i with i + B/2^k at level k).

    pair=True: treat even/odd lanes as two independent pairing-product
    instances (see _full_kernel) and return (2, 2, 3, 2, L): index 0 = the
    even-lane product, 1 = the odd-lane product.  Exact: field products are
    order-independent (canonical representation is unique)."""
    from ..pairing.ate import _DIGITS

    B = p_aff.shape[0]
    assert B & (B - 1) == 0 and B <= 512
    assert not (pair and B < 2)
    pt = jnp.transpose(p_aff, (1, 2, 0))
    qt = jnp.transpose(q_aff, (1, 2, 3, 0))
    out = pl.pallas_call(
        functools.partial(_full_kernel, pair),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # consts
            pl.BlockSpec(memory_space=pltpu.VMEM),   # twist-frob consts
            pl.BlockSpec(memory_space=pltpu.SMEM),   # NAF digit tape
            pl.BlockSpec(memory_space=pltpu.VMEM),   # P
            pl.BlockSpec(memory_space=pltpu.VMEM),   # Q
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, 3, 2, L, B), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((2, 3, 2, L, B), jnp.uint32),   # f
            pltpu.VMEM((3, 2, L, B), jnp.uint32),      # t
        ],
        # the fq12 temporaries of the loop body peak at ~21 MB of scoped
        # VMEM at B=128 — above the 16 MB default limit, well under the
        # 128 MB v5e VMEM (measured via local AOT compile, scratch/aot_diag)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        jnp.asarray(t.CONSTS_NP),
        jnp.asarray(TWF_NP),
        jnp.asarray(_DIGITS),
        pt,
        qt,
    )
    if pair:
        # lanes 0/1 hold the even/odd-class products: (2, 2, 3, 2, L)
        return jnp.moveaxis(out[..., 0:2], -1, 0)
    # drop the lane axis: (2, 3, 2, L, B) lane 0 -> standard (2, 3, 2, L)
    return out[..., 0]


# ------------------------------------------------------------- fused kernel

def _step_kernel(d_ref, c_ref, qp_ref, qn_ref, p_ref, f_ref, t_ref,
                 fo_ref, to_ref):
    with t.bound_consts(c_ref[:]):
        xp, yp = p_ref[0], p_ref[1]
        f = fq12_sqr(f_ref[:])
        t2, line = dbl_step(t_ref[:], xp, yp)
        fo_ref[:] = fq12_mul_line(f, *line)
        to_ref[:] = t2

        @pl.when(d_ref[0] != 0)
        def _():
            q = jnp.where(d_ref[0] == 1, qp_ref[:], qn_ref[:])
            t3, line2 = add_step(to_ref[:], q, xp, yp)
            fo_ref[:] = fq12_mul_line(fo_ref[:], *line2)
            to_ref[:] = t3


@functools.partial(jax.jit, static_argnums=(6,))
def miller_step(digit, consts, qp, qn, p, carry, interpret: bool = False):
    """One fused Miller step.  carry = (f, t) in transposed layout."""
    f, tj = carry
    B = f.shape[-1]
    fo, to = pl.pallas_call(
        _step_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((2, 3, 2, L, B), jnp.uint32),
            jax.ShapeDtypeStruct((3, 2, L, B), jnp.uint32),
        ],
        interpret=interpret,
    )(jnp.asarray(digit, jnp.uint32).reshape(1), consts, qp, qn, p, f, tj)
    return fo, to
