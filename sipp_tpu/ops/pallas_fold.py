"""Fused Pallas TPU kernels for the SIPP fold ladder.

The per-round fold A' = A_lo + [x]A_hi (reference prover_native.rs:60-69;
SURVEY.md D3/D4) as ONE kernel per group: the full 254-step double-and-add
ladder, the mixed addition of the offset, and the Jacobian->affine conversion
(Fermat inversion) — all in-kernel.  As an XLA scan the ladder costs ~254
dispatched steps of small ops (~55 ms/round on a v5e at 128 lanes); in-kernel
it is pure VPU instruction throughput, and the shared challenge scalar lives
in SMEM so zero bits SKIP their conditional add (`pl.when`) instead of
computing and discarding it.

Formulas mirror curves/weierstrass.py exactly (same dbl / add_mixed /
to_affine algebra, same infinity handling via selects) in the transposed
(limbs-on-sublanes, batch-on-lanes) layout of ops/tmul.py; differentially
tested bit-exact against the XLA path in tests/test_pallas.py and on TPU.

Layouts (B = lanes):
    G1 affine (2, L, B), jacobian (3, L, B)
    G2 affine (2, 2, L, B), jacobian (3, 2, L, B)   [coord, c, L, B]
Point at infinity: affine all-zero; jacobian Z == 0.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import FQ
from . import tmul as t

L = FQ.L


class _FqAd:
    """Field adapter over tmul for the generic ladder (Fq: (..., L, B))."""

    ndim = 2  # trailing field axes: (L, B)

    mul = staticmethod(t.mul)
    add = staticmethod(t.add)
    sub = staticmethod(t.sub)
    neg = staticmethod(t.neg)
    double = staticmethod(t.double)

    @staticmethod
    def is_zero(x):
        return jnp.all(x == 0, axis=-2)

    inv = staticmethod(t.inv)

    @staticmethod
    def one_like(x):
        return jnp.broadcast_to(t._c(4), x.shape)


class _Fq2Ad:
    """Fq2 adapter: (..., 2, L, B)."""

    ndim = 3

    mul = staticmethod(t.fq2_mul)
    add = staticmethod(t.add)
    sub = staticmethod(t.sub)
    neg = staticmethod(t.neg)
    double = staticmethod(t.double)

    @staticmethod
    def is_zero(x):
        return jnp.all(x == 0, axis=(-3, -2))

    inv = staticmethod(t.fq2_inv)

    @staticmethod
    def one_like(x):
        one = jnp.broadcast_to(t._c(4), x.shape[:-3] + x.shape[-2:])
        zero = jnp.zeros_like(one)
        return jnp.stack([one, zero], axis=-3)


def _sel(cond, a, b, f):
    """Select with a (..., B) condition broadcast over field coeff axes."""
    for _ in range(f.ndim - 1):
        cond = cond[..., None, :]
    return jnp.where(cond, a, b)


def _dbl(p, f):
    """Jacobian doubling, a=0 curve (mirror weierstrass.CurveOps.dbl).
    Stacked to avoid latency-bound single muls: Y3 = 3*M*S - M^3 - 8C
    (exact identity for M*(S - X3) - 8C with X3 = M^2 - 2S), so W = M^2
    rides the second stack and (M^3, M*S) the third — no single muls in
    the 254-iteration ladder (see pallas_miller.dbl_step)."""
    X, Y, Z = p[0], p[1], p[2]
    v = f.mul(jnp.stack([X, Y, Y]), jnp.stack([X, Y, Z]))
    A, B, YZ = v[0], v[1], v[2]
    xb = f.add(X, B)
    M = f.add(f.double(A), A)
    v = f.mul(jnp.stack([B, xb, M]), jnp.stack([B, xb, M]))
    C, D, W = v[0], v[1], v[2]
    S = f.double(f.sub(f.sub(D, A), C))
    v = f.mul(jnp.stack([M, M]), jnp.stack([W, S]))
    M3, MS = v[0], v[1]
    X3 = f.sub(W, f.double(S))
    C8 = f.double(f.double(f.double(C)))
    Y3 = f.sub(f.sub(f.add(f.double(MS), MS), M3), C8)
    Z3 = f.double(YZ)
    return jnp.stack([X3, Y3, Z3])


def _add_mixed(p, q_aff, f):
    """p (jacobian) + q (affine), incomplete (no P==Q case — the ladder
    never hits it), infinity-safe for both (mirror add_mixed + affine-q
    infinity select)."""
    X, Y, Z = p[0], p[1], p[2]
    x2, y2 = q_aff[0], q_aff[1]
    v = f.mul(jnp.stack([Z, y2]), jnp.stack([Z, Z]))
    ZZ, Y2Z = v[0], v[1]
    v = f.mul(jnp.stack([x2, Y2Z]), jnp.stack([ZZ, ZZ]))
    U2, S2 = v[0], v[1]
    H = f.sub(U2, X)
    R = f.sub(S2, Y)
    v = f.mul(jnp.stack([H, R]), jnp.stack([H, R]))
    HH, RR = v[0], v[1]
    v = f.mul(jnp.stack([H, X, Z]), jnp.stack([HH, HH, H]))
    HHH, V, Z3 = v[0], v[1], v[2]
    X3 = f.sub(f.sub(RR, HHH), f.double(V))
    v = f.mul(jnp.stack([R, Y]), jnp.stack([f.sub(V, X3), HHH]))
    Y3 = f.sub(v[0], v[1])
    out = jnp.stack([X3, Y3, Z3])
    # p == infinity -> q (affine lifted to jacobian)
    q_jac = jnp.stack([x2, y2, f.one_like(x2)])
    out = _sel(f.is_zero(Z)[None], q_jac, out, f)
    # q == infinity -> p (affine infinity is all-zero)
    q_inf = jnp.logical_and(f.is_zero(x2), f.is_zero(y2))
    return _sel(q_inf[None], p, out, f)


def _to_affine(p, f):
    """Jacobian -> affine; infinity -> (0, 0) (mirror to_affine)."""
    X, Y, Z = p[0], p[1], p[2]
    zinv = f.inv(Z)
    zinv2 = f.mul(zinv, zinv)
    v = f.mul(jnp.stack([X, zinv2]), jnp.stack([zinv2, zinv]))
    x, zinv3 = v[0], v[1]
    y = f.mul(Y, zinv3)
    out = jnp.stack([x, y])
    return _sel(f.is_zero(Z)[None], jnp.zeros_like(out), out, f)


def _make_fold_kernel(f):
    def kernel(c_ref, bits_ref, off_ref, base_ref, o_ref, acc_ref):
        with t.bound_consts(c_ref[:]):
            base = base_ref[:]
            # acc starts at [bit0]base (bit 0 of the challenge is the MSB and
            # may be 0 for an arbitrary 254-bit challenge)
            zero = jnp.zeros_like(base)
            acc_ref[:] = jnp.where(bits_ref[0] != 0,
                                   jnp.concatenate(
                                       [base, f.one_like(base[0])[None]]),
                                   jnp.zeros(acc_ref.shape, jnp.uint32))

            def body(i, carry):
                acc_ref[:] = _dbl(acc_ref[:], f)

                @pl.when(bits_ref[i] != 0)
                def _():
                    acc_ref[:] = _add_mixed(acc_ref[:], base, f)

                return carry

            jax.lax.fori_loop(1, bits_ref.shape[0], body, 0)
            out = _add_mixed(acc_ref[:], off_ref[:], f)
            o_ref[:] = _to_affine(out, f)

    return kernel


_K_G1 = _make_fold_kernel(_FqAd)
_K_G2 = _make_fold_kernel(_Fq2Ad)


def _fold_call(kernel, coeff_shape, off_t, base_t, bits):
    B = off_t.shape[-1]
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # consts
            pl.BlockSpec(memory_space=pltpu.SMEM),   # challenge bits
            pl.BlockSpec(memory_space=pltpu.VMEM),   # offset (affine)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # base (affine)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2,) + coeff_shape + (L, B), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((3,) + coeff_shape + (L, B), jnp.uint32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(
        jnp.asarray(t.CONSTS_NP),
        bits,
        off_t,
        base_t,
    )
    return out


@jax.jit
def fold_g1_fused(a1_aff, a2_aff, bits):
    """a1 + [x]a2 -> AFFINE, whole ladder in one kernel.  a1, a2:
    (B, 2, L) affine G1; bits: (254,) MSB-first shared challenge.
    Bit-identical to G1.to_affine(G1.fold(a1, a2, bits))."""
    off = jnp.transpose(a1_aff, (1, 2, 0))
    base = jnp.transpose(a2_aff, (1, 2, 0))
    out = _fold_call(_K_G1, (), off, base, bits)
    return jnp.transpose(out, (2, 0, 1))


@jax.jit
def fold_g2_fused(b1_aff, b2_aff, bits):
    """G2 twin of fold_g1_fused.  b1, b2: (B, 2, 2, L) affine G2."""
    off = jnp.transpose(b1_aff, (1, 2, 3, 0))
    base = jnp.transpose(b2_aff, (1, 2, 3, 0))
    out = _fold_call(_K_G2, (2,), off, base, bits)
    return jnp.transpose(out, (3, 0, 1, 2))
