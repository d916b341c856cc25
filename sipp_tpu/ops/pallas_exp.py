"""Fused Pallas TPU kernels for PER-LANE exponentiations (SURVEY.md D7/D8).

The reference's starky exp statements — G1ExpInput/G2ExpInput {x, offset,
exp_val} -> offset + [exp_val]x and Fq12ExpInput -> offset * x^exp_val
(/root/reference/src/verifier_circuit.rs:92-135) — have PER-LANE exponents,
unlike the SIPP fold's shared challenge scalar.  As XLA scans
(curves.scalar_mul_per_lane / tower.fq12_pow_bits) they cost 254 dispatched
steps of small ops and are latency-bound at protocol batch sizes; here the
whole ladder runs inside ONE Pallas kernel per group.

Per-lane divergence: the exponent bits live in VMEM as a (254, B) plane and
every iteration computes the conditional add/multiply for all lanes and
SELECTS per lane — uniform control flow (no pl.when possible: bits differ
across lanes; the add is ~half the step cost, so the ceiling vs the
shared-scalar fold kernel is ~1.5x, far below the ~254x dispatch overhead
this removes).

Formulas mirror pallas_fold (curve ladders) and pallas_fexp (Fq12 ops) in
the transposed limbs-on-sublanes layout of ops/tmul.py; bit-identical to the
XLA path (differentially tested in tests/test_pallas.py + on TPU).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import FQ
from . import tmul as t
# CIOS-form fq12_mul (pallas_miller): this kernel is per-lane THROUGHPUT
# work, where CIOS's lower op count wins; pallas_fexp's fq12_mul switched
# to the latency-form SOS multiply for its serial B=1 tail in round 4
from .pallas_miller import fq12_mul
from .pallas_fold import (_FqAd, _Fq2Ad, _add_mixed, _dbl, _sel, _to_affine)

L = FQ.L


def _add_mixed_complete(p, q_aff, f):
    """_add_mixed plus the P == Q doubling case (the offset addition can hit
    it: offset + [k]x with offset == [k]x is legal input — mirror of
    weierstrass.add_mixed handle_double=True)."""
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
    # P == Q (H == R == 0, Z != 0): double the affine point instead
    q_jac = jnp.stack([x2, y2, f.one_like(x2)])
    dbl_case = jnp.logical_and(
        jnp.logical_and(f.is_zero(H), f.is_zero(R)),
        jnp.logical_not(f.is_zero(Z)))
    out = _sel(dbl_case[None], _dbl(q_jac, f), out, f)
    # p == infinity -> q
    out = _sel(f.is_zero(Z)[None], q_jac, out, f)
    # q == infinity -> p
    q_inf = jnp.logical_and(f.is_zero(x2), f.is_zero(y2))
    return _sel(q_inf[None], p, out, f)


def _make_exp_kernel(f):
    def kernel(c_ref, bits_ref, x_ref, off_ref, o_ref, acc_ref):
        with t.bound_consts(c_ref[:]):
            base = x_ref[:]
            acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.uint32)  # infinity

            def body(i, carry):
                acc = _dbl(acc_ref[:], f)
                added = _add_mixed(acc, base, f)
                acc_ref[:] = _sel((bits_ref[i] != 0)[None], added, acc, f)
                return carry

            jax.lax.fori_loop(0, bits_ref.shape[0], body, 0)
            out = _add_mixed_complete(acc_ref[:], off_ref[:], f)
            o_ref[:] = _to_affine(out, f)

    return kernel


_K_G1 = _make_exp_kernel(_FqAd)
_K_G2 = _make_exp_kernel(_Fq2Ad)


def _exp_call(kernel, coeff_shape, x_t, off_t, bits, interpret=False):
    B = x_t.shape[-1]
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # consts
            pl.BlockSpec(memory_space=pltpu.VMEM),   # per-lane bits (254, B)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # x (affine)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # offset (affine)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2,) + coeff_shape + (L, B), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((3,) + coeff_shape + (L, B), jnp.uint32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(t.CONSTS_NP), bits, x_t, off_t)


@functools.partial(jax.jit, static_argnums=(3,))
def exp_g1_fused(x_aff, off_aff, bits, interpret=False):
    """offset + [k_i]x_i -> AFFINE, whole per-lane ladder in one kernel.
    x_aff, off_aff: (B, 2, L) affine G1; bits: (254, B) MSB-first per-lane.
    Bit-identical to G1.to_affine(G1.exp_with_offset(x, off, bits))."""
    xt = jnp.transpose(x_aff, (1, 2, 0))
    ot = jnp.transpose(off_aff, (1, 2, 0))
    out = _exp_call(_K_G1, (), xt, ot, bits, interpret)
    return jnp.transpose(out, (2, 0, 1))


@functools.partial(jax.jit, static_argnums=(3,))
def exp_g2_fused(x_aff, off_aff, bits, interpret=False):
    """G2 twin.  x, off: (B, 2, 2, L) affine G2; bits: (254, B)."""
    xt = jnp.transpose(x_aff, (1, 2, 3, 0))
    ot = jnp.transpose(off_aff, (1, 2, 3, 0))
    out = _exp_call(_K_G2, (2,), xt, ot, bits, interpret)
    return jnp.transpose(out, (3, 0, 1, 2))


# ------------------------------------------------------------- Fq12 exp

def _one_like_fq12(x):
    """Fq12 one in transposed layout (..., 2, 3, 2, L, B): Montgomery one at
    coeff [0, 0, 0], zero elsewhere — built with concatenates (Mosaic-safe;
    no scatter)."""
    one = jnp.broadcast_to(t._c(4), (1, 1, 1) + x.shape[-2:])
    z1 = jnp.zeros_like(one)
    c00 = jnp.concatenate([one, z1], axis=2)            # (1, 1, 2, L, B)
    z2 = jnp.zeros((1, 2, 2) + x.shape[-2:], jnp.uint32)
    c0 = jnp.concatenate([c00, z2], axis=1)             # (1, 3, 2, L, B)
    return jnp.concatenate([c0, jnp.zeros_like(c0)], axis=0)


def _fq12_exp_kernel(c_ref, bits_ref, x_ref, off_ref, o_ref):
    with t.bound_consts(c_ref[:]):
        x = x_ref[:]
        # offset * x^k: run the pure MSB-first power from one, then ONE final
        # multiply by the offset (mirrors tower.fq12_exp_with_offset =
        # fq12_mul(off, fq12_pow_bits(x, bits))).
        pw = _one_like_fq12(x)

        def body(i, pw):
            pw = fq12_mul(pw, pw)
            mul = fq12_mul(pw, x)
            return _sel_fq12((bits_ref[i] != 0), mul, pw)

        pw = jax.lax.fori_loop(0, bits_ref.shape[0], body, pw)
        o_ref[:] = fq12_mul(off_ref[:], pw)


def _sel_fq12(cond, a, b):
    """(B,) condition -> select over (..., 2, 3, 2, L, B)."""
    return jnp.where(cond[None, None, None, None, :], a, b)


@functools.partial(jax.jit, static_argnums=(3,))
def fq12_exp_fused(x, off, bits, interpret=False):
    """offset * x^(k_i) per lane, one kernel.  x, off: (B, 2, 3, 2, L)
    standard layout; bits: (254, B).  Bit-identical to
    tower.fq12_exp_with_offset."""
    B = x.shape[0]
    xt = jnp.transpose(x, (1, 2, 3, 4, 0))
    ot = jnp.transpose(off, (1, 2, 3, 4, 0))
    out = pl.pallas_call(
        _fq12_exp_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bits (254, B)
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, 3, 2, L, B), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(t.CONSTS_NP), bits, xt, ot)
    return jnp.transpose(out, (4, 0, 1, 2, 3))
