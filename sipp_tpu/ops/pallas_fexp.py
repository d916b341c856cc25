"""Fused Pallas TPU kernel for the BN254 final exponentiation.

After the Fq12 product tree the final-exp input has no batch axis; its ~800
dependent Fq12 multiplies are pure dispatch latency as XLA ops (~100 ms on a
v5e) and were therefore run on the host C++ kernel in round 1 — at the cost
of a device->host->device round trip (~25 ms through the axon tunnel,
NOTES_NEXT.md item 3).  This module runs the ENTIRE final exponentiation —
easy part (with the Fq12 tower inversion), the three x-power chains, and the
lambda addition-chain tape — inside ONE pallas_call, so the whole tail is a
single device op with zero host traffic.

Algorithm identical to pairing/pairing.py final_exp (easy part
`(conj(f)·f^-1)^(p^2+1)` then the exact lambda decomposition tape _TAPE);
reference semantics: the final exponentiation of the per-pair `pairing` calls
(/root/reference/src/prover_native.rs:20; SURVEY.md D5).  Differentially
tested bit-exact against final_exp in tests/test_pallas.py.

Layouts: transposed (ops/tmul.py) — limbs on sublanes, batch on lanes.
The whole exponent schedule is STATIC (p-2, the BN parameter x, and the
lambda addition-chain tape are compile-time constants), so the kernel is
fully unrolled where it pays: the x-power chains and the Fermat inversion
run as squaring chains + stacked set-bit product trees (tmul.pow_tree, ~2x
less serial depth than square-and-multiply), and the tape runs with static
register names and statically selected conj/Frobenius post-ops instead of
a scratch register file with dynamic indexing.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import params
from ..fields import FQ, tower
from . import tmul as t
from .pallas_miller import fq6_mul, fq6_mul_by_v

L = FQ.L

# Frobenius constants pi^1..3 as one (3, 6, 2, L) array (Montgomery form),
# same coefficient order as tower._FROB_C (i-major over (w^i v^j)).
FROB_NP = np.stack(
    [np.asarray(jax.device_get(tower._FROB_C[k])).reshape(6, 2, L)
     for k in (1, 2, 3)]
)

_X_BITS = np.array([int(b) for b in bin(params.X)[2:]], dtype=np.uint32)


def _tape():
    from ..pairing.ate import _TAPE
    return _TAPE


# --------------------------------------------------- Fq12 ops (transposed)

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


def fq12_conj(a):
    """f^(p^6): negate the w half."""
    return jnp.stack(
        [a[..., 0, :, :, :, :], t.neg(a[..., 1, :, :, :, :])], axis=-5
    )


def fq12_cyclo_sqr(g):
    """Granger-Scott cyclotomic squaring (mirror of tower.fq12_cyclo_sqr)."""
    z0 = g[..., 0, 0, :, :, :]; z4 = g[..., 0, 1, :, :, :]
    z3 = g[..., 0, 2, :, :, :]; z2 = g[..., 1, 0, :, :, :]
    z1 = g[..., 1, 1, :, :, :]; z5 = g[..., 1, 2, :, :, :]
    x = jnp.stack([z0, z1, z0, z2, z3, z2, z4, z5, z4])
    y = jnp.stack([z0, z1, z1, z2, z3, z3, z4, z5, z5])
    v = t.fq2_mul(x, y)

    # Fp4 squarings for the three pairs at once (one stacked stage each):
    # t = a^2 + xi b^2, u = 2ab.
    a2 = jnp.stack([v[0], v[3], v[6]])
    b2 = jnp.stack([v[1], v[4], v[7]])
    ab = jnp.stack([v[2], v[5], v[8]])
    t0_, u0, s0 = t.add(a2, t.fq2_mul_xi(b2))
    t1_, u1, s1 = t.double(ab)

    # the six 3T +/- 2z chains as TWO stacked stages (3T then the +/- 2z),
    # instead of six separate serial add chains
    T6 = jnp.stack([t0_, u0, s0, t.fq2_mul_xi(s1), t1_, u1])
    Z6 = jnp.stack([z0, z4, z3, z2, z1, z5])
    r3 = t.add(t.double(T6), T6)
    d2 = t.double(Z6)
    lo = jnp.moveaxis(t.sub(r3[:3], d2[:3]), 0, -4)
    hi = jnp.moveaxis(t.add(r3[3:], d2[3:]), 0, -4)
    return jnp.stack([lo, hi], axis=-5)


def fq12_frob(a, frob, k: int):
    """a^(p^k), k in {1,2,3}; frob: the (3, 6, 2, L) constant table."""
    if k % 2:
        a = jnp.concatenate(
            [a[..., 0:1, :, :], t.neg(a[..., 1:2, :, :])], axis=-3
        )
    c = a.reshape(*a.shape[:-5], 6, 2, L, a.shape[-1])
    # explicit broadcast: leading stack axes (the B>1 fexp batch) otherwise
    # misalign against the (6, 2, L, 1) constant table
    out = t.fq2_mul(c, jnp.broadcast_to(frob[k - 1][..., None], c.shape))
    return out.reshape(a.shape)


def fq6_inv(a):
    """Mirror of tower.fq6_inv (one Fq2 inversion)."""
    a0, a1, a2 = a[..., 0, :, :, :], a[..., 1, :, :, :], a[..., 2, :, :, :]
    prods = t.fq2_mul(
        jnp.stack([a0, a1, a2, a1, a0, a0]),
        jnp.stack([a0, a1, a2, a2, a1, a2]),
    )
    s0, s1, s2, p12, p01, p02 = (prods[i] for i in range(6))
    A = t.sub(s0, t.fq2_mul_xi(p12))
    B = t.sub(t.fq2_mul_xi(s2), p01)
    C = t.sub(s1, p02)
    u = t.fq2_mul(jnp.stack([a0, a2, a1]), jnp.stack([A, B, C]))
    tt = t.add(u[0], t.fq2_mul_xi(t.add(u[1], u[2])))
    tinv = t.fq2_inv(tt)
    out = t.fq2_mul(jnp.stack([A, B, C]), tinv[None])
    return jnp.moveaxis(out, 0, -4)


def fq12_inv(a):
    """Mirror of tower.fq12_inv (norm-map descent, one Fq Fermat inv)."""
    a0, a1 = a[..., 0, :, :, :, :], a[..., 1, :, :, :, :]
    sq = fq6_mul(jnp.stack([a0, a1]), jnp.stack([a0, a1]))
    tt = fq6_inv(t.sub(sq[0], fq6_mul_by_v(sq[1])))
    return jnp.stack([fq6_mul(a0, tt), t.neg(fq6_mul(a1, tt))], axis=-5)


def _powx(v):
    """v^x (x = BN parameter, static 63-bit exponent): 62 cyclotomic
    squarings + one stacked 28-leaf product tree (tmul.pow_tree)."""
    return t.pow_tree(v, _X_BITS, sqrfn=fq12_cyclo_sqr, mulfn=fq12_mul)


# ------------------------------------------------------------------ kernel

def _fexp_kernel(c_ref, frob_ref, f_ref, o_ref):
    with t.bound_consts(c_ref[:]):
        frob = frob_ref[:]
        f = f_ref[:]
        # easy part: g = (conj(f) * f^-1)^(p^2) * (conj(f) * f^-1)
        g = fq12_mul(fq12_conj(f), fq12_inv(f))
        g = fq12_mul(fq12_frob(g, frob, 2), g)
        # register file with STATIC names: 0=g, 1=g^x, 2=g^(x^2), 3=g^(x^3),
        # 4..11 tape scratch; the tape and its conj/frob post-ops are
        # compile-time constants, so no dynamic indexing / where-selects
        regs = {0: g}
        for k in (1, 2, 3):
            regs[k] = _powx(regs[k - 1])
        for dst, s1, s2, post in _tape().tolist():
            r = fq12_mul(regs[s1], regs[s2])
            if post == 1:
                r = fq12_conj(r)
            elif post == 2:
                r = fq12_frob(r, frob, 1)
            elif post == 3:
                r = fq12_frob(r, frob, 2)
            regs[dst] = r
        o_ref[:] = fq12_mul(regs[5], fq12_frob(regs[0], frob, 3))


@functools.partial(jax.jit, static_argnums=(1,))
def final_exp_fused(f, interpret: bool = False):
    """f^((p^12-1)/r) as ONE Pallas kernel.  f: (B, 2, 3, 2, L) standard
    layout, B small (the post-product-tree tail).  Bit-identical to
    pairing.final_exp.

    Batch layout: B rides the OUTERMOST stack axis with a unit lane axis —
    (B, 2, 3, 2, L, 1) — NOT the lane axis.  The exponentiation chain is
    branch-free and identical for every element, and tmul.mul's stacked-
    lead flatten then merges (B*S, L, 1) -> (L, B*S): B final exps cost one
    kernel at B-fold lane utilization (the (L, B, S) lane merge a lane-axis
    batch would need is an unsupported Mosaic shape cast)."""
    assert f.ndim == 5 and f.shape[0] <= 16, "fexp kernel is a small-B tail"
    B = f.shape[0]
    ft = f[..., None]                     # (B, 2, 3, 2, L, 1)
    out = pl.pallas_call(
        _fexp_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # consts
            pl.BlockSpec(memory_space=pltpu.VMEM),   # frobenius table
            pl.BlockSpec(memory_space=pltpu.VMEM),   # f
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2, 3, 2, L, 1), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        jnp.asarray(t.CONSTS_NP),
        jnp.asarray(FROB_NP),
        ft,
    )
    return out[..., 0]
