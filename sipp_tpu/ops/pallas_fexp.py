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
lambda addition-chain tape are compile-time constants).  Round-4 IR layout
(the round-3 fully-unrolled kernel serialized to 7.8 MB of StableHLO and
dominated the whole-program tunnel compile, VERDICT r3 next-1): everything
serial now rides fori_loops over VMEM register files with dynamic indexing
(the pow_tree store/load pattern, which Mosaic supports):
  * the three x-power chains are ONE fori_loop k=0..2 over a 12-slot Fq12
    register file (regs[k+1] = regs[k]^x), each chain a fori_loop squaring
    chain + one static stacked set-bit product tree (~2x less serial depth
    than square-and-multiply);
  * lambda-tape rows 0..22 (no post-ops) are ONE fori_loop reading
    (dst, s1, s2) from SMEM; only the 7 tail rows with conj/Frobenius
    post-ops stay unrolled, keeping the post-op selection compile-time.
Value-identical to the unrolled form (same multiplies in the same order).

Round-4 latency split: the HARD PART (x-chains, product trees, tape —
~80% of the serial stages) runs in the L=17-limb lazy-column domain
(ops/tmul_lat.py flat-expansion ops: one norm + one stacked SOS multiply
+ one canonicalization per tower op, vs ~15 norm-ops each in the L16
forms), converted at the easy-part/hard-part boundary; the easy part
(with its Fermat tower inversion) stays in the L16 ops.  Bit-equality
and the speedup were measured on v5e before integration
(scratch/r4_fexp_lat.py; RESULTS.md round 4).
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
from . import tmul_lat as lt

L = FQ.L


# ---------------------------------------------------- latency-form Fq mul
# This kernel is LATENCY-bound (B=1, ~470 dependent stages); the round-4
# probe (scratch/r4_latency_probe.py) measured the SOS multiply at 3.35 us
# vs CIOS's 5.24 us per dependent op — the three SOS product passes have no
# cross-iteration dependency, unlike CIOS's serial accumulator, so Mosaic
# schedules them shallower.  Value-identical (same canonical Montgomery
# output; tmul._mul_impl docstring), so the swap is bit-invisible.  The
# throughput-bound Miller kernels keep CIOS (fewer total vector ops).

def _mul_l(a, b):
    """t.mul's stacked-lead lane-merge wrapper around the SOS core."""
    if a.shape != b.shape:
        a, b = jnp.broadcast_arrays(a, b)
    lead = a.shape[:-2]
    B = a.shape[-1]
    S = int(np.prod(lead)) if lead else 1
    if S > 1 and B == 1:
        ar = jnp.transpose(a.reshape(S, L), (1, 0))
        br = jnp.transpose(b.reshape(S, L), (1, 0))
        r = t._mul_impl_sos(ar, br)
        return jnp.transpose(r, (1, 0)).reshape(a.shape)
    return t._mul_impl_sos(a, b)


def fq2_mul_l(a, b):
    """t.fq2_mul with the latency-form mul (same lazy cross sums)."""
    a0, a1 = a[..., 0, :, :], a[..., 1, :, :]
    b0, b1 = b[..., 0, :, :], b[..., 1, :, :]
    x = jnp.stack([a0, a1, t.add_lazy(a0, a1)])
    y = jnp.stack([b0, b1, t.add_lazy(b0, b1)])
    v = _mul_l(x, y)
    c0 = t.sub(v[0], v[1])
    c1 = t.sub(v[2], t.add(v[0], v[1]))
    return jnp.stack([c0, c1], axis=-3)


def _inv_l(a):
    """Fermat inversion with the latency-form mul (pow_tree schedule)."""
    return t.pow_tree(a, t._PM2_BITS_NP,
                      sqrfn=lambda s: _mul_l(s, s), mulfn=_mul_l)


def fq2_inv_l(a):
    a0, a1 = a[..., 0, :, :], a[..., 1, :, :]
    sq = _mul_l(jnp.stack([a0, a1]), jnp.stack([a0, a1]))
    ninv = _inv_l(t.add(sq[0], sq[1]))
    return jnp.stack([_mul_l(a0, ninv), t.neg(_mul_l(a1, ninv))], axis=-3)


def fq6_mul(a, b):
    """Toom/Karatsuba Fq6 multiply (pallas_miller.fq6_mul, latency mul)."""
    a0, a1, a2 = a[..., 0, :, :, :], a[..., 1, :, :, :], a[..., 2, :, :, :]
    b0, b1, b2 = b[..., 0, :, :, :], b[..., 1, :, :, :], b[..., 2, :, :, :]
    x = jnp.stack([a0, a1, a2, t.add(a1, a2), t.add(a0, a1), t.add(a0, a2)])
    y = jnp.stack([b0, b1, b2, t.add(b1, b2), t.add(b0, b1), t.add(b0, b2)])
    v = fq2_mul_l(x, y)
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
    v = fq2_mul_l(x, y)

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
    out = fq2_mul_l(c, jnp.broadcast_to(frob[k - 1][..., None], c.shape))
    return out.reshape(a.shape)


def fq6_inv(a):
    """Mirror of tower.fq6_inv (one Fq2 inversion)."""
    a0, a1, a2 = a[..., 0, :, :, :], a[..., 1, :, :, :], a[..., 2, :, :, :]
    prods = fq2_mul_l(
        jnp.stack([a0, a1, a2, a1, a0, a0]),
        jnp.stack([a0, a1, a2, a2, a1, a2]),
    )
    s0, s1, s2, p12, p01, p02 = (prods[i] for i in range(6))
    A = t.sub(s0, t.fq2_mul_xi(p12))
    B = t.sub(t.fq2_mul_xi(s2), p01)
    C = t.sub(s1, p02)
    u = fq2_mul_l(jnp.stack([a0, a2, a1]), jnp.stack([A, B, C]))
    tt = t.add(u[0], t.fq2_mul_xi(t.add(u[1], u[2])))
    tinv = fq2_inv_l(tt)
    out = fq2_mul_l(jnp.stack([A, B, C]), tinv[None])
    return jnp.moveaxis(out, 0, -4)


def fq12_inv(a):
    """Mirror of tower.fq12_inv (norm-map descent, one Fq Fermat inv)."""
    a0, a1 = a[..., 0, :, :, :, :], a[..., 1, :, :, :, :]
    sq = fq6_mul(jnp.stack([a0, a1]), jnp.stack([a0, a1]))
    tt = fq6_inv(t.sub(sq[0], fq6_mul_by_v(sq[1])))
    return jnp.stack([fq6_mul(a0, tt), t.neg(fq6_mul(a1, tt))], axis=-5)


# chain index j of the x squaring chain holds v^(2^j); set bits of x sit at
# j = nbits-1-k (pow_tree convention); x's MSB makes j = nbits-1 the last
_X_NBITS = len(_X_BITS)
_X_SET_POWS = [_X_NBITS - 1 - k for k in range(_X_NBITS) if _X_BITS[k]]

# Frobenius table in the L17 lazy-column domain (tmul_lat) for the hard
# part; derived from the same Montgomery values as FROB_NP.
FROB17_NP = lt.l17_mont_table(FROB_NP)


def _powx_ref(v, sq_ref):
    """v^x (x = BN parameter, static 63-bit exponent) in the L17 domain: a
    fori_loop of 62 flat-expansion cyclotomic squarings stored to the
    caller's VMEM scratch + one static stacked 28-leaf set-bit product
    tree (pow_tree's schedule, scratch hoisted so the whole thing can sit
    inside an outer fori_loop)."""

    def body(i, s):
        sq_ref[pl.ds(i, 1)] = s[None]
        return lt.fq12_cyclo_sqr(s)

    last = jax.lax.fori_loop(0, _X_NBITS - 1, body, v)
    vals = [last if j == _X_NBITS - 1 else sq_ref[pl.ds(j, 1)][0]
            for j in _X_SET_POWS]
    while len(vals) > 1:
        h = len(vals) // 2
        prod = lt.fq12_mul(jnp.stack(vals[:h]), jnp.stack(vals[h:2 * h]))
        vals = [prod[i] for i in range(h)] + vals[2 * h:]
    return vals[0]


# Tape split: rows 0..22 have no post-op (one fori_loop); the 7 tail rows
# keep their conj/frob post-ops compile-time static.
_TAPE_NLOOP = 23


# ------------------------------------------------------------------ kernel

def _fexp_kernel(c_ref, cl_ref, frob_ref, frob17_ref, tape_ref, f_ref,
                 o_ref, regs_ref, sq_ref):
    tape = _tape()
    assert not tape[:_TAPE_NLOOP, 3].any() and tape[_TAPE_NLOOP:, 0].size == 7
    with t.bound_consts(c_ref[:]):
        # easy part in the production L16 ops (one tower inversion)
        frob = frob_ref[:]
        f = f_ref[:]
        # easy part: g = (conj(f) * f^-1)^(p^2) * (conj(f) * f^-1)
        g = fq12_mul(fq12_conj(f), fq12_inv(f))
        g16 = fq12_mul(fq12_frob(g, frob, 2), g)
    # hard part in the L17 lazy-column domain (tmul_lat): ~80% of the
    # serial stages, at roughly half the per-stage latency (flat-expansion
    # ops: one norm + one stacked multiply + one canon each) — measured
    # bit-equal + faster on v5e (scratch/r4_fexp_lat.py, RESULTS.md r4)
    with lt.bound_consts(cl_ref[:]):
        frob17 = frob17_ref[:]
        # 12-slot register file: 0=g, 1=g^x, 2=g^(x^2), 3=g^(x^3), 4..11
        # tape scratch
        regs_ref[pl.ds(0, 1)] = lt.from_l16(g16)[None]

        def chain(k, c):
            regs_ref[pl.ds(k + 1, 1)] = (
                _powx_ref(regs_ref[pl.ds(k, 1)][0], sq_ref)[None])
            return c

        jax.lax.fori_loop(0, 3, chain, 0)

        def tape_step(i, c):
            # tape_ref: flat int32 SMEM (3 words per row: dst, s1, s2)
            v = lt.fq12_mul(regs_ref[pl.ds(tape_ref[3 * i + 1], 1)][0],
                            regs_ref[pl.ds(tape_ref[3 * i + 2], 1)][0])
            regs_ref[pl.ds(tape_ref[3 * i], 1)] = v[None]
            return c

        jax.lax.fori_loop(0, _TAPE_NLOOP, tape_step, 0)

        # static tail (posts are compile-time): registers by name
        def r(i):
            return regs_ref[pl.ds(i, 1)][0]

        for dst, s1, s2, post in tape[_TAPE_NLOOP:].tolist():
            v = lt.fq12_mul(r(s1), r(s2))
            if post == 1:
                v = lt.fq12_conj(v)
            elif post == 2:
                v = lt.fq12_frob(v, frob17, 1)
            elif post == 3:
                v = lt.fq12_frob(v, frob17, 2)
            regs_ref[pl.ds(dst, 1)] = v[None]
        out = lt.fq12_mul(r(5), lt.fq12_frob(r(0), frob17, 3))
        o_ref[:] = lt.to_l16(out)


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
    elt = (B, 2, 3, 2, L, 1)
    elt17 = (B, 2, 3, 2, lt.NL, 1)
    out = pl.pallas_call(
        _fexp_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # tmul consts
            pl.BlockSpec(memory_space=pltpu.VMEM),   # tmul_lat consts
            pl.BlockSpec(memory_space=pltpu.VMEM),   # frobenius table (L16)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # frobenius table (L17)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # lambda tape (flat)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # f
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(elt, jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((12,) + elt17, jnp.uint32),          # register file
            pltpu.VMEM((_X_NBITS - 1,) + elt17, jnp.uint32),  # x-chain pow
        ],
        # the B=1 kernel peaks at ~100.5 MB scoped VMEM (the L17 canon
        # candidate stacks); v5e has 128 MB physical
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=119 * 1024 * 1024),
        interpret=interpret,
    )(
        jnp.asarray(t.CONSTS_NP),
        jnp.asarray(lt.CONSTS_NP),
        jnp.asarray(FROB_NP),
        jnp.asarray(FROB17_NP),
        jnp.asarray(_tape()[:, :3].reshape(-1), jnp.int32),
        ft,
    )
    return out[..., 0]
