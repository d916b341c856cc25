"""Pallas Fq multiply kernel: interpret-mode correctness vs the XLA path."""

import numpy as np

from sipp_tpu.fields import FQ
from sipp_tpu.ops.pallas_fq import fq_mul_pallas


def test_fq_mul_pallas_interpret(rng):
    xs = [int.from_bytes(rng.bytes(40), "little") % FQ.p for _ in range(64)]
    ys = [int.from_bytes(rng.bytes(40), "little") % FQ.p for _ in range(64)]
    a, b = FQ.encode(xs), FQ.encode(ys)
    got = fq_mul_pallas(a, b, interpret=True)
    want = FQ.mul(a, b)
    assert (np.asarray(got) == np.asarray(want)).all()


# ---------------------------------------------------------------- tmul layer

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from sipp_tpu.fields import tower as T
from sipp_tpu.ops import tmul


def _run_t(fn, out_shape, *args):
    """Run a tmul op inside an interpret-mode pallas_call (the constants are
    kernel inputs, as on the production Mosaic path)."""

    def kernel(c_ref, *refs):
        o_ref = refs[-1]
        with tmul.bound_consts(c_ref[:]):
            o_ref[:] = fn(*(r[:] for r in refs[:-1]))

    return pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct(out_shape, jnp.uint32),
        interpret=True,
    )(jnp.asarray(tmul.CONSTS_NP), *args)


def test_tmul_field_ops_vs_xla(rng):
    B = 16
    xs = [int.from_bytes(rng.bytes(40), "little") % FQ.p for _ in range(B)]
    ys = [int.from_bytes(rng.bytes(40), "little") % FQ.p for _ in range(B)]
    xs[0], ys[0] = 0, 0          # edge lanes
    xs[1], ys[1] = FQ.p - 1, FQ.p - 1
    a, b = FQ.encode(xs), FQ.encode(ys)
    at, bt = tmul.to_t(a), tmul.to_t(b)
    for tfn, xfn in [(tmul.mul, FQ.mul), (tmul.add, FQ.add),
                     (tmul.sub, FQ.sub), (tmul.mul9, None)]:
        if tfn is tmul.mul9:
            got = tmul.from_t(_run_t(tfn, (FQ.L, B), at), (B,))
            want = FQ.mul(a, FQ.encode([9] * B))
        else:
            got = tmul.from_t(_run_t(tfn, (FQ.L, B), at, bt), (B,))
            want = xfn(a, b)
        assert (np.asarray(got) == np.asarray(want)).all()


def test_tmul_fq2_ops_vs_tower(rng):
    B = 8
    xs = [int.from_bytes(rng.bytes(40), "little") % FQ.p for _ in range(4 * B)]
    a2 = jnp.stack([FQ.encode(xs[:B]), FQ.encode(xs[B:2*B])], axis=1)
    b2 = jnp.stack([FQ.encode(xs[2*B:3*B]), FQ.encode(xs[3*B:])], axis=1)
    a2t, b2t = jnp.transpose(a2, (1, 2, 0)), jnp.transpose(b2, (1, 2, 0))
    cases = [
        (tmul.fq2_mul, T.fq2_mul, 2),
        (tmul.fq2_mul_xi, T.fq2_mul_xi, 1),
    ]
    for tfn, xfn, nargs in cases:
        args = (a2t, b2t)[:nargs]
        got = _run_t(tfn, (2, FQ.L, B), *args)
        want = xfn(*((a2, b2)[:nargs]))
        assert (np.asarray(jnp.transpose(got, (2, 0, 1)))
                == np.asarray(want)).all()


def test_fexp_tower_ops_vs_tower(rng):
    """Final-exp kernel building blocks (ops/pallas_fexp.py) vs the XLA
    tower, bit-exact in interpret mode.  The FULL fused final-exp kernel is
    covered by the same differential on real TPU (scratch/tpu_fexp_bench.py:
    bit-exact vs final_exp); whole-kernel interpret execution of its ~18k
    sequential Fq muls is too slow for the suite."""
    from sipp_tpu.ops import pallas_fexp as PF
    from sipp_tpu.pairing.ate import _easy_part

    B = 4
    xs = [int.from_bytes(rng.bytes(40), "little") % FQ.p
          for _ in range(24 * B)]
    a = FQ.encode(xs[: 12 * B]).reshape(B, 2, 3, 2, FQ.L)
    b = FQ.encode(xs[12 * B:]).reshape(B, 2, 3, 2, FQ.L)
    at = jnp.transpose(a, (1, 2, 3, 4, 0))
    bt = jnp.transpose(b, (1, 2, 3, 4, 0))
    consts = jnp.asarray(tmul.CONSTS_NP)
    frob = jnp.asarray(PF.FROB_NP)
    S = (2, 3, 2, FQ.L, B)

    def run(kfn, *args):
        return pl.pallas_call(
            kfn, out_shape=jax.ShapeDtypeStruct(S, jnp.uint32),
            interpret=True,
        )(*args)

    def back(x):
        return jnp.transpose(x, (4, 0, 1, 2, 3))

    def k_mul(c, f, g, o):
        with tmul.bound_consts(c[:]):
            o[:] = PF.fq12_mul(f[:], g[:])

    def k_inv(c, f, o):
        with tmul.bound_consts(c[:]):
            o[:] = PF.fq12_inv(f[:])

    def k_cyclo(c, f, o):
        with tmul.bound_consts(c[:]):
            o[:] = PF.fq12_cyclo_sqr(f[:])

    got = back(run(k_mul, consts, at, bt))
    assert (np.asarray(got) == np.asarray(T.fq12_mul(a, b))).all()

    got = back(run(k_inv, consts, at))
    assert (np.asarray(got) == np.asarray(T.fq12_inv(a))).all()

    for k in (1, 2, 3):
        def k_frob(c, fr, f, o, k=k):
            with tmul.bound_consts(c[:]):
                o[:] = PF.fq12_frob(f[:], fr[:], k)
        got = back(run(k_frob, consts, frob, at))
        assert (np.asarray(got) == np.asarray(T.fq12_frob(a, k))).all()

    g = _easy_part(a)   # cyclotomic-subgroup input for the GS squaring
    gt = jnp.transpose(g, (1, 2, 3, 4, 0))
    got = back(run(k_cyclo, consts, gt))
    assert (np.asarray(got) == np.asarray(T.fq12_cyclo_sqr(g))).all()


import os

import pytest

# Whole-kernel interpret runs compile for tens of minutes on XLA:CPU (the
# default suite must stay CI-fast); the pieces above cover the arithmetic.
# The full kernels are validated bit-exact on real TPU (scratch/ bench
# scripts + the driver bench) and here under SIPP_SLOW_TESTS=1.
slow = pytest.mark.skipif(
    os.environ.get("SIPP_SLOW_TESTS") != "1",
    reason="whole-kernel interpret compile is tens of minutes; SIPP_SLOW_TESTS=1",
)


@slow
def test_miller_loop_fused_interpret():
    """Whole fused-Pallas Miller loop == XLA Miller loop, bit-exact (covers
    fq12 sqr/mul_line, dbl/add steps, and the digit conditional)."""
    from sipp_tpu.pairing.ate import miller_loop, miller_loop_fused
    from sipp_tpu.utils.testing import random_instance

    A, B = random_instance(2, seed=3)
    ref = miller_loop(A, B)
    out = miller_loop_fused(A, B, True)
    assert (np.asarray(out) == np.asarray(ref)).all()


@slow
def test_fold_kernels_interpret():
    """Whole-ladder fold kernels == XLA fold path: live lanes bit-exact,
    infinity lanes semantically correct (a1 + x*O = a1; O + x*a2 = [x]a2 —
    cases the XLA scan path does not define)."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from sipp_tpu import params
    from sipp_tpu.curves import G1, G2, scalar_to_bits
    from sipp_tpu.ops import pallas_fold as pf
    from sipp_tpu.utils.testing import random_instance

    A, B = random_instance(8, seed=21)
    A2, B2 = random_instance(8, seed=22)
    A = A.at[5].set(0).at[7].set(0)      # 5: dead lane, 7: offset at inf
    A2 = A2.at[5].set(0).at[6].set(0)    # 6: base at inf
    B = B.at[5].set(0).at[7].set(0)
    B2 = B2.at[5].set(0).at[6].set(0)
    x = 1234567890123456789012345678901234567890123456789 % params.R
    xb = scalar_to_bits(x)

    def run(kernel, coeff_shape, a1, a2, tdims):
        off = jnp.transpose(a1, tdims)
        base = jnp.transpose(a2, tdims)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (2,) + coeff_shape + (pf.L, 8), jnp.uint32),
            scratch_shapes=[pltpu.VMEM(
                (3,) + coeff_shape + (pf.L, 8), jnp.uint32)],
            interpret=True,
        )(jnp.asarray(pf.t.CONSTS_NP), jnp.asarray(xb), off, base)

    for grp, a1, a2, kern, cs, td, ti in (
        (G1, A, A2, pf._K_G1, (), (1, 2, 0), (2, 0, 1)),
        (G2, B, B2, pf._K_G2, (2,), (1, 2, 3, 0), (3, 0, 1, 2)),
    ):
        got = jnp.transpose(run(kern, cs, a1, a2, td), ti)
        ref = grp.to_affine(grp.fold(a1, a2, jnp.asarray(xb)))
        exp = grp.to_affine(grp.scalar_mul(a2, jnp.asarray(xb)))
        assert (np.asarray(got[:5]) == np.asarray(ref[:5])).all()
        assert (np.asarray(got[5]) == 0).all()
        assert (np.asarray(got[6]) == np.asarray(a1[6])).all()
        assert (np.asarray(got[7]) == np.asarray(exp[7])).all()


@slow
def test_miller_product_fused_interpret():
    """Whole-loop+product-tree kernel == _product_tree(miller_loop), incl.
    infinity-lane masking and the Frobenius tail, bit-exact."""
    from sipp_tpu.ops.pallas_miller import miller_product_fused
    from sipp_tpu.pairing.ate import _product_tree, miller_loop
    from sipp_tpu.utils.testing import random_instance

    A, B = random_instance(8, seed=11)
    A = A.at[3].set(0)
    B = B.at[3].set(0)
    ref = _product_tree(miller_loop(A, B))
    out = miller_product_fused(A, B, True)
    assert (np.asarray(out) == np.asarray(ref)).all()


@slow
def test_miller_product_pair_interpret():
    """pair=True kernel: even/odd lanes reduce to two independent pairing
    products (a fold round's Z_L/Z_R from ONE launch) — bit-exact vs the
    separate product-tree reductions, incl. infinity lanes."""
    from sipp_tpu.ops.pallas_miller import miller_product_fused
    from sipp_tpu.pairing.ate import _product_tree, miller_loop
    from sipp_tpu.utils.testing import random_instance

    A, B = random_instance(8, seed=12)
    A = A.at[5].set(0)   # an infinity lane in the odd class
    B = B.at[5].set(0)
    out = miller_product_fused(A, B, True, True)
    ref_even = _product_tree(miller_loop(A[0::2], B[0::2]))
    ref_odd = _product_tree(miller_loop(A[1::2], B[1::2]))
    assert (np.asarray(out[0]) == np.asarray(ref_even)).all()
    assert (np.asarray(out[1]) == np.asarray(ref_odd)).all()


@slow
def test_cross_f_pair_interpret(monkeypatch):
    """_cross_f_pair (interleave + pair kernel [+ chunked scan]) == the two
    separate _inner_f cross products, bit-exact — unchunked (W=8) and
    chunked (W=8, chunk=4), incl. masked (infinity) lanes at m < W/2."""
    import jax

    from sipp_tpu.ops import pallas_miller as pm
    from sipp_tpu.pairing import ate
    from sipp_tpu.protocol.prover import _halves
    from sipp_tpu.utils.testing import random_instance

    a, b = random_instance(8, seed=13)
    orig = pm.miller_product_fused

    def interp(p, q, i=False, pair=False):
        return orig(p, q, True, pair)

    monkeypatch.setattr(pm, "miller_product_fused", interp)
    for chunk, m in ((128, 4), (128, 2), (4, 4)):
        monkeypatch.setenv("SIPP_MILLER_CHUNK", str(chunk))
        monkeypatch.setattr(ate, "MILLER_FUSED_CHUNK", chunk)
        jax.clear_caches()
        a_lo, a_hi = _halves(a, m)
        b_lo, b_hi = _halves(b, m)
        got = ate._cross_f_pair(a_lo, a_hi, b_lo, b_hi)
        ref_l = ate._inner_f(a_hi, b_lo, None)
        ref_r = ate._inner_f(a_lo, b_hi, None)
        assert (np.asarray(got[0]) == np.asarray(ref_l)).all()
        assert (np.asarray(got[1]) == np.asarray(ref_r)).all()
    jax.clear_caches()


# ------------------------------------------------- per-lane exp kernels (D7/D8)

def test_exp_add_mixed_complete_interpret():
    """pallas_exp._add_mixed_complete vs weierstrass.add_mixed(handle_double):
    generic, P == Q, P == inf lanes bit-exact; q == inf (kernel-only
    completeness: result == p) asserted semantically."""
    from sipp_tpu.curves import G1
    from sipp_tpu.ops import pallas_exp as pe
    from sipp_tpu.ops import pallas_fold as pf
    from sipp_tpu.utils.testing import random_instance

    A, _ = random_instance(8, seed=31)
    Q, _ = random_instance(8, seed=32)
    p = G1.dbl(G1.jac_from_affine(A))            # nontrivial Z
    p = p.at[3].set(G1.jac_from_affine(Q)[3])    # lane 3: P == Q (double)
    p = p.at[4].set(0)                           # lane 4: P == inf -> q
    Q = Q.at[5].set(0)                           # lane 5: q == inf -> p

    def kernel(c_ref, p_ref, q_ref, o_ref):
        with tmul.bound_consts(c_ref[:]):
            o_ref[:] = pe._add_mixed_complete(p_ref[:], q_ref[:], pf._FqAd)

    got = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((3, FQ.L, 8), jnp.uint32),
        interpret=True,
    )(jnp.asarray(tmul.CONSTS_NP), jnp.transpose(p, (1, 2, 0)),
      jnp.transpose(Q, (1, 2, 0)))
    got = jnp.transpose(got, (2, 0, 1))
    ref = G1.add_mixed(p, Q, handle_double=True)
    ga, ra = np.asarray(G1.to_affine(got)), np.asarray(G1.to_affine(ref))
    assert (ga[:5] == ra[:5]).all()
    assert (ga[6:] == ra[6:]).all()
    assert (ga[5] == np.asarray(G1.to_affine(p))[5]).all()


def test_exp_one_like_fq12_interpret():
    """pallas_exp._one_like_fq12 == tower one (Montgomery), transposed."""
    from sipp_tpu.fields import tower as T
    from sipp_tpu.ops import pallas_exp as pe

    B = 4
    want = jnp.transpose(T.fq12_ones((B,)), (1, 2, 3, 4, 0))

    def kernel(c_ref, x_ref, o_ref):
        with tmul.bound_consts(c_ref[:]):
            o_ref[:] = pe._one_like_fq12(x_ref[:])

    got = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((2, 3, 2, FQ.L, B), jnp.uint32),
        interpret=True,
    )(jnp.asarray(tmul.CONSTS_NP), jnp.zeros((2, 3, 2, FQ.L, B), jnp.uint32))
    assert (np.asarray(got) == np.asarray(want)).all()


@slow
def test_exp_kernels_interpret():
    """Whole per-lane exp ladders == the XLA exp_with_offset path, bit-exact
    (fq12_exp_fused's pieces are covered by test_fexp_tower_ops_vs_tower +
    test_exp_one_like_fq12_interpret; all three kernels are differentially
    verified vs XLA on real TPU — scratch/exp_probe.log)."""
    import numpy as _np

    from sipp_tpu.curves import G1, G2
    from sipp_tpu.ops import pallas_exp as pe
    from sipp_tpu.utils.testing import random_instance

    B = 4
    rng = _np.random.default_rng(5)
    bits = jnp.asarray(rng.integers(0, 2, size=(254, B)), jnp.uint32)
    x1, o1 = random_instance(B, seed=41)[0], random_instance(B, seed=42)[0]
    got = pe.exp_g1_fused(x1, o1, bits, True)
    want = G1.to_affine(G1.exp_with_offset(x1, o1, bits))
    assert (np.asarray(got) == np.asarray(want)).all()

    x2, o2 = random_instance(B, seed=43)[1], random_instance(B, seed=44)[1]
    got = pe.exp_g2_fused(x2, o2, bits, True)
    want = G2.to_affine(G2.exp_with_offset(x2, o2, bits))
    assert (np.asarray(got) == np.asarray(want)).all()
