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
import os

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

# Miller-loop lane chunk: beyond this the scan state spills VMEM on v5e.
# Injectable (env, or monkeypatch + jax.clear_caches()) so the multi-chunk
# _inner_f path is exercisable at CPU-test scale.
MILLER_CHUNK = int(os.environ.get("SIPP_MILLER_CHUNK_XLA", "1024"))
# Fused-Pallas Miller chunk: the per-step kernel's VMEM working set caps the
# lane count at 128 on v5e (256+ fails Mosaic compile; measured 2.8x faster
# than the XLA scan at 128 lanes).  The WHOLE-LOOP kernel scales further
# (scoped VMEM ~21.4 MB at 128 lanes, limit raised to 100 MB), so the chunk
# is overridable for n >= 256 workloads: SIPP_MILLER_CHUNK=256/512 amortizes
# the per-launch fixed cost over more lanes (NOTES_NEXT.md perf item 1).
MILLER_FUSED_CHUNK = int(os.environ.get("SIPP_MILLER_CHUNK", "128"))
# Wide-chunk auto-pick: MEASURED A LOSS and disabled (round-4 batch s3,
# n=4096 distinct-input steady state: chunk 128 = 163.8 ms vs chunk 256 =
# 174.9 ms, bit-equal outputs) — the per-launch fixed cost inside the
# chunk scan is negligible, and 128 lanes share one compiled kernel with
# the n=128 flagship.  SIPP_MILLER_CHUNK pins the chunk outright;
# SIPP_MILLER_CHUNK_AUTO_N re-enables a 256-lane cutover for experiments.
_CHUNK_AUTO_N = int(os.environ.get("SIPP_MILLER_CHUNK_AUTO_N", str(1 << 62)))


def _fused_chunk(n: int) -> int:
    if "SIPP_MILLER_CHUNK" in os.environ:
        return MILLER_FUSED_CHUNK
    return 256 if n >= _CHUNK_AUTO_N else MILLER_FUSED_CHUNK


def _fused_ok():
    """Use the Mosaic kernels?  Default: on real TPU backends only (the CPU
    interpret path is test-only and slow).  Env override SIPP_FUSED=0/1."""
    env = os.environ.get("SIPP_FUSED")
    if env is not None:
        return env != "0"
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


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
    return t2, (a, b, c)


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
    return t3, (a, b, c)


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
        f = T.fq12_sqr(f)
        t, line = _dbl_step(t, xp, yp)
        f = T.fq12_mul_line(f, *line)

        # The digit is a scalar (shared ate schedule), so lax.cond executes
        # only one branch at runtime: zero digits (~60% of the NAF) skip the
        # whole addition step instead of computing-and-discarding it.
        def do_add(ft):
            f_, t_ = ft
            q_sel = jnp.where(digit == 1, q_aff, q_neg)
            t_add, line_add = _add_step(t_, q_sel, xp, yp)
            return T.fq12_mul_line(f_, *line_add), t_add

        f, t = jax.lax.cond(digit != 0, do_add, lambda ft: ft, (f, t))
        return (f, t), None

    (f, t), _ = jax.lax.scan(body, (f0, t0), digits)
    return _miller_tail(f, t, p_aff, q_aff)


def _miller_tail(f, t, p_aff, q_aff):
    """Frobenius correction lines (+pi(Q), -pi^2(Q)) + infinity masking —
    shared by the XLA and fused-Pallas Miller loops."""
    xp, yp = p_aff[..., 0, :], p_aff[..., 1, :]
    q1 = _twist_frob(q_aff)
    q2 = _twist_frob(q1)
    nq2 = q2.at[..., 1, :, :].set(F.neg(q2[..., 1, :, :]))
    t, line = _add_step(t, q1, xp, yp)
    f = T.fq12_mul_line(f, *line)
    _, line = _add_step(t, nq2, xp, yp)
    f = T.fq12_mul_line(f, *line)

    # infinity handling: e(O, Q) = e(P, O) = 1
    inf_p = jnp.all(p_aff == 0, axis=(-1, -2))
    inf_q = jnp.all(q_aff == 0, axis=(-1, -2, -3))
    inf = jnp.logical_or(inf_p, inf_q)[..., None, None, None, None]
    return jnp.where(inf, T.fq12_ones(p_aff.shape[:-2]), f)


@functools.partial(jax.jit, static_argnums=(2,))
def miller_loop_fused(p_aff, q_aff, interpret: bool = False):
    """Miller loop with the scan body fused into ONE Pallas kernel per step
    (ops/pallas_miller.py) — removes the ~30-XLA-ops-per-step dispatch
    overhead that dominates at small batch.  Bit-identical to miller_loop
    (differentially tested); single leading batch axis only.

    p_aff: (B, 2, L); q_aff: (B, 2, 2, L).
    """
    from ..ops import pallas_miller, tmul

    assert p_aff.ndim == 3 and q_aff.ndim == 4
    B = p_aff.shape[0]
    q_neg = q_aff.at[..., 1, :, :].set(F.neg(q_aff[..., 1, :, :]))
    t0 = jnp.concatenate(
        [q_aff, jnp.broadcast_to(T.fq2_encode((1, 0)), q_aff[..., :1, :, :].shape)],
        axis=-3,
    )
    # standard (B, ...) -> transposed (..., L, B)
    pt = jnp.transpose(p_aff, (1, 2, 0))
    qp = jnp.transpose(q_aff, (1, 2, 3, 0))
    qn = jnp.transpose(q_neg, (1, 2, 3, 0))
    tt0 = jnp.transpose(t0, (1, 2, 3, 0))
    ft0 = jnp.transpose(T.fq12_ones((B,)), (1, 2, 3, 4, 0))
    consts = jnp.asarray(tmul.CONSTS_NP)

    def body(carry, digit):
        return (
            pallas_miller.miller_step(digit, consts, qp, qn, pt, carry,
                                      interpret),
            None,
        )

    (ft, tt), _ = jax.lax.scan(body, (ft0, tt0), jnp.asarray(_DIGITS))
    f = jnp.transpose(ft, (4, 0, 1, 2, 3))
    t = jnp.transpose(tt, (3, 0, 1, 2))
    return _miller_tail(f, t, p_aff, q_aff)


# Hard-part exponent (p^4 - p^2 + 1) / r.
_HARD_EXP = (params.P**4 - params.P**2 + 1) // params.R
# Its exact base-p decomposition for BN curves (verified at import):
#   d = l0 + l1*p + l2*p^2 + p^3
_L0 = 36 * params.X**3 + 30 * params.X**2 + 18 * params.X + 2   # = -l0
_L1 = 36 * params.X**3 + 18 * params.X**2 + 12 * params.X - 1   # = -l1
assert (-_L0) + (-_L1) * params.P + (6 * params.X**2 + 1) * params.P**2 \
    + params.P**3 == _HARD_EXP


def _easy_part(f):
    """f^((p^6-1)(p^2+1)): lands in the cyclotomic subgroup."""
    g = T.fq12_mul(T.fq12_conj(f), T.fq12_inv(f))
    return T.fq12_mul(T.fq12_frob(g, 2), g)


# The lambda addition chain as an instruction tape over a 12-slot Fq12
# register file: each step is R[dst] = post(R[s1] * R[s2]) with post in
# {identity, conj, frob1, frob2}.  Driving it with one lax.scan keeps the
# compiled graph ONE multiply big regardless of chain length (the naively
# unrolled chain was ~30 inlined Fq12 multiplies of HLO and dominated
# compile time).  Registers: 0=f, 1=f^x, 2=f^(x^2), 3=f^(x^3), 4.. scratch.
_POST_NONE, _POST_CONJ, _POST_FROB1, _POST_FROB2 = 0, 1, 2, 3
_TAPE = np.array([
    # c-chain: c36 in r6 (c = r3)
    (4, 3, 3, 0),   # c2
    (5, 4, 4, 0),   # c4
    (6, 5, 5, 0),   # c8
    (6, 6, 6, 0),   # c16
    (6, 6, 6, 0),   # c32
    (6, 6, 5, 0),   # c36 = c32*c4
    # b-chain: b30 in r9, b18 in r8, b6 in r10 (b = r2)
    (4, 2, 2, 0),   # b2
    (5, 4, 4, 0),   # b4
    (7, 5, 5, 0),   # b8
    (8, 7, 7, 0),   # b16
    (9, 8, 7, 0),   # b16*b8
    (10, 5, 4, 0),  # b6 = b4*b2
    (9, 9, 10, 0),  # b30
    (8, 8, 4, 0),   # b18
    # a-chain: a18 in r11, a12 in r7 (a = r1)
    (4, 1, 1, 0),   # a2
    (5, 4, 4, 0),   # a4
    (7, 5, 5, 0),   # a8
    (11, 7, 7, 0),  # a16
    (11, 11, 4, 0), # a18
    (7, 7, 5, 0),   # a12
    (4, 0, 0, 0),   # f2
    # lam0 = conj(c36*b30*a18*f2) -> r5
    (5, 6, 9, 0),
    (5, 5, 11, 0),
    (5, 5, 4, _POST_CONJ),
    # frob1(lam1) = frob1(conj(c36*b18*a12)*f) -> r9
    (9, 6, 8, 0),
    (9, 9, 7, _POST_CONJ),
    (9, 9, 0, _POST_FROB1),
    # frob2(lam2) = frob2(b6*f) -> r10
    (10, 10, 0, _POST_FROB2),
    # combine: r5 = lam0*frob1(lam1)*frob2(lam2)
    (5, 5, 9, 0),
    (5, 5, 10, 0),
], dtype=np.int32)


@jax.jit
def _hard_part(f):
    """f^((p^4-p^2+1)/r) for f in the cyclotomic subgroup, via the exact
    lambda decomposition d = -|l0| - |l1| p + l2 p^2 + p^3 (conj == inverse
    in the cyclotomic subgroup).  Differentially tested vs the naive pow."""
    batch = f.shape[:-4]

    # powx tower a = f^x, b = a^x, c = b^x as one nested scan
    xbits = jnp.asarray(
        np.array([int(v) for v in bin(params.X)[2:]], dtype=np.uint32)
    )

    def outer(v, _):
        def inner(acc, bit):
            acc = T.fq12_cyclo_sqr(acc)
            return jnp.where(bit != 0, T.fq12_mul(acc, v), acc), None

        out, _ = jax.lax.scan(inner, T.fq12_ones(batch), xbits)
        return out, out

    _, abc = jax.lax.scan(outer, f, None, length=3)  # (3, ..., 2,3,2,L)

    regs = jnp.concatenate(
        [f[None], abc, jnp.zeros((8,) + f.shape, jnp.uint32)], axis=0
    )

    def step(regs, inst):
        dst, s1, s2, post = inst[0], inst[1], inst[2], inst[3]
        v = T.fq12_mul(jnp.take(regs, s1, axis=0), jnp.take(regs, s2, axis=0))
        v = jax.lax.switch(
            post,
            [
                lambda x: x,
                T.fq12_conj,
                lambda x: T.fq12_frob(x, 1),
                lambda x: T.fq12_frob(x, 2),
            ],
            v,
        )
        return jax.lax.dynamic_update_index_in_dim(regs, v, dst, 0), None

    regs, _ = jax.lax.scan(step, regs, jnp.asarray(_TAPE))
    return T.fq12_mul(regs[5], T.fq12_frob(f, 3))


@jax.jit
def final_exp(f):
    """f^((p^12-1)/r), batched."""
    return _hard_part(_easy_part(f))


@jax.jit
def final_exp_naive(f):
    """Reference-schedule final exp (naive hard part); oracle for tests."""
    return T.fq12_pow_static(_easy_part(f), _HARD_EXP)


def final_exp_host(f):
    """Final exponentiation of a SINGLE (unbatched) Fq12 element on the host
    C++ kernel (csrc/bn254.cpp).

    Architecture note: after the product tree the FE input has no batch
    axis — ~800 dependent multiplies are pure dispatch latency on the TPU
    (~100 ms) but ~1 ms on the host.  Latency-bound scalar tails run on the
    CPU; throughput-bound batched work runs on the TPU.  Bit-identical to
    final_exp (same chain, same Montgomery radix) and differentially tested.
    Falls back to the device path when the native library is unavailable.
    """
    from .. import native

    if native.get_lib() is None:
        return final_exp(f)
    arr = native.fq12_dev_to_u64(jax.device_get(f))
    if arr.ndim == 3:        # small leading batch: loop the ~1 ms C kernel
        out = np.stack([native.fq12_final_exp(x) for x in arr])
    else:
        out = native.fq12_final_exp(arr)
    return jnp.asarray(native.u64_to_fq12_dev(out))


def final_exp_host_np(f_np):
    """Host-only final exp: (..., 12, 4) uint64 Montgomery in, same format
    out, plus the canonical tower-int decode of each element (for transcript
    appends) — zero device ops.  Requires the native library."""
    from .. import native

    arr = np.asarray(f_np)
    flat = arr.reshape(-1, 12, 4)
    out = np.stack([native.fq12_final_exp(x) for x in flat])
    ints = [native.fq12_u64_to_tower_ints(x) for x in out]
    if arr.ndim == 2:        # unbatched
        return out[0], ints[0]
    return out.reshape(arr.shape), ints


def _cross_f_pair(a_lo, a_hi, b_lo, b_hi):
    """Both pre-FE cross inner products of a fold round from HALF the Miller
    work of two separate calls: (F_L, F_R) = (miller-prod(A_hi, B_lo),
    miller-prod(A_lo, B_hi)).

    The two m-wide (m <= W/2) products ride ONE W-lane whole-loop kernel:
    Z_L's pairs interleaved on even lanes, Z_R's on odd, with the kernel's
    lane-hypercube product stopped at stride 2 (pair=True) so the parity
    classes reduce independently.  Bit-identical to two _inner_f calls:
    dead lanes are points at infinity (f = 1, and the Montgomery product by
    one is exact), and exact-field products are order-independent (canonical
    limb encoding is unique).  Inputs are the full-width _halves outputs
    (live lanes < m <= W/2, so the static [:W/2] slice keeps every live
    lane).  Returns (2, 2, 3, 2, L): [F_L, F_R]."""
    from ..ops import pallas_miller

    W = a_lo.shape[0]
    h = W // 2
    p = jnp.stack([a_hi[:h], a_lo[:h]], axis=1).reshape(W, *a_lo.shape[1:])
    q = jnp.stack([b_lo[:h], b_hi[:h]], axis=1).reshape(W, *b_lo.shape[1:])
    chunk = _fused_chunk(W)
    if W <= chunk:
        return pallas_miller.miller_product_fused(p, q, False, True)
    c = W // chunk
    pr = p.reshape(c, chunk, *p.shape[1:])
    qr = q.reshape(c, chunk, *q.shape[1:])

    def body(_, ab):
        return None, pallas_miller.miller_product_fused(ab[0], ab[1],
                                                        False, True)

    _, parts = jax.lax.scan(body, None, (pr, qr))    # (c, 2, 2, 3, 2, L)
    return _product_tree(parts)


@jax.jit
def _round_zs_fused(a, b, m):
    """One fold round's (Z_L, Z_R) = (e-prod(A_hi, B_lo), e-prod(A_lo, B_hi))
    INCLUDING final exps, one device program: the dynamic-m halving masks,
    ONE pair-product whole-loop Miller kernel (_cross_f_pair), plus the
    final-exp kernel TWICE at B=1 (the L17 hard part's VMEM peak rules out
    the old B=2 stacking; one shared compiled kernel).  m traced: one
    compiled program per width."""
    from ..ops import pallas_fexp
    from ..protocol.prover import _halves

    a_lo, a_hi = _halves(a, m)
    b_lo, b_hi = _halves(b, m)
    fpair = _cross_f_pair(a_lo, a_hi, b_lo, b_hi)
    return jnp.concatenate([pallas_fexp.final_exp_fused(fpair[0][None]),
                            pallas_fexp.final_exp_fused(fpair[1][None])])


@functools.partial(jax.jit, static_argnums=(2,))
def _inner_z_fused(a_g1, b_g2, pad_to):
    """Whole inner product INCLUDING the final exponentiation as one device
    program (fused-Pallas Miller chunks + product tree + the single-kernel
    final exp of ops/pallas_fexp.py).  Zero host traffic: back-to-back calls
    pipeline instead of serializing on a host round trip per aggregation."""
    from ..ops import pallas_fexp

    return pallas_fexp.final_exp_fused(_inner_f(a_g1, b_g2, pad_to)[None])[0]


def pairing(p_aff, q_aff):
    """Batched optimal ate pairing e(P, Q); matches hostref.pairing bit-exactly."""
    return final_exp(miller_loop(p_aff, q_aff))


@jax.jit
def _miller_product(a_g1, b_g2):
    """Fused batched Miller loop + Fq12 product tree (single device program)."""
    return _product_tree(miller_loop(a_g1, b_g2))


@functools.partial(jax.jit, static_argnums=(2,))
def _inner_f(a_g1, b_g2, pad_to):
    """Whole pre-final-exp inner product as ONE device program: padding,
    chunking, Miller loops (fused-Pallas on TPU, XLA scan elsewhere), and the
    Fq12 product tree.  Keeping every glue op inside the jit matters: each
    eager device op is a dispatch round trip (~13 ms through the axon
    tunnel; the n=128 aggregation dropped 46 ms -> ~20 ms when the two chunk
    slices moved in here)."""
    n = a_g1.shape[0]
    if pad_to is not None and n < pad_to:
        a_g1 = jnp.concatenate(
            [a_g1, jnp.zeros((pad_to - n,) + a_g1.shape[1:], jnp.uint32)], 0)
        b_g2 = jnp.concatenate(
            [b_g2, jnp.zeros((pad_to - n,) + b_g2.shape[1:], jnp.uint32)], 0)
        n = pad_to
    fused = _fused_ok()
    chunk = _fused_chunk(n) if fused else MILLER_CHUNK
    if fused:
        from ..ops import pallas_miller

        if os.environ.get("SIPP_WHOLE_LOOP") == "0":
            # fallback: per-step fused kernel under a lax.scan + XLA tree
            def prod(x, y):
                return _product_tree(miller_loop_fused(x, y))
        else:
            # whole loop + Frobenius tail + lane product tree in ONE kernel
            # (validated bit-exact on v5e; 9.87 ms vs 11.53 ms per 128-lane
            # chunk for the per-step variant)
            def prod(x, y):
                return pallas_miller.miller_product_fused(x, y)

        # pad to a chunk multiple with infinity lanes (f = 1) so every chunk
        # hits the same compiled 128-lane kernel
        pad = -n % chunk
        if pad:
            a_g1 = jnp.concatenate(
                [a_g1, jnp.zeros((pad,) + a_g1.shape[1:], jnp.uint32)], 0)
            b_g2 = jnp.concatenate(
                [b_g2, jnp.zeros((pad,) + b_g2.shape[1:], jnp.uint32)], 0)
            n += pad
    else:
        def prod(x, y):
            return _product_tree(miller_loop(x, y))

    if n <= chunk:
        return prod(a_g1, b_g2)
    c = n // chunk
    rem = n - c * chunk
    ar = a_g1[: c * chunk].reshape(c, chunk, *a_g1.shape[1:])
    br = b_g2[: c * chunk].reshape(c, chunk, *b_g2.shape[1:])

    def body(_, ab):
        return None, prod(ab[0], ab[1])

    _, parts = jax.lax.scan(body, None, (ar, br))
    if rem:
        parts = jnp.concatenate([parts, prod(a_g1[c * chunk:], b_g2[c * chunk:])[None]])
    return _product_tree(parts)


@jax.jit
def _product_tree(f):
    """prod over the leading axis of a (n, ...) Fq12 batch, log2(n) rounds."""
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
    return f[0]


def inner_product(a_g1, b_g2, pad_to: int = None):
    """Z = prod_i e(A_i, B_i) over the leading batch axis.

    Semantics of reference prover_native.rs:15-23; computed as one batched
    Miller loop, a product tree over lanes, and a single final exponentiation.
    Deliberately NOT one fused jit: miller/product/final-exp compile as three
    reusable kernels (the fused graph exhausts compile memory and recompiles
    per batch size; the pieces are shared across fold rounds and batch sizes).

    pad_to: pad the lane count with points at infinity (which contribute
    f = 1) so different fold rounds reuse one compiled kernel — exact, since
    the infinity lanes multiply 1 into the product tree.
    """
    # Miller + padding + chunking + product tree + final exp in ONE device
    # program on TPU (zero host traffic; calls pipeline); on other backends
    # the final exp runs on the host C++ kernel (latency-bound tail).
    # Chunking: fused-Pallas kernels cap at 128 lanes (VMEM); the XLA scan
    # spills VMEM beyond ~1k lanes (measured 4024 pair/s at n=1024 vs 2360
    # at n=4096 unchunked).
    if _fused_ok():
        return _inner_z_fused(a_g1, b_g2, pad_to)
    return final_exp_host(_inner_f(a_g1, b_g2, pad_to))
