"""Fused Pallas kernels for the on-chip Fiat-Shamir transcript tail.

Round-5 measurement (RESULTS.md): the on-chip prover's rounds cost ~52 ms
each on a v5e, of which ~40 ms is the SERIAL transcript tail executed as
raw XLA ops — 27 Poseidon-Goldilocks permutations (two Fq12 appends + the
challenge) and a 253-step Fr Fermat inversion, all on tiny tensors where
per-op overhead dwarfs compute.  This module fuses that tail into ONE
Pallas kernel per use site:

  * `transcript_append_fq12(state, f)` — one hash-chain append
    (state' = Poseidon_no_pad(state[4] || MyFq12-direct(f) as 96 elems)),
  * `transcript_round_tail(state, zl, zr)` — both appends of a fold round,
    the challenge derivation (digest -> to_u32_digits quirk -> reduce mod
    r), and the Fr Fermat inversion; returns (state', x_limbs, xinv_limbs).

Bit-exactness: the kernels run the SAME algorithms as the XLA twins
(fields/poseidon.py permute_device, protocol/transcript_device.py) over the
same Montgomery limb encodings — Goldilocks as 5x16-bit limbs (R = 2^80),
Fr as 16x16-bit limbs (R = 2^256) — and every op canonicalizes, so outputs
are bit-identical (differentially tested in interpret mode,
tests/test_pallas_transcript.py).  Reference semantics: hash chain +
challenge of /root/reference/src/transcript_native.rs:25-65 (SURVEY §2.4).

The Fq12 -> 96-element message encode (direct-basis conversion, from_mont,
u32 digits, Goldilocks embed) stays in XLA: it is ONE vectorized op bundle,
not a serial chain; only the chain itself needs fusing.

Layouts: Goldilocks element (..., 5, B); Poseidon state (12, 5, B); Fr
element (16, B); B == 1 (the transcript is a single serial object).
Stacked leading axes are lane-merged around multiplies (tmul.mul pattern)
so e.g. the 144 MDS products run at 144-lane utilization.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import params
from ..fields import FGL, FR, poseidon
from . import tmul as t

GL = FGL.L            # 5 limbs (R = 2^80)
LF = FR.L             # 16 limbs (R = 2^256)
U32 = jnp.uint32

# ------------------------------------------------------- constant tables

_P_GL = params.GOLDILOCKS_P


def _limbs(v, n):
    return np.array([(v >> (16 * i)) & 0xFFFF for i in range(n)], np.uint32)


# Goldilocks (L=5) table rows: 0: p | 1: R-p | 2: raw one | 3: N' (row 0
# col 0 only used)      (each row width GL)
_GL_NP0 = int((-pow(_P_GL, -1, 1 << 80)) % (1 << 80)) & 0xFFFF
GL_CONSTS_NP = np.stack([
    _limbs(_P_GL, GL),
    _limbs((1 << 80) - _P_GL, GL),
    _limbs(1, GL),
    _limbs(_GL_NP0, GL),
])

# Fr (L=16) table in tmul's own row layout (bound_consts-compatible), plus
# two extra rows used by this module: 5: R^2 mod r (to_mont), 6: raw one.
_R = params.R
FR_CONSTS_NP = np.stack([
    np.concatenate([_limbs(_R, LF), np.zeros(LF, np.uint32)]),
    np.concatenate([FR.np_arr_np.astype(np.uint32), np.zeros(LF, np.uint32)]),
    np.concatenate([np.asarray(jax.device_get(FR.rp_arr), np.uint32),
                    np.zeros(LF, np.uint32)]),
    np.concatenate([np.zeros(LF, np.uint32),
                    np.asarray(jax.device_get(FR.rp_arr), np.uint32)]),
    np.concatenate([np.asarray(jax.device_get(FR.one_mont), np.uint32),
                    np.zeros(LF, np.uint32)]),
    np.concatenate([_limbs(pow(1 << 256, 2, _R), LF), np.zeros(LF, np.uint32)]),
    np.concatenate([_limbs(1, LF), np.zeros(LF, np.uint32)]),
])

_RM2_BITS_NP = np.array([int(b) for b in bin(_R - 2)[2:]], dtype=np.uint32)

# Poseidon tables (Montgomery 5-limb), built from the SAME module state as
# the XLA twin (fields/poseidon.py — including any SIPP_POSEIDON_RC_FILE
# override, read at import like _RC_MONT)
RC_MONT_NP = np.asarray(jax.device_get(poseidon._RC_MONT))      # (30, 12, 5)
MDS_MONT_NP = np.asarray(jax.device_get(poseidon._MDS_MONT))    # (12, 12, 5)
ISFULL_NP = np.array(
    [1 if (r < poseidon.N_FULL
           or r >= poseidon.N_FULL + poseidon.N_PARTIAL) else 0
     for r in range(poseidon.N_ROUNDS)], np.uint32)

_WIDTH = poseidon.WIDTH
_RATE = poseidon.RATE
_NROUNDS = poseidon.N_ROUNDS


# ------------------------------------- Goldilocks 5-limb field primitives
# (tmul's algorithms with L=5 and explicit constants; tmul.norm/_shift_up
# are limb-count generic and reused as-is)

def _g_mul_impl(a, b, gc):
    """CIOS Montgomery product over 5x16-bit limbs (tmul._mul_impl with
    L=5): canonical (< p) output for inputs < 2p."""
    p_col = gc[0][..., None]
    np0 = gc[3, 0:1][..., None]
    acc = jnp.zeros(jnp.broadcast_shapes(a.shape, b.shape), U32)
    zrow = jnp.zeros(acc.shape[:-2] + (1,) + acc.shape[-1:], U32)
    for i in range(GL):
        ti = a[..., i : i + 1, :] * b
        acc = acc + (ti & 0xFFFF)
        m = (acc[..., 0:1, :] * np0) & 0xFFFF
        u = m * p_col
        acc = acc + (u & 0xFFFF)
        carry0 = acc[..., 0:1, :] >> 16
        acc = jnp.concatenate(
            [acc[..., 1:2, :] + carry0, acc[..., 2:, :], zrow], axis=-2)
        acc = acc + (ti >> 16) + (u >> 16)
    cols = jnp.stack([acc, acc + gc[1][..., None]])
    limbs, carry = t.norm(cols, GL)
    return jnp.where((carry[1] != 0)[..., None, :], limbs[1], limbs[0])


def g_mul(a, b, gc):
    """Montgomery mul with the stacked-lead lane merge (tmul.mul pattern:
    a (S, ..., 5, 1) stack runs at S-lane utilization)."""
    if a.shape != b.shape:
        a, b = jnp.broadcast_arrays(a, b)
    lead = a.shape[:-2]
    B = a.shape[-1]
    S = int(np.prod(lead)) if lead else 1
    if S > 1 and B == 1:
        ar = jnp.transpose(a.reshape(S, GL), (1, 0))
        br = jnp.transpose(b.reshape(S, GL), (1, 0))
        r = _g_mul_impl(ar, br, gc)
        return jnp.transpose(r, (1, 0)).reshape(a.shape)
    return _g_mul_impl(a, b, gc)


def g_add(a, b, gc):
    s = a + b
    cols = jnp.stack([s, s + gc[1][..., None]])
    limbs, carry = t.norm(cols, GL)
    return jnp.where((carry[1] != 0)[..., None, :], limbs[1], limbs[0])


# --------------------------------------------------- Poseidon permutation

def _sbox(x, gc):
    """x^7 (three Montgomery muls; canonical at every step, so the result
    is bit-identical to poseidon._sbox_dev regardless of grouping)."""
    x2 = g_mul(x, x, gc)
    x4 = g_mul(x2, x2, gc)
    return g_mul(g_mul(x4, x2, gc), x, gc)


def _permute(state, rc_ref, isfull_ref, mds, gc):
    """One Poseidon permutation; state (12, 5, 1) Montgomery limbs.
    Mirrors poseidon.permute_device: rc add, full/partial sbox select, MDS
    row products + add tree — every op canonicalizes, so any association
    order yields the same canonical limbs."""

    def round_fn(r, s):
        rc = rc_ref[pl.ds(r, 1)][0]                 # (12, 5, 1)... see call
        s = g_add(s, rc, gc)
        all_sb = _sbox(s, gc)
        lane0 = jnp.concatenate([all_sb[:1], s[1:]], axis=0)
        s = jnp.where(isfull_ref[r] != 0, all_sb, lane0)
        prod = g_mul(mds, s[None], gc)              # (12, 12, 5, 1)
        k = _WIDTH
        tt = prod
        while k > 1:
            half = k // 2
            head = g_add(tt[:, :half], tt[:, half : 2 * half], gc)
            if k % 2:
                head = jnp.concatenate([head, tt[:, 2 * half :]], axis=1)
            tt = head
            k = half + (k % 2)
        return tt[:, 0]

    return jax.lax.fori_loop(0, _NROUNDS, round_fn, state)


def _absorb(state, msg, rc_ref, isfull_ref, mds, gc):
    """hash_no_pad chain segment: overwrite-absorb msg (K, 5, 1) in rate-8
    chunks into state (12, 5, 1), permuting after each chunk."""
    K = msg.shape[0]
    for i in range(0, K, _RATE):
        w = min(_RATE, K - i)
        state = jnp.concatenate([msg[i : i + w], state[w:]], axis=0)
        state = _permute(state, rc_ref, isfull_ref, mds, gc)
    return state


def _append(state4, msg, rc_ref, isfull_ref, mds, gc):
    """state' = hash_no_pad(state4 (4,5,1) || msg (96,5,1)) -> (4,5,1)."""
    zero = jnp.zeros((_WIDTH, GL, 1), U32)
    full = _absorb(zero, jnp.concatenate([state4, msg], axis=0),
                   rc_ref, isfull_ref, mds, gc)
    return full[:4]


# ------------------------------------------------------- challenge logic

def _from_mont_gl(x, gc):
    """Montgomery -> canonical (mont mul by raw 1)."""
    one = jnp.broadcast_to(gc[2][..., None], x.shape)
    return g_mul(x, one, gc)


def _digest_to_fr_limbs(canon):
    """(4, 5, 1) canonical Goldilocks digest -> (16, 1) 16-bit limbs of the
    quirk-exact concatenated integer (mirror of transcript_device.
    _digest_to_challenge_limbs; canonical values < 2^64 live in limbs 0-3)."""
    l = canon[:, :4, :]                               # (4, 4, 1)
    lo_zero = (l[:, 0] | l[:, 1]) == 0                # (4, 1)
    hi_zero = (l[:, 2] | l[:, 3]) == 0
    lens = (2 - hi_zero.astype(jnp.int32)
            - (hi_zero & lo_zero).astype(jnp.int32))  # (4, 1)
    i = jax.lax.broadcasted_iota(jnp.int32, (LF, 1), 0)
    out = jnp.zeros((LF, 1), U32)
    off = jnp.zeros_like(lens[0])                     # running u32 offset
    for k in range(4):
        base = 2 * off                                # (1,)
        for t_ in range(4):
            present = (lens[k] >= 1) if t_ < 2 else (lens[k] == 2)
            out = out + jnp.where((i == base + t_) & present, l[k, t_], 0)
        off = off + lens[k]
    return out


# ------------------------------------------------------------- kernels

def _k_append(glc_ref, rc_ref, isfull_ref, mds_ref, st_ref, msg_ref, o_ref):
    gc = glc_ref[:]
    o_ref[:] = _append(st_ref[:], msg_ref[:], rc_ref, isfull_ref,
                       mds_ref[:], gc)[..., 0]


def _k_round_tail(glc_ref, frc_ref, rc_ref, isfull_ref, mds_ref,
                  st_ref, ml_ref, mr_ref, so_ref, x_ref, xi_ref):
    gc = glc_ref[:]
    mds = mds_ref[:]
    state = _append(st_ref[:], ml_ref[:], rc_ref, isfull_ref, mds, gc)
    state = _append(state, mr_ref[:], rc_ref, isfull_ref, mds, gc)
    so_ref[:] = state[..., 0]
    # challenge: digest = Poseidon(state4) (no absorb of extra input:
    # hash_no_pad of exactly the 4 state elements = one chunk of width 4)
    digest = _absorb(jnp.zeros((_WIDTH, GL, 1), U32), state,
                     rc_ref, isfull_ref, mds, gc)[:4]
    canon = _from_mont_gl(digest, gc)
    limbs = _digest_to_fr_limbs(canon)                # (16, 1)
    with t.bound_consts(frc_ref[:]):
        r2 = frc_ref[5, :LF][..., None]
        raw1 = frc_ref[6, :LF][..., None]
        xm = t.mul(limbs, r2)                         # to_mont (reduces mod r)
        x = t.mul(xm, raw1)                           # canonical x
        invm = t.pow_tree(xm, _RM2_BITS_NP)           # Fermat x^(r-2), Mont
        xinv = t.mul(invm, raw1)                      # canonical x^-1
    x_ref[:] = x
    xi_ref[:] = xinv


@functools.partial(jax.jit, static_argnums=(2,))
def transcript_append_fq12(state, f, interpret: bool = False):
    """state (4, 5) Montgomery Goldilocks + f (2,3,2,16) Montgomery Fq12 ->
    new state (4, 5).  Bit-identical to transcript_device.append_fq12."""
    from ..protocol import transcript_device as td
    from ..fields import tower

    direct = tower.fq12_to_direct(f)
    u32s = td._fq_limbs_to_u32(direct)
    msg = td._u32s_to_goldilocks(u32s.reshape(96))    # (96, 5)
    return pl.pallas_call(
        _k_append,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # GL consts
            pl.BlockSpec(memory_space=pltpu.VMEM),   # RC table
            pl.BlockSpec(memory_space=pltpu.SMEM),   # full/partial flags
            pl.BlockSpec(memory_space=pltpu.VMEM),   # MDS
            pl.BlockSpec(memory_space=pltpu.VMEM),   # state
            pl.BlockSpec(memory_space=pltpu.VMEM),   # msg
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, GL), U32),
        interpret=interpret,
    )(
        jnp.asarray(GL_CONSTS_NP),
        jnp.asarray(RC_MONT_NP)[..., None],
        jnp.asarray(ISFULL_NP),
        jnp.asarray(MDS_MONT_NP)[..., None],
        state[..., None],
        msg[..., None],
    )


@functools.partial(jax.jit, static_argnums=(3,))
def transcript_round_tail(state, zl, zr, interpret: bool = False):
    """Both fold-round appends + challenge + Fr inversion as ONE kernel.

    state (4, 5) Montgomery; zl, zr (2,3,2,16) Montgomery Fq12.
    Returns (state' (4,5), x (16,), xinv (16,)) — x/xinv CANONICAL Fr
    limbs, bit-identical to the transcript_device.get_challenge + FR
    Fermat-inversion pair the XLA on-chip round uses."""
    from ..protocol import transcript_device as td
    from ..fields import tower

    zs = jnp.stack([zl, zr])
    direct = tower.fq12_to_direct(zs)
    u32s = td._fq_limbs_to_u32(direct)
    msg = td._u32s_to_goldilocks(u32s.reshape(2, 96))  # (2, 96, 5)
    state2, x, xinv = pl.pallas_call(
        _k_round_tail,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # GL consts
            pl.BlockSpec(memory_space=pltpu.VMEM),   # FR consts
            pl.BlockSpec(memory_space=pltpu.VMEM),   # RC table
            pl.BlockSpec(memory_space=pltpu.SMEM),   # full/partial flags
            pl.BlockSpec(memory_space=pltpu.VMEM),   # MDS
            pl.BlockSpec(memory_space=pltpu.VMEM),   # state
            pl.BlockSpec(memory_space=pltpu.VMEM),   # msg L
            pl.BlockSpec(memory_space=pltpu.VMEM),   # msg R
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((4, GL), U32),
            jax.ShapeDtypeStruct((LF, 1), U32),
            jax.ShapeDtypeStruct((LF, 1), U32),
        ],
        interpret=interpret,
    )(
        jnp.asarray(GL_CONSTS_NP),
        jnp.asarray(FR_CONSTS_NP),
        jnp.asarray(RC_MONT_NP)[..., None],
        jnp.asarray(ISFULL_NP),
        jnp.asarray(MDS_MONT_NP)[..., None],
        state[..., None],
        msg[0][..., None],
        msg[1][..., None],
    )
    return state2, x[..., 0], xinv[..., 0]
