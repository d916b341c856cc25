"""SIPP prover: log2(n) Fiat-Shamir folding rounds, batched on device.

Semantics of reference sipp_prove_native (/root/reference/src/prover_native.rs:26-80),
re-architected TPU-first (SURVEY.md §3.1): the n pairings of Z and the m/2+m/2
cross inner products Z_L/Z_R per round are single batched Miller loops + one
final exponentiation (pairing/pairing.py); the G1/G2 folds A' = A_lo + x*A_hi,
B' = B_lo + x^-1*B_hi are batched shared-scalar ladder kernels (curves/).
Only the hash chain (the serial spine, SURVEY.md §3.5) runs on host.

Fixed-width dynamic-m rounds (the compile-count design): arrays keep a fixed
lane width W = min-clamped at 2*PAD_FLOOR; the live half-count m enters the
jitted programs as a DYNAMIC scalar.  Halving is a dynamic lane roll + an
iota<m infinity mask instead of a shape-halving slice, so every small round
hits the SAME compiled programs: one `_halves` mask program per point type,
one fold program, and the width-W inner-product program — which is the same
program that computes the initial Z and the verifier's final check.  (Shape-
specialized per-round programs cost a full XLA compile per round; masked
lanes are points at infinity, which contribute exactly 1 to pairing products
and fold as O + x*O = O, so the result is bit-identical.)

Fold orientation (SURVEY.md §2.4 item 7): with (lo, hi) = split_at(n/2):
Z_L = <A_hi, B_lo>, Z_R = <A_lo, B_hi>; proof = [Z, Z_L1, Z_R1, ...] REVERSED
so the verifier pops from the back (§2.4 item 6).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from .. import curves, native, params
from ..curves import G1, G2, scalar_to_bits
from ..fields import tower
from ..pairing.ate import (_fused_ok, _inner_f, _inner_z_fused,
                               _round_zs_fused, final_exp, final_exp_host_np)
from .transcript import Transcript

# Small fold rounds keep this many live+masked lanes (width 2*PAD_FLOOR) so
# they all share ONE compiled kernel instead of recompiling at every halved
# size (exact: infinity lanes contribute 1 to products and fold to infinity).
# Injectable (env SIPP_PAD_FLOOR, or monkeypatch + jax.clear_caches()) so the
# wide-round width-shrinking paths are exercisable at CPU-test scale.
PAD_FLOOR = int(os.environ.get("SIPP_PAD_FLOOR", "64"))


def _floor(n0: int) -> int:
    return max(1, min(PAD_FLOOR, n0 // 2))


def pad_lanes(arr, target: int):
    n = arr.shape[0]
    if n >= target:
        return arr
    return jnp.concatenate(
        [arr, jnp.zeros((target - n,) + arr.shape[1:], jnp.uint32)], 0)


@jax.jit
def _halves(v, m):
    """(lo, hi) of a width-W point vector whose first 2*m lanes are live:
    lane i of hi is v[m+i] (dynamic roll), lanes >= m masked to the point at
    infinity (all-zero affine encoding).  m is a traced scalar, so one
    compiled program serves every fold round at this width."""
    W = v.shape[0]
    live = (jnp.arange(W) < m).reshape((W,) + (1,) * (v.ndim - 1))
    lo = jnp.where(live, v, 0)
    hi = jnp.where(live, jnp.roll(v, -m, axis=0), 0)
    return lo, hi


@jax.jit
def _fold_halves(a_lo, a_hi, b_lo, b_hi, xbits, xinvbits):
    """A' = A_lo + x*A_hi, B' = B_lo + x^-1*B_hi, affine, full width (dead
    lanes fold O + x*O = O and decode back to all-zero affine)."""
    a2 = G1.to_affine(G1.fold(a_lo, a_hi, xbits))
    b2 = G2.to_affine(G2.fold(b_lo, b_hi, xinvbits))
    return a2, b2


@jax.jit
def _fold_rounds_scan(a, b, ms, xbits_all, xinvbits_all):
    """ALL fixed-width fold rounds as ONE device program: lax.scan over
    (m, xbits, xinvbits) per round — the round body (halving masks + the
    two whole-ladder fold kernels) compiles once and the program dispatches
    once.  Used by the verifier, whose challenges are all known up-front
    from the proof (host transcript replay needs no device work)."""
    from ..ops import pallas_fold

    def body(carry, inp):
        a, b = carry
        m, xb, xib = inp
        a_lo, a_hi = _halves(a, m)
        b_lo, b_hi = _halves(b, m)
        return (pallas_fold.fold_g1_fused(a_lo, a_hi, xb),
                pallas_fold.fold_g2_fused(b_lo, b_hi, xib)), None

    (a, b), _ = jax.lax.scan(body, (a, b), (ms, xbits_all, xinvbits_all))
    return a, b


@jax.jit
def _fold_round_fused(a, b, m, xbits, xinvbits):
    """Fused-kernel fold round: the dynamic-m halving masks plus the whole
    254-step ladder + affine conversion as ONE Pallas kernel per group
    (ops/pallas_fold.py) — one device dispatch per round instead of an XLA
    scan of ~254 steps.  Bit-identical to _halves + _fold_halves on live
    lanes and on dead (infinity) lanes."""
    from ..ops import pallas_fold

    a_lo, a_hi = _halves(a, m)
    b_lo, b_hi = _halves(b, m)
    return (pallas_fold.fold_g1_fused(a_lo, a_hi, xbits),
            pallas_fold.fold_g2_fused(b_lo, b_hi, xinvbits))


def _finalize_host(f_dev):
    """(B?, 2,3,2,L) pre-FE Miller product(s) -> (device-format np arrays,
    tower-int tuples) via the host C++ final exp (one transfer in)."""
    f_np = native.fq12_dev_to_u64(jax.device_get(f_dev))
    z_np, ints = final_exp_host_np(f_np)
    return native.u64_to_fq12_dev(z_np), ints


def _finalize_dev(f_dev):
    """Fallback (no native lib): device XLA final exp + one decode."""
    batched = f_dev.ndim == 5
    z = final_exp(f_dev)
    ints = tower.fq12_decode(z if batched else z[None])
    return np.asarray(jax.device_get(z)), ints if batched else ints[0]


def _decode_z(z_dev):
    """Device-format final z -> (np array, tower ints), one transfer."""
    z_np = np.asarray(jax.device_get(z_dev))
    return z_np, native.fq12_u64_to_tower_ints(native.fq12_dev_to_u64(z_np))


# --------------------------------------------------------- on-chip prover

def _bits_msb(fr_limbs):
    """(..., 16) canonical Fr limbs -> (254,) MSB-first bit array."""
    idx = (253 - jnp.arange(254)) // 16
    sh = (253 - jnp.arange(254)) % 16
    return (fr_limbs[..., idx] >> sh.astype(jnp.uint32)) & 1


def _final_exp_dev(f):
    """Batched final exp for the on-chip prover: the fused Pallas kernel on
    TPU, the (bit-identical) XLA graph elsewhere — so the fully on-device
    prover control flow (device transcript, challenge, Fr inversion, scanned
    rounds) is testable on the CPU suite."""
    if _fused_ok():
        from ..ops import pallas_fexp

        return pallas_fexp.final_exp_fused(f)
    return final_exp(f)


def _fold_dev(a_lo, a_hi, b_lo, b_hi, xbits, xinvbits):
    if _fused_ok():
        from ..ops import pallas_fold

        return (pallas_fold.fold_g1_fused(a_lo, a_hi, xbits),
                pallas_fold.fold_g2_fused(b_lo, b_hi, xinvbits))
    return _fold_halves(a_lo, a_hi, b_lo, b_hi, xbits, xinvbits)


def _round_body_onchip(a, b, state, m):
    """One fold round ENTIRELY on device: cross Miller products (ONE
    pair-product kernel on TPU), two B=1 final exps (the L17 hard part's
    VMEM peak rules out B=2 stacking), transcript appends, challenge, Fr
    inversion (Fermat over r-2), and both fold ladders.  Bit-identical to
    the host-sync round: the device transcript reproduces the host hash
    chain and digit quirk exactly."""
    from ..fields import FR
    from ..pairing.ate import _cross_f_pair
    from . import transcript_device as td

    a_lo, a_hi = _halves(a, m)
    b_lo, b_hi = _halves(b, m)
    if _fused_ok() and a.shape[0] >= 2:
        fpair = _cross_f_pair(a_lo, a_hi, b_lo, b_hi)
        fl, fr_ = fpair[0], fpair[1]
    else:
        fl = _inner_f(a_hi, b_lo, None)
        fr_ = _inner_f(a_lo, b_hi, None)
    zs = jnp.concatenate([_final_exp_dev(fl[None]),
                          _final_exp_dev(fr_[None])])
    if _fused_ok():
        # the serial transcript tail (2 appends + challenge + Fr Fermat
        # inversion) as ONE Pallas kernel: ~40 ms of per-op XLA overhead
        # per round drops to ~ms (ops/pallas_transcript.py; bit-identical)
        from ..ops.pallas_transcript import transcript_round_tail

        state, x_fr, xinv = transcript_round_tail(state, zs[0], zs[1])
        xbits, xinvbits = _bits_msb(x_fr), _bits_msb(xinv)
    else:
        state = td.append_fq12(state, zs[0])
        state = td.append_fq12(state, zs[1])
        xbits, x_fr = td.get_challenge(state)
        xinv = FR.from_mont(FR.inv(FR.to_mont(x_fr)))
        xinvbits = _bits_msb(xinv)
    a2, b2 = _fold_dev(a_lo, a_hi, b_lo, b_hi, xbits, xinvbits)
    return a2, b2, state, zs


@jax.jit
def _z_onchip(a, b, state):
    """Initial Z = FE(prod e(A_i, B_i)) + its transcript append, on device."""
    from . import transcript_device as td

    z = _final_exp_dev(_inner_f(a, b, None)[None])[0]
    if _fused_ok():
        from ..ops.pallas_transcript import transcript_append_fq12

        return z, transcript_append_fq12(state, z)
    return z, td.append_fq12(state, z)


@jax.jit
def _round_onchip(a, b, state, m):
    return _round_body_onchip(a, b, state, m)


@jax.jit
def _rounds_onchip(a, b, state, ms):
    """All fixed-width rounds as ONE scanned device program."""

    def body(carry, m):
        a, b, state = carry
        a2, b2, state, zs = _round_body_onchip(a, b, state, m)
        return (a2, b2, state), zs

    (a, b, state), zs_all = jax.lax.scan(body, (a, b, state), ms)
    return a, b, state, zs_all


def sipp_prove_onchip(a_g1, b_g2, return_transcript=False, scan=None,
                      round_times=None):
    """Fully on-chip prover: after the host point-prologue hash, the entire
    fold recursion — cross inner products, final exps, Poseidon transcript,
    challenges, Fr inversions, folds — runs on device with ZERO host syncs
    (the reference's serial spine, SURVEY.md §3.5, becomes device-resident):
    one program for Z, one per wide round, then the fixed-width rounds as
    either per-round dispatches of ONE shared program (default: every
    fixed-width round hits the same compiled `_round_onchip`, dispatches
    queue asynchronously with no host round trip) or one scanned program
    (scan=True / env SIPP_ONCHIP_SCAN=1 — smallest dispatch count, but the
    monolithic compile is tunnel-hostile; see NOTES_NEXT).  A single
    transfer collects the proof.  Produces bit-identical proofs to
    sipp_prove (device transcript is quirk-exact).

    round_times: optional list; when given, each fixed-width round is
    individually blocked and its wall-clock seconds appended — the
    per-fold-round latency metric (BASELINE.json metric string)."""
    n = a_g1.shape[0]
    assert n == b_g2.shape[0] and n & (n - 1) == 0 and n >= 1
    if scan is None:
        scan = os.environ.get("SIPP_ONCHIP_SCAN") == "1"
    from ..fields import FGL

    a_host = curves.g1_decode(a_g1)
    b_host = curves.g2_decode(b_g2)
    tr = Transcript()
    tr.append_points(a_host, b_host)
    state = FGL.encode(list(tr.state))

    a, b = a_g1, b_g2
    z_dev, state = _z_onchip(a, b, state)
    w_min = 2 * _floor(n)
    zs_wide = []
    m = n // 2
    while m >= 1 and a.shape[0] > w_min:
        a, b, state, zs = _round_onchip(a, b, state, np.int32(m))
        a, b = a[: max(m, w_min)], b[: max(m, w_min)]
        zs_wide.append(zs)
        m //= 2
    ms = []
    while m >= 1:
        ms.append(m)
        m //= 2
    zs_tail = None
    if ms and scan:
        a, b, state, zs_tail = _rounds_onchip(
            a, b, state, np.asarray(ms, np.int32))
    elif ms:
        import time as _time

        for m_ in ms:
            t0 = _time.time() if round_times is not None else None
            a, b, state, zs = _round_onchip(a, b, state, np.int32(m_))
            if round_times is not None:
                jax.block_until_ready(zs)
                round_times.append(_time.time() - t0)
            zs_wide.append(zs)

    z_np, zs_wide_np, zs_tail_np, state_np = jax.device_get(
        (z_dev, zs_wide, zs_tail, state))
    proof = [np.asarray(z_np)]
    for zs in zs_wide_np:
        proof.append(np.asarray(zs[0]))
        proof.append(np.asarray(zs[1]))
    if zs_tail_np is not None:
        for r in np.asarray(zs_tail_np):
            proof.append(r[0])
            proof.append(r[1])
    proof.reverse()  # verifier reads back-to-front (prover_native.rs:78)
    out = jnp.asarray(np.stack(proof))
    if return_transcript:
        tr.state = FGL.decode(jnp.asarray(state_np))
        return out, tr
    return out


def sipp_prove(a_g1, b_g2, return_transcript=False):
    """a_g1: (n, 2, L) G1 affine; b_g2: (n, 2, 2, L) G2 twist affine; n a
    power of two.  Returns proof: (2*log2(n)+1, 2, 3, 2, L) Fq12 array in
    reversed (verifier pop) order."""
    n = a_g1.shape[0]
    assert n == b_g2.shape[0] and n & (n - 1) == 0 and n >= 1

    fused = _fused_ok()
    finalize = _finalize_host if native.get_lib() is not None else _finalize_dev

    a_host = curves.g1_decode(a_g1)
    b_host = curves.g2_decode(b_g2)
    tr = Transcript()
    tr.append_points(a_host, b_host)

    if fused:
        z_np, z_ints = _decode_z(_inner_z_fused(a_g1, b_g2, None))
    else:
        z_np, z_ints = finalize(_inner_f(a_g1, b_g2, None))
    proof = [z_np]
    tr.append_fq12(z_ints)

    a, b = a_g1, b_g2
    w_min = 2 * _floor(n)  # min(128, n): the shared-program width
    while n > 1:
        m = n // 2
        # shrink the working width once the live half fits the floor width
        # (one cheap slice dispatch per halving above the floor)
        if a.shape[0] > max(n, w_min):
            a, b = a[: max(n, w_min)], b[: max(n, w_min)]
        if fused:
            # TWO dispatches per round total (zs program here, fold program
            # below): halving masks recomputed in-program, one transfer
            zs_np = np.asarray(jax.device_get(_round_zs_fused(a, b, m)))
            zl_np, zl_ints = zs_np[0], native.fq12_u64_to_tower_ints(
                native.fq12_dev_to_u64(zs_np[0]))
            zr_np, zr_ints = zs_np[1], native.fq12_u64_to_tower_ints(
                native.fq12_dev_to_u64(zs_np[1]))
        else:
            a_lo, a_hi = _halves(a, m)
            b_lo, b_hi = _halves(b, m)
            fl = _inner_f(a_hi, b_lo, None)
            fr = _inner_f(a_lo, b_hi, None)
            zs_np, zs_ints = finalize(jnp.stack([fl, fr]))
            zl_np, zr_np = zs_np[0], zs_np[1]
            zl_ints, zr_ints = zs_ints[0], zs_ints[1]
        proof.append(zl_np)
        tr.append_fq12(zl_ints)
        proof.append(zr_np)
        tr.append_fq12(zr_ints)

        x = tr.get_challenge()
        x_inv = pow(x, -1, params.R)
        if fused:
            a, b = _fold_round_fused(a, b, m,
                                     scalar_to_bits(x), scalar_to_bits(x_inv))
        else:
            a, b = _fold_halves(a_lo, a_hi, b_lo, b_hi,
                                scalar_to_bits(x), scalar_to_bits(x_inv))
        n = m

    proof.reverse()  # verifier reads back-to-front (prover_native.rs:78)
    out = jnp.asarray(np.stack(proof))
    if return_transcript:
        return out, tr
    return out
