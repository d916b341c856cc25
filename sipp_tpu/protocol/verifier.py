"""SIPP verifier: transcript replay, fold verification, one final pairing.

Semantics of reference sipp_verify_native
(/root/reference/src/verifier_native.rs:14-85; SURVEY.md §3.2): replays the
transcript, pops the proof from the back, folds A/B with the same challenges
and updates Z' = Z_L^x * Z * Z_R^(x^-1), then checks e(final_A, final_B) ==
final_Z with a single pairing.  The G1/G2 exps and Fq12 exps that the
reference outsources to starky STARK statements (SURVEY.md D7/D8) are here
computed directly by the batched fold/exp kernels.

Dispatch discipline (see prover.py): the whole proof (2*log2(n)+1 Fq12, a few
KB) is transferred to the host ONCE and decoded in pure Python; the per-round
Z' power chain runs on the host C++ kernel (single-element exps are
latency-bound on device); per round the device does exactly ONE fused fold
program.  The final pairing is one more device program + one transfer.
"""

import jax
import jax.numpy as jnp
import numpy as np

from .. import curves, native, params
from ..curves import G1, G2, scalar_to_bits
from ..fields import tower

from .statements import SIPPStatement
from .transcript import Transcript


class VerificationError(Exception):
    pass


@jax.jit
def _finals_msm_dev(a, b, bits_a, bits_b):
    """The verifier finals as TWO per-lane MSMs in ONE device program
    (VERDICT r4 next-8; reference cost model: n-1 G1 + n-1 G2 exps,
    /root/reference/src/verifier_native.rs:48-57): final_A = sum_j c_j A_j
    with c_j = prod_k x_k^{bit_k(j)} (bit_1 = MSB of j), final_B the
    x^-1 twin.  Replaces log2(n) SEQUENTIAL 254-step fold ladders with ONE
    254-step per-lane ladder + a log2(n) complete-add tree — same group
    elements, so the affine results are bit-identical (canonical encoding).
    Fused Pallas exp kernels on TPU; XLA ladders elsewhere (value-equality
    of the two finals paths is CPU-tested; fused==XLA kernel equality is
    covered by tests/test_exp_kernels.py)."""
    from ..ops.msm import _tree_sum
    from ..pairing.ate import _fused_ok

    if _fused_ok():
        from ..ops.pallas_exp import exp_g1_fused, exp_g2_fused

        pa = G1.jac_from_affine(exp_g1_fused(a, jnp.zeros_like(a), bits_a))
        pb = G2.jac_from_affine(exp_g2_fused(b, jnp.zeros_like(b), bits_b))
    else:
        pa = G1.scalar_mul_per_lane(a, bits_a)  # no infinity-offset add here
        pb = G2.scalar_mul_per_lane(b, bits_b)  # (XLA add_mixed rejects it)
    fa = G1.to_affine(_tree_sum(G1, pa)[None])
    fb = G2.to_affine(_tree_sum(G2, pb)[None])
    return fa, fb


def _msm_mode() -> str:
    """SIPP_VERIFY_MSM: "auto" (default — MSM finals on the fused/TPU path,
    fold ladders elsewhere), "1" (always), "0" (never; fold ladders)."""
    import os

    return os.environ.get("SIPP_VERIFY_MSM", "auto")


def sipp_verify(a_g1, b_g2, proof) -> SIPPStatement:
    """Verify a SIPP proof.  proof: (2*log2(n)+1, 2, 3, 2, L) Fq12 array in
    the prover's reversed order.  Returns the accepted SIPPStatement or
    raises VerificationError (reference verifier_native.rs:80-84)."""
    n = a_g1.shape[0]
    assert n & (n - 1) == 0 and n >= 1
    assert proof.shape[0] == 2 * (n.bit_length() - 1) + 1

    # adversarial-input validation (reference parity: arkworks' typed
    # deserialization + the circuit's limb range asserts — see validate.py).
    # Async: the curve/subgroup device programs overlap the host transcript
    # replay below; the results gate the final accept.
    from . import validate
    _validation_ok = validate.check_instance_async(a_g1, b_g2)

    a_host = curves.g1_decode(a_g1)
    b_host = curves.g2_decode(b_g2)
    tr = Transcript()
    tr.append_points(a_host, b_host)

    # one transfer: whole proof to host (validated), u64 Montgomery +
    # canonical ints
    proof_u = native.fq12_dev_to_u64(validate.check_proof(proof))
    proof_ints = [native.fq12_u64_to_tower_ints(x) for x in proof_u]
    use_native = native.get_lib() is not None

    idx = proof.shape[0] - 1
    z_u, z_ints = proof_u[idx], proof_ints[idx]
    original_z_ints = z_ints
    idx -= 1
    tr.append_fq12(z_ints)
    exp_rows = []   # no-native-lib fallback: (proof_idx, exponent) per exp

    from ..pairing.ate import _fused_ok
    from .prover import (_floor, _fold_halves, _fold_round_fused,
                         _fold_rounds_scan, _halves)

    fused = _fused_ok()

    # phase 1 (pure host): replay the transcript and the Z' power chain,
    # collecting the fold schedule — unlike the prover, ALL challenges are
    # derivable up-front from the proof, so the device folds can run as one
    # scanned program afterwards.
    n0 = n
    w_min = 2 * _floor(n)
    sched = []  # (m, xbits, xinvbits)
    xs_int = []  # (x, x_inv) integer challenges, round order (MSM finals)
    while n > 1:
        m = n // 2
        tr.append_fq12(proof_ints[idx])
        tr.append_fq12(proof_ints[idx - 1])

        x = tr.get_challenge()
        x_inv = pow(x, -1, params.R)
        xs_int.append((x, x_inv))
        # Z' = Z_L^x * Z * Z_R^(x^-1) — single-element exponentiations are
        # latency-bound, so they run on the host C++ kernel when available
        # (bit-identical; see pairing.final_exp_host rationale).
        if use_native:
            t = native.fq12_mul(native.fq12_pow(proof_u[idx], x), z_u)
            z_u = native.fq12_mul(t, native.fq12_pow(proof_u[idx - 1], x_inv))
        else:
            exp_rows += [(idx, x), (idx - 1, x_inv)]
        idx -= 2
        sched.append((m, scalar_to_bits(x), scalar_to_bits(x_inv)))
        n = m

    if not use_native:
        z_dev = proof[len(proof) - 1]
        if exp_rows:
            # batched fallback: the final Z is Z * prod_k Z_L,k^x_k *
            # Z_R,k^(x_k^-1) (the per-round chain is just a commutative
            # product), so ALL 2*log2(n) single-element exps run as ONE
            # lane-batched device program + one product tree — instead of
            # 2*log2(n) serial latency-bound scans (VERDICT r3 next-9).
            bases = proof[np.asarray([i for i, _ in exp_rows])]
            bits = jnp.asarray(
                np.stack([scalar_to_bits(e) for _, e in exp_rows], axis=1))
            powers = tower.fq12_pow_bits(bases, bits)
            from ..pairing.ate import _product_tree
            z_dev = _product_tree(
                jnp.concatenate([z_dev[None], powers], 0))

    # phase 2 (device): recover final_A/final_B.  Default on the fused/TPU
    # path: ONE MSM program (_finals_msm_dev).  Fallback (and CPU default):
    # fold ladders — wide rounds individually, fixed-width tail as ONE
    # scanned program.
    mode = _msm_mode()
    use_msm = n0 > 1 and (mode == "1" or (mode == "auto" and fused))
    a, b = a_g1, b_g2
    k = 0
    if use_msm:
        from .prover import pad_lanes

        logn = len(xs_int)
        bits_a = np.empty((254, n0), np.uint32)
        bits_b = np.empty((254, n0), np.uint32)
        for j in range(n0):
            c = d = 1
            for kk, (x_k, xi_k) in enumerate(xs_int):
                if (j >> (logn - 1 - kk)) & 1:
                    c = c * x_k % params.R
                    d = d * xi_k % params.R
            bits_a[:, j] = scalar_to_bits(c)
            bits_b[:, j] = scalar_to_bits(d)
        fa_aff, fb_aff = _finals_msm_dev(
            a_g1, b_g2, jnp.asarray(bits_a), jnp.asarray(bits_b))
        # pad to the shared final-check width with infinity lanes (identical
        # to what the fold path leaves in lanes >= 1)
        a = pad_lanes(fa_aff, min(n0, w_min))
        b = pad_lanes(fb_aff, min(n0, w_min))
    elif fused:
        while a.shape[0] > w_min and k < len(sched):
            m, xb, xib = sched[k]
            k += 1
            a, b = _fold_round_fused(a, b, m, xb, xib)
            a, b = a[: max(m, w_min)], b[: max(m, w_min)]
        if k < len(sched):
            ms = np.asarray([s[0] for s in sched[k:]], np.int32)
            xbs = np.stack([s[1] for s in sched[k:]])
            xibs = np.stack([s[2] for s in sched[k:]])
            a, b = _fold_rounds_scan(a, b, ms, xbs, xibs)
    else:
        for m, xb, xib in sched:
            if a.shape[0] > max(2 * m, w_min):
                a, b = a[: max(2 * m, w_min)], b[: max(2 * m, w_min)]
            a_lo, a_hi = _halves(a, m)
            b_lo, b_hi = _halves(b, m)
            a, b = _fold_halves(a_lo, a_hi, b_lo, b_hi, xb, xib)

    if use_native:
        final_z_ints = native.fq12_u64_to_tower_ints(z_u)
    else:
        final_z_ints = tower.fq12_decode(z_dev[None])[0]
    final_a = curves.g1_decode(a)[0]
    final_b = curves.g2_decode(b)[0]
    stmt = SIPPStatement(
        A=a_host, B=b_host,
        Z=original_z_ints,
        final_A=final_a, final_B=final_b, final_Z=final_z_ints,
    )

    # final check e(final_A, final_B) == final_Z: a,b kept at the shared
    # program width with infinity in the dead lanes (contribute 1), so this
    # reuses the SAME compiled inner-product program as the prover's rounds;
    # the comparison happens on host ints.
    from ..pairing.ate import (_fused_ok, _inner_f, _inner_z_fused,
                                   final_exp, final_exp_host_np)

    if _fused_ok():
        lhs_ints = native.fq12_u64_to_tower_ints(native.fq12_dev_to_u64(
            jax.device_get(_inner_z_fused(a, b, None))))
    elif native.get_lib() is not None:
        _, lhs_ints = final_exp_host_np(
            native.fq12_dev_to_u64(jax.device_get(_inner_f(a, b, None))))
    else:
        lhs_ints = tower.fq12_decode(final_exp(_inner_f(a, b, None))[None])[0]
    _validation_ok()   # fetch the async entry-validation verdicts
    if lhs_ints != final_z_ints:
        raise VerificationError("Verification failed")
    return stmt
