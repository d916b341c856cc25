"""Speed-of-light (SOL) model for the SIPP-TPU kernels (VERDICT r4 next-2).

The BASELINE north star demands "every field-arithmetic kernel must hit
speed-of-light per chip (limb-mul bound)".  This tool derives that bound:

  1. COUNT the primitive field operations each production kernel executes —
     by running the actual kernel-body math functions (ops/pallas_miller.py,
     ops/pallas_fold.py, ops/pallas_fexp.py mirrors) at B=1 on CPU under
     counting wrappers around the tmul/tmul_lat primitives, driving the real
     schedules (NAF digit tape, 254-bit ladder, x-chains/lambda tape).
  2. CONVERT counts to u32 VPU lane-ops via a per-primitive cost model
     (documented below, derived from the op-by-op structure of
     tmul._mul_impl / tmul.norm — the "limb-mul bound" plus its unavoidable
     carry-normalization traffic).
  3. DIVIDE by the v5e VPU integer throughput to get the SOL time, and
     compare with measured steady-state times (RESULTS.md).

v5e VPU denominator: the VPU is an (8, 128) vector unit with 4 independent
ALUs per lane position; clock derived from the published 197 bf16 TFLOP/s
peak of the 4 MXUs (4 * 128 * 128 * 2 * f = 197e12 -> f ~ 1.5 GHz):
    VPU_OPS = 8 * 128 * 4 * 1.5e9 ~ 6.1e12 u32 lane-ops/s
ASSUMPTION (stated, not measured): every u32 ALU op (add/mul/shift/logic/
compare/select) retires at 1 op/ALU/cycle.  If 32-bit integer multiply
retires slower on the VPU (plausible; unpublished), SOL times scale up by
that factor — the model reports the multiply fraction so the reader can
re-derive under other assumptions.

Cost model (u32 lane-ops per (16,)-limb Fq instance, counted per element):

  CIOS Montgomery mul (tmul._mul_impl): 16 iterations of
      t = a_i*b (1 vec mul) + acc += t&0xffff (2) + m (scalar row ~0.2)
      + u = m*p (1 mul) + acc += u&0xffff (2) + shift-down (~1.2)
      + acc += (t>>16)+(u>>16) (4)                      ~ 11.4 ops/iter
    -> 16 * 11.4 = 182 vec-ops of width 16  (56 of them multiplies)
    + exit: 2-candidate stacked norm (2 * 22) + select (1) + add (1) = 46
    TOTAL ~ 228 width-16 ops  => 3,648 u32 lane-ops per Fq mul element
  norm pass (tmul.norm per 16-limb instance): extract r/b (2), shift (1),
      u (1), g/p (2), Kogge-Stone 4 levels * 3 ops (12), c (2), limbs (2),
      carry (1) ~ 23 width-16 ops => 368 u32 lane-ops per instance
  (tmul.add = 2-candidate norm + select + 1 add ~ 2*23+2 = 48;
   tmul.sub same; add_lazy = 1 norm + 1 add = 24 — all counted via the
   wrapped `norm` calls they make plus small glue.)

Run: JAX_PLATFORMS=cpu PYTHONPATH= python tools/sol_model.py
Output: JSON table kernel -> {counted ops, u32 ops, sol_ms, measured_ms,
pct_sol} — the RESULTS.md SOL table is generated from this.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

# ------------------------------------------------------------ cost model

VPU_OPS_PER_S = 8 * 128 * 4 * 1.5e9          # 6.14e12 (assumption above)
W16 = 16                                      # lane-ops per width-16 vec op

CIOS_VEC_OPS = 182        # width-16 vec ops per Fq mul element EXCLUDING its
                          # exit norm (the wrapped `norm` counts that call
                          # separately: 2 candidate instances per mul)
CIOS_MUL_OPS = 56         # of which u32 multiplies
SOS_VEC_OPS = 330         # separated-SOS mul core (3 product passes over
                          # L/2L-wide columns) excluding its norms (counted
                          # via the wrapped norm calls) — fexp easy part
NORM_VEC_OPS = 23         # width-16 vec ops per norm pass instance

# L17 (tmul_lat) variants: same structure over 17 limbs; scale by 17/16.
L17_SCALE = 17.0 / 16.0


class Counter:
    def __init__(self):
        self.fq_mul = 0.0          # Fq CIOS Montgomery-mul instances
        self.fq_mul_sos = 0.0      # Fq SOS-form mul instances (fexp tail)
        self.norm = 0.0            # norm-pass instances (16-limb columns)
        self.fq_mul17 = 0.0        # L17 mul instances
        self.norm17 = 0.0          # L17 norm instances (incl. canon cands)

    def u32_ops(self):
        # L17 muls are SOS-form (tmul_lat._mul_merged); width scales 17/16
        return W16 * (self.fq_mul * CIOS_VEC_OPS
                      + self.fq_mul_sos * SOS_VEC_OPS
                      + self.norm * NORM_VEC_OPS
                      + L17_SCALE * (self.fq_mul17 * SOS_VEC_OPS
                                     + self.norm17 * NORM_VEC_OPS))

    def mul_fraction(self):
        mul = W16 * CIOS_MUL_OPS * (self.fq_mul + L17_SCALE * self.fq_mul17)
        return mul / max(self.u32_ops(), 1)

    def as_dict(self):
        return {"fq_mul": round(self.fq_mul),
                "fq_mul_sos": round(self.fq_mul_sos),
                "norm_passes": round(self.norm),
                "fq_mul_l17": round(self.fq_mul17),
                "norm_l17": round(self.norm17),
                "u32_ops": round(self.u32_ops()),
                "mul_fraction": round(self.mul_fraction(), 3)}


CNT = Counter()


def _instances(shape, limbs):
    n = 1
    for s in shape:
        n *= s
    return n / limbs


def install():
    """Wrap the tmul/tmul_lat primitives with counters (delegating to the
    originals so the drivers execute real values at B=1).  Also replaces
    t.pow_tree (pl.run_scoped, kernel-only) with a flat equivalent doing
    the same op COUNT: nbits-1 squarings + (popcount-1) tree multiplies."""
    from sipp_tpu.ops import tmul as t
    from sipp_tpu.ops import tmul_lat as lt

    orig_mul_impl = t._mul_impl
    orig_mul_sos = t._mul_impl_sos
    orig_norm = t.norm
    orig_mul_merged = lt._mul_merged
    orig_norm_raw = lt.norm_raw

    def pow_tree_flat(a, bits, sqrfn=None, mulfn=None):
        sqrfn = sqrfn or (lambda s: t.mul(s, s))
        mulfn = mulfn or t.mul
        bits = np.asarray(bits)
        s = a
        for _ in range(len(bits) - 1):
            s = sqrfn(s)
        for _ in range(int(bits.sum()) - 1):
            s = mulfn(s, a)
        return s

    t.pow_tree = pow_tree_flat

    def mul_impl(a, b):
        CNT.fq_mul += _instances(jnp.broadcast_shapes(a.shape, b.shape), 16)
        return orig_mul_impl(a, b)

    def norm(cols, num_out):
        CNT.norm += _instances(cols.shape, 16) * (num_out / 16.0)
        return orig_norm(cols, num_out)

    def mul_merged(a, b):
        CNT.fq_mul17 += _instances(jnp.broadcast_shapes(a.shape, b.shape), 17)
        return orig_mul_merged(a, b)

    def norm_raw(cols, num_out):
        CNT.norm17 += _instances(cols.shape, 17) * (num_out / 17.0)
        return orig_norm_raw(cols, num_out)

    def mul_sos(a, b):
        CNT.fq_mul_sos += _instances(jnp.broadcast_shapes(a.shape, b.shape),
                                     16)
        return orig_mul_sos(a, b)

    t._mul_impl = mul_impl
    t._mul_impl_sos = mul_sos
    t.norm = norm
    lt._mul_merged = mul_merged
    lt.norm_raw = norm_raw
    # pltpu.roll has no eager evaluation rule outside Pallas; op counts are
    # identical under jnp.roll (semantics differ only in direction, which
    # doesn't matter for counting)
    import types
    shim = types.SimpleNamespace(
        roll=lambda x, s, axis: jnp.roll(x, s, axis=axis))
    t.pltpu = shim
    lt.pltpu = shim
    return (orig_mul_impl, orig_norm, orig_mul_merged, orig_norm_raw)


# ------------------------------------------------------------ drivers

def count_miller_n128():
    """The whole-loop kernel's schedule at B=1 (per-lane cost; the 128-lane
    kernel does 128x this work in the loop + the 7-level product tree)."""
    from sipp_tpu.ops import pallas_miller as pm
    from sipp_tpu.ops import tmul as t
    from sipp_tpu.pairing.ate import _DIGITS

    L, B = 16, 1
    with t.bound_consts(jnp.asarray(t.CONSTS_NP)):
        one = jnp.ones((L, B), jnp.uint32)
        fq2 = jnp.ones((2, L, B), jnp.uint32)
        f12 = jnp.ones((2, 3, 2, L, B), jnp.uint32)
        tj = jnp.ones((3, 2, L, B), jnp.uint32)
        q = jnp.ones((2, 2, L, B), jnp.uint32)
        xp = yp = one

        start = Counter()
        start.__dict__.update(CNT.__dict__)
        nadd = int((np.asarray(_DIGITS) != 0).sum())
        for _ in range(len(_DIGITS)):
            f = pm.fq12_sqr(f12)
            t2, line = pm.dbl_step(tj, xp, yp)
            f = pm.fq12_mul_line(f, *line)
        for _ in range(nadd + 2):      # NAF adds + 2 Frobenius-tail adds
            t3, line = pm.add_step(tj, q, xp, yp)
            f = pm.fq12_mul_line(f, *line)
        per_lane = Counter()
        for k in CNT.__dict__:
            per_lane.__dict__[k] = CNT.__dict__[k] - start.__dict__[k]
        # whole kernel at 128 lanes: 128x per-lane + product tree (7 levels
        # of full-width fq12_mul = 7 * 128 instances at the kernel's lane
        # width... the hypercube multiplies ALL 128 lanes at each level)
        total = Counter()
        for k in ("fq_mul", "fq_mul_sos", "norm", "fq_mul17", "norm17"):
            total.__dict__[k] = per_lane.__dict__[k] * 128
        start2 = Counter()
        start2.__dict__.update(CNT.__dict__)
        pm.fq12_mul(f12, f12)
        for k in ("fq_mul", "fq_mul_sos", "norm", "fq_mul17", "norm17"):
            d = CNT.__dict__[k] - start2.__dict__[k]
            total.__dict__[k] += d * 128 * 7   # 7 hypercube levels, 128 lanes
    return total


def count_fold(glen, nbits=254, setbits=127):
    """Fold ladder kernel (pallas_fold): per step one Jacobian double of the
    accumulator + (set bits only, pl.when) one mixed add; plus the fold's
    base add and final to-affine inversion.  glen: 1 for G1 (Fq coords),
    2 for G2 (Fq2).  Counted per lane then scaled to 128 lanes."""
    from sipp_tpu.ops import pallas_fold as pf
    from sipp_tpu.ops import tmul as t

    L, B = 16, 1
    f = pf._FqAd if glen == 1 else pf._Fq2Ad
    with t.bound_consts(jnp.asarray(t.CONSTS_NP)):
        coord = jnp.ones(((2,) * (glen - 1)) + (L, B), jnp.uint32)
        p = jnp.stack([coord, coord, coord])
        q = jnp.stack([coord, coord])
        start = Counter()
        start.__dict__.update(CNT.__dict__)
        for _ in range(nbits):
            p = pf._dbl(p, f)
        for _ in range(setbits + 1):   # expected adds + the offset add
            p = pf._add_mixed(p, q, f)
        pf._to_affine(p, f)
        out = Counter()
        for k in ("fq_mul", "fq_mul_sos", "norm", "fq_mul17", "norm17"):
            out.__dict__[k] = (CNT.__dict__[k] - start.__dict__[k]) * 128
    return out


def count_fexp():
    """final_exp_fused at B=1: easy part (conj, Fermat fq12 inversion, two
    fq12 muls, frob) in the L16 domain + hard part (3 x-chains of 62
    cyclotomic squarings + set-bit product trees, 29-row lambda tape + the
    finishing multiply) in the L17 flat-expansion domain."""
    from sipp_tpu import params
    from sipp_tpu.ops import pallas_fexp as pfx
    from sipp_tpu.ops import tmul as t
    from sipp_tpu.ops import tmul_lat as lt

    L, B = 16, 1
    with t.bound_consts(jnp.asarray(t.CONSTS_NP)), \
            lt.bound_consts(jnp.asarray(lt.CONSTS_NP)):
        f12 = jnp.ones((2, 3, 2, L, B), jnp.uint32)
        f17 = jnp.ones((2, 3, 2, 17, B), jnp.uint32)
        start = Counter()
        start.__dict__.update(CNT.__dict__)

        # ---- easy part (t-domain mirrors; pow_tree replaced analytically:
        # Fermat inv = 253 squarings + (popcount leaves - 1) tree muls)
        pm2 = np.array([int(b) for b in bin(params.P - 2)[2:]])
        n_sq, n_leaf = len(pm2) - 1, int(pm2.sum())
        one = jnp.ones((L, B), jnp.uint32)
        for _ in range(n_sq + (n_leaf - 1)):
            pfx._mul_l(one, one)               # Fq-level inv chain
        # fq12_inv structure around the Fq inversion (fq6_inv + fq2 muls):
        # count the real composition once with the Fq inv stubbed out
        orig_inv = pfx._inv_l
        pfx._inv_l = lambda a: a
        pfx.fq12_inv(f12)
        pfx._inv_l = orig_inv
        pfx.fq12_mul(f12, f12)                 # conj(f) * inv(f)
        pfx.fq12_mul(f12, f12)                 # frob2(g) * g
        # ---- hard part (lt-domain): 3 chains x (62 cyclo-sqr + tree muls)
        xbits = np.array([int(b) for b in bin(params.X)[2:]])
        x_sq, x_leaf = len(xbits) - 1, int(xbits.sum())
        for _ in range(3):
            for _ in range(x_sq):
                lt.fq12_cyclo_sqr(f17)
            for _ in range(x_leaf - 1):
                lt.fq12_mul(f17, f17)
        from sipp_tpu.pairing.ate import _TAPE
        for _ in range(len(_TAPE) + 1):        # lambda tape + finishing mul
            lt.fq12_mul(f17, f17)
        out = Counter()
        for k in ("fq_mul", "fq_mul_sos", "norm", "fq_mul17", "norm17"):
            out.__dict__[k] = CNT.__dict__[k] - start.__dict__[k]
    return out


MEASURED_MS = {
    # round-4 final / round-5 measured steady states (RESULTS.md)
    "miller_product_fused_n128": None,     # filled from whole128 - fexp
    "whole128 (miller+tree+fexp)": 8.295,
    "final_exp_fused_B1": None,            # in-program share, see RESULTS
    "fold_g1_fused_128": None,
    "fold_g2_fused_128": None,
}


def main():
    global CNT
    install()
    table = {}
    CNT = Counter()
    table["miller_product_fused_n128"] = count_miller_n128().as_dict()
    CNT = Counter()
    table["final_exp_fused_B1"] = count_fexp().as_dict()
    CNT = Counter()
    table["fold_g1_fused_128"] = count_fold(1).as_dict()
    CNT = Counter()
    table["fold_g2_fused_128"] = count_fold(2).as_dict()

    for k, v in table.items():
        v["sol_ms"] = round(v["u32_ops"] / VPU_OPS_PER_S * 1e3, 3)
    out = {"vpu_ops_per_s": VPU_OPS_PER_S,
           "assumption": "1 u32 ALU op/lane/cycle, 4096 lanes, 1.5 GHz",
           "kernels": table}
    print(json.dumps(out, indent=1))
    with open("/tmp/sol_model.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
