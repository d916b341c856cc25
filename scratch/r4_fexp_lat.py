"""Standalone L17 (tmul_lat) variant of the final-exp kernel: compiles as
its OWN program (no production cache interference), asserts bit-equality
against ops/pallas_fexp.final_exp_fused on the real TPU, and times both.

Structure: easy part stays in the production L16 ops (tmul + pallas_fexp
helpers); the hard part (3 x-chains, product trees, lambda tape) — ~80% of
the serial stages — runs in the L17 lazy-column domain (tmul_lat flat
expansions), with one domain conversion around it.

Usage: python scratch/r4_fexp_lat.py   (axon TPU)
Go/no-go gate for the round-5 (or late-round-4) integration.
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sipp_tpu.fields import FQ
from sipp_tpu.ops import pallas_fexp as PF
from sipp_tpu.ops import tmul as t
from sipp_tpu.ops import tmul_lat as lt

L = FQ.L
FROB17_NP = lt.l17_mont_table(PF.FROB_NP)


def _powx_lat(v, sq_ref):
    def body(i, s):
        sq_ref[pl.ds(i, 1)] = s[None]
        return lt.fq12_cyclo_sqr(s)

    last = jax.lax.fori_loop(0, PF._X_NBITS - 1, body, v)
    vals = [last if j == PF._X_NBITS - 1 else sq_ref[pl.ds(j, 1)][0]
            for j in PF._X_SET_POWS]
    while len(vals) > 1:
        h = len(vals) // 2
        prod = lt.fq12_mul(jnp.stack(vals[:h]), jnp.stack(vals[h:2 * h]))
        vals = [prod[i] for i in range(h)] + vals[2 * h:]
    return vals[0]


def _kernel(c_ref, cl_ref, frob_ref, frob17_ref, tape_ref, f_ref, o_ref,
            regs_ref, sq_ref):
    tape = PF._tape()
    with t.bound_consts(c_ref[:]):
        # easy part in the production L16 ops
        f = f_ref[:]
        g = PF.fq12_mul(PF.fq12_conj(f), PF.fq12_inv(f))
        g16 = PF.fq12_mul(PF.fq12_frob(g, frob_ref[:], 2), g)
    with lt.bound_consts(cl_ref[:]):
        frob17 = frob17_ref[:]
        regs_ref[pl.ds(0, 1)] = lt.from_l16(g16)[None]

        def chain(k, c):
            regs_ref[pl.ds(k + 1, 1)] = (
                _powx_lat(regs_ref[pl.ds(k, 1)][0], sq_ref)[None])
            return c

        jax.lax.fori_loop(0, 3, chain, 0)

        def tape_step(i, c):
            v = lt.fq12_mul(regs_ref[pl.ds(tape_ref[3 * i + 1], 1)][0],
                            regs_ref[pl.ds(tape_ref[3 * i + 2], 1)][0])
            regs_ref[pl.ds(tape_ref[3 * i], 1)] = v[None]
            return c

        jax.lax.fori_loop(0, PF._TAPE_NLOOP, tape_step, 0)

        def r(i):
            return regs_ref[pl.ds(i, 1)][0]

        for dst, s1, s2, post in tape[PF._TAPE_NLOOP:].tolist():
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
def final_exp_lat(f, interpret: bool = False):
    B = f.shape[0]
    ft = f[..., None]
    elt16 = (B, 2, 3, 2, L, 1)
    elt17 = (B, 2, 3, 2, lt.NL, 1)
    out = pl.pallas_call(
        _kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
        + [pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(elt16, jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((12,) + elt17, jnp.uint32),
            pltpu.VMEM((PF._X_NBITS - 1,) + elt17, jnp.uint32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )(
        jnp.asarray(t.CONSTS_NP),
        jnp.asarray(lt.CONSTS_NP),
        jnp.asarray(PF.FROB_NP),
        jnp.asarray(FROB17_NP),
        jnp.asarray(PF._tape()[:, :3].reshape(-1), jnp.int32),
        ft,
    )
    return out[..., 0]


def main():
    print("devices:", jax.devices(), flush=True)
    res = {}
    rng = np.random.default_rng(17)
    xs = [int.from_bytes(rng.bytes(40), "little") % FQ.p for _ in range(12)]
    f = FQ.encode(xs).reshape(1, 2, 3, 2, L)

    tt = time.time()
    z_lat = final_exp_lat(f)
    jax.block_until_ready(z_lat)
    res["lat_compile_s"] = round(time.time() - tt, 1)
    print("lat compile", res["lat_compile_s"], flush=True)

    tt = time.time()
    z_ref = PF.final_exp_fused(f)
    jax.block_until_ready(z_ref)
    res["ref_compile_s"] = round(time.time() - tt, 1)

    res["bitequal"] = bool(
        (np.asarray(jax.device_get(z_lat))
         == np.asarray(jax.device_get(z_ref))).all())
    print("bit-equal vs production kernel:", res["bitequal"], flush=True)

    # timing: vary input each rep (fresh final-exp bases)
    fs = [FQ.encode([(x + i + 1) % FQ.p for x in xs]).reshape(1, 2, 3, 2, L)
          for i in range(20)]
    jax.block_until_ready(fs)
    for name, fn in [("lat", final_exp_lat), ("ref", PF.final_exp_fused)]:
        tt = time.time()
        for fi in fs:
            z = fn(fi)
        jax.block_until_ready(z)
        res[name + "_ms"] = round((time.time() - tt) / len(fs) * 1000, 3)
        print(name, res[name + "_ms"], "ms", flush=True)
    with open("/tmp/r4_fexp_lat.json", "w") as fp:
        json.dump(res, fp, indent=1)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
