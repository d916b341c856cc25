"""Multi-device SIPP prover: cyclic index sharding over a 1-D mesh.

The reference is single-process (SURVEY.md §2.3); this is the new first-class
parallel layer (components P1-P3/P5-P6).  Design:

**Cyclic layout.**  The pairing vectors A, B are stored as (n/d, d, ...) with
the *second* axis sharded over mesh axis "i", so device k holds global
indices {l*d + k}.  Fold round pairing is i <-> i + n/2; since d | n/2 for
every round until n == d, both fold partners and both cross-inner-product
partners (A[n/2+i], B[i]) live on the SAME device.  Consequence: every fold
round is communication-free except one tiny Fq12 collective (the reduction of
per-device partial Miller products, 2*12*16 u32 = 1.5 KB) — the analogue of
the reference's in-memory split_at fold (prover_native.rs:46-49) with zero
resharding.

**Deterministic reduction.**  Fq12 products are exact field ops, so any
reduction order gives the identical value; we still fix the order
(local tree, then all_gather + tree in device order) so sharded and
single-device proofs are bit-identical arrays, not just equal values.

**Tail rounds.**  When the vector length reaches d, remaining points are
gathered and the single-device prover finishes (log2(d) tiny rounds).

The Fiat-Shamir chain is replicated host state (P6): challenges depend only
on gathered public values, so every host computes them identically.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import curves, params
from ..curves import G1, G2, scalar_to_bits
from ..fields import tower
from ..pairing import miller_loop
from ..pairing.ate import _product_tree
from ..protocol.transcript import Transcript


def make_mesh(num_devices: int = None) -> Mesh:
    devs = jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), ("i",))


def shard_cyclic(arr, mesh: Mesh):
    """(n, ...) -> (n/d, d, ...) with axis 1 sharded (cyclic global layout)."""
    d = mesh.devices.size
    n = arr.shape[0]
    assert n % d == 0, f"n={n} not divisible by mesh size {d}"
    resh = arr.reshape(n // d, d, *arr.shape[1:])
    spec = P(None, "i", *([None] * (arr.ndim - 1)))
    return jax.device_put(resh, NamedSharding(mesh, spec))


def unshard(arr):
    """(n/d, d, ...) cyclic -> (n, ...) gathered on host order."""
    return jnp.reshape(arr, (arr.shape[0] * arr.shape[1], *arr.shape[2:]))


@functools.lru_cache(maxsize=None)
def _round_kernels(mesh: Mesh):
    """Build the per-mesh shard_map kernels (cached per mesh)."""

    a_spec = P(None, "i", None, None)          # (n/d, d, 2, L)
    b_spec = P(None, "i", None, None, None)    # (n/d, d, 2, 2, L)
    rep = P(*([None] * 4))                     # replicated fq12 (2,3,2,L)

    def cross_products(a, b):
        """Local Z_L/Z_R partial Miller products + exact cross-device tree.

        Both cross products run in ONE 2m-lane Miller scan (lanes 0..m-1 =
        (A_hi, B_lo), lanes m.. = (A_lo, B_hi)) instead of two m-lane scans:
        one scan body in the program (half the XLA compile) and one wide
        dispatch (better VPU utilization) per round."""
        a, b = a[:, 0], b[:, 0]
        m = a.shape[0] // 2
        aa = jnp.concatenate([a[m:], a[:m]], 0)
        bb = jnp.concatenate([b[:m], b[m:]], 0)
        f = miller_loop(aa, bb)
        f_l = _product_tree(f[:m])
        f_r = _product_tree(f[m:])
        fg = jax.lax.all_gather(jnp.stack([f_l, f_r]), "i")  # (d, 2, 2,3,2,L)
        z_l = _product_tree(fg[:, 0])
        z_r = _product_tree(fg[:, 1])
        return z_l, z_r

    def fold_a(a, bits):
        a = a[:, 0]
        m = a.shape[0] // 2
        return G1.to_affine(G1.fold(a[:m], a[m:], bits))[:, None]

    def fold_b(b, bits):
        b = b[:, 0]
        m = b.shape[0] // 2
        return G2.to_affine(G2.fold(b[:m], b[m:], bits))[:, None]

    # check_vma=False: the Miller scan carries replicated constants into
    # per-device varying values, which the varying-manual-axes checker
    # rejects; replication of outputs is managed explicitly (all_gather +
    # fixed-order trees), so the check is safely disabled.
    sm = functools.partial(shard_map, mesh=mesh, check_vma=False)
    return {
        "cross": jax.jit(sm(cross_products, in_specs=(a_spec, b_spec),
                            out_specs=(rep, rep))),
        "fold_a": jax.jit(sm(fold_a, in_specs=(a_spec, P(None)),
                             out_specs=a_spec)),
        "fold_b": jax.jit(sm(fold_b, in_specs=(b_spec, P(None)),
                             out_specs=b_spec)),
    }


def _fq12_mul_host(x, y):
    """One Fq12 multiply on the host (native C++ when available): combines
    the two cross sub-products into Z with ZERO extra compiled programs."""
    from .. import native

    if native.get_lib() is not None:
        out = native.fq12_mul(native.fq12_dev_to_u64(np.asarray(x)),
                              native.fq12_dev_to_u64(np.asarray(y)))
        return jnp.asarray(native.u64_to_fq12_dev(out))
    return tower.fq12_mul(x[None], y[None])[0]


def z_product(kernels, a, b):
    """Z = prod_i e(A_i, B_i) (pre-final-exp) via the SAME compiled
    cross-products program: pre-swapping the halves of A makes the cross
    lane pairing (A_hi, B_lo)/(A_lo, B_hi) collapse to (A_i, B_i), so the
    per-round program set is 3 programs, not 4 — the dominant cold-start
    cost of the sharded prover and the multichip dryrun.  Value-exact:
    Fq12 products are exact field ops, so bracketing cannot change the
    result (sharded == single-device asserted in tests/test_sharding.py)."""
    h = a.shape[0] // 2
    a_sw = jnp.concatenate([a[h:], a[:h]], axis=0)
    f_l, f_r = kernels["cross"](a_sw, b)
    return _fq12_mul_host(f_l, f_r)


def precompile_round(mesh: Mesh, a, b, bits):
    """AOT-compile the four per-round shard_map programs IN PARALLEL threads
    (XLA compilation releases the GIL, so a 4-core host compiles all four
    concurrently — the cold-start cost becomes max(program) instead of
    sum(programs)).  Returns {name: compiled executable}; also populates the
    persistent compile cache for the jit call path.

    a, b: already cyclic-sharded (n/d, d, ...) arrays; bits: (254,) uint32.
    """
    import concurrent.futures as cf

    k = _round_kernels(mesh)
    argv = {
        "cross": (k["cross"], (a, b)),
        "fold_a": (k["fold_a"], (a, bits)),
        "fold_b": (k["fold_b"], (b, bits)),
    }
    with cf.ThreadPoolExecutor(max_workers=len(argv)) as ex:
        futs = {
            name: ex.submit(lambda f=f, args=args: f.lower(*args).compile())
            for name, (f, args) in argv.items()
        }
        return {name: fut.result() for name, fut in futs.items()}


def sipp_prove_sharded(a_g1, b_g2, mesh: Mesh):
    """Sharded SIPP prover; bit-identical output to protocol.sipp_prove.

    a_g1: (n, 2, L), b_g2: (n, 2, 2, L) host-order arrays (will be
    cyclic-sharded over the mesh); n a power of two with n % d == 0.
    """
    n = a_g1.shape[0]
    d = mesh.devices.size
    assert n & (n - 1) == 0 and n >= d and d & (d - 1) == 0

    k = _round_kernels(mesh)
    a_host = curves.g1_decode(a_g1)
    b_host = curves.g2_decode(b_g2)
    tr = Transcript()
    tr.append_points(a_host, b_host)

    a = shard_cyclic(a_g1, mesh)
    b = shard_cyclic(b_g2, mesh)

    from ..pairing.ate import final_exp_host

    if n > d:
        z = final_exp_host(z_product(k, a, b))
    else:  # one element per device: single-device program does the work
        from ..pairing import inner_product

        z = inner_product(unshard(a), unshard(b))
    proof = [z]
    tr.append_fq12(tower.fq12_decode(z[None])[0])

    while n > d:
        f_l, f_r = k["cross"](a, b)
        z_l, z_r = final_exp_host(f_l), final_exp_host(f_r)
        proof.append(z_l)
        tr.append_fq12(tower.fq12_decode(z_l[None])[0])
        proof.append(z_r)
        tr.append_fq12(tower.fq12_decode(z_r[None])[0])
        x = tr.get_challenge()
        x_inv = pow(x, -1, params.R)
        a = k["fold_a"](a, scalar_to_bits(x))
        b = k["fold_b"](b, scalar_to_bits(x_inv))
        n //= 2

    # tail: n == d; gather and finish on one logical device (padded to the
    # shared kernel width like the single-device prover)
    a_t, b_t = unshard(a), unshard(b)
    from ..pairing import inner_product
    from ..protocol.prover import _floor, pad_lanes

    flo = _floor(n)
    while n > 1:
        m = n // 2
        tgt = max(m, flo)
        z_l = inner_product(a_t[m:], b_t[:m], pad_to=tgt)
        z_r = inner_product(a_t[:m], b_t[m:], pad_to=tgt)
        proof.append(z_l)
        tr.append_fq12(tower.fq12_decode(z_l[None])[0])
        proof.append(z_r)
        tr.append_fq12(tower.fq12_decode(z_r[None])[0])
        x = tr.get_challenge()
        x_inv = pow(x, -1, params.R)
        a_t = G1.to_affine(
            G1.fold(pad_lanes(a_t[:m], tgt), pad_lanes(a_t[m:], tgt),
                    scalar_to_bits(x)))[:m]
        b_t = G2.to_affine(
            G2.fold(pad_lanes(b_t[:m], tgt), pad_lanes(b_t[m:], tgt),
                    scalar_to_bits(x_inv)))[:m]
        n = m

    proof.reverse()
    return jnp.stack(proof)
