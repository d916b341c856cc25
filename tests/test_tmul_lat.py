"""Differentials for ops/tmul_lat.py (the L=17-limb lazy-column domain).

tmul_lat is the measured round-5 integration path for the serial final-exp
tail (see its module docstring); these tests pin its value semantics
against the production field layer before any kernel adopts it:
round-trip through the domain, lazy mul/sub/mul9 chains, canon_k bounds,
and the Fq2 layer vs fields/tower.  Ops run in interpret-mode pallas calls
(pltpu.roll has no eager rule).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from sipp_tpu.fields import FQ, tower as T
from sipp_tpu.ops import tmul_lat as lt


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(42)


def run_lt(fn, out_shape, *args):
    """Run fn(*args) -> one array, inside an interpret-mode kernel with the
    tmul_lat constant table bound."""

    def kernel(c_ref, *refs):
        o_ref = refs[-1]
        with lt.bound_consts(c_ref[:]):
            o_ref[:] = fn(*(r[:] for r in refs[:-1]))

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.uint32),
        interpret=True,
    )(jnp.asarray(lt.CONSTS_NP), *args)


def enc16(xs):
    """ints -> standard tmul-layout (16, B) transposed Montgomery limbs."""
    a = FQ.encode(xs)                      # (B, 16)
    return jnp.transpose(a, (1, 0))


def dec16(a_t):
    return FQ.decode(jnp.transpose(a_t, (1, 0)))


def rand_fq(rng, k):
    return [int.from_bytes(rng.bytes(40), "little") % FQ.p for _ in range(k)]


def test_roundtrip_and_mul(rng):
    xs, ys = rand_fq(rng, 4), rand_fq(rng, 4)
    B = 4
    a = run_lt(lt.from_l16, (lt.NL, B), enc16(xs))
    b = run_lt(lt.from_l16, (lt.NL, B), enc16(ys))
    assert dec16(run_lt(lt.to_l16, (16, B), a)) == xs
    prod = run_lt(lt.mul, (lt.NL, B), a, b)
    assert dec16(run_lt(lt.to_l16, (16, B), prod)) == [
        x * y % FQ.p for x, y in zip(xs, ys)]
    # chained lazy muls stay in contract (< 2p outputs feed back)
    sq4 = run_lt(lambda p: lt.mul(lt.mul(p, p), lt.mul(p, p)),
                 (lt.NL, B), prod)
    assert dec16(run_lt(lt.to_l16, (16, B), sq4)) == [
        pow(x * y, 4, FQ.p) for x, y in zip(xs, ys)]


def test_raw_add_sub_mul9(rng):
    xs, ys = rand_fq(rng, 4), rand_fq(rng, 4)
    B = 4
    a = run_lt(lt.from_l16, (lt.NL, B), enc16(xs))
    b = run_lt(lt.from_l16, (lt.NL, B), enc16(ys))
    # 11a - 2b as raw columns, ONE canon at the end, back to the L16 domain
    # (a, b < 2p: value < 22p + 2 * 6.3p complement inflation < 35p)
    got = run_lt(
        lambda a_, b_: lt.to_l16(lt.canon_k(
            lt.sub(lt.sub(lt.mul9(a_) + a_ + a_, b_), b_), 40)),
        (16, B), a, b)
    assert dec16(got) == [
        (11 * x - 2 * y) % FQ.p for x, y in zip(xs, ys)]


def test_canon_k_bounds():
    for mult in (0, 1, 2, 5, 14):
        v = mult * FQ.p + 12345
        cols = jnp.asarray(lt._limbs(v))[:, None]
        out = run_lt(lambda c: lt.canon_k(c, 16), (lt.NL, 1), cols)
        raw = sum(int(x) << (16 * i)
                  for i, x in enumerate(np.asarray(out)[:, 0]))
        assert raw == v % FQ.p, mult


def test_fq2_layer_vs_tower(rng):
    xs = rand_fq(rng, 8)
    B = 2
    a2 = FQ.encode(xs[:4]).reshape(2, 2, FQ.L)      # 2 Fq2 elements
    b2 = FQ.encode(xs[4:]).reshape(2, 2, FQ.L)
    at = jnp.transpose(a2, (1, 2, 0))               # (2, L, B)
    bt = jnp.transpose(b2, (1, 2, 0))
    a = run_lt(lt.from_l16, (2, lt.NL, B), at)
    b = run_lt(lt.from_l16, (2, lt.NL, B), bt)

    def back(x):
        return np.asarray(jnp.transpose(x, (2, 0, 1)))

    got = run_lt(lambda x, y: lt.to_l16(lt.fq2_mul(x, y)),
                 (2, 16, B), a, b)
    want = T.fq2_mul(a2, b2)
    assert (back(got) == np.asarray(want)).all()

    got = run_lt(lambda x, y: lt.to_l16(lt.fq2_mul_xi(lt.fq2_mul(x, y))),
                 (2, 16, B), a, b)
    assert (back(got) == np.asarray(T.fq2_mul_xi(want))).all()

    got = run_lt(lambda x, y: lt.to_l16(lt.fq2_conj(lt.fq2_mul(x, y))),
                 (2, 16, B), a, b)
    assert (back(got) == np.asarray(T.fq2_conj(want))).all()


def test_fq12_flat_mul_vs_tower(rng):
    """Flat-expansion fq12_mul (one norm + one 54-lane multiply + one exit
    canon) == tower fq12_mul, bit-exact after domain conversion."""
    xs, ys = rand_fq(rng, 12), rand_fq(rng, 12)
    a = FQ.encode(xs).reshape(2, 3, 2, FQ.L)
    b = FQ.encode(ys).reshape(2, 3, 2, FQ.L)
    at = a[..., None]                    # transposed layout (2,3,2,L,B=1)
    bt = b[..., None]

    def run(fn, *xs_):
        return run_lt(fn, (2, 3, 2, lt.NL, 1), *xs_)

    a17 = run(lt.from_l16, at)
    b17 = run(lt.from_l16, bt)
    got17 = run(lambda x, y: lt.fq12_mul(x, y), a17, b17)
    got = run_lt(lt.to_l16, (2, 3, 2, 16, 1), got17)[..., 0]
    want = T.fq12_mul(a[None], b[None])[0]
    assert (np.asarray(got) == np.asarray(want)).all()


def test_fq12_flat_cyclo_vs_tower(rng):
    """Flat-expansion cyclotomic squaring == tower fq12_cyclo_sqr on a
    cyclotomic-subgroup element; chained twice to prove composability."""
    from sipp_tpu.pairing.ate import _easy_part

    xs = rand_fq(rng, 12)
    g = _easy_part(FQ.encode(xs).reshape(1, 2, 3, 2, FQ.L))[0]
    gt = g[..., None]

    def run(fn, *xs_):
        return run_lt(fn, (2, 3, 2, lt.NL, 1), *xs_)

    g17 = run(lt.from_l16, gt)
    got17 = run(lambda x: lt.fq12_cyclo_sqr(lt.fq12_cyclo_sqr(x)), g17)
    got = run_lt(lt.to_l16, (2, 3, 2, 16, 1), got17)[..., 0]
    want = T.fq12_cyclo_sqr(T.fq12_cyclo_sqr(g[None]))[0]
    assert (np.asarray(got) == np.asarray(want)).all()


def test_fq12_flat_conj_frob_vs_tower(rng):
    """Flat conj + frob == tower (frob constants converted to the L17
    domain by l17_mont_table)."""
    from sipp_tpu.ops.pallas_fexp import FROB_NP

    xs = rand_fq(rng, 12)
    a = FQ.encode(xs).reshape(2, 3, 2, FQ.L)
    at = a[..., None]
    frob17 = jnp.asarray(lt.l17_mont_table(FROB_NP))

    def run(fn, *xs_):
        return run_lt(fn, (2, 3, 2, lt.NL, 1), *xs_)

    a17 = run(lt.from_l16, at)
    got = run_lt(lambda x: lt.to_l16(lt.fq12_conj(x)),
                 (2, 3, 2, 16, 1), a17)[..., 0]
    assert (np.asarray(got) == np.asarray(T.fq12_conj(a[None])[0])).all()

    for k in (1, 2, 3):
        got17 = run(lambda x, f, k=k: lt.fq12_frob(x, f, k), a17, frob17)
        got = run_lt(lt.to_l16, (2, 3, 2, 16, 1), got17)[..., 0]
        want = T.fq12_frob(a[None], k)[0]
        assert (np.asarray(got) == np.asarray(want)).all(), k
