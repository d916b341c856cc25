"""Differential tests of the limb-field layer against Python big-int arithmetic.

Mirrors the reference test strategy (SURVEY.md §4): every kernel is checked
against an independent oracle — here Python ints mod p."""

import numpy as np
import jax.numpy as jnp
import pytest

from sipp_tpu.fields import FQ, FR, FGL


FIELDS = [FQ, FR, FGL]


def rand_ints(rng, F, n):
    return [int.from_bytes(rng.bytes(40), "little") % F.p for _ in range(n)]


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
def test_codec_roundtrip(F, rng):
    xs = rand_ints(rng, F, 8)
    enc = F.encode(xs)
    assert F.decode(enc) == xs
    enc_raw = F.encode(xs, mont=False)
    assert F.decode(enc_raw, mont=False) == xs


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
def test_add_sub_neg(F, rng):
    xs = rand_ints(rng, F, 16)
    ys = rand_ints(rng, F, 16)
    a, b = F.encode(xs), F.encode(ys)
    assert F.decode(F.add(a, b)) == [(x + y) % F.p for x, y in zip(xs, ys)]
    assert F.decode(F.sub(a, b)) == [(x - y) % F.p for x, y in zip(xs, ys)]
    assert F.decode(F.neg(a)) == [(-x) % F.p for x in xs]
    # edge cases: 0, p-1
    e = F.encode([0, F.p - 1, 1])
    assert F.decode(F.add(e, e)) == [0, (2 * (F.p - 1)) % F.p, 2]
    assert F.decode(F.neg(e)) == [0, 1, F.p - 1]


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
def test_mul(F, rng):
    xs = rand_ints(rng, F, 16)
    ys = rand_ints(rng, F, 16)
    a, b = F.encode(xs), F.encode(ys)
    assert F.decode(F.mul(a, b)) == [(x * y) % F.p for x, y in zip(xs, ys)]
    # identity, zero, p-1 squared
    e = F.encode([1, 0, F.p - 1])
    assert F.decode(F.mul(e, e)) == [1, 0, ((F.p - 1) ** 2) % F.p]


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
def test_pow_inv(F, rng):
    xs = rand_ints(rng, F, 4)
    a = F.encode(xs)
    assert F.decode(F.pow_static(a, 5)) == [pow(x, 5, F.p) for x in xs]
    assert F.decode(F.inv(a)) == [pow(x, -1, F.p) if x else 0 for x in xs]
    # Fermat: x^(p-1) == 1
    assert F.decode(F.pow_static(a, F.p - 1)) == [1 if x else 0 for x in xs]


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
def test_batch_inv(F, rng):
    xs = rand_ints(rng, F, 9)
    xs[3] = 0  # zero lane maps to zero
    a = F.encode(xs)
    got = F.decode(F.batch_inv(a))
    assert got == [pow(x, -1, F.p) if x else 0 for x in xs]


def test_broadcasting(rng):
    F = FQ
    xs = rand_ints(rng, F, 6)
    a = F.encode(xs).reshape(2, 3, F.L)
    y = rand_ints(rng, F, 1)[0]
    b = F.encode(y)  # (L,) broadcasts against (2,3,L)
    got = np.array(F.decode(F.mul(a, b)))
    want = np.array([(x * y) % F.p for x in xs]).reshape(2, 3)
    assert (got == want).all()
