"""G1 (over Fq) and G2 (over Fq2) curve ops + host codecs.

TPU-native replacement for ark-ec curve arithmetic (SURVEY.md D3/D4).
"""

import jax.numpy as jnp
import numpy as np

from .. import params
from ..fields import FQ, tower
from .weierstrass import CurveOps

F = FQ


class _FqAdapter:
    ndim = 1
    mul = staticmethod(F.mul)
    add = staticmethod(F.add)
    sub = staticmethod(F.sub)
    neg = staticmethod(F.neg)
    double = staticmethod(F.double)
    inv = staticmethod(F.inv)
    is_zero = staticmethod(F.is_zero)

    @staticmethod
    def zero():
        return jnp.zeros((F.L,), jnp.uint32)

    @staticmethod
    def one():
        return F.one_mont


class _Fq2Adapter:
    ndim = 2
    mul = staticmethod(tower.fq2_mul)
    add = staticmethod(tower.fq2_add)
    sub = staticmethod(tower.fq2_sub)
    neg = staticmethod(tower.fq2_neg)
    double = staticmethod(F.double)
    inv = staticmethod(tower.fq2_inv)
    is_zero = staticmethod(tower.fq2_is_zero)

    @staticmethod
    def zero():
        return jnp.zeros((2, F.L), jnp.uint32)

    @staticmethod
    def one():
        return tower.fq2_encode((1, 0))


G1 = CurveOps(_FqAdapter(), "G1")
G2 = CurveOps(_Fq2Adapter(), "G2")


# ------------------------------------------------------------- host codecs

def g1_encode(points):
    """Host affine points [(x, y), ...] (or one) -> (..., 2, L) Montgomery.
    None (infinity) encodes as (0, 0).  Builds on host, one device transfer."""
    from ..fields import bigint

    if points is None or (isinstance(points, tuple) and isinstance(points[0], int)):
        x, y = points if points is not None else (0, 0)
        return F.encode([x, y])
    vals = []
    for p in points:
        x, y = p if p is not None else (0, 0)
        vals += [(x * F.R) % F.p, (y * F.R) % F.p]
    arr = bigint.ints_to_limbs(vals, F.L).reshape(len(points), 2, F.L)
    return jnp.asarray(arr)


def _decode_fq_ints(arr):
    """(..., L) Montgomery device array -> flat list of canonical ints, pure
    host path: ONE transfer, bulk byte repack, one 256-bit modmul per element
    (no per-shape device program, no per-limb Python loop) — this is the
    serial-spine prologue decode, sized for n = 65536 (SURVEY.md §2.4.4)."""
    import jax
    from ..fields import bigint

    np_arr = np.asarray(jax.device_get(arr))
    vals = bigint.limbs16_to_ints_fast(np_arr)
    rinv = pow(F.R, -1, F.p)
    return [(v * rinv) % F.p for v in vals]


def g1_decode(arr):
    flat = _decode_fq_ints(arr.reshape(-1, F.L))
    pts = np.array(flat, dtype=object).reshape(arr.shape[:-1])

    def rec(x):
        if x.ndim == 1:
            return None if (x[0] == 0 and x[1] == 0) else (int(x[0]), int(x[1]))
        return [rec(v) for v in x]

    return rec(pts)


def g2_encode(points):
    """Host affine G2 points [((x0,x1),(y0,y1)), ...] -> (..., 2, 2, L).
    Builds on host, one device transfer."""
    from ..fields import bigint

    if points is None:
        return jnp.zeros((2, 2, F.L), jnp.uint32)
    if isinstance(points, tuple) and isinstance(points[0][0], int):
        return tower.fq2_encode(list(points))
    vals = []
    for p in points:
        ((x0, x1), (y0, y1)) = p if p is not None else ((0, 0), (0, 0))
        vals += [(v * F.R) % F.p for v in (x0, x1, y0, y1)]
    arr = bigint.ints_to_limbs(vals, F.L).reshape(len(points), 2, 2, F.L)
    return jnp.asarray(arr)


def g2_decode(arr):
    flat = _decode_fq_ints(arr.reshape(-1, F.L))
    vals = [(flat[i], flat[i + 1]) for i in range(0, len(flat), 2)]
    out = []
    for i in range(0, len(vals), 2):
        x, y = vals[i], vals[i + 1]
        out.append(None if x == (0, 0) and y == (0, 0) else (x, y))
    shape = arr.shape[:-3]
    if shape == ():
        return out[0]
    res = np.empty(len(out), dtype=object)
    res[:] = out
    return [list(r) if isinstance(r, np.ndarray) else r
            for r in res.reshape(shape).tolist()]


def scalar_to_bits(k: int, width: int = 254) -> np.ndarray:
    """Scalar -> MSB-first uint32 bit array of fixed width (for scalar_mul).
    Returns a HOST array: jit call sites transfer it as part of the dispatch
    instead of paying a separate eager device_put round trip."""
    assert 0 <= k < (1 << width)
    return np.array(
        [(k >> (width - 1 - i)) & 1 for i in range(width)], dtype=np.uint32
    )
