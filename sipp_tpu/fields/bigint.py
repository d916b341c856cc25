"""Host-side codecs between Python ints and little-endian 16-bit limb arrays.

The device representation of a field element throughout this framework is a
little-endian vector of L 16-bit limbs stored in uint32 (see fields/fp.py for
why).  These helpers convert between that representation and Python ints /
u32-digit lists on the host, and are also used by the statement codec
(reference /root/reference/src/statements.rs:90-131 uses 8 u32 limbs per Fq;
here an Fq is 16 x 16-bit limbs on device and 8 x u32 limbs on the wire).
"""

import numpy as np

MASK16 = 0xFFFF


def int_to_limbs(x: int, num_limbs: int) -> np.ndarray:
    """Python int -> little-endian 16-bit limbs as uint32 array of shape (num_limbs,)."""
    assert x >= 0
    out = np.empty(num_limbs, dtype=np.uint32)
    for i in range(num_limbs):
        out[i] = x & MASK16
        x >>= 16
    assert x == 0, "value does not fit in num_limbs 16-bit limbs"
    return out


def limbs_to_int(limbs) -> int:
    """Little-endian 16-bit limb array -> Python int."""
    x = 0
    arr = np.asarray(limbs, dtype=np.uint64)
    for i in range(arr.shape[-1] - 1, -1, -1):
        x = (x << 16) | int(arr[..., i])
    return x


def ints_to_limbs(xs, num_limbs: int) -> np.ndarray:
    """List of ints -> (len(xs), num_limbs) uint32 array."""
    return np.stack([int_to_limbs(x, num_limbs) for x in xs])


def limbs_to_ints(arr) -> list:
    """(..., num_limbs) array -> nested list of Python ints over leading dims."""
    arr = np.asarray(arr)
    if arr.ndim == 1:
        return limbs_to_int(arr)
    return [limbs_to_ints(a) for a in arr]


def int_to_u32_digits(x: int, num_digits: int) -> list:
    """Python int -> fixed-length little-endian u32 digit list (wire format,
    reference transcript_native.rs:68-77: 8 u32 digits per Fq)."""
    out = []
    for _ in range(num_digits):
        out.append(x & 0xFFFFFFFF)
        x >>= 32
    assert x == 0
    return out


def u32_digits_to_int(digits) -> int:
    x = 0
    for d in reversed(list(digits)):
        x = (x << 32) | int(d)
    return x
