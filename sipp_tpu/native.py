"""Loader for the native (C++) host kernels in csrc/.

Builds csrc/libsipp_host.so on first use if g++ is available; injects the
Poseidon constants from fields/poseidon.py (single source of truth).  All
callers must fall back to the pure-Python path when `get_lib()` is None —
the native library is a fast path, never a semantic dependency.
"""

import ctypes
import os
import pathlib
import subprocess

import numpy as np

_REPO = pathlib.Path(__file__).resolve().parent.parent
_SO = _REPO / "csrc" / "libsipp_host.so"
_lib = None
_tried = False


def get_lib():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("SIPP_TPU_NO_NATIVE"):
        return None
    try:
        if not _SO.exists() or _SO.stat().st_mtime < (_SO.parent / "sipp_host.cpp").stat().st_mtime:
            subprocess.run(
                ["make", "-C", str(_SO.parent)],
                check=True, capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(str(_SO))
    except Exception:
        return None

    lib.sipp_set_constants.argtypes = [
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64)]
    lib.sipp_poseidon_permute.argtypes = [ctypes.POINTER(ctypes.c_uint64)]
    lib.sipp_hash_no_pad.argtypes = [
        ctypes.POINTER(ctypes.c_uint64), ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_uint64)]
    lib.sipp_transcript_absorb.argtypes = [
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_size_t), ctypes.c_size_t]

    from .fields import poseidon

    rc = np.asarray(poseidon.ROUND_CONSTANTS, dtype=np.uint64).ravel()
    mds = np.asarray(poseidon.MDS, dtype=np.uint64).ravel()
    lib.sipp_set_constants(
        rc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        mds.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
    )

    # BN254 constants (Montgomery, 4x64 limbs), injected from params/hostref
    from . import hostref, params

    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.sipp_bn254_init.argtypes = [u64p, ctypes.c_uint64, u64p, u64p, u64p,
                                    ctypes.c_uint64]
    for name in ("sipp_fq12_mul", "sipp_fq12_pow", "sipp_fq12_final_exp"):
        getattr(lib, name).argtypes = [u64p] * (3 if name != "sipp_fq12_final_exp" else 2)
    lib.sipp_fq12_product.argtypes = [u64p, ctypes.c_uint64, u64p]

    def limbs64(x, n=4):
        return [(x >> (64 * i)) & 0xFFFFFFFFFFFFFFFF for i in range(n)]

    R = 1 << 256
    p_arr = np.asarray(limbs64(params.P), dtype=np.uint64)
    n0 = (-pow(params.P, -1, 1 << 64)) % (1 << 64)
    r2_arr = np.asarray(limbs64((R * R) % params.P), dtype=np.uint64)
    one_m = np.asarray(limbs64(R % params.P), dtype=np.uint64)
    frob = np.zeros((3, 6, 2, 4), dtype=np.uint64)
    for k in (1, 2, 3):
        for m in range(6):
            c = hostref.fq2_pow(params.XI, (params.P**k - 1) * m // 6)
            for u in range(2):
                frob[k - 1, m, u] = limbs64((c[u] * R) % params.P)
    lib.sipp_bn254_init(
        p_arr.ctypes.data_as(u64p), n0, r2_arr.ctypes.data_as(u64p),
        one_m.ctypes.data_as(u64p), frob.ravel().ctypes.data_as(u64p),
        params.X,
    )
    _lib = lib
    return _lib


def _fq12_call(fn_name, *arrays):
    """Invoke a C Fq12 op on (12, 4) uint64 Montgomery coefficient arrays."""
    lib = get_lib()
    import ctypes as ct

    u64p = ct.POINTER(ct.c_uint64)
    args = [np.ascontiguousarray(a, dtype=np.uint64) for a in arrays]
    out = np.zeros((12, 4), dtype=np.uint64)
    getattr(lib, fn_name)(*([a.ctypes.data_as(u64p) for a in args]
                            + [out.ctypes.data_as(u64p)]))
    return out


def fq12_final_exp(f_12x4):
    return _fq12_call("sipp_fq12_final_exp", f_12x4)


def fq12_pow(f_12x4, exp_int):
    e = np.asarray([(exp_int >> (64 * i)) & 0xFFFFFFFFFFFFFFFF
                    for i in range(4)], dtype=np.uint64)
    return _fq12_call("sipp_fq12_pow", f_12x4, e)


def fq12_mul(a_12x4, b_12x4):
    return _fq12_call("sipp_fq12_mul", a_12x4, b_12x4)


def fq12_product(fs_nx12x4) -> np.ndarray:
    """Product of a (n, 12, 4) batch of Fq12 elements (pairwise-tree order,
    bit-identical to pairing._product_tree)."""
    lib = get_lib()
    import ctypes as ct

    u64p = ct.POINTER(ct.c_uint64)
    arr = np.ascontiguousarray(fs_nx12x4, dtype=np.uint64)
    out = np.zeros((12, 4), dtype=np.uint64)
    lib.sipp_fq12_product(arr.ctypes.data_as(u64p), arr.shape[0],
                          out.ctypes.data_as(u64p))
    return out


# Device (...,2,3,2,16)x16-bit <-> native (...,12,4)x64-bit Montgomery limb
# codecs.  Same Montgomery radix R = 2^256 on both sides: pure bit repacking.

def fq12_dev_to_u64(arr) -> np.ndarray:
    a = np.asarray(arr, dtype=np.uint64)
    batch = a.shape[:-4]
    a = a.reshape(*batch, 12, 16)
    out = np.zeros(batch + (12, 4), np.uint64)
    for k in range(4):
        for t in range(4):
            out[..., k] |= a[..., 4 * k + t] << np.uint64(16 * t)
    return out


def u64_to_fq12_dev(arr) -> np.ndarray:
    a = np.asarray(arr, dtype=np.uint64)
    batch = a.shape[:-2]
    out = np.zeros(batch + (12, 16), np.uint32)
    for k in range(4):
        for t in range(4):
            out[..., 4 * k + t] = ((a[..., k] >> np.uint64(16 * t))
                                   & np.uint64(0xFFFF)).astype(np.uint32)
    return out.reshape(*batch, 2, 3, 2, 16)


def fq12_u64_to_tower_ints(arr):
    """Host decode: (12, 4) uint64 Montgomery coeffs -> nested tower int
    tuple ((c0,c1) x3) x2, same format as tower.fq12_decode — pure Python,
    no device ops (prover hot path: transcript appends)."""
    from . import params

    rinv = pow(1 << 256, -1, params.P)

    def val(l4):
        x = (int(l4[0]) | int(l4[1]) << 64 | int(l4[2]) << 128
             | int(l4[3]) << 192)
        return (x * rinv) % params.P

    flat = [val(arr[k]) for k in range(12)]
    return tuple(
        tuple((flat[i * 6 + j * 2], flat[i * 6 + j * 2 + 1]) for j in range(3))
        for i in range(2)
    )


def hash_no_pad(inputs) -> list:
    """Native hash_n_to_hash_no_pad; caller guarantees get_lib() is not None."""
    lib = get_lib()
    arr = np.asarray(inputs, dtype=np.uint64)
    out = np.zeros(4, dtype=np.uint64)
    lib.sipp_hash_no_pad(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), arr.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
    return [int(x) for x in out]


def transcript_absorb(state4, msgs) -> list:
    """Run the hash chain over a list of messages natively."""
    flat = np.asarray([x for m in msgs for x in m], dtype=np.uint64)
    lens = np.asarray([len(m) for m in msgs], dtype=np.uintp)
    return transcript_absorb_flat(state4, flat, lens)


def transcript_absorb_flat(state4, flat, lens) -> list:
    """Hash chain over pre-flattened message elements (bulk prologue path):
    flat: (sum(lens),) uint64; lens: (num_msgs,) uintp."""
    lib = get_lib()
    st = np.asarray(state4, dtype=np.uint64).copy()
    flat = np.ascontiguousarray(flat, dtype=np.uint64)
    lens = np.ascontiguousarray(lens, dtype=np.uintp)
    lib.sipp_transcript_absorb(
        st.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_size_t)),
        len(lens),
    )
    return [int(x) for x in st]
