"""Poseidon permutation over Goldilocks (width 12, rate 8, capacity 4).

Replaces plonky2's `hash_n_to_hash_no_pad::<F, PoseidonPermutation<F>>` used
by the reference transcript (/root/reference/src/transcript_native.rs:27;
SURVEY.md D6/D12).  The permutation follows plonky2's Hades structure exactly:
width 12 over p = 2^64 - 2^32 + 1, x^7 S-box, 8 full rounds (4 + 4) around 22
partial rounds (S-box on lane 0 only), round constants added before each
S-box layer, then an MDS matrix multiply.  The MDS matrix is plonky2's
circulant [17,15,41,16,2,28,13,13,39,18,34,20] with +8 on the (0,0) entry.

NOTE ON CONSTANTS: plonky2's 360 round constants are not derivable in this
offline environment (the dependency is not vendored; SURVEY.md §4 notes the
reference Rust is not runnable here, and the table is not Grain-LFSR
reproducible).  The round-5 exhaustive attempt is committed as
tools/grain_poseidon.py: a faithful implementation of the canonical
hadeshash `generate_parameters_grain.sage` generator (80-bit LFSR, taps
62/51/38/23/13/0, 160 warm-up rounds, pair-shrinking output rule,
MSB-first 64-bit assembly with rejection sampling) swept over 3,456
parameterizations (field tag, sbox tag, field-size 63/64, t 8/11/12,
R_F 4/8, R_P 22/41/56, init/output bit order, shrinking on/off) — NONE
reproduces the recalled prefix of plonky2's ALL_ROUND_CONSTANTS (first
element 0xb585f766f2144405); the canonical parameterization yields
0x13dcf33aba214f46.  plonky2's table therefore does not come from the
documented Poseidon reference generator.  The constants here are instead
generated deterministically below (SHA-256 counter mode, domain-separated,
rejection sampling into the field).  The permutation structure, widths,
absorb rule, and every byte of the transcript encoding contract
(SURVEY.md §2.4) are bit-exact to the reference.

SWAP HOOK: set SIPP_POSEIDON_RC_FILE to a file holding the 360 u64 round
constants (JSON list, or whitespace/comma-separated decimal/hex ints, row-
major round-then-lane — plonky2's ALL_ROUND_CONSTANTS order) and EVERY
engine (host Python, device kernels, native C++ chain via
native.sipp_set_constants) picks them up at import: the day plonky2's table
is available, full cross-implementation hash equality is a file drop plus
regenerating the golden vectors (tests/test_poseidon_transcript.py).

Both a host (pure Python int) and a device (vectorized jnp over the FGL limb
field) implementation are provided and differentially tested.
"""

import hashlib
import os

import jax
import jax.numpy as jnp
import numpy as np

from .. import params
from . import FGL

P = params.GOLDILOCKS_P
WIDTH = 12
RATE = 8
N_FULL = 4      # full rounds on each side
N_PARTIAL = 22
N_ROUNDS = 2 * N_FULL + N_PARTIAL

MDS_CIRC = [17, 15, 41, 16, 2, 28, 13, 13, 39, 18, 34, 20]
MDS_DIAG0 = 8
# MDS[r][c] = CIRC[(c - r) mod 12] (+ 8 at r == c == 0)
MDS = [
    [MDS_CIRC[(c - r) % WIDTH] + (MDS_DIAG0 if r == 0 and c == 0 else 0)
     for c in range(WIDTH)]
    for r in range(WIDTH)
]


def _gen_round_constants():
    out = []
    ctr = 0
    while len(out) < N_ROUNDS * WIDTH:
        h = hashlib.sha256(b"sipp-tpu poseidon goldilocks rc %d" % ctr).digest()
        ctr += 1
        for off in range(0, 32, 8):
            v = int.from_bytes(h[off : off + 8], "little")
            if v < P:  # rejection sampling: uniform in the field
                out.append(v)
    return [out[r * WIDTH : (r + 1) * WIDTH] for r in range(N_ROUNDS)]


def _load_round_constants(path):
    """External table hook (see module docstring): 360 u64s, row-major
    round-then-lane.  Accepts a JSON list or whitespace/comma-separated
    decimal/0x-hex integers."""
    with open(path) as f:
        text = f.read()
    try:
        import json

        vals = [int(v) for v in json.loads(text)]
    except ValueError:
        vals = [int(tok, 0) for tok in text.replace(",", " ").split()]
    if len(vals) != N_ROUNDS * WIDTH:
        raise ValueError(
            f"SIPP_POSEIDON_RC_FILE {path}: expected {N_ROUNDS * WIDTH} "
            f"constants, got {len(vals)}")
    bad = [v for v in vals if not 0 <= v < 2**64]
    if bad:
        raise ValueError(f"SIPP_POSEIDON_RC_FILE {path}: out-of-range {bad[:3]}")
    # plonky2 adds constants as unreduced u64s into Goldilocks arithmetic;
    # reduce on load so all three engines see canonical field elements
    vals = [v % P for v in vals]
    return [vals[r * WIDTH : (r + 1) * WIDTH] for r in range(N_ROUNDS)]


_RC_FILE = os.environ.get("SIPP_POSEIDON_RC_FILE")
ROUND_CONSTANTS = (
    _load_round_constants(_RC_FILE) if _RC_FILE else _gen_round_constants()
)


# ------------------------------------------------------------------- host

def _sbox(x):
    x2 = (x * x) % P
    x4 = (x2 * x2) % P
    return (x4 * x2 % P) * x % P


def permute(state):
    """One Poseidon permutation on a 12-list of ints."""
    s = [x % P for x in state]
    for r in range(N_ROUNDS):
        s = [(x + c) % P for x, c in zip(s, ROUND_CONSTANTS[r])]
        if N_FULL <= r < N_FULL + N_PARTIAL:
            s[0] = _sbox(s[0])
        else:
            s = [_sbox(x) for x in s]
        s = [sum(MDS[i][j] * s[j] for j in range(WIDTH)) % P for i in range(WIDTH)]
    return s


def hash_no_pad(inputs):
    """plonky2 hash_n_to_hash_no_pad: overwrite-absorb in rate-8 chunks,
    output = first 4 state elements (reference transcript_native.rs:27)."""
    state = [0] * WIDTH
    for i in range(0, len(inputs), RATE):
        chunk = inputs[i : i + RATE]
        state[: len(chunk)] = [x % P for x in chunk]
        state = permute(state)
    return state[:4]


# ------------------------------------------------------------------ device

_RC_MONT = jnp.asarray(
    np.stack(
        [
            np.stack([np.asarray(FGL.encode(c)) for c in row])
            for row in ROUND_CONSTANTS
        ]
    )
)  # (30, 12, 5) Montgomery limbs

_MDS_MONT = jnp.asarray(
    np.stack([np.stack([np.asarray(FGL.encode(v)) for v in row]) for row in MDS])
)  # (12, 12, 5)


def _sbox_dev(x):
    x2 = FGL.mul(x, x)
    x4 = FGL.mul(x2, x2)
    return FGL.mul(FGL.mul(x4, x2), x)


@jax.jit
def permute_device(state):
    """Vectorized permutation: state (..., 12, 5) Montgomery Goldilocks limbs."""

    def round_fn(s, inp):
        rc, is_full = inp
        s = FGL.add(s, rc)
        all_sb = _sbox_dev(s)
        lane0 = jnp.concatenate([all_sb[..., :1, :], s[..., 1:, :]], axis=-2)
        s = jnp.where(is_full, all_sb, lane0)
        # MDS: out[i] = sum_j MDS[i][j] * s[j] — one stacked mul + tree add
        prod = FGL.mul(_MDS_MONT, s[..., None, :, :])  # (..., 12, 12, 5)
        t = prod
        k = WIDTH
        while k > 1:  # exact: each FGL.add reduces mod p
            half = k // 2
            head = FGL.add(t[..., :half, :], t[..., half : 2 * half, :])
            if k % 2:
                head = jnp.concatenate([head, t[..., 2 * half :, :]], axis=-2)
            t = head
            k = half + (k % 2)
        return t[..., 0, :], None

    is_full = jnp.asarray(
        np.array(
            [1 if (r < N_FULL or r >= N_FULL + N_PARTIAL) else 0
             for r in range(N_ROUNDS)],
            dtype=np.uint32,
        )
    )
    out, _ = jax.lax.scan(round_fn, state, (_RC_MONT, is_full))
    return out


@jax.jit
def hash_no_pad_device(inputs):
    """Device hash_n_to_hash_no_pad: inputs (..., K, 5) Montgomery limbs,
    K a static multiple-free length; returns (..., 4, 5)."""
    K = inputs.shape[-2]
    state = jnp.zeros(inputs.shape[:-2] + (WIDTH, FGL.L), jnp.uint32)
    for i in range(0, K, RATE):
        chunk = inputs[..., i : min(i + RATE, K), :]
        w = chunk.shape[-2]
        state = jnp.concatenate([chunk, state[..., w:, :]], axis=-2)
        state = permute_device(state)
    return state[..., :4, :]
