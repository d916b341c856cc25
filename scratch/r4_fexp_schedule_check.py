"""Fast CPU check of the round-4 compact fexp kernel SCHEDULE (not the ref
mechanics): mirrors _fexp_kernel's control flow — chains via _X_SET_POWS
tree, tape split at _TAPE_NLOOP, static tail — using the XLA tower ops, and
compares bit-exact against pairing.final_exp.  Run:
    JAX_PLATFORMS=cpu PYTHONPATH= python scratch/r4_fexp_schedule_check.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from sipp_tpu import params
from sipp_tpu.fields import FQ, tower as T
from sipp_tpu.pairing.ate import _TAPE, _easy_part, final_exp
from sipp_tpu.ops.pallas_fexp import _X_BITS, _X_NBITS, _X_SET_POWS, _TAPE_NLOOP

rng = np.random.default_rng(7)
xs = [int.from_bytes(rng.bytes(40), "little") % FQ.p for _ in range(12)]
f = FQ.encode(xs).reshape(1, 2, 3, 2, FQ.L)

# mirror of the kernel schedule with the XLA tower
g = _easy_part(f)
regs = {0: g}


def powx_mirror(v):
    sq = {}
    s = v
    for j in range(_X_NBITS - 1):
        sq[j] = s
        s = T.fq12_cyclo_sqr(s)
    sq[_X_NBITS - 1] = s
    vals = [sq[j] for j in _X_SET_POWS]
    while len(vals) > 1:
        h = len(vals) // 2
        prod = [T.fq12_mul(vals[i], vals[h + i]) for i in range(h)]
        vals = prod + vals[2 * h:]
    return vals[0]


for k in range(3):
    regs[k + 1] = powx_mirror(regs[k])

tape = _TAPE
assert not tape[:_TAPE_NLOOP, 3].any(), "loop rows must have no post-op"
assert tape.shape[0] - _TAPE_NLOOP == 7
for i in range(_TAPE_NLOOP):
    dst, s1, s2, _ = tape[i]
    regs[int(dst)] = T.fq12_mul(regs[int(s1)], regs[int(s2)])
for dst, s1, s2, post in tape[_TAPE_NLOOP:].tolist():
    v = T.fq12_mul(regs[s1], regs[s2])
    if post == 1:
        v = T.fq12_conj(v)
    elif post == 2:
        v = T.fq12_frob(v, 1)
    elif post == 3:
        v = T.fq12_frob(v, 2)
    regs[dst] = v
out = T.fq12_mul(regs[5], T.fq12_frob(regs[0], 3))

want = final_exp(f)
ok = (np.asarray(out) == np.asarray(want)).all()
print("powx check:", (np.asarray(powx_mirror(g)) ==
                      np.asarray(T.fq12_pow_static(g, params.X))).all())
print("schedule check:", ok)
assert ok
