"""Deep-sharded + production-scale CPU coverage (VERDICT r4 next-6/next-10).

n=64 over an 8-device mesh runs THREE communication-free sharded fold
rounds (64 -> 32 -> 16 -> 8) before the gathered tail — the multi-round
cyclic-layout regime BASELINE configs 4/5 operate in, which the n=16/d=8
test exercises for only ONE round.  The sharded proof must be BIT-IDENTICAL
to the single-device prover's (which itself must verify end-to-end).  The
single-device n=64 run is also the reference's own scale point
(/root/reference/src/verifier_native.rs:99 tests n=64) at default config —
no shrunk pad floors or Miller chunks (VERDICT r4 next-10).

Slow-gated: the width-64 XLA:CPU programs compile in tens of minutes; run
with SIPP_SLOW_TESTS=1 (the default suite covers the same machinery at
n<=16 via test_sharding*, test_wide_rounds).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from sipp_tpu.utils.testing import random_instance

slow = pytest.mark.skipif(
    os.environ.get("SIPP_SLOW_TESTS") != "1",
    reason="width-64 CPU compiles are tens of minutes; SIPP_SLOW_TESTS=1",
)


@pytest.fixture(scope="module")
def ref64():
    from sipp_tpu.protocol import sipp_prove

    a, b = random_instance(64, seed=64)
    return a, b, np.asarray(sipp_prove(a, b))


@slow
def test_n64_e2e_single_device(ref64):
    """Default-config n=64 prove -> verify roundtrip (multi-wide-round
    interaction at production shape, off-TPU)."""
    from sipp_tpu.fields import tower as T
    from sipp_tpu.protocol import sipp_verify

    a, b, proof = ref64
    assert proof.shape[0] == 2 * 6 + 1      # 2*log2(64)+1 (prover_native.rs)
    stmt = sipp_verify(a, b, jnp.asarray(proof))
    assert stmt.Z == T.fq12_decode(jnp.asarray(proof[-1:]))[0]


@slow
def test_n64_sharded_8dev_bit_identical(ref64):
    """>= 3 consecutive communication-free sharded rounds + gathered tail
    == single-device proof, bit-exact."""
    from sipp_tpu.parallel import make_mesh, sipp_prove_sharded

    a, b, proof = ref64
    mesh = make_mesh(8)
    p2 = sipp_prove_sharded(a, b, mesh)
    assert np.array_equal(np.asarray(p2), proof)
