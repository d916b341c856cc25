"""Sharded prover == single-device prover, bit-exactly (SURVEY.md §4)."""

import numpy as np
import jax

from sipp_tpu.parallel import make_mesh, shard_cyclic, sipp_prove_sharded, unshard
from sipp_tpu.protocol import sipp_prove, sipp_verify
from sipp_tpu.utils.testing import random_instance


def test_shard_cyclic_roundtrip():
    import jax.numpy as jnp

    mesh = make_mesh(4)
    x = jnp.arange(8 * 3).reshape(8, 3).astype(jnp.uint32)
    s = shard_cyclic(x, mesh)
    assert s.shape == (2, 4, 3)
    assert (unshard(s) == x).all()
    # device k holds global indices {l*d + k}
    assert (np.asarray(s)[1, 2] == np.asarray(x)[6]).all()


def test_sharded_prove_matches_single():
    mesh = make_mesh(4)
    a, b = random_instance(8, seed=5)
    proof_single = sipp_prove(a, b)
    proof_sharded = sipp_prove_sharded(a, b, mesh)
    assert (np.asarray(proof_single) == np.asarray(proof_sharded)).all()
    sipp_verify(a, b, proof_sharded)
