"""On-chip prover coverage: sipp_prove_onchip must be bit-identical to the
host-spine sipp_prove (reference semantics prover_native.rs:26-80).

On CPU the on-chip prover runs the same control flow (device transcript,
on-device challenge + Fr inversion, scanned fixed-width rounds) over the XLA
kernels; on TPU the fused Pallas kernels slot in (bit-identical,
differentially tested in tests/test_pallas.py)."""

import numpy as np

from sipp_tpu.protocol import sipp_prove, sipp_verify
from sipp_tpu.protocol.prover import sipp_prove_onchip
from sipp_tpu.utils.testing import random_instance


def test_onchip_prover_bit_identical_n4():
    a, b = random_instance(4, seed=211)
    proof_host, tr_host = sipp_prove(a, b, return_transcript=True)
    proof_chip, tr_chip = sipp_prove_onchip(a, b, return_transcript=True)
    assert np.array_equal(np.asarray(proof_chip), np.asarray(proof_host))
    assert tr_chip.state == tr_host.state
    # and the proof verifies
    sipp_verify(a, b, proof_chip)
