"""Wide-round machinery coverage at CPU-test scale (VERDICT r2 item 3).

At production scale (n=128+) the prover/verifier run "wide" rounds — widths
above the shared fixed-width floor 2*PAD_FLOOR — through width-shrinking
slices (prover.py sipp_prove, verifier.py phase 2), the on-chip prover's
wide/tail split (_round_onchip vs the scanned _rounds_onchip), and the
multi-chunk _inner_f scan (pairing/ate.py).  The default CPU suite tops out
at n=16 where PAD_FLOOR=64 makes every round fixed-width, leaving those
paths untested.  PAD_FLOOR and MILLER_CHUNK are injectable precisely so this
file can shrink them: with PAD_FLOOR=2, MILLER_CHUNK=4, an n=16 instance
drives wide rounds at widths 16 and 8, the tail scan at m=2,1, and a 4-chunk
scanned _inner_f — and the proofs must be BIT-IDENTICAL to the default-config
run (masked infinity lanes contribute exactly 1 to pairing products and fold
to infinity; reference-scale analogue: verifier_native.rs:96-106, n=64).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sipp_tpu.utils.testing import random_instance

N = 16


@pytest.fixture
def shrunk(monkeypatch):
    """Shrink the shared-width floor and the Miller chunk, clearing jit
    caches so module-global reads at trace time see the patched values (and
    again on exit so later tests re-trace with the defaults)."""
    from sipp_tpu.pairing import ate
    from sipp_tpu.protocol import prover

    monkeypatch.setattr(prover, "PAD_FLOOR", 2)
    monkeypatch.setattr(ate, "MILLER_CHUNK", 4)
    jax.clear_caches()
    yield
    jax.clear_caches()


@pytest.fixture(scope="module")
def ref_proof():
    """Default-config (every round fixed-width at n=16) proof + instance."""
    from sipp_tpu.protocol import prover

    assert 2 * prover._floor(N) == N  # default config: no wide rounds
    a, b = random_instance(N, seed=4242)
    return a, b, np.asarray(prover.sipp_prove(a, b))


def test_wide_rounds_prove_bit_identical(shrunk, ref_proof):
    from sipp_tpu.protocol import prover

    a, b, ref = ref_proof
    assert 2 * prover._floor(N) == 4  # wide rounds at widths 16 and 8
    p = np.asarray(prover.sipp_prove(a, b))
    assert (p == ref).all()


def test_wide_rounds_verify_and_tamper(shrunk, ref_proof):
    from sipp_tpu.protocol import verifier

    a, b, ref = ref_proof
    stmt = verifier.sipp_verify(a, b, jnp.asarray(ref))
    from sipp_tpu.fields import tower as T

    assert stmt.Z == T.fq12_decode(jnp.asarray(ref[-1:]))[0]
    bad = ref.copy()
    bad[1, 0, 0, 0, 0] ^= 1
    with pytest.raises(verifier.VerificationError):
        verifier.sipp_verify(a, b, jnp.asarray(bad))


def test_wide_rounds_onchip_bit_identical(shrunk, ref_proof):
    """Wide/tail split of the on-chip prover: _round_onchip at widths 16 and
    8, then ONE scanned _rounds_onchip over ms=[2, 1]."""
    from sipp_tpu.protocol import prover

    a, b, ref = ref_proof
    p = np.asarray(prover.sipp_prove_onchip(a, b))
    assert (p == ref).all()


def test_multichunk_inner_f(shrunk, ref_proof):
    """4-chunk scanned _inner_f (chunk=4, n=16) == single-chunk result."""
    from sipp_tpu.pairing import ate

    a, b, _ = ref_proof
    chunked = ate.final_exp_host(ate._inner_f(a, b, None))
    jax.clear_caches()
    import sipp_tpu.pairing.ate as ate2

    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(ate2, "MILLER_CHUNK", 1024)
        whole = ate2.final_exp_host(ate2._inner_f(a, b, None))
    assert (np.asarray(chunked) == np.asarray(whole)).all()
