"""SIPP protocol layer: prover, verifier, transcript, statements.

Replaces reference L4/L5 (SURVEY.md §1): prover_native.rs / verifier_native.rs
/ transcript_native.rs / statements.rs, TPU-batched.
"""

from .prover import sipp_prove, sipp_prove_onchip  # noqa: F401
from .statements import SIPPStatement  # noqa: F401
from .transcript import Transcript  # noqa: F401
from .verifier import VerificationError, sipp_verify  # noqa: F401
