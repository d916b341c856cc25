"""Proof / statement serialization (SURVEY.md §5 checkpoint-resume audit:
the reference's only durable format is the 48n+240-u32 statement encoding;
this adds npz proof files on top, keeping that u32 layout as the
interchange format)."""

import numpy as np

from . import curves
from .fields import tower
from .protocol.statements import SIPPStatement


def save_proof(path: str, a_g1, b_g2, proof):
    """Write instance + proof as an npz of uint32 arrays."""
    np.savez_compressed(
        path,
        a=np.asarray(a_g1), b=np.asarray(b_g2), proof=np.asarray(proof),
        version=np.uint32(1),
    )


def load_proof(path: str):
    """Load an instance + proof npz; limb-validates the proof on load (the
    reference's typed-deserialization guarantee — sipp_verify re-validates
    the instance points on entry, so garbage files fail fast either way)."""
    import jax.numpy as jnp

    z = np.load(path)
    from .protocol import validate

    validate.check_limbs(z["proof"], "proof")
    return (jnp.asarray(z["a"]), jnp.asarray(z["b"]), jnp.asarray(z["proof"]))


def save_statement(path: str, stmt: SIPPStatement):
    """Write the statement in the reference's flat u32 wire layout
    (statements.rs:24-54; 48n+240 little-endian u32 values)."""
    np.asarray(stmt.to_vec(), dtype=np.uint32).tofile(path)


def load_statement(path: str, n: int) -> SIPPStatement:
    vec = np.fromfile(path, dtype=np.uint32)
    return SIPPStatement.from_vec(n, [int(v) for v in vec])
