"""Field layer: BN254 Fq/Fr, the Fq2/Fq6/Fq12 tower, and Goldilocks.

Replaces the reference's ark-bn254 field types and plonky2's GoldilocksField
(SURVEY.md §2.2 D1/D2/D12) with vectorized 16-bit-limb JAX arithmetic.
"""

from .. import params
from .fp import Fp, field

# BN254 base field (L=16 limbs) and scalar field.
FQ = field(params.P, name="Fq")
FR = field(params.R, name="Fr")

# Goldilocks p = 2^64 - 2^32 + 1 (transcript hashing).  L is auto-bumped to 5
# so the Montgomery CIOS < 2p bound holds.
FGL = field(params.GOLDILOCKS_P, name="Goldilocks")

assert FQ.L == 16
assert FR.L == 16
assert FGL.L == 5
