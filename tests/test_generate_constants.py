"""The Poseidon round-constant table regenerates from the reference's seed.

Parity with plonky2/src/bin/generate_constants.rs: ChaCha8 seeded with 0,
rejection-sampled into [0, p). A byte-identical regeneration pins our
constant table to the reference's provenance, not just its values.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def test_round_constants_regenerate():
    import generate_constants as gc
    from plonky2_tpu.hash.poseidon_constants import ALL_ROUND_CONSTANTS

    assert gc.generate(16)[:16] == list(ALL_ROUND_CONSTANTS)[:16]
    assert gc.generate() == list(ALL_ROUND_CONSTANTS)
