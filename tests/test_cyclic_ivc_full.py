"""Multi-step cyclic-recursion (IVC) hash chain in the default suite.

Runs the full validation_cyclic flow — base case + TWO recursive layers of
the SAME circuit verifying its own verifier key (the common_data fixpoint,
reference recursion/cyclic_recursion.rs test) — which the one-step test in
test_conditional_cyclic.py does not exercise. Marked slow: skip with
`-m "not slow"` for a quick pass."""

import pytest

import validation_cyclic


@pytest.mark.slow
def test_cyclic_ivc_two_layers():
    validation_cyclic.main()
