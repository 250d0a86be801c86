"""Starky: FRI-based STARK/AIR prover (reference starky/src/).

The most TPU-natural part of the system: an AIR is a pure function over
[rows, cols] arrays; the whole quotient evaluation is one fused XLA program
over the quotient coset domain.
"""
