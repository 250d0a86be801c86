"""Recursive proof composition: in-circuit verification of plonky2 proofs
(reference plonky2/src/recursion/)."""
