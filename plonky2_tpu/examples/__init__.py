"""Runnable examples mirroring the reference (plonky2/examples/)."""
