"""prove_many (pipelined throughput proving): byte-identity vs sequential
`prove` calls, on the fused path, under zk, with lookups, and under an
8-device mesh. Reference analog: rayon whole-machine parallelism over
independent proofs (maybe_rayon/src/lib.rs:31-289)."""

import numpy as np
import pytest

from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig
from plonky2_tpu.plonk.serialization import proof_to_bytes
from plonky2_tpu.util import rng


def _mul_chain_circuit(num_ops=800, zk=False):
    cfg = (CircuitConfig.standard_recursion_zk_config() if zk
           else CircuitConfig.standard_recursion_config())
    b = CircuitBuilder(cfg)
    x = b.add_virtual_target()
    cur = x
    for _ in range(num_ops):
        cur = b.mul(cur, cur)
        cur = b.add(cur, x)
    b.register_public_input(cur)
    data = b.build()
    return data, x


def _pw(x, v):
    w = PartialWitness()
    w.set_target(x, v)
    return w


def _prove_seq(data, pws, seed):
    rng.seed(seed)
    try:
        return [proof_to_bytes(data.prove(pw)) for pw in pws]
    finally:
        rng.seed(None)


def _prove_many(data, pws, seed, window):
    rng.seed(seed)
    try:
        return [proof_to_bytes(p)
                for p in data.prove_many(pws, window=window)]
    finally:
        rng.seed(None)


def test_prove_many_byte_identical_fused():
    from plonky2_tpu.plonk import prover as P

    data, x = _mul_chain_circuit()
    pws = [_pw(x, v) for v in (3, 5, 7)]
    seq = _prove_seq(data, pws, seed=41)
    many = _prove_many(data, pws, seed=41, window=2)
    assert P._LAST_TRANSCRIPT == "fused"
    assert seq == many
    # distinct witnesses -> distinct proofs (sanity that we proved 3 things)
    assert len(set(many)) == 3
    rng.seed(41)
    try:
        proofs = data.prove_many(pws, window=2)
    finally:
        rng.seed(None)
    for p in proofs:
        data.verify(p)


def test_prove_many_zk_byte_identical():
    data, x = _mul_chain_circuit(zk=True)
    pws = [_pw(x, v) for v in (2, 9)]
    seq = _prove_seq(data, pws, seed=43)
    many = _prove_many(data, pws, seed=43, window=3)
    assert seq == many


def test_prove_many_window_one_matches():
    data, x = _mul_chain_circuit()
    pws = [_pw(x, v) for v in (11, 13)]
    assert _prove_many(data, pws, seed=5, window=1) == \
        _prove_seq(data, pws, seed=5)


def test_prove_many_threaded_byte_identical():
    """threads>=2 mode (dispatch pool; witness+rng phase stays on the
    caller thread in proof order) produces byte-identical proofs to
    sequential proves."""
    data, x = _mul_chain_circuit()
    pws = [_pw(x, v) for v in (6, 10, 14, 21)]
    seq = _prove_seq(data, pws, seed=61)
    rng.seed(61)
    try:
        proofs = data.prove_many(pws, window=3, threads=2)
    finally:
        rng.seed(None)
    assert [proof_to_bytes(p) for p in proofs] == seq
    for p in proofs:
        data.verify(p)


def test_prove_many_lookup_circuit():
    from plonky2_tpu.gadgets.lookup import TIP5_TABLE

    cfg = CircuitConfig.standard_recursion_config()
    b = CircuitBuilder(cfg)
    tip5_idx = b.add_lookup_table_from_table(list(range(256)), list(TIP5_TABLE))
    a = b.add_virtual_target()
    out = b.add_lookup_from_index(a, tip5_idx)
    b.register_public_input(out)
    data = b.build()
    pws = [_pw(a, v) for v in (2, 3)]
    seq = _prove_seq(data, pws, seed=17)
    many = _prove_many(data, pws, seed=17, window=2)
    assert seq == many


def test_prove_many_under_mesh():
    import jax

    from plonky2_tpu.parallel import make_mesh, use_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    data, x = _mul_chain_circuit(num_ops=400)
    pws = [_pw(x, v) for v in (3, 4)]
    seq = _prove_seq(data, pws, seed=23)
    with use_mesh(make_mesh(8)):
        many = _prove_many(data, pws, seed=23, window=2)
    assert seq == many
