"""Pin WHICH FRI/transcript code path each configuration executes, and that
every path produces byte-identical proofs for the same circuit.

Round 2 shipped a broken fused FRI path coexisting with a green host path
because nothing asserted which path a given config takes — tiny circuits,
keccak configs and fixed-shape starky recursion silently diverged onto
different code. This matrix makes that failure mode structurally
impossible: any gate-condition drift changes an asserted path name, and
any fused/host divergence breaks the byte-identity assertions.

Paths (plonky2_tpu/fri/prover.py):
  "fused"        — whole FRI argument (folds, PoW, query draws+gathers) in
                   one device program chain, single fetch
  "commit_fused" — fused commit phase only (fixed verifier shapes: starky
                   unified recursion padding)
  "host"         — host transcript loop (keccak, no fold steps, forced)
Transcript (plonky2_tpu/plonk/prover.py): "fused" = DeviceChallenger for
caps/openings/zeta; "host" = per-phase cap fetches.
"""

import numpy as np
import pytest

import plonky2_tpu.fri.prover as fp


@pytest.fixture(autouse=True)
def _clear_compiled():
    """This module proves 9+ fresh circuits (fused/host/mesh/zk variants);
    per-TEST executable-cache clearing keeps the XLA:CPU LLVM-JIT state
    under the state-dependent SIGABRT threshold (see tests/conftest.py —
    the module-scope clear no longer suffices at this module's size)."""
    yield
    import jax

    jax.clear_caches()
import plonky2_tpu.plonk.prover as pp
from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig, keccak_goldilocks_config
from plonky2_tpu.plonk.serialization import proof_to_bytes
from plonky2_tpu.util import rng


def _mul_chain(n_muls, gc=None):
    config = CircuitConfig.standard_recursion_config()
    b = CircuitBuilder(config, gc=gc) if gc else CircuitBuilder(config)
    x = b.add_virtual_target()
    cur = x
    for i in range(n_muls):
        cur = b.mul(cur, b.constant(i % 13 + 1))
    b.register_public_input(x)
    b.register_public_input(cur)
    return b.build(), x


def _prove(data, x, seed=77):
    pw = PartialWitness()
    pw.set_target(x, 3)
    rng.seed(seed)
    proof = data.prove(pw)
    rng.seed(None)
    data.verify(proof)
    return proof


def test_tiny_circuit_takes_host_path():
    """No fold steps (degree < 2^6) -> host FRI loop, host transcript."""
    data, x = _mul_chain(20)
    assert not tuple(data.common.fri_params.reduction_arity_bits)
    _prove(data, x)
    assert fp._LAST_PATH == "host"
    assert pp._LAST_TRANSCRIPT == "host"


def test_folded_poseidon_takes_fused_path_and_matches_host():
    """>=1 fold step + Poseidon -> fully fused path; forcing the host path
    must produce byte-identical proofs."""
    data, x = _mul_chain(700)
    assert len(data.common.fri_params.reduction_arity_bits) >= 1
    proof_fused = _prove(data, x)
    assert fp._LAST_PATH == "fused"
    assert pp._LAST_TRANSCRIPT == "fused"

    with fp.force_host_path():
        proof_host = _prove(data, x)
    assert fp._LAST_PATH == "host"
    assert pp._LAST_TRANSCRIPT == "host"
    assert proof_to_bytes(proof_fused) == proof_to_bytes(proof_host)


def test_folded_keccak_takes_host_path():
    """Keccak transcript (non-algebraic) -> host FRI loop even with folds."""
    data, x = _mul_chain(700, gc=keccak_goldilocks_config())
    assert len(data.common.fri_params.reduction_arity_bits) >= 1
    _prove(data, x)
    assert fp._LAST_PATH == "host"
    assert pp._LAST_TRANSCRIPT == "host"


def test_folded_poseidon_under_mesh_fused_and_identical():
    """The mesh run takes the SAME fused path (per-tree-gather fallback
    inside it) and produces byte-identical proofs."""
    from plonky2_tpu.parallel import make_mesh, use_mesh

    data, x = _mul_chain(700)
    proof_single = _prove(data, x)
    assert fp._LAST_PATH == "fused"
    with use_mesh(make_mesh(8)):
        proof_mesh = _prove(data, x)
    assert fp._LAST_PATH == "fused"
    assert pp._LAST_TRANSCRIPT == "fused"
    assert proof_to_bytes(proof_mesh) == proof_to_bytes(proof_single)


def test_lookup_circuit_takes_fused_transcript_and_matches_host():
    """Round 4: lookup circuits take the fully fused device transcript (the
    RE/SLDC row recurrences run as device associative scans and the
    LUT-binding evals as device Horner sums) — byte-identical to the host
    path."""
    config = CircuitConfig.standard_recursion_config()
    b = CircuitBuilder(config)
    lut = b.add_lookup_table_from_table(list(range(16)),
                                        [(7 * i + 3) % 16 for i in range(16)])
    x = b.add_virtual_target()
    out = b.add_lookup_from_index(x, lut)
    b.register_public_input(out)
    cur = out
    for i in range(700):
        cur = b.mul(cur, b.constant(i % 13 + 1))
    b.register_public_input(cur)
    data = b.build()
    assert len(data.common.fri_params.reduction_arity_bits) >= 1

    def run():
        pw = PartialWitness()
        pw.set_target(x, 5)
        rng.seed(77)
        proof = data.prove(pw)
        rng.seed(None)
        data.verify(proof)
        return proof

    proof_fused = run()
    assert pp._LAST_TRANSCRIPT == "fused"
    assert fp._LAST_PATH == "fused"

    with fp.force_host_path():
        proof_host = run()
    assert pp._LAST_TRANSCRIPT == "host"
    assert fp._LAST_PATH == "host"
    assert proof_to_bytes(proof_fused) == proof_to_bytes(proof_host)


def test_lookup_circuit_under_mesh_fused_and_identical():
    """Lookup circuit + 8-device mesh (VERDICT r4 #4): the device
    associative-scan lookup columns (RE/partial-SLDC) and LUT-binding
    Horner sums reshard under the mesh and the proof stays byte-identical
    to the single-device fused prove."""
    from plonky2_tpu.parallel import make_mesh, use_mesh

    config = CircuitConfig.standard_recursion_config()
    b = CircuitBuilder(config)
    lut = b.add_lookup_table_from_table(list(range(16)),
                                        [(7 * i + 3) % 16 for i in range(16)])
    x = b.add_virtual_target()
    out = b.add_lookup_from_index(x, lut)
    b.register_public_input(out)
    cur = out
    for i in range(700):
        cur = b.mul(cur, b.constant(i % 13 + 1))
    b.register_public_input(cur)
    data = b.build()
    assert data.common.num_lookup_polys > 0
    assert len(data.common.fri_params.reduction_arity_bits) >= 1

    def run():
        pw = PartialWitness()
        pw.set_target(x, 5)
        rng.seed(78)
        proof = data.prove(pw)
        rng.seed(None)
        data.verify(proof)
        return proof

    proof_single = run()
    assert fp._LAST_PATH == "fused"
    with use_mesh(make_mesh(8)):
        proof_mesh = run()
    assert fp._LAST_PATH == "fused"
    assert pp._LAST_TRANSCRIPT == "fused"
    assert proof_to_bytes(proof_mesh) == proof_to_bytes(proof_single)


def _zk_mul_chain(n_muls):
    config = CircuitConfig.standard_recursion_zk_config()
    b = CircuitBuilder(config)
    x = b.add_virtual_target()
    cur = x
    for i in range(n_muls):
        cur = b.mul(cur, b.constant(i % 13 + 1))
    b.register_public_input(x)
    b.register_public_input(cur)
    return b.build(), x


def test_zk_config_takes_fused_path_and_matches_host():
    """standard_recursion_zk_config (salted oracles + blinding rows,
    reference plonk/circuit_data.rs:121-140): the hiding proof takes the
    fused device transcript and is byte-stable against the host path
    (blinding randomness pinned by the seeded prover rng)."""
    data, x = _zk_mul_chain(700)
    assert data.common.config.zero_knowledge
    assert len(data.common.fri_params.reduction_arity_bits) >= 1
    proof_fused = _prove(data, x)
    assert fp._LAST_PATH == "fused"
    assert pp._LAST_TRANSCRIPT == "fused"

    with fp.force_host_path():
        proof_host = _prove(data, x)
    assert fp._LAST_PATH == "host"
    assert pp._LAST_TRANSCRIPT == "host"
    assert proof_to_bytes(proof_fused) == proof_to_bytes(proof_host)


def test_zk_config_under_mesh_fused_and_identical():
    """zk + 8-device mesh: same fused path, byte-identical proofs."""
    from plonky2_tpu.parallel import make_mesh, use_mesh

    data, x = _zk_mul_chain(700)
    proof_single = _prove(data, x)
    assert fp._LAST_PATH == "fused"
    with use_mesh(make_mesh(8)):
        proof_mesh = _prove(data, x)
    assert fp._LAST_PATH == "fused"
    assert pp._LAST_TRANSCRIPT == "fused"
    assert proof_to_bytes(proof_mesh) == proof_to_bytes(proof_single)


def test_batch_fri_oracle_takes_batch_fused_path():
    """A BatchFriOracle prove takes the FUSED batch commit program (folds +
    degree-group absorption + PoW + query draws in one device program,
    reference batch_fri/prover.rs:25-148) and is byte-identical to the
    forced host-transcript commit loop."""
    import jax.numpy as jnp

    from plonky2_tpu.field import scalar as fs
    from plonky2_tpu.fri.batch_fri import BatchFriOracle, batch_fri_proof
    from plonky2_tpu.fri.config import FriConfig, FriParams, FriReductionStrategy
    from plonky2_tpu.iop.challenger import Challenger

    r = np.random.default_rng(5)
    rate_bits, cap_height = 3, 2
    bits = [9, 7]
    groups = [
        r.integers(0, fs.P, size=(3, 1 << bits[0]), dtype=np.uint64),
        r.integers(0, fs.P, size=(2, 1 << bits[1]), dtype=np.uint64),
    ]
    oracle = BatchFriOracle(groups, rate_bits, cap_height)
    arities = (1,) * 4
    params = FriParams(
        config=FriConfig(rate_bits=rate_bits, cap_height=cap_height,
                         proof_of_work_bits=8,
                         reduction_strategy=FriReductionStrategy.Fixed(arities),
                         num_query_rounds=8),
        hiding=False, degree_bits=bits[0], reduction_arity_bits=arities,
    )
    comp = []
    for k in range(2):
        comp.append((jnp.asarray(groups[k][0]),
                     jnp.asarray(np.zeros_like(groups[k][0]))))

    challenger = Challenger()
    challenger.observe_element(9)
    proof_fused = batch_fri_proof([oracle.batch_merkle_tree], comp,
                                  challenger, params)
    assert fp._LAST_PATH == "batch_fused"
    fused_state = (list(challenger.sponge_state), list(challenger.input_buffer),
                   list(challenger.output_buffer))

    with fp.force_host_path():
        challenger_h = Challenger()
        challenger_h.observe_element(9)
        proof_host = batch_fri_proof([oracle.batch_merkle_tree], comp,
                                     challenger_h, params)
        assert fp._LAST_PATH == "batch_host"

    assert _proof_key(proof_fused) == _proof_key(proof_host)
    assert fused_state == (list(challenger_h.sponge_state),
                           list(challenger_h.input_buffer),
                           list(challenger_h.output_buffer))


def _proof_key(p):
    return (p.commit_phase_merkle_caps, p.final_poly, p.pow_witness,
            repr(p.query_round_proofs))


def test_fixed_shape_takes_commit_fused_path():
    """Unified-verifier-shape FRI (starky variable-degree recursion pads
    with max_num_query_steps, reference fri/prover.rs:119-131) keeps the
    fused commit phase but host PoW/query rounds."""
    import jax.numpy as jnp

    from plonky2_tpu.field import scalar as fs
    from plonky2_tpu.fri.config import FriConfig, FriReductionStrategy
    from plonky2_tpu.hash.merkle import MerkleTree
    from plonky2_tpu.iop.challenger import Challenger

    config = FriConfig(rate_bits=1, cap_height=0, proof_of_work_bits=1,
                       reduction_strategy=FriReductionStrategy.ConstantArityBits(1, 2),
                       num_query_rounds=2)
    params = config.fri_params(4, False)
    assert len(params.reduction_arity_bits) >= 1
    n = 1 << 4
    r = np.random.default_rng(0)
    coeffs = (jnp.asarray(r.integers(0, fs.P, n, dtype=np.uint64)),
              jnp.asarray(r.integers(0, fs.P, n, dtype=np.uint64)))
    tree = MerkleTree(r.integers(0, fs.P, (n * 2, 4), dtype=np.uint64), 0)
    challenger = Challenger()
    challenger.observe_element(1)
    fp.fri_proof([tree], coeffs, challenger, params,
                 max_num_query_steps=len(params.reduction_arity_bits) + 1)
    assert fp._LAST_PATH == "commit_fused"
