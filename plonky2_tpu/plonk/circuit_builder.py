"""CircuitBuilder: host-side circuit construction + `build()` compilation
(reference plonk/circuit_builder.rs:141-1348).

Building is a one-time host pass producing static-shape device programs; all
consensus-relevant decisions (gate ordering, selector grouping, sigma cycles,
constant placement, PI hashing) follow the reference semantics exactly so that
proofs agree bit-for-bit.
"""

from __future__ import annotations

import logging

import numpy as np

# `log`-crate analog (reference uses debug!/info! via env_logger; examples
# expose -v/-vv, bench_recursion.rs:354-364). Enable with
# logging.basicConfig(level=logging.DEBUG) or the examples' -v/-vv flags.
_log = logging.getLogger("plonky2_tpu.builder")

from plonky2_tpu.field import scalar as fs
from plonky2_tpu.fri.oracle import PolynomialBatch
from plonky2_tpu.gates.arithmetic_base import ArithmeticGate
from plonky2_tpu.gates.poseidon_gate import PoseidonGate
from plonky2_tpu.gates.simple_gates import ConstantGate, NoopGate, PublicInputGate
from plonky2_tpu.hash import poseidon as ps
from plonky2_tpu.iop.generator import (
    ConstantGenerator,
    CopyGenerator,
    RandomValueGenerator,
)
from plonky2_tpu.iop.target import (
    BoolTarget,
    Target,
    VirtualTarget,
    Wire,
    is_routable,
)
from plonky2_tpu.plonk import config as pcfg
from plonky2_tpu.plonk.circuit_data import (
    CircuitData,
    CommonCircuitData,
    ProverOnlyCircuitData,
    SelectorsInfo,
    VerifierOnlyCircuitData,
)
from plonky2_tpu.plonk.config import CircuitConfig
from plonky2_tpu.plonk.permutation_argument import Forest
from plonky2_tpu.util import log2_ceil, log2_strict


class GateInstance:
    __slots__ = ("gate", "constants")

    def __init__(self, gate, constants):
        self.gate = gate
        self.constants = constants


from plonky2_tpu.gadgets.algebra_gadgets import AlgebraGadgetsMixin
from plonky2_tpu.gadgets.extension_arithmetic import ExtensionArithmeticMixin
from plonky2_tpu.gadgets.lookup import LookupMixin
from plonky2_tpu.gadgets.recursion_gadgets import RecursionGadgetsMixin


class CircuitBuilder(ExtensionArithmeticMixin, RecursionGadgetsMixin, LookupMixin,
                     AlgebraGadgetsMixin):
    def __init__(self, config: CircuitConfig | None = None, gc=None):
        self.config = config or CircuitConfig.standard_recursion_config()
        self.gc = gc or pcfg.poseidon_goldilocks_config()
        self.gate_instances: list[GateInstance] = []
        self.gates: dict[str, object] = {}  # id -> gate type (set semantics)
        self.copy_constraints: list[tuple[Target, Target]] = []
        self.generators: list = []
        self.public_inputs: list[Target] = []
        self.virtual_target_index = 0
        self.constants_to_targets: dict[int, Target] = {}
        self.targets_to_constants: dict[Target, int] = {}
        self.constant_generators: list[ConstantGenerator] = []
        self.base_arithmetic_results: dict[tuple, Target] = {}
        # gate-slot batching: gate_id -> {params(tuple): (row, op)}
        self.current_slots: dict[str, dict[tuple, tuple[int, int]]] = {}
        self.luts: list = []
        self.lookup_rows: list = []
        self.lut_to_lookups: list = []
        # cyclic recursion state (reference circuit_builder.rs:429,1284)
        self.verifier_data_public_input = None
        self.goal_common_data = None
        # named-scope gate-count profiling (reference util/context_tree.rs)
        from plonky2_tpu.util import ContextTree

        self.context_log = ContextTree()
        self._context_stack = [self.context_log]

    # -- context / profiling -------------------------------------------------

    def push_context(self, name: str) -> None:
        self._context_stack.append(
            self._context_stack[-1].push(name, self.num_gates())
        )

    def pop_context(self) -> None:
        self._context_stack.pop().pop(self.num_gates())

    def print_gate_counts(self, min_gates: int = 1) -> None:
        """reference circuit_builder.rs:1030-1046."""
        from collections import Counter

        counts = Counter(gi.gate.id() for gi in self.gate_instances)
        for gate_id, count in counts.most_common():
            print(f"{count} {gate_id}")
        self.context_log.print(self.num_gates(), min_gates=min_gates)

    # -- targets -----------------------------------------------------------

    def add_virtual_target(self) -> Target:
        t = VirtualTarget(self.virtual_target_index)
        self.virtual_target_index += 1
        return t

    def add_virtual_targets(self, n: int) -> list[Target]:
        return [self.add_virtual_target() for _ in range(n)]

    def add_virtual_bool_target_safe(self) -> BoolTarget:
        b = BoolTarget(self.add_virtual_target())
        self.assert_bool(b)
        return b

    def add_virtual_bool_target_unsafe(self) -> BoolTarget:
        return BoolTarget(self.add_virtual_target())

    def add_virtual_hash(self) -> list[Target]:
        return self.add_virtual_targets(4)

    def add_virtual_hashes(self, n: int) -> list[list[Target]]:
        return [self.add_virtual_hash() for _ in range(n)]

    def add_virtual_target_arr(self, n: int) -> list[Target]:
        return self.add_virtual_targets(n)

    def add_virtual_public_input_arr(self, n: int) -> list[Target]:
        ts = self.add_virtual_targets(n)
        self.register_public_inputs(ts)
        return ts

    def add_virtual_hash_public_input(self) -> list[Target]:
        h = self.add_virtual_hash()
        self.register_public_inputs(h)
        return h

    def add_virtual_hashes_public_input(self, n: int) -> list[list[Target]]:
        return [self.add_virtual_hash_public_input() for _ in range(n)]

    def connect_array(self, xs, ys) -> None:
        assert len(xs) == len(ys)
        for x, y in zip(xs, ys):
            self.connect(x, y)

    def constant_bool(self, b: bool) -> BoolTarget:
        return BoolTarget(self.one() if b else self.zero())

    def constant_hash(self, digest) -> list[Target]:
        return [self.constant(int(v)) for v in digest]

    def constant_merkle_cap(self, cap) -> list[list[Target]]:
        return [self.constant_hash(d) for d in cap]

    def constant_verifier_data(self, verifier_only):
        """reference circuit_builder.rs constant_verifier_data."""
        from plonky2_tpu.recursion.recursive_verifier import VerifierCircuitTarget

        return VerifierCircuitTarget(
            constants_sigmas_cap=self.constant_merkle_cap(
                verifier_only.constants_sigmas_cap),
            circuit_digest=self.constant_hash(verifier_only.circuit_digest),
        )

    def set_domain_separator(self, separator: list[int]) -> None:
        """Distinguishes otherwise-identical circuits' digests/VKs
        (reference circuit_builder.rs:262-266)."""
        assert getattr(self, "domain_separator", None) is None
        self.domain_separator = list(separator)

    # -- gates -------------------------------------------------------------

    def num_gates(self) -> int:
        return len(self.gate_instances)

    def add_gate(self, gate, constants: list[int]) -> int:
        assert gate.num_wires() <= self.config.num_wires, (
            f"{gate.id()} requires {gate.num_wires()} wires, config has {self.config.num_wires}"
        )
        assert gate.num_constants() <= self.config.num_constants or isinstance(gate, ConstantGate)
        assert len(constants) <= gate.num_constants(), "Too many constants."
        constants = list(constants) + [0] * (gate.num_constants() - len(constants))

        row = len(self.gate_instances)
        # Only ConstantGate slots route circuit constants; other gates'
        # extra-constant wires stay zero-filled (constant 0 == unset wire 0),
        # so a dummy circuit (which has no such gate instances) reproduces the
        # same gate set and ConstantGate count as the original.
        if isinstance(gate, ConstantGate):
            for constant_index, wire_index in gate.extra_constant_wires():
                self.constant_generators.append(
                    ConstantGenerator(row, constant_index, wire_index, 0)
                )
        self.gates.setdefault(gate.id(), gate)
        self.gate_instances.append(GateInstance(gate, constants))
        return row

    def find_slot(self, gate, params: list[int], constants: list[int]) -> tuple[int, int]:
        """(row, op-slot) batching for multi-op gates
        (reference circuit_builder.rs:813-840)."""
        num_gates = self.num_gates()
        num_ops = gate.num_ops
        gate_slots = self.current_slots.setdefault(gate.id(), {})
        key = tuple(params)
        if key in gate_slots:
            gate_idx, slot_idx = gate_slots[key]
        else:
            self.add_gate(gate, list(constants))
            gate_idx, slot_idx = num_gates, 0
        if slot_idx == num_ops - 1:
            gate_slots.pop(key, None)
        else:
            gate_slots[key] = (gate_idx, slot_idx + 1)
        return gate_idx, slot_idx

    # -- copy constraints / generators --------------------------------------

    def connect(self, x: Target, y: Target) -> None:
        assert is_routable(x, self.config), "Tried to route a wire that isn't routable"
        assert is_routable(y, self.config), "Tried to route a wire that isn't routable"
        self.copy_constraints.append((x, y))

    def generate_copy(self, src: Target, dst: Target) -> None:
        self.add_simple_generator(CopyGenerator(src, dst))

    def add_simple_generator(self, gen) -> None:
        self.generators.append(gen)

    def add_generators(self, gens) -> None:
        self.generators.extend(gens)

    # -- constants ----------------------------------------------------------

    def constant(self, c: int) -> Target:
        c = c % fs.P
        if c in self.constants_to_targets:
            return self.constants_to_targets[c]
        t = self.add_virtual_target()
        self.constants_to_targets[c] = t
        self.targets_to_constants[t] = c
        return t

    def constants(self, cs) -> list[Target]:
        return [self.constant(c) for c in cs]

    def zero(self) -> Target:
        return self.constant(0)

    def one(self) -> Target:
        return self.constant(1)

    def two(self) -> Target:
        return self.constant(2)

    def neg_one(self) -> Target:
        return self.constant(fs.P - 1)

    def _false(self) -> BoolTarget:
        return BoolTarget(self.zero())

    def _true(self) -> BoolTarget:
        return BoolTarget(self.one())

    def target_as_constant(self, t: Target):
        return self.targets_to_constants.get(t)

    # -- public inputs -------------------------------------------------------

    def register_public_input(self, t: Target) -> None:
        self.public_inputs.append(t)

    def register_public_inputs(self, ts) -> None:
        for t in ts:
            self.register_public_input(t)

    def add_virtual_public_input(self) -> Target:
        t = self.add_virtual_target()
        self.register_public_input(t)
        return t

    def num_public_inputs(self) -> int:
        return len(self.public_inputs)

    def connect_hashes(self, a, b) -> None:
        for x, y in zip(a, b):
            self.connect(x, y)

    def select_hash(self, b: BoolTarget, h0, h1) -> list:
        return [self.select(b, x, y) for x, y in zip(h0, h1)]

    # -- arithmetic gadgets --------------------------------------------------

    def arithmetic(self, const_0: int, const_1: int, m0: Target, m1: Target,
                   addend: Target) -> Target:
        const_0 %= fs.P
        const_1 %= fs.P
        special = self._arithmetic_special_cases(const_0, const_1, m0, m1, addend)
        if special is not None:
            return special
        key = (const_0, const_1, m0, m1, addend)
        if key in self.base_arithmetic_results:
            return self.base_arithmetic_results[key]
        result = self._add_base_arithmetic_operation(const_0, const_1, m0, m1, addend)
        self.base_arithmetic_results[key] = result
        return result

    def _add_base_arithmetic_operation(self, const_0, const_1, m0, m1, addend) -> Target:
        gate = ArithmeticGate.new_from_config(self.config)
        constants = [const_0, const_1]
        row, i = self.find_slot(gate, constants, constants)
        self.connect(m0, Wire(row, ArithmeticGate.wire_ith_multiplicand_0(i)))
        self.connect(m1, Wire(row, ArithmeticGate.wire_ith_multiplicand_1(i)))
        self.connect(addend, Wire(row, ArithmeticGate.wire_ith_addend(i)))
        return Wire(row, ArithmeticGate.wire_ith_output(i))

    def _arithmetic_special_cases(self, const_0, const_1, m0, m1, addend):
        zero = self.zero()
        mul_0_const = self.target_as_constant(m0)
        mul_1_const = self.target_as_constant(m1)
        addend_const = self.target_as_constant(addend)

        first_term_zero = const_0 == 0 or m0 == zero or m1 == zero
        second_term_zero = const_1 == 0 or addend == zero

        if first_term_zero:
            first_term_const = 0
        elif mul_0_const is not None and mul_1_const is not None:
            first_term_const = fs.mul(fs.mul(mul_0_const, mul_1_const), const_0)
        else:
            first_term_const = None
        if second_term_zero:
            second_term_const = 0
        elif addend_const is not None:
            second_term_const = fs.mul(addend_const, const_1)
        else:
            second_term_const = None
        if first_term_const is not None and second_term_const is not None:
            return self.constant(fs.add(first_term_const, second_term_const))

        if first_term_zero and const_1 == 1:
            return addend
        if second_term_zero:
            if mul_0_const is not None and fs.mul(mul_0_const, const_0) == 1:
                return m1
            if mul_1_const is not None and fs.mul(mul_1_const, const_0) == 1:
                return m0
        return None

    def add(self, x: Target, y: Target) -> Target:
        one = 1
        return self.arithmetic(one, one, x, self.one(), y)

    def add_many(self, ts) -> Target:
        ts = list(ts)
        acc = ts[0]
        for t in ts[1:]:
            acc = self.add(acc, t)
        return acc

    def sub(self, x: Target, y: Target) -> Target:
        return self.arithmetic(1, fs.P - 1, x, self.one(), y)

    def mul(self, x: Target, y: Target) -> Target:
        return self.arithmetic(1, 0, x, y, self.zero())

    def mul_many(self, ts) -> Target:
        ts = list(ts)
        acc = ts[0]
        for t in ts[1:]:
            acc = self.mul(acc, t)
        return acc

    def mul_add(self, x: Target, y: Target, z: Target) -> Target:
        return self.arithmetic(1, 1, x, y, z)

    def mul_sub(self, x: Target, y: Target, z: Target) -> Target:
        return self.arithmetic(1, fs.P - 1, x, y, z)

    def mul_const(self, c: int, x: Target) -> Target:
        return self.arithmetic(c, 0, x, self.one(), self.zero())

    def mul_const_add(self, c: int, x: Target, y: Target) -> Target:
        return self.arithmetic(c, 1, x, self.one(), y)

    def add_const(self, x: Target, c: int) -> Target:
        return self.add(x, self.constant(c))

    def neg(self, x: Target) -> Target:
        return self.mul(x, self.neg_one())

    def square(self, x: Target) -> Target:
        return self.mul(x, x)

    def inverse(self, x: Target) -> Target:
        """1/x with an in-circuit x * x_inv = 1 check."""
        from plonky2_tpu.gadgets.inverse import add_inverse

        return add_inverse(self, x)

    def div(self, x: Target, y: Target) -> Target:
        y_inv = self.inverse(y)
        return self.mul(x, y_inv)

    # -- bit decomposition / range checks -----------------------------------

    def split_le(self, integer: Target, num_bits: int):
        from plonky2_tpu.gadgets.split_join import split_le

        return split_le(self, integer, num_bits)

    def range_check(self, x: Target, n_log: int) -> None:
        from plonky2_tpu.gadgets.split_join import range_check

        range_check(self, x, n_log)

    def low_bits(self, x: Target, num_low_bits: int, num_bits: int):
        from plonky2_tpu.gadgets.split_join import low_bits

        return low_bits(self, x, num_low_bits, num_bits)

    def split_low_high(self, x: Target, n_log: int, num_bits: int):
        from plonky2_tpu.gadgets.split_join import split_low_high

        return split_low_high(self, x, n_log, num_bits)

    def exp_u64(self, base: Target, exponent: int) -> Target:
        """base^exponent for a constant exponent (square-and-multiply)."""
        result = self.one()
        b = base
        e = exponent
        while e > 0:
            if e & 1:
                result = self.mul(result, b)
            e >>= 1
            if e:
                b = self.square(b)
        return result

    # -- assertions ---------------------------------------------------------

    def assert_zero(self, x: Target) -> None:
        self.connect(x, self.zero())

    def assert_one(self, x: Target) -> None:
        self.connect(x, self.one())

    def assert_bool(self, b: BoolTarget) -> None:
        t = b.target
        sq = self.mul(t, t)
        self.connect(sq, t)

    def is_equal(self, x: Target, y: Target) -> BoolTarget:
        from plonky2_tpu.gadgets.inverse import is_equal

        return is_equal(self, x, y)

    def select(self, b: BoolTarget, x: Target, y: Target) -> Target:
        """b ? x : y = b*(x-y) + y (reference gadgets/select.rs)."""
        tmp = self.mul(b.target, self.sub(x, y))
        return self.add(tmp, y)

    # -- in-circuit hashing (PI hash & Merkle) -------------------------------

    def permute_swapped(self, inputs: list[Target], swap: BoolTarget) -> list[Target]:
        """One PoseidonGate row (reference hash/poseidon.rs:892-919)."""
        gate = PoseidonGate()
        row = self.add_gate(gate, [])
        self.connect(swap.target, Wire(row, PoseidonGate.WIRE_SWAP))
        for i in range(12):
            self.connect(inputs[i], Wire(row, PoseidonGate.wire_input(i)))
        return [Wire(row, PoseidonGate.wire_output(i)) for i in range(12)]

    def permute(self, inputs: list[Target]) -> list[Target]:
        return self.permute_swapped(inputs, self._false())

    def hash_n_to_m_no_pad(self, inputs: list[Target], num_outputs: int) -> list[Target]:
        zero = self.zero()
        state = [zero] * 12
        for i in range(0, len(inputs), 8):
            chunk = inputs[i : i + 8]
            state = chunk + state[len(chunk) :]
            state = self.permute(state)
        outputs = []
        while True:
            for s in state[:8]:
                outputs.append(s)
                if len(outputs) == num_outputs:
                    return outputs
            state = self.permute(state)

    def hash_n_to_hash_no_pad(self, inputs: list[Target]) -> list[Target]:
        return self.hash_n_to_m_no_pad(inputs, 4)

    def hash_or_noop(self, inputs: list[Target]) -> list[Target]:
        if len(inputs) <= 4:
            return inputs + [self.zero()] * (4 - len(inputs))
        return self.hash_n_to_hash_no_pad(inputs)

    # -- build ---------------------------------------------------------------

    def _fri_params(self, degree_bits: int):
        return self.config.fri_config.fri_params(degree_bits, self.config.zero_knowledge)

    def _num_blinding_gates(self, degree_estimate: int) -> tuple[int, int]:
        D = 2
        degree_bits_estimate = log2_strict(degree_estimate)
        fri_queries = self.config.fri_config.num_query_rounds
        arities = [1 << x for x in self._fri_params(degree_bits_estimate).reduction_arity_bits]
        total_fri_folding_points = sum(x - 1 for x in arities)
        prod = 1
        for x in arities:
            prod *= x
        final_poly_coeffs = degree_estimate // prod
        fri_openings = fri_queries * (1 + D * total_fri_folding_points + D * final_poly_coeffs)
        return (D + fri_openings, 2 * D + fri_openings)

    def _blinding_counts(self) -> tuple[int, int]:
        num_gates = len(self.gate_instances)
        degree_estimate = 1 << log2_ceil(max(num_gates, 1))
        while True:
            regular, z = self._num_blinding_gates(degree_estimate)
            if num_gates + regular + 2 * z <= degree_estimate:
                return regular, z
            degree_estimate *= 2

    def _blind_and_pad(self) -> None:
        if self.config.zero_knowledge:
            self._blind()
        while len(self.gate_instances) & (len(self.gate_instances) - 1):
            self.add_gate(NoopGate(), [])
        if not self.gate_instances:
            self.add_gate(NoopGate(), [])

    def _blind(self) -> None:
        regular, z = self._blinding_counts()
        nw, nrw = self.config.num_wires, self.config.num_routed_wires
        for _ in range(regular):
            row = self.add_gate(NoopGate(), [])
            for w in range(nw):
                self.add_simple_generator(RandomValueGenerator(Wire(row, w)))
        for _ in range(z):
            g1 = self.add_gate(NoopGate(), [])
            g2 = self.add_gate(NoopGate(), [])
            for w in range(nrw):
                self.add_simple_generator(RandomValueGenerator(Wire(g1, w)))
                self.generate_copy(Wire(g1, w), Wire(g2, w))

    def _constant_polys(self) -> list[np.ndarray]:
        max_constants = max(g.num_constants() for g in self.gates.values())
        n = len(self.gate_instances)
        out = np.zeros((max_constants, n), dtype=np.uint64)
        for j, gi in enumerate(self.gate_instances):
            for k, c in enumerate(gi.constants):
                out[k, j] = c
        return [out[k] for k in range(max_constants)]

    def _selector_polynomials(self, gates, max_degree):
        """Greedy grouping by degree (reference gates/selectors.rs:113-185)."""
        n = len(self.gate_instances)
        num_gates = len(gates)
        max_gate_degree = gates[-1].degree()
        index = {g.id(): i for i, g in enumerate(gates)}

        UNUSED = (1 << 32) - 1

        if max_gate_degree + num_gates - 1 <= max_degree:
            poly = np.array(
                [index[gi.gate.id()] for gi in self.gate_instances], dtype=np.uint64
            )
            return [poly], SelectorsInfo([0] * num_gates, [range(0, num_gates)])

        assert max_gate_degree < max_degree, (
            f"{gates[-1].id()} has too high degree; increase quotient_degree_factor"
        )

        groups = []
        start = 0
        while start < num_gates:
            size = 0
            while start + size < num_gates and size + gates[start + size].degree() < max_degree:
                size += 1
            groups.append(range(start, start + size))
            start += size

        def group_of(i):
            for gidx, rng in enumerate(groups):
                if i in rng:
                    return gidx
            raise AssertionError

        selector_indices = [group_of(i) for i in range(num_gates)]
        polys = [np.full(n, UNUSED, dtype=np.uint64) for _ in groups]
        for j, gi in enumerate(self.gate_instances):
            i = index[gi.gate.id()]
            gr = group_of(i)
            for g in range(len(groups)):
                polys[g][j] = i if g == gr else UNUSED
        return polys, SelectorsInfo(selector_indices, groups)

    def build(self) -> CircuitData:
        config = self.config
        rate_bits = config.fri_config.rate_bits
        cap_height = config.fri_config.cap_height

        # 1. hash public inputs in-circuit; route to PublicInputGate
        num_public_inputs = len(self.public_inputs)
        public_inputs_hash_t = self.hash_n_to_hash_no_pad(list(self.public_inputs))
        pi_gate = self.add_gate(PublicInputGate(), [])
        for hash_part, wire in zip(public_inputs_hash_t, PublicInputGate.wires_public_inputs_hash()):
            self.connect(hash_part, Wire(pi_gate, wire))
        for wire in range(4, config.num_wires):
            self.add_simple_generator(RandomValueGenerator(Wire(pi_gate, wire)))

        # 1b. lookup gates (reference circuit_builder.rs:1101)
        if self.luts:
            self.add_all_lookups()

        # 2. constant gates + generators
        while len(self.constants_to_targets) > len(self.constant_generators):
            self.add_gate(ConstantGate(config.num_constants), [])
        for (c, t), const_gen in zip(
            sorted(self.constants_to_targets.items(), key=lambda kv: kv[0]),
            self.constant_generators,
        ):
            self.gate_instances[const_gen.row].constants[const_gen.constant_index] = c
            self.connect(Wire(const_gen.row, const_gen.wire_index), t)
            const_gen.constant = c
            self.add_simple_generator(const_gen)

        # 3. blind + pad to power of two
        degree_before = len(self.gate_instances)
        self._blind_and_pad()
        degree = len(self.gate_instances)
        degree_bits = log2_strict(degree)
        # reference circuit_builder.rs:1132-1138 (info!/debug! via log crate)
        _log.info("Degree before blinding & padding: %d", degree_before)
        _log.info("Degree after blinding & padding: %d (2^%d)", degree,
                  degree_bits)
        if _log.isEnabledFor(logging.DEBUG):
            counts: dict[str, int] = {}
            for gi in self.gate_instances:
                gid = gi.gate.id().split("(")[0].split(" ")[0]
                counts[gid] = counts.get(gid, 0) + 1
            for gid, cnt in sorted(counts.items(), key=lambda kv: -kv[1]):
                _log.debug("  %d × %s", cnt, gid)
        fri_params = self._fri_params(degree_bits)
        assert fri_params.total_arities() <= degree_bits + rate_bits - cap_height, (
            "FRI total reduction arity is too large."
        )

        quotient_degree_factor = config.max_quotient_degree_factor
        gates = sorted(self.gates.values(), key=lambda g: (g.degree(), g.id()))
        constant_vecs, selectors_info = self._selector_polynomials(
            gates, quotient_degree_factor + 1
        )
        constant_vecs = list(constant_vecs)

        # lookup selector polynomials (reference gates/selectors.rs:51-111)
        num_luts = len(self.luts)
        if num_luts:
            n_rows = len(self.gate_instances)
            lookup_selectors = [np.zeros(n_rows, dtype=np.uint64) for _ in range(4)]
            TRANS_SRE, TRANS_LDC, INIT_SRE, LAST_LDC = range(4)
            ends = []
            for lw in self.lookup_rows:
                lookup_selectors[TRANS_SRE][lw.last_lut_gate:lw.first_lut_gate + 1] = 1
                lookup_selectors[TRANS_LDC][lw.last_lu_gate:lw.last_lut_gate] = 1
                lookup_selectors[INIT_SRE][lw.first_lut_gate + 1] = 1
                lookup_selectors[LAST_LDC][lw.last_lu_gate] = 1
            for lw in self.lookup_rows:
                end = np.zeros(n_rows, dtype=np.uint64)
                end[lw.last_lut_gate] = 1
                ends.append(end)
            constant_vecs += lookup_selectors + ends
            num_lookup_selectors = 4 + num_luts
            from plonky2_tpu.gates.lookup import LookupGate

            lookup_degree = config.max_quotient_degree_factor - 1
            num_lookup_polys = (
                -(-LookupGate.num_slots_from_config(config) // lookup_degree) + 1
            )
        else:
            num_lookup_selectors = 0
            num_lookup_polys = 0

        constant_vecs = constant_vecs + self._constant_polys()
        num_constants = len(constant_vecs)

        subgroup = fs.two_adic_subgroup(degree_bits)
        k_is = fs.get_unique_coset_shifts(degree, config.num_routed_wires)

        # 4. sigma polynomials via union-find over copy constraints
        forest = Forest(config.num_wires, config.num_routed_wires, degree,
                        self.virtual_target_index)
        for a, b in self.copy_constraints:
            forest.merge(a, b)
        forest.compress_paths()
        sigma_vecs = forest.wire_partition().get_sigma_polys(degree_bits, k_is, subgroup)

        # 5. commit to constants + sigmas
        constants_sigmas = np.concatenate(
            [np.stack(constant_vecs), sigma_vecs], axis=0
        )
        constants_sigmas_commitment = PolynomialBatch.from_values(
            constants_sigmas, rate_bits, pcfg.CONSTANTS_SIGMAS.blinding, cap_height,
            hasher=self.gc.hasher,
        )

        # 6. gate generators (drop unused slots of partially-filled gates)
        incomplete_gates = {}
        for slots in self.current_slots.values():
            for row, op in slots.values():
                incomplete_gates[row] = op
        for row, gi in enumerate(self.gate_instances):
            gens = gi.gate.generators(row, gi.constants)
            if row in incomplete_gates:
                gens = gens[: incomplete_gates[row]]
            self.add_generators(gens)

        # 7. watch index by representative
        generator_indices_by_watches: dict[int, list[int]] = {}
        for i, gen in enumerate(self.generators):
            for watch in gen.dependencies():
                rep = forest.parents[forest.target_index(watch)]
                generator_indices_by_watches.setdefault(rep, []).append(i)
        for v in generator_indices_by_watches.values():
            v[:] = sorted(set(v))

        num_gate_constraints = max(g.num_constraints() for g in gates)
        num_partial_products = (
            (config.num_routed_wires + quotient_degree_factor - 1) // quotient_degree_factor - 1
        )

        # 8. circuit digest (reference circuit_builder.rs:1252-1264)
        hasher = self.gc.hasher
        cap = constants_sigmas_commitment.merkle_tree.cap
        domain_separator_digest = hasher.hash_pad(
            getattr(self, "domain_separator", None) or [])
        digest_parts = (
            [x for h in cap for x in hasher.digest_to_felts(h)]
            + hasher.digest_to_felts(domain_separator_digest)
            + [degree_bits]
        )
        circuit_digest = hasher.hash_no_pad(digest_parts)

        common = CommonCircuitData(
            gc=self.gc,
            config=config,
            fri_params=fri_params,
            gates=gates,
            selectors_info=selectors_info,
            quotient_degree_factor=quotient_degree_factor,
            num_gate_constraints=num_gate_constraints,
            num_constants=num_constants,
            num_public_inputs=num_public_inputs,
            k_is=k_is,
            num_partial_products=num_partial_products,
            num_lookup_polys=num_lookup_polys,
            num_lookup_selectors=num_lookup_selectors,
            luts=[list(l) for l in self.luts],
        )
        prover_only = ProverOnlyCircuitData(
            generators=self.generators,
            generator_indices_by_watches=generator_indices_by_watches,
            constants_sigmas_commitment=constants_sigmas_commitment,
            sigmas=sigma_vecs,  # [num_routed, degree]
            subgroup=subgroup,
            public_inputs=self.public_inputs,
            representative_map=forest.parents,
            circuit_digest=circuit_digest,
            lookup_rows=list(self.lookup_rows),
            lut_to_lookups=[list(l) for l in self.lut_to_lookups],
        )
        verifier_only = VerifierOnlyCircuitData(
            constants_sigmas_cap=cap,
            circuit_digest=circuit_digest,
        )
        if self.goal_common_data is not None:
            assert common == self.goal_common_data, (
                "Built CommonCircuitData does not match the goal (cyclic fixpoint)"
            )
        return CircuitData(prover_only, verifier_only, common)

    def build_prover(self):
        """Proving-only circuit data (reference circuit_builder.rs:1336-1340)."""
        return self.build().prover_data()

    def build_verifier(self):
        """Verification-only circuit data (reference circuit_builder.rs:1343-1347)."""
        return self.build().verifier_data()

    def mock_build(self):
        """Witness-generation-only data (reference circuit_builder.rs:1328-1334)."""
        return self.build().mock()
