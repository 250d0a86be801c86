"""Builder gadgets used by the recursive verifier: le_sum, exponentiation
from bits, random access, in-circuit Merkle verification, coset
interpolation (reference gadgets/{split_base,arithmetic,random_access,
interpolation}.rs and hash/merkle_proofs.rs).
"""

from __future__ import annotations

from plonky2_tpu.field import scalar as fs
from plonky2_tpu.gates.base_sum import BaseSumGate
from plonky2_tpu.gates.exponentiation import ExponentiationGate
from plonky2_tpu.gates.random_access import RandomAccessGate
from plonky2_tpu.iop.target import BoolTarget, ExtensionTarget, Target, Wire


class RecursionGadgetsMixin:
    def num_base_arithmetic_ops_per_gate(self) -> int:
        if self.config.use_base_arithmetic_gate:
            from plonky2_tpu.gates.arithmetic_base import ArithmeticGate

            return ArithmeticGate.num_ops_from_config(self.config)
        from plonky2_tpu.gates.arithmetic_extension import ArithmeticExtensionGate

        return ArithmeticExtensionGate.new_from_config(self.config).num_ops

    # -- bit recomposition / exponentiation ----------------------------------

    def le_sum(self, bits) -> Target:
        """Sum of little-endian bits (reference gadgets/split_base.rs:38-75)."""
        bits = list(bits)
        num_bits = len(bits)
        assert num_bits < 64, f"{num_bits} bits may overflow the field"
        if num_bits == 0:
            return self.zero()
        if num_bits - 1 <= self.num_base_arithmetic_ops_per_gate():
            two = self.two()
            rev = list(reversed(bits))
            acc = rev[0].target
            for b in rev[1:]:
                acc = self.mul_add(two, acc, b.target)
            return acc
        gate_type = BaseSumGate.new_from_config(self.config, 2)
        row = self.add_gate(BaseSumGate(gate_type.num_limbs, 2), [])
        for limb, wire in zip(bits, gate_type.limbs()):
            self.connect(limb.target, Wire(row, wire))
        for wire in range(gate_type.START_LIMBS + num_bits,
                          gate_type.START_LIMBS + gate_type.num_limbs):
            self.assert_zero(Wire(row, wire))
        return Wire(row, BaseSumGate.WIRE_SUM)

    def exp_from_bits(self, base: Target, exponent_bits) -> Target:
        """ExponentiationGate-based (reference gadgets/arithmetic.rs:248-269)."""
        bits = list(exponent_bits)
        gate = ExponentiationGate.new_from_config(self.config)
        while len(bits) < gate.num_power_bits:
            bits.append(self._false())
        row = self.add_gate(gate, [])
        self.connect(base, Wire(row, gate.wire_base()))
        for i, bit in enumerate(bits):
            self.connect(bit.target, Wire(row, gate.wire_power_bit(i)))
        return Wire(row, gate.wire_output())

    def exp_from_bits_const_base(self, base: int, exponent_bits) -> Target:
        """base^(sum 2^i bit_i) for a CONSTANT base
        (reference gadgets/arithmetic.rs:280-309)."""
        bits = list(exponent_bits)
        if len(bits) > self.num_base_arithmetic_ops_per_gate():
            return self.exp_from_bits(self.constant(base), bits)
        product = self.one()
        for i, bit in enumerate(bits):
            pow_const = fs.exp(base, 1 << i)
            # product *= 1 + bit*(base^pow - 1)
            product = self.arithmetic(
                fs.sub(pow_const, 1), 1, product, bit.target, product
            )
        return product

    def exp_power_of_2(self, base: Target, k: int) -> Target:
        for _ in range(k):
            base = self.square(base)
        return base

    def assert_leading_zeros(self, x: Target, leading_zeros: int) -> None:
        self.range_check(x, 64 - leading_zeros)

    # -- random access -------------------------------------------------------

    def random_access(self, access_index: Target, v: list[Target]) -> Target:
        """v[access_index] via RandomAccessGate
        (reference gadgets/random_access.rs:17-52)."""
        v = list(v)
        current_len = len(v)
        next_pow2 = 1 << (current_len - 1).bit_length() if current_len > 1 else 1
        if current_len < next_pow2 and v:
            v.extend([v[-1]] * (next_pow2 - current_len))
        vec_size = len(v)
        if vec_size == 1:
            return v[0]
        bits = vec_size.bit_length() - 1
        assert 1 << bits == vec_size
        claimed = self.add_virtual_target()
        dummy_gate = RandomAccessGate.new_from_config(self.config, bits)
        row, copy = self.find_slot(dummy_gate, [], [])
        for i, val in enumerate(v):
            self.connect(val, Wire(row, dummy_gate.wire_list_item(i, copy)))
        self.connect(access_index, Wire(row, dummy_gate.wire_access_index(copy)))
        self.connect(claimed, Wire(row, dummy_gate.wire_claimed_element(copy)))
        return claimed

    def random_access_extension(self, access_index: Target, v: list) -> ExtensionTarget:
        v = list(v)
        current_len = len(v)
        next_pow2 = 1 << (current_len - 1).bit_length() if current_len > 1 else 1
        if current_len < next_pow2 and v:
            v.extend([v[-1]] * (next_pow2 - current_len))
        return ExtensionTarget(tuple(
            self.random_access(access_index, [et.parts[i] for et in v])
            for i in range(2)
        ))

    def random_access_hash(self, access_index: Target, v: list) -> list[Target]:
        """v is a list of 4-target digests."""
        return [
            self.random_access(access_index, [h[i] for h in v]) for i in range(4)
        ]

    def exp(self, base: Target, exponent: Target, max_bits: int) -> Target:
        """base^exponent for a target exponent of at most max_bits bits
        (reference gadgets/arithmetic.rs exp)."""
        return self.exp_from_bits(base, self.split_le(exponent, max_bits))

    def exp_extension_from_bits(self, base, exponent_bits):
        """base^(Σ bits_i·2^i) for an ExtensionTarget base (square-and-select,
        reference gadgets/arithmetic_extension.rs exp_extension_from_bits)."""
        one = self.one_extension()
        acc = one
        cur = base
        for bit in exponent_bits:
            acc = self.mul_extension(acc, self.select_ext(bit, cur, one))
            cur = self.square_extension(cur)
        return acc

    # -- conditional equality -------------------------------------------------

    def conditional_assert_eq(self, cond: Target, x: Target, y: Target) -> None:
        """cond·(x − y) = 0 (reference circuit_builder.rs conditional_assert_eq)."""
        self.assert_zero(self.mul(cond, self.sub(x, y)))

    def conditional_assert_eq_ext(self, cond: Target, x, y) -> None:
        c = self.convert_to_ext(cond)
        prod = self.mul_extension(c, self.sub_extension(x, y))
        self.connect_extension(prod, self.zero_extension())

    # -- in-circuit Merkle verification --------------------------------------

    def verify_merkle_proof_to_cap_with_cap_indices(
            self, condition: Target, leaf_data: list[Target], leaf_index_bits,
            min_log_n: int, max_log_n: int, n_index: Target, cap_index: Target,
            merkle_cap_t, proof_t) -> None:
        """Variable-height Merkle path: walk all max-path siblings keeping a
        shift register of intermediate roots, select the one matching the
        actual tree height with n_index, and conditionally compare against
        the cap (reference hash/merkle_proofs.rs:186-239)."""
        zero = self.zero()
        state = self.hash_or_noop(leaf_data)
        num_log_n = max_log_n - min_log_n + 1
        final_states = [state] * num_log_n
        for bit, sibling in zip(leaf_index_bits, proof_t.siblings):
            inputs = list(state) + list(sibling) + [zero] * 4
            state = self.permute_swapped(inputs, bit)[:4]
            final_states = final_states[1:] + [state]
        for i in range(4):
            result = self.random_access(cap_index, [h[i] for h in merkle_cap_t])
            st = self.random_access(n_index, [s[i] for s in final_states])
            self.conditional_assert_eq(condition, result, st)

    def verify_merkle_proof_to_cap_with_cap_index(self, leaf_data: list[Target],
                                                  leaf_index_bits, cap_index: Target,
                                                  merkle_cap_t, proof_t) -> None:
        """reference hash/merkle_proofs.rs:144-183. merkle_cap_t: list of
        4-target digests; proof_t.siblings: list of 4-target digests."""
        zero = self.zero()
        state = self.hash_or_noop(leaf_data)
        for bit, sibling in zip(leaf_index_bits, proof_t.siblings):
            inputs = list(state) + list(sibling) + [zero] * 4
            outs = self.permute_swapped(inputs, bit)
            state = outs[:4]
        for i in range(4):
            result = self.random_access(cap_index, [h[i] for h in merkle_cap_t])
            self.connect(result, state[i])

    def verify_batch_merkle_proof_to_cap_with_cap_index(
            self, leaf_data: list, leaf_heights: list[int], leaf_index_bits,
            cap_index: Target, merkle_cap_t, proof_t) -> None:
        """BatchMerkleTree path: shorter matrices' rows are absorbed into the
        running digest when the walk reaches their height
        (reference hash/merkle_proofs.rs:243-296)."""
        zero = self.zero()
        state = self.hash_or_noop(list(leaf_data[0]))
        current_height = leaf_heights[0]
        leaf_data_index = 1
        for bit, sibling in zip(leaf_index_bits, proof_t.siblings):
            inputs = list(state) + list(sibling) + [zero] * 4
            state = self.permute_swapped(inputs, bit)[:4]
            current_height -= 1
            if (leaf_data_index < len(leaf_heights)
                    and current_height == leaf_heights[leaf_data_index]):
                state = self.hash_or_noop(list(state) + list(leaf_data[leaf_data_index]))
                leaf_data_index += 1
        for i in range(4):
            result = self.random_access(cap_index, [h[i] for h in merkle_cap_t])
            self.connect(result, state[i])

    # -- coset interpolation --------------------------------------------------

    def interpolate_coset(self, gate, coset_shift: Target, values,
                          evaluation_point: ExtensionTarget) -> ExtensionTarget:
        """reference gadgets/interpolation.rs:15-38."""
        row = self.num_gates()
        self.connect(coset_shift, Wire(row, gate.wire_shift()))
        for i, v in enumerate(values):
            self.connect_extension(
                v, ExtensionTarget(tuple(Wire(row, w) for w in gate.wires_value(i)))
            )
        self.connect_extension(
            evaluation_point,
            ExtensionTarget(tuple(Wire(row, w) for w in gate.wires_evaluation_point())),
        )
        eval_t = ExtensionTarget(
            tuple(Wire(row, w) for w in gate.wires_evaluation_value())
        )
        self.add_gate(gate, [])
        return eval_t
