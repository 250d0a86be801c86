"""New gadget surface: bool logic, ext-algebra ops, polynomial eval,
Frobenius, vectorized random access, split_le_base — each proven in a
circuit and checked against host scalar math (reference
gadgets/arithmetic.rs, arithmetic_extension.rs, polynomial.rs, select.rs,
random_access.rs, split_base.rs, iop/ext_target.rs)."""

import numpy as np
import pytest

from plonky2_tpu.field import scalar as fs
from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig


def _prove(b, pw=None):
    data = b.build()
    proof = data.prove(pw or PartialWitness())
    data.verify(proof)
    return proof.public_inputs


def test_bool_logic_and_if():
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    t = b.add_virtual_bool_target_safe()
    f = b.add_virtual_bool_target_safe()
    outs = [b.and_(t, f), b.or_(t, f), b.not_(t), b.not_(f),
            b.and_(t, t), b.or_(f, f)]
    b.register_public_inputs([o.target for o in outs])
    b.register_public_input(b.if_(t, b.constant(77), b.constant(33)))
    b.register_public_input(b.if_(f, b.constant(77), b.constant(33)))
    b.register_public_input(b.cube(b.constant(5)))
    pw = PartialWitness()
    pw.set_bool_target(t, True)
    pw.set_bool_target(f, False)
    assert _prove(b, pw) == [0, 1, 0, 1, 1, 0, 77, 33, 125]


def test_ext_inner_product_and_div_add():
    rng = np.random.default_rng(1)
    a, bb, c, d, e = [tuple(int(x) for x in rng.integers(0, fs.P, 2, dtype=np.uint64))
                      for _ in range(5)]
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    ct = lambda v: b.constant_extension(v)
    wide = b.wide_arithmetic_extension(ct(a), ct(bb), ct(c), ct(d), ct(e))
    div_add = b.div_add_extension(ct(a), ct(bb), ct(c))
    sms = b.scalar_mul_sub_extension(b.constant(7), ct(a), ct(c))
    b.register_public_inputs(list(wide.parts) + list(div_add.parts) + list(sms.parts))
    pis = _prove(b)

    exp_wide = fs.ext_add(fs.ext_add(fs.ext_mul(a, bb), fs.ext_mul(c, d)), e)
    exp_div = fs.ext_add(fs.ext_mul(a, fs.ext_inverse(bb)), c)
    exp_sms = fs.ext_sub(fs.ext_scalar_mul(7, a), c)
    assert pis == list(exp_wide) + list(exp_div) + list(exp_sms)


def test_ext_algebra_mul():
    """mul_ext_algebra == host ExtensionAlgebra multiplication in
    F_{p^2}[X]/(X^2 - W)."""
    rng = np.random.default_rng(2)
    A = [tuple(int(x) for x in rng.integers(0, fs.P, 2, dtype=np.uint64)) for _ in range(2)]
    B = [tuple(int(x) for x in rng.integers(0, fs.P, 2, dtype=np.uint64)) for _ in range(2)]

    # host: (A0 + A1 X)(B0 + B1 X) mod (X^2 - W), coefficients in F_{p^2}
    w = fs.EXT_W[2]
    lo = fs.ext_mul(A[0], B[0])
    cross = fs.ext_add(fs.ext_mul(A[0], B[1]), fs.ext_mul(A[1], B[0]))
    hi_w = fs.ext_scalar_mul(w, fs.ext_mul(A[1], B[1]))
    expected = [fs.ext_add(lo, hi_w), cross]

    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    ct = lambda v: b.constant_extension(v)
    out = b.mul_ext_algebra([ct(A[0]), ct(A[1])], [ct(B[0]), ct(B[1])])
    b.register_public_inputs([t for et in out for t in et.parts])
    pis = _prove(b)
    assert pis == [x for e in expected for x in e]


def test_polynomial_eval_targets():
    from plonky2_tpu.gadgets.algebra_gadgets import (
        PolynomialCoeffsExtAlgebraTarget,
        PolynomialCoeffsExtTarget,
    )

    rng = np.random.default_rng(3)
    coeffs = [tuple(int(x) for x in rng.integers(0, fs.P, 2, dtype=np.uint64)) for _ in range(5)]
    z = tuple(int(x) for x in rng.integers(0, fs.P, 2, dtype=np.uint64))
    s = 12345

    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    ct = lambda v: b.constant_extension(v)
    poly = PolynomialCoeffsExtTarget([ct(c) for c in coeffs])
    ev = poly.eval(b, ct(z))
    ev_s = poly.eval_scalar(b, b.constant(s))
    b.register_public_inputs(list(ev.parts) + list(ev_s.parts))

    alg = PolynomialCoeffsExtAlgebraTarget(
        [[ct(c), ct((0, 0))] for c in coeffs])
    ev_a = alg.eval_scalar(b, ct(z))
    b.register_public_inputs(list(ev_a[0].parts))
    pis = _prove(b)

    def horner(point):
        acc = (0, 0)
        for c in reversed(coeffs):
            acc = fs.ext_add(fs.ext_mul(acc, point), c)
        return acc

    expected = list(horner(z)) + list(horner((s, 0))) + list(horner(z))
    assert pis == expected


def test_frobenius_ext():
    rng = np.random.default_rng(4)
    x = tuple(int(v) for v in rng.integers(0, fs.P, 2, dtype=np.uint64))
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    fr = b.frobenius_ext(b.constant_extension(x))
    fr2 = b.repeated_frobenius_ext(b.constant_extension(x), 2)
    b.register_public_inputs(list(fr.parts) + list(fr2.parts))
    pis = _prove(b)
    assert tuple(pis[:2]) == fs.ext_frobenius(x), "x^p mismatch"
    assert tuple(pis[2:]) == x, "Frobenius^D must be identity"


def test_select_ext_generalized_and_random_access_vk():
    rng = np.random.default_rng(5)
    x = tuple(int(v) for v in rng.integers(0, fs.P, 2, dtype=np.uint64))
    y = tuple(int(v) for v in rng.integers(0, fs.P, 2, dtype=np.uint64))
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    one_e = b.one_extension()
    zero_e = b.zero_extension()
    s1 = b.select_ext_generalized(one_e, b.constant_extension(x), b.constant_extension(y))
    s0 = b.select_ext_generalized(zero_e, b.constant_extension(x), b.constant_extension(y))
    b.register_public_inputs(list(s1.parts) + list(s0.parts))

    # random_access over two fake verifier keys (constant digests)
    from plonky2_tpu.recursion.recursive_verifier import VerifierCircuitTarget

    def fake_vk(tag):
        cap = [[b.constant(tag * 100 + i * 4 + j) for j in range(4)]
               for i in range(2)]
        return VerifierCircuitTarget(
            constants_sigmas_cap=cap,
            circuit_digest=[b.constant(tag * 1000 + j) for j in range(4)])

    vks = [fake_vk(1), fake_vk(2)]
    sel = b.random_access_verifier_data(b.constant(1), vks)
    b.register_public_inputs(sel.circuit_digest)
    b.register_public_inputs(sel.constants_sigmas_cap[0])
    pis = _prove(b)
    assert pis[:2] == list(x) and pis[2:4] == list(y)
    assert pis[4:8] == [2000, 2001, 2002, 2003]
    assert pis[8:12] == [200, 201, 202, 203]


def test_split_le_base():
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    x = b.add_virtual_target()
    limbs4 = b.split_le_base(x, 8, 4)  # 8 base-4 limbs of a 16-bit value
    b.register_public_inputs(limbs4)
    pw = PartialWitness()
    val = 0b1101100111000110
    pw.set_target(x, val)
    pis = _prove(b, pw)
    expected = [(val >> (2 * i)) & 3 for i in range(8)]
    assert pis == expected


def test_builder_convenience_apis():
    """build_prover/build_verifier/mock_build + constant hash/cap/vk +
    domain separator (reference circuit_builder.rs:262,1328-1347)."""
    def make(sep=None):
        b = CircuitBuilder(CircuitConfig.standard_recursion_config())
        if sep is not None:
            b.set_domain_separator(sep)
        xs = b.add_virtual_public_input_arr(3)
        h = b.add_virtual_hash_public_input()
        b.connect_array(xs[:2], xs[1:])  # x0 == x1 == x2
        b.register_public_input(b.constant_bool(True).target)
        return b, xs, h

    b, xs, h = make()
    data = b.build()

    b2, xs2, h2 = make()
    prover = b2.build_prover()
    pw = PartialWitness()
    pw.set_target(xs2[0], 9)
    for t in h2:
        pw.set_target(t, 1)
    proof = prover.prove(pw)
    assert proof.public_inputs == [9, 9, 9, 1, 1, 1, 1, 1]

    b3, _, _ = make()
    verifier = b3.build_verifier()
    verifier.verify(proof)
    blob = verifier.to_bytes()
    from plonky2_tpu.plonk.circuit_data import VerifierCircuitData

    VerifierCircuitData.from_bytes(blob).verify(proof)

    # distinct domain separators -> distinct circuit digests
    b4, _, _ = make(sep=[1, 2, 3])
    data4 = b4.build()
    assert data4.verifier_only.circuit_digest != data.verifier_only.circuit_digest

    # mock build generates witnesses without proving key material
    b5, xs5, h5 = make()
    mock = b5.mock_build()
    pw = PartialWitness()
    pw.set_target(xs5[0], 4)
    for t in h5:
        pw.set_target(t, 2)
    w = mock.generate_witness(pw)
    assert w.get_target(xs5[2]) == 4
