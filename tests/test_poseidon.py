"""Poseidon KATs (reference hash/poseidon_goldilocks.rs:420+ test vectors) and
host/device consistency."""

import random

import numpy as np

from plonky2_tpu.field import scalar as s
from plonky2_tpu.hash import poseidon as ps

NEG_ONE = s.P - 1

KATS = [
    ([0] * 12,
     [0x3C18A9786CB0B359, 0xC4055E3364A246C3, 0x7953DB0AB48808F4, 0xC71603F33A1144CA,
      0xD7709673896996DC, 0x46A84E87642F44ED, 0xD032648251EE0B3C, 0x1C687363B207DF62,
      0xDF8565563E8045FE, 0x40F5B37FF4254DAE, 0xD070F637B431067C, 0x1792B1C4342109D7]),
    (list(range(12)),
     [0xD64E1E3EFC5B8E9E, 0x53666633020AAA47, 0xD40285597C6A8825, 0x613A4F81E81231D2,
      0x414754BFEBD051F0, 0xCB1F8980294A023F, 0x6EB2A9E4D54A9D0F, 0x1902BC3AF467E056,
      0xF045D5EAFDC6021F, 0xE4150F77CAAA3BE5, 0xC9BFD01D39B50CCE, 0x5C0A27FCB0E1459B]),
    ([NEG_ONE] * 12,
     [0xBE0085CFC57A8357, 0xD95AF71847D05C09, 0xCF55A13D33C1C953, 0x95803A74F4530E82,
      0xFCD99EB30A135DF1, 0xE095905E913A3029, 0xDE0392461B42919B, 0x7D3260E24E81D031,
      0x10D3D0465D9DEAA0, 0xA87571083DFC2A47, 0xE18263681E9958F8, 0xE28E96F1AE5E60D3]),
    ([0x8CCBBBEA4FE5D2B7, 0xC2AF59EE9EC49970, 0x90F7E1A9E658446A, 0xDCC0630A3AB8B1B8,
      0x7FF8256BCA20588C, 0x5D99A7CA0C44ECFB, 0x48452B17A70FBEE3, 0xEB09D654690B6C88,
      0x4A55D3A39C676A88, 0xC0407A38D2285139, 0xA234BAC9356386D1, 0xE1633F2BAD98A52F],
     [0xA89280105650C4EC, 0xAB542D53860D12ED, 0x5704148E9CCAB94F, 0xD3A826D4B62DA9F5,
      0x8A7A6CA87892574F, 0xC7017E1CAD1A674E, 0x1F06668922318E34, 0xA3B203BC8102676F,
      0xFCC781B0CE382BF2, 0x934C69FF3ED14BA5, 0x504688A5996E8F13, 0x401F3F2ED524A2BA]),
]


def test_scalar_kats():
    for inp, expected in KATS:
        assert ps.permute(inp) == expected


def test_device_matches_scalar_on_kats():
    from plonky2_tpu.field import goldilocks as g

    states = g.to_field([inp for inp, _ in KATS])  # [4, 12]
    out = np.asarray(ps.permute_dev(states))
    for row, (_, expected) in zip(out, KATS):
        assert [int(v) for v in row] == expected


def test_device_batch_random():
    from plonky2_tpu.field import goldilocks as g

    rng = random.Random(7)
    batch = [[rng.randrange(s.P) for _ in range(12)] for _ in range(33)]
    out = np.asarray(ps.permute_dev(g.to_field(batch)))
    for row, inp in zip(out, batch):
        assert [int(v) for v in row] == ps.permute(inp)


def test_sponge():
    # hash_n_to_m_no_pad absorb/squeeze shape checks + determinism
    inputs = list(range(1, 20))
    out = ps.hash_no_pad(inputs)
    assert len(out) == 4
    assert out == ps.hash_no_pad(inputs)
    assert out != ps.hash_no_pad(inputs[:-1])
    # hash_or_noop passthrough
    assert ps.hash_or_noop([5, 6]) == [5, 6, 0, 0]
    assert ps.hash_or_noop(list(range(5))) == ps.hash_no_pad(list(range(5)))
    # squeeze more than rate
    out12 = ps.hash_n_to_m_no_pad(inputs, 12)
    assert len(out12) == 12 and out12[:4] == out
