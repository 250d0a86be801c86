"""Regenerate the Poseidon round constants from the ChaCha8 seed.

Parity tool for the reference's constant generator
(plonky2/src/bin/generate_constants.rs): ChaCha8 seeded with 0 via
rand_core's seed_from_u64 (a PCG32 expansion), sampled into [0, p) with
rand 0.8's widening-multiply rejection sampler. Asserts the regenerated
stream equals plonky2_tpu.hash.poseidon_constants.ALL_ROUND_CONSTANTS and
prints the table in the reference's format.
"""

import sys

sys.path.insert(0, "/root/repo")

MASK32 = (1 << 32) - 1
MASK64 = (1 << 64) - 1


def _pcg32_expand_seed(state: int, nbytes: int) -> bytes:
    """rand_core 0.6 SeedableRng::seed_from_u64: PCG32 stream, 4 bytes/step."""
    MUL = 6364136223846793005
    INC = 11634580027462260723
    out = bytearray()
    while len(out) < nbytes:
        state = (state * MUL + INC) & MASK64
        xorshifted = (((state >> 18) ^ state) >> 27) & MASK32
        rot = state >> 59
        x = ((xorshifted >> rot) | (xorshifted << ((32 - rot) & 31))) & MASK32
        out += x.to_bytes(4, "little")
    return bytes(out[:nbytes])


class ChaCha8:
    """rand_chacha 0.3 ChaCha8Rng word stream (64-byte blocks, 8 rounds)."""

    def __init__(self, seed: bytes):
        assert len(seed) == 32
        self.key = [int.from_bytes(seed[4 * i:4 * i + 4], "little") for i in range(8)]
        self.counter = 0
        self.words: list[int] = []

    @staticmethod
    def _quarter(s, a, b, c, d):
        s[a] = (s[a] + s[b]) & MASK32
        s[d] = ((s[d] ^ s[a]) << 16 | (s[d] ^ s[a]) >> 16) & MASK32
        s[c] = (s[c] + s[d]) & MASK32
        s[b] = ((s[b] ^ s[c]) << 12 | (s[b] ^ s[c]) >> 20) & MASK32
        s[a] = (s[a] + s[b]) & MASK32
        s[d] = ((s[d] ^ s[a]) << 8 | (s[d] ^ s[a]) >> 24) & MASK32
        s[c] = (s[c] + s[d]) & MASK32
        s[b] = ((s[b] ^ s[c]) << 7 | (s[b] ^ s[c]) >> 25) & MASK32

    def _block(self) -> list[int]:
        st = [0x61707865, 0x3320646E, 0x79622D32, 0x6B206574,
              *self.key,
              self.counter & MASK32, (self.counter >> 32) & MASK32, 0, 0]
        s = list(st)
        for _ in range(4):  # 8 rounds = 4 double rounds
            self._quarter(s, 0, 4, 8, 12)
            self._quarter(s, 1, 5, 9, 13)
            self._quarter(s, 2, 6, 10, 14)
            self._quarter(s, 3, 7, 11, 15)
            self._quarter(s, 0, 5, 10, 15)
            self._quarter(s, 1, 6, 11, 12)
            self._quarter(s, 2, 7, 8, 13)
            self._quarter(s, 3, 4, 9, 14)
        self.counter += 1
        return [(x + y) & MASK32 for x, y in zip(s, st)]

    def next_u32(self) -> int:
        if not self.words:
            self.words = self._block()
        return self.words.pop(0)

    def next_u64(self) -> int:
        lo = self.next_u32()
        return lo | (self.next_u32() << 32)


def gen_range_u64(rng: ChaCha8, end: int) -> int:
    """rand 0.8 UniformInt::<u64>::sample_single(0, end): widening-multiply
    rejection with zone = (end << end.leading_zeros()) - 1."""
    lz = 64 - end.bit_length()
    zone = ((end << lz) - 1) & MASK64
    while True:
        v = rng.next_u64()
        prod = v * end
        hi, lo = prod >> 64, prod & MASK64
        if lo <= zone:
            return hi


def generate(n: int = 12 * 30) -> list[int]:
    p = 0xFFFFFFFF00000001  # Goldilocks order
    rng = ChaCha8(_pcg32_expand_seed(0, 32))
    return [gen_range_u64(rng, p) for _ in range(n)]


def main():
    from plonky2_tpu.hash.poseidon_constants import ALL_ROUND_CONSTANTS

    constants = generate()
    assert constants == list(ALL_ROUND_CONSTANTS), (
        "regenerated constants do not match the shipped table")
    for i in range(0, len(constants), 4):
        print(" ".join(f"0x{c:016x}," for c in constants[i:i + 4]))
    print("# OK: matches ALL_ROUND_CONSTANTS", file=sys.stderr)


if __name__ == "__main__":
    main()
