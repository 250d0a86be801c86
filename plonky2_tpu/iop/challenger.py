"""Fiat-Shamir challenger: duplex sponge in overwrite mode (host-side).

Behavioral parity with reference iop/challenger.rs:16-153 is consensus
critical — challenge streams must be bit-exact. Notes carried over:
  - observing clears the output buffer;
  - absorbing auto-duplexes when the input buffer reaches RATE;
  - `get_challenge` duplexes if inputs are pending or outputs exhausted, then
    POPS FROM THE END of the squeezed rate (first challenge = state[RATE-1]);
  - `compact()` flushes pending inputs and exposes the raw sponge state
    (used by the FRI proof-of-work grinder).

The transcript is tiny and strictly sequential — the wrong shape for the TPU
— so it runs on host with Python ints; bulk device work happens between
challenger interactions (5 sync points per proof, see SURVEY.md §3.2).
"""

from __future__ import annotations

from plonky2_tpu.hash import poseidon as ps
from plonky2_tpu.hash.poseidon_constants import SPONGE_RATE, SPONGE_WIDTH


class Challenger:
    def __init__(self, hasher=None):
        from plonky2_tpu.hash.hashers import PoseidonHasher

        self.hasher = hasher or PoseidonHasher
        self.sponge_state: list[int] = [0] * SPONGE_WIDTH
        self.input_buffer: list[int] = []
        self.output_buffer: list[int] = []

    # -- observing ---------------------------------------------------------

    def observe_element(self, element: int) -> None:
        assert 0 <= element < ps.P
        self.output_buffer.clear()
        self.input_buffer.append(element)
        if len(self.input_buffer) == SPONGE_RATE:
            self._duplexing()

    def observe_elements(self, elements) -> None:
        for e in elements:
            self.observe_element(e)

    def observe_extension_element(self, element) -> None:
        self.observe_elements(element)

    def observe_extension_elements(self, elements) -> None:
        for e in elements:
            self.observe_extension_element(e)

    def observe_hash(self, digest) -> None:
        """Digest felts (Poseidon HashOut) or bytes (Keccak BytesHash —
        7-byte-chunk felts, reference hash_types.rs:184-194)."""
        from plonky2_tpu.hash.hashers import observe_digest

        observe_digest(self, digest)

    def observe_cap(self, cap) -> None:
        for digest in cap:
            self.observe_hash(digest)

    # -- squeezing ---------------------------------------------------------

    def get_challenge(self) -> int:
        if self.input_buffer or not self.output_buffer:
            self._duplexing()
        return self.output_buffer.pop()

    def get_n_challenges(self, n: int) -> list[int]:
        return [self.get_challenge() for _ in range(n)]

    def get_hash(self) -> list[int]:
        return self.get_n_challenges(4)

    def get_extension_challenge(self, d: int = 2) -> tuple[int, ...]:
        return tuple(self.get_n_challenges(d))

    def get_n_extension_challenges(self, n: int, d: int = 2) -> list[tuple[int, ...]]:
        return [self.get_extension_challenge(d) for _ in range(n)]

    # -- internals ---------------------------------------------------------

    def _duplexing(self) -> None:
        assert len(self.input_buffer) <= SPONGE_RATE
        for i, x in enumerate(self.input_buffer):
            self.sponge_state[i] = x
        self.input_buffer.clear()
        self.sponge_state = self.hasher.permute(self.sponge_state)
        self.output_buffer = list(self.sponge_state[:SPONGE_RATE])

    def compact(self) -> list[int]:
        """Flush inputs and return the raw sponge state (for PoW grinding)."""
        if self.input_buffer:
            self._duplexing()
        self.output_buffer.clear()
        return list(self.sponge_state)


class DeviceChallenger:
    """Trace-time dual of `Challenger` for use INSIDE one jit program.

    Values (sponge state, buffered elements) are device scalars; buffer
    COUNTS are static Python ints, so tracing unrolls the exact duplex
    schedule the host challenger would execute — challenge streams are
    bit-identical. Used by the fused FRI commit phase (fri/prover.py) to run
    cap-observe -> beta -> fold chains without per-step host round trips."""

    def __init__(self, sponge_state, pending_inputs=()):
        self.state = sponge_state  # [12] u64 device array
        self.inputs = list(pending_inputs)  # list of 0-d device scalars
        self.outputs: list = []

    def observe_element(self, x) -> None:
        from plonky2_tpu.hash.poseidon_constants import SPONGE_RATE

        self.outputs = []
        self.inputs.append(x)
        if len(self.inputs) == SPONGE_RATE:
            self._duplexing()

    def observe_cap_rows(self, cap) -> None:
        """cap: [rows, 4] device digests, observed row-major (the host
        observe_cap order)."""
        rows, width = cap.shape
        for r in range(rows):
            for c in range(width):
                self.observe_element(cap[r, c])

    def get_challenge(self):
        if self.inputs or not self.outputs:
            self._duplexing()
        return self.outputs.pop()

    def _duplexing(self) -> None:
        import jax.numpy as jnp

        from plonky2_tpu.hash.poseidon_constants import SPONGE_RATE

        st = self.state
        if self.inputs:
            st = jnp.concatenate([jnp.stack(self.inputs),
                                  st[len(self.inputs):]])
        st = ps.permute_dev_sm(st[:, None])[:, 0]
        self.state = st
        self.inputs = []
        self.outputs = [st[i] for i in range(SPONGE_RATE)]


import functools as _functools


@_functools.lru_cache(maxsize=None)
def cap_boundary_fn(k_pending: int, cap_height: int, natural: bool,
                    n_draws: int):
    """One cached jit for a prover phase boundary: absorb one Merkle cap into
    the device-resident transcript, then draw `n_draws` challenges — the
    Fiat-Shamir step between commitment rounds (reference plonk/prover.rs
    observe_cap + get_n_challenges) WITHOUT fetching the cap to host.

    cap: natural=True takes the NaturalMerkleTree device cap layout
    [4, 2^cap_height] (reference row order is the bit-reversed column);
    natural=False takes row-major [2^cap_height, 4] digests.

    Returns (sponge_state [12], pending [k_out], draws [n_draws],
    cap_rows [2^cap_height, 4] in reference digest order — so the proof's
    cap bytes can ride a later packed fetch instead of their own round
    trip). The pending count after any draw is 0 (duplexing flushes
    inputs); with n_draws=0 it is (k_pending + 4*2^cap_height) %
    SPONGE_RATE — static either way, so callers thread it to the next
    boundary."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from plonky2_tpu.util import reverse_bits

    C = 1 << cap_height

    def f(sponge, pending, cap):
        dc = DeviceChallenger(sponge, [pending[i] for i in range(k_pending)])
        if natural:
            perm = np.asarray([reverse_bits(c, cap_height) for c in range(C)],
                              dtype=np.int32)
            rows = cap[:, perm].T  # [C, 4] reference digest order
        else:
            rows = cap
        dc.observe_cap_rows(rows)
        draws = [dc.get_challenge() for _ in range(n_draws)]
        pend = (jnp.stack(dc.inputs) if dc.inputs
                else jnp.zeros((0,), jnp.uint64))
        out = (jnp.stack(draws) if draws else jnp.zeros((0,), jnp.uint64))
        return dc.state, pend, out, rows

    from plonky2_tpu.util.export_cache import persistent_jit

    pj = persistent_jit(f, name="iop.challenger.cap_boundary")
    key = repr((k_pending, cap_height, natural, n_draws))
    return lambda *a: pj(*a, _pj_key=key)
