"""Fiat-Shamir challenger: Poseidon duplex sponge (plonky2-style).

Absorbs transcript elements (public inputs, commitment caps, openings) and
squeezes verifier challenges; prover and verifier run identical instances so
challenges bind to the whole transcript prefix.
"""

from typing import List

from .. import poseidon
from ..poseidon_constants import RATE, WIDTH
from .field_ext import ExtensionField


class Challenger:
    def __init__(self):
        self.sponge_state: List[int] = [0] * WIDTH
        self.input_buffer: List[int] = []
        self.output_buffer: List[int] = []

    def _duplex(self) -> None:
        for i, v in enumerate(self.input_buffer):
            self.sponge_state[i] = v
        self.input_buffer.clear()
        self.sponge_state = poseidon.permute_scalar(self.sponge_state)
        self.output_buffer = list(self.sponge_state[:RATE])

    def observe_element(self, x: int) -> None:
        self.output_buffer.clear()  # any new input invalidates pending outputs
        self.input_buffer.append(int(x))
        if len(self.input_buffer) == RATE:
            self._duplex()

    def observe_elements(self, xs) -> None:
        xs = [int(x) for x in xs]
        if len(xs) + len(self.input_buffer) >= 2 * RATE:
            from .. import native
            if native.available():
                self._observe_bulk(xs)
                return
        for x in xs:
            self.observe_element(x)

    def _observe_bulk(self, xs) -> None:
        """Bulk twin of the observe_element loop: identical sponge states
        and buffer contents, one native call for all full RATE chunks."""
        import numpy as np
        from .. import native
        total = self.input_buffer + xs
        n_full = len(total) // RATE * RATE
        rem = total[n_full:]
        if n_full:
            state = native.sponge_absorb(
                np.asarray(self.sponge_state, dtype=np.uint64),
                np.asarray(total[:n_full], dtype=np.uint64))
            self.sponge_state = [int(v) for v in state]
            # the scalar walk leaves output_buffer = state[:RATE] right
            # after a duplex, and empty once another element arrives
            self.output_buffer = [] if rem else list(self.sponge_state[:RATE])
        elif xs:
            self.output_buffer = []
        self.input_buffer = rem

    def observe_hash(self, digest) -> None:
        self.observe_elements(int(v) for v in digest)

    def observe_cap(self, cap) -> None:
        # one bulk absorb for the whole cap (identical element stream)
        self.observe_elements(int(v) for digest in cap for v in digest)

    def observe_extension(self, x: ExtensionField) -> None:
        self.observe_elements(x.to_basefield_array())

    def observe_extensions(self, xs) -> None:
        for x in xs:
            self.observe_extension(x)

    def get_challenge(self) -> int:
        if self.input_buffer or not self.output_buffer:
            self._duplex()
        return self.output_buffer.pop()

    def get_n_challenges(self, n: int) -> List[int]:
        return [self.get_challenge() for _ in range(n)]

    def get_extension_challenge(self) -> ExtensionField:
        a0 = self.get_challenge()
        a1 = self.get_challenge()
        return ExtensionField(a0, a1)
