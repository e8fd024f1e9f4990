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
        for x in xs:
            self.observe_element(x)

    def observe_hash(self, digest) -> None:
        self.observe_elements(int(v) for v in digest)

    def observe_cap(self, cap) -> None:
        for digest in cap:
            self.observe_hash(digest)

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
