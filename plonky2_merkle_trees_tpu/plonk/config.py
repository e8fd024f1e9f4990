"""Circuit / FRI configuration.

Defaults mirror plonky2 0.1.3's ``CircuitConfig::standard_recursion_config``
(the only config the reference ever uses — e.g. mmr_plonky2_verifier.rs:30):
135 wires / 80 routed, rate 1/8, cap height 4, 28 query rounds, 16 PoW bits,
degree-8 quotient chunks, 2 challenge sets.
"""

from dataclasses import dataclass, field


@dataclass(frozen=True)
class FriConfig:
    rate_bits: int = 3              # LDE blowup 8x
    cap_height: int = 4             # Merkle cap of 2^4 digests
    proof_of_work_bits: int = 16
    num_query_rounds: int = 28
    # Folding arities per FRI commit round (log2); chosen at build time from
    # the degree via max arity 4 like plonky2's reduction strategy.
    max_arity_bits: int = 4
    final_poly_max_degree_bits: int = 5

    def reduction_arity_bits(self, degree_bits: int) -> list:
        """Fold-by-16 until the final polynomial is small."""
        arities = []
        remaining = degree_bits + self.rate_bits  # LDE domain log-size
        current_degree = degree_bits
        while current_degree > self.final_poly_max_degree_bits:
            step = min(self.max_arity_bits, current_degree - self.final_poly_max_degree_bits)
            arities.append(step)
            current_degree -= step
        del remaining
        return arities


@dataclass(frozen=True)
class CircuitConfig:
    num_wires: int = 135
    num_routed_wires: int = 80
    num_constants: int = 2
    security_bits: int = 100
    num_challenges: int = 2
    zero_knowledge: bool = False
    max_quotient_degree_factor: int = 8
    fri_config: FriConfig = field(default_factory=FriConfig)

    @staticmethod
    def standard_recursion_config() -> "CircuitConfig":
        return CircuitConfig()

    @staticmethod
    def test_config() -> "CircuitConfig":
        """Reduced-security config (fewer FRI queries, lighter grinding) so
        recursion tests stay seconds, not minutes.  Protocol shape is
        identical to the standard config."""
        return CircuitConfig(fri_config=FriConfig(num_query_rounds=6,
                                                  proof_of_work_bits=8))
