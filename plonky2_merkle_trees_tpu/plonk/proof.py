"""Proof objects (plonky2 ``ProofWithPublicInputs`` analog) + serialization."""

from dataclasses import dataclass
from typing import List

import numpy as np

from .field_ext import ExtensionField
from .fri import FriProof


@dataclass
class OpeningSet:
    """Polynomial evaluations at zeta (and zeta*omega for the Z polys)."""
    constants_sigmas: List[ExtensionField]
    wires: List[ExtensionField]
    zs: List[ExtensionField]
    partials: List[ExtensionField]
    quotient: List[ExtensionField]
    zs_next: List[ExtensionField]

    def flat(self) -> List[ExtensionField]:
        return (self.constants_sigmas + self.wires + self.zs + self.partials
                + self.quotient + self.zs_next)


@dataclass
class Proof:
    wires_cap: np.ndarray
    zs_partial_cap: np.ndarray
    quotient_cap: np.ndarray
    openings: OpeningSet
    fri: FriProof


@dataclass
class ProofWithPublicInputs:
    proof: Proof
    public_inputs: List[int]


def _ext_to_json(e: ExtensionField):
    return [e.a0, e.a1]


def _digests_to_json(arr) -> list:
    return np.asarray(arr, dtype=np.uint64).tolist()


def proof_to_json(pwpi: ProofWithPublicInputs) -> dict:
    """Serialize a proof to JSON-compatible plain data (checkpoint/transport
    parity: the reference never serializes proofs — SURVEY.md §5 marks this
    as a gap the TPU build fills)."""
    p = pwpi.proof
    return {
        "public_inputs": [int(v) for v in pwpi.public_inputs],
        "wires_cap": _digests_to_json(p.wires_cap),
        "zs_partial_cap": _digests_to_json(p.zs_partial_cap),
        "quotient_cap": _digests_to_json(p.quotient_cap),
        "openings": {
            k: [_ext_to_json(e) for e in getattr(p.openings, k)]
            for k in ("constants_sigmas", "wires", "zs", "partials",
                      "quotient", "zs_next")
        },
        "fri": {
            "commit_caps": [_digests_to_json(c) for c in p.fri.commit_caps],
            "final_poly": [_ext_to_json(e) for e in p.fri.final_poly],
            "pow_witness": p.fri.pow_witness,
            "query_rounds": [
                {
                    "index": qr.index,
                    "initial_values": [[int(v) for v in lv]
                                       for lv in qr.initial.leaf_values],
                    "initial_paths": [[_digests_to_json(d) for d in path]
                                      for path in qr.initial.paths],
                    "steps": [
                        {"coset_values": _digests_to_json(s.coset_values),
                         "path": [_digests_to_json(d) for d in s.path]}
                        for s in qr.steps
                    ],
                }
                for qr in p.fri.query_rounds
            ],
        },
    }


def proof_from_json(data: dict) -> ProofWithPublicInputs:
    from .fri import FriProof, FriQueryRound, FriQueryStep, FriInitialOpening

    def ext(v):
        return ExtensionField(int(v[0]), int(v[1]))

    def digs(v):
        return np.asarray(v, dtype=np.uint64)

    openings = OpeningSet(**{
        k: [ext(e) for e in data["openings"][k]]
        for k in ("constants_sigmas", "wires", "zs", "partials",
                  "quotient", "zs_next")
    })
    fri = FriProof(
        commit_caps=[digs(c) for c in data["fri"]["commit_caps"]],
        final_poly=[ext(e) for e in data["fri"]["final_poly"]],
        pow_witness=int(data["fri"]["pow_witness"]),
        query_rounds=[
            FriQueryRound(
                index=int(qr["index"]),
                initial=FriInitialOpening(
                    leaf_values=[digs(lv) for lv in qr["initial_values"]],
                    paths=[[digs(d) for d in path] for path in qr["initial_paths"]],
                ),
                steps=[FriQueryStep(coset_values=digs(s["coset_values"]),
                                    path=[digs(d) for d in s["path"]])
                       for s in qr["steps"]],
            )
            for qr in data["fri"]["query_rounds"]
        ],
    )
    proof = Proof(wires_cap=digs(data["wires_cap"]),
                  zs_partial_cap=digs(data["zs_partial_cap"]),
                  quotient_cap=digs(data["quotient_cap"]),
                  openings=openings, fri=fri)
    return ProofWithPublicInputs(proof=proof,
                                 public_inputs=[int(v) for v in data["public_inputs"]])
