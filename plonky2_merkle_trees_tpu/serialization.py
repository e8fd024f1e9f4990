"""Checkpoint / serialization for trees, MMRs, and proofs.

The reference keeps everything in memory per test run (SURVEY.md §5
"Checkpoint / resume: None"); production deployment needs durable artifacts:

* MMR element arrays and Merkle trees -> .npz
* proof transcripts -> JSON (plonk.proof.proof_to_json / proof_from_json)
"""

import json

import numpy as np

from .mmr import MMR
from .naive_mmr import NaiveMMR
from .tree import MerkleTree
from .plonk.proof import proof_from_json, proof_to_json  # noqa: F401


def save_mmr(mmr: MMR, path: str) -> None:
    np.savez_compressed(path, elements=np.stack(mmr.elements)
                        if mmr.elements else np.zeros((0, 4), dtype=np.uint64))


def load_mmr(path: str) -> MMR:
    data = np.load(path)
    return MMR(list(data["elements"].astype(np.uint64)))


def save_tree(tree: MerkleTree, path: str) -> None:
    arrays = {f"level_{i}": lvl for i, lvl in enumerate(tree.tree)}
    np.savez_compressed(path, root=tree.root,
                        count_levels=np.array([tree.count_levels]), **arrays)


def load_tree(path: str) -> MerkleTree:
    data = np.load(path)
    count_levels = int(data["count_levels"][0])
    levels = [data[f"level_{i}"].astype(np.uint64) for i in range(count_levels)]
    return MerkleTree(count_levels, levels, data["root"].astype(np.uint64))


def save_proof(pwpi, path: str) -> None:
    with open(path, "w") as f:
        json.dump(proof_to_json(pwpi), f)


def load_proof(path: str):
    with open(path) as f:
        return proof_from_json(json.load(f))
