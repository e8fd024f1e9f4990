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


# ---------------------------------------------------------------------------
# Circuit checkpoint: skip the expensive build in serving processes
# ---------------------------------------------------------------------------
#
# Building a degree-2^15 recursion circuit costs minutes of host Python
# (builder DSL + union-find + preprocessing).  Everything the PROVER needs
# at run time is a set of arrays: the preprocessed constants/sigmas values,
# the vectorised witness-engine tables (including the native VM program),
# and a dense target -> witness-root map.  save_circuit writes those;
# load_circuit reconstitutes a CircuitData that proves and verifies with
# byte-identical transcripts (the constants/sigmas commitment is recomputed
# deterministically, on device when one is attached).
#
# Loaded circuits carry no builder state (no generator closures, no
# union-find), so they require the vectorised witness engine — always
# available since the tables are part of the checkpoint.


def save_circuit(data, path: str) -> None:
    """Checkpoint a built CircuitData (see module comment)."""
    common = data.common
    po = data.prover_only
    config = common.config
    fri = config.fri_config
    vg = po.vec_gen
    if vg is None or vg.get("prog") is None:
        raise ValueError("circuit has no vectorised witness tables; "
                         "only builder-produced circuits can be saved")

    num_sel = common.selectors.shape[0]
    num_gate_constants = int(common.gate_constants.shape[0])
    pre_values = np.concatenate(
        [common.selectors, common.gate_constants, po.sigmas], axis=0)

    # dense target -> root id map (replaces the union-find dictionaries).
    # Checkpoint-LOADED circuits have empty root_map/root_id but already
    # carry the dense map — reuse it verbatim (re-deriving from the empty
    # dicts would save a 0-sized store; ADVICE r1).
    if vg.get("target_ids") is not None and not vg["root_id"]:
        target_ids = np.asarray(vg["target_ids"], dtype=np.int64)
    else:
        t_nodes = [n for n in po.root_map if n[0] == "t"]
        t_nodes += [n for n in vg["root_id"]
                    if isinstance(n, tuple) and n[0] == "t"]
        max_t = max((n[1] for n in t_nodes), default=-1) + 1
        target_ids = np.full(max_t, -1, dtype=np.int64)
        for t in range(max_t):
            node = ("t", t)
            root = po.root_map.get(node, node)
            target_ids[t] = vg["root_id"].get(root, -1)

    meta = {
        "config": {
            "num_wires": config.num_wires,
            "num_routed_wires": config.num_routed_wires,
            "num_constants": config.num_constants,
            "security_bits": config.security_bits,
            "num_challenges": config.num_challenges,
            "zero_knowledge": config.zero_knowledge,
            "max_quotient_degree_factor": config.max_quotient_degree_factor,
            "fri": {
                "rate_bits": fri.rate_bits, "cap_height": fri.cap_height,
                "proof_of_work_bits": fri.proof_of_work_bits,
                "num_query_rounds": fri.num_query_rounds,
                "max_arity_bits": fri.max_arity_bits,
                "final_poly_max_degree_bits": fri.final_poly_max_degree_bits,
            },
        },
        "degree_bits": common.degree_bits,
        "num_sel": num_sel,
        "num_gate_constants": num_gate_constants,
        "num_public_inputs": common.num_public_inputs,
        "public_inputs": [int(t) for t in po.public_inputs],
        "n_roots": int(vg.get("n_roots", len(vg["root_id"]))),
        "split_widths": sorted(vg["splits"].keys()),
        "blinding_rows": [int(r) for r in common.blinding_rows],
    }
    arrays = {
        "pre_values": pre_values,
        "target_ids": target_ids,
        "eqs": np.asarray(vg["eqs"], dtype=np.int64).reshape(-1, 4)
        if vg["eqs"] else np.zeros((0, 4), dtype=np.int64),
    }
    for key in ("const_ids", "const_vals", "a_x", "a_y", "a_z", "a_o",
                "a_c0", "a_c1", "p_in", "p_out", "inv_t", "inv_o",
                "ei_a", "ei_o", "wm_ids", "wm_cols", "wm_rows"):
        arrays[f"vg_{key}"] = vg[key]
    for nb, (s_t, s_bits) in vg["splits"].items():
        arrays[f"split_t_{nb}"] = s_t
        arrays[f"split_b_{nb}"] = s_bits
    for key, arr in vg["prog"].items():
        arrays[f"prog_{key}"] = arr
    np.savez_compressed(path, meta=np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8), **arrays)


def load_circuit(path: str):
    """Reconstitute a saved circuit; transcripts match the original
    byte-for-byte (deterministic recommit of the constants/sigmas oracle)."""
    from types import SimpleNamespace
    from . import poseidon
    from .plonk.config import CircuitConfig, FriConfig
    from .plonk.circuit_data import (
        CircuitData, CommonCircuitData, ProverOnlyCircuitData,
        VerifierOnlyCircuitData)
    from . import field

    data = np.load(path)
    meta = json.loads(bytes(data["meta"]).decode())
    c = meta["config"]
    config = CircuitConfig(
        num_wires=c["num_wires"], num_routed_wires=c["num_routed_wires"],
        num_constants=c["num_constants"], security_bits=c["security_bits"],
        num_challenges=c["num_challenges"], zero_knowledge=c["zero_knowledge"],
        max_quotient_degree_factor=c["max_quotient_degree_factor"],
        fri_config=FriConfig(**{
            "rate_bits": c["fri"]["rate_bits"],
            "cap_height": c["fri"]["cap_height"],
            "proof_of_work_bits": c["fri"]["proof_of_work_bits"],
            "num_query_rounds": c["fri"]["num_query_rounds"],
            "max_arity_bits": c["fri"]["max_arity_bits"],
            "final_poly_max_degree_bits": c["fri"]["final_poly_max_degree_bits"],
        }))
    degree_bits = meta["degree_bits"]
    num_sel = meta["num_sel"]
    # Gate-constant row count: stored in the checkpoint (older checkpoints
    # predate the field and were all written with 2); validate against the
    # current gate registry so a layout change fails loudly instead of
    # silently mis-slicing sigmas (ADVICE r1).
    from .plonk import gates as _gates
    ngc = int(meta.get("num_gate_constants", 2))
    if ngc != _gates.NUM_GATE_CONSTANTS:
        raise ValueError(
            f"checkpoint has {ngc} gate-constant rows but this build uses "
            f"{_gates.NUM_GATE_CONSTANTS}; re-save the circuit")
    pre_values = data["pre_values"].astype(np.uint64)
    selectors = pre_values[:num_sel]
    gate_constants = pre_values[num_sel:num_sel + ngc]
    sigmas = pre_values[num_sel + ngc:]
    r_wires = config.num_routed_wires
    k_is = [pow(field.MULTIPLICATIVE_GROUP_GENERATOR, i, field.P)
            for i in range(r_wires)]

    vg = {"root_id": {}, "n_roots": meta["n_roots"],
          "target_ids": data["target_ids"].astype(np.int64),
          "eqs": [tuple(int(v) for v in row) for row in data["eqs"]]}
    for key in ("const_ids", "const_vals", "a_x", "a_y", "a_z", "a_o",
                "a_c0", "a_c1", "p_in", "p_out", "inv_t", "inv_o",
                "ei_a", "ei_o", "wm_ids", "wm_cols", "wm_rows"):
        vg[key] = data[f"vg_{key}"]
    vg["splits"] = {nb: (data[f"split_t_{nb}"], data[f"split_b_{nb}"])
                    for nb in meta["split_widths"]}
    vg["prog"] = {key: data[f"prog_{key}"]
                  for key in ("ops", "args", "arg_off", "cons_off", "cons_idx")}

    # recommit the preprocessed oracle (deterministic; device when attached)
    from .plonk.device import device_mode
    if device_mode(SimpleNamespace(degree_bits=degree_bits)):
        from .plonk.device import DeviceBatch, _stage_batch
        import jax.numpy as jnp
        rate_bits = config.fri_config.rate_bits
        cap_height = config.fri_config.cap_height
        coeffs, lde, levels = _stage_batch(rate_bits, cap_height)(
            jnp.asarray(pre_values))
        pre_batch = DeviceBatch(coeffs, lde, levels,
                                min(cap_height, degree_bits + rate_bits))
        pre_batch.values = pre_values
    else:
        from .plonk.commitment import PolynomialBatch
        pre_batch = PolynomialBatch.from_values(
            pre_values, config.fri_config.rate_bits,
            config.fri_config.cap_height)
    cap = np.asarray(pre_batch.cap)
    from .plonk.circuit_data import compute_circuit_digest
    circuit_digest = compute_circuit_digest(cap, degree_bits, config)

    common = CommonCircuitData(
        config=config, degree_bits=degree_bits, selectors=selectors,
        gate_constants=gate_constants, k_is=k_is,
        num_public_inputs=meta["num_public_inputs"],
        blinding_rows=list(meta.get("blinding_rows", [])))
    prover_only = ProverOnlyCircuitData(
        constants_sigmas_batch=pre_batch, sigmas=sigmas,
        generators=[], public_inputs=list(meta["public_inputs"]),
        uf=None, uf_find=lambda node: node, rows=None,
        wm_fill=[], wm_cells=set(), vec_gen=vg, root_map={})
    verifier_only = VerifierOnlyCircuitData(
        constants_sigmas_cap=cap, circuit_digest=circuit_digest)
    return CircuitData(common, prover_only, verifier_only)
