"""Profile the vectorised witness engine: pass count and per-pass pending
sizes on the recursion outer prove (the flagship flow).

Run on CPU (witness gen is host-side anyway):
    python tools/profile_witness.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import plonky2_merkle_trees_tpu  # noqa: F401
from plonky2_merkle_trees_tpu import field
from plonky2_merkle_trees_tpu.mmr import MMR
from plonky2_merkle_trees_tpu.circuits.mmr_recursion import (
    verify_inner_merkle_proof_circuit,
    complete_verification_circuit_with_inner_proof,
)
from plonky2_merkle_trees_tpu.plonk.witness import PartialWitness
from plonky2_merkle_trees_tpu.plonk import prover


def main():
    rng = np.random.default_rng(7)
    leaves = rng.integers(0, field.P, size=11, dtype=np.uint64)
    mmr = MMR.from_leaves(leaves)
    pr = mmr.get_proof_normal_index(3)
    root = mmr.bagging_the_peaks()

    t0 = time.perf_counter()
    inner, leaf_t, proof_ts = verify_inner_merkle_proof_circuit(
        len(pr.merkle_proof), len(pr.peaks))
    print(f"inner build: {time.perf_counter()-t0:.2f}s degree={inner.common.degree}")

    pw1 = PartialWitness()
    pw1.set_target(leaf_t, int(leaves[3]))
    for (ht, bt), (h, b) in zip(proof_ts, pr.merkle_proof):
        pw1.set_hash_target(ht, h)
        pw1.set_bool_target(bt, b)
    pi = inner.prover_only.public_inputs
    for t, v in zip(pi, [e for p in pr.peaks for e in p]):
        pw1.set_target(t, int(v))

    t0 = time.perf_counter()
    inner_proof = inner.prove(pw1)
    print(f"inner prove: {time.perf_counter()-t0:.2f}s")

    t0 = time.perf_counter()
    outer, proof_t, vdata_t, peak_ts = complete_verification_circuit_with_inner_proof(
        inner.common, len(pr.peaks))
    print(f"outer build: {time.perf_counter()-t0:.2f}s degree={outer.common.degree}")

    pw2 = PartialWitness()
    pw2.set_proof_with_pis_target(proof_t, inner_proof)
    pw2.set_verifier_data_target(vdata_t, inner.verifier_only)
    for ts, peak in zip(peak_ts, pr.peaks):
        pw2.set_hash_target(ts, peak)
    for t, v in zip(outer.prover_only.public_inputs, root):
        pw2.set_target(t, int(v))

    # Profile witness gen alone, with pass tracing enabled.  The native
    # witness VM bypasses the fixpoint (and its per-pass trace), so run the
    # traced engine with the program disabled first, then time the VM.
    os.environ["PMT_WITNESS_TRACE"] = "1"
    vg = outer.prover_only.vec_gen
    prog = vg.pop("prog", None)
    t0 = time.perf_counter()
    w = prover._run_generators(outer, pw2)
    print(f"outer witness gen (fixpoint engine): {time.perf_counter()-t0:.2f}s")
    os.environ.pop("PMT_WITNESS_TRACE")
    if prog is not None:
        vg["prog"] = prog
    t0 = time.perf_counter()
    w = prover._run_generators(outer, pw2)
    print(f"outer witness gen (native VM if available): {time.perf_counter()-t0:.2f}s")
    t0 = time.perf_counter()
    wires = prover._wire_matrix(outer, w)
    print(f"outer wire matrix: {time.perf_counter()-t0:.2f}s shape={wires.shape}")

    t0 = time.perf_counter()
    final = outer.prove(pw2)
    print(f"outer prove total: {time.perf_counter()-t0:.2f}s")
    outer.verify(final)
    print("verified ok")


if __name__ == "__main__":
    main()
