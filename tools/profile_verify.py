"""Profile the host proof verifier (VERDICT r4 weak #2: verification was
the one metric losing to its baseline, with no profiler to explain why).

Usage:
    python tools/profile_verify.py [--circuit C.npz --proof P.json] [--iters N]

With no arguments it loads the flagship outer circuit from the bench
artifact dir and expects a proof at <artifact_dir>/outer_proof.json (bench
writes one); otherwise it builds a small standard-config Merkle circuit and
proves it on the host first.

Prints total verify seconds plus a cProfile cumulative-time top list —
the scalar hotspots (ExtensionField arithmetic in eval_combined, transcript
replay, FRI fold checks) are exactly what needs batching.
"""

import argparse
import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("PMT_PROFILE_VERIFY_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")   # verify is host-side work

import plonky2_merkle_trees_tpu as pmt  # noqa: E402
from plonky2_merkle_trees_tpu.serialization import (  # noqa: E402
    load_circuit, load_proof)


def _small_case():
    import numpy as np
    from plonky2_merkle_trees_tpu import MerkleTree, field
    from plonky2_merkle_trees_tpu.circuits.merkle import (
        verify_merkle_proof_circuit)
    from plonky2_merkle_trees_tpu.plonk.witness import PartialWitness

    leaves = [int(v) for v in np.random.default_rng(5).integers(
        0, field.P, size=16, dtype=np.uint64)]
    mt = MerkleTree.build(leaves)
    idx = 6
    data, targets = verify_merkle_proof_circuit(idx, 4)
    pw = PartialWitness()
    pw.set_hash_target(targets[0], mt.tree[0][idx])
    for ht, h in zip(targets[1:], mt.get_merkle_proof(idx)):
        pw.set_hash_target(ht, h)
    for t, v in zip(data.prover_only.public_inputs, mt.root):
        pw.set_target(t, int(v))
    return data, data.prove(pw)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--circuit")
    ap.add_argument("--proof")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    if args.circuit and args.proof:
        data = load_circuit(args.circuit)
        proof = load_proof(args.proof)
    else:
        print("building small standard-config case (pass --circuit/--proof "
              "for the flagship)...", flush=True)
        data, proof = _small_case()

    data.verify(proof)  # warm native lib etc.
    start = time.perf_counter()
    for _ in range(args.iters):
        data.verify(proof)
    per = (time.perf_counter() - start) / args.iters
    print(f"verify: {per:.4f} s/iter over {args.iters} iters")

    prof = cProfile.Profile()
    prof.enable()
    for _ in range(args.iters):
        data.verify(proof)
    prof.disable()
    buf = io.StringIO()
    pstats.Stats(prof, stream=buf).sort_stats("cumulative").print_stats(args.top)
    print(buf.getvalue())


if __name__ == "__main__":
    main()
