"""Regenerate the committed flagship bench artifacts for the CURRENT tree.

bench.py keys its artifact cache (checkpointed outer circuit + witness for
the flagship 1-recursion prove) on a hash of the package sources, so ANY
source edit invalidates the committed artifacts and the driver's bench
would fall back to the expensive fresh-build path.  Run this as the LAST
step of a round, after the final source change:

    python tools/refresh_bench_artifacts.py
    git add .bench_artifacts && git commit ...

It forces the HOST prover for the inner proof (PMT_PROVER_DEVICE=0): the
host and device provers are transcript-identical by construction (pinned in
tests/test_device_prover.py), and the host path avoids the multi-minute
client-side XLA compile of the inner circuit's device programs — artifacts
only need the inner PROOF BYTES, not device residency.
"""

import os
import sys

os.environ.setdefault("PMT_PROVER_DEVICE", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# Artifact regeneration never needs an accelerator; force the CPU backend
# (the axon sitecustomize pins jax_platforms at interpreter startup, so the
# env var alone does not stick — same pattern as tests/conftest.py) so this
# also runs while another process holds the TPU.
jax.config.update("jax_platforms", "cpu")

import bench  # noqa: E402


def main():
    art_dir = bench._artifact_dir()
    if not os.path.exists(os.path.join(art_dir, "COMPLETE")):
        print(f"building flagship artifacts -> {art_dir}")
        outer, pw2 = bench._build_flagship_fresh()
        bench._save_flagship(outer, pw2, art_dir)
    else:
        print(f"flagship artifacts already current: {art_dir}")
    if not os.path.exists(os.path.join(art_dir, "CHAIN_COMPLETE")):
        # the uniform-chain circuit bundle (bench_chain4/bench_chain16):
        # three circuit builds incl. the fixpoint probe, minutes of host
        # Python the driver's bench deadline cannot pay
        print(f"building uniform-chain artifacts -> {art_dir}")
        from plonky2_merkle_trees_tpu.circuits.merkle_recursion import (
            uniform_chain_circuits)
        uniform_chain_circuits(cache_dir=art_dir)
    else:
        print(f"chain artifacts already current: {art_dir}")
    # prune stale source keys so the committed dir holds exactly one entry
    base = os.path.dirname(art_dir)
    for name in os.listdir(base):
        stale = os.path.join(base, name)
        if stale != art_dir and os.path.isdir(stale):
            import shutil
            shutil.rmtree(stale)
            print(f"pruned stale artifacts: {stale}")
    print("done")


if __name__ == "__main__":
    main()
