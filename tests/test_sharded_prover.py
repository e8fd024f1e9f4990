"""The distributed (mesh-sharded) prover on the 8-virtual-device CPU mesh.

The whole point of the SPMD design is that partitioning must not change a
single byte of the transcript: modular arithmetic is exact, so the sharded
programs must reproduce the PINNED sha256 of the single-chip prover's proof
bytes (VERDICT r1 #1 "byte-identical transcript").
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute tier; fast CI runs -m 'not slow'

import jax

from plonky2_merkle_trees_tpu import MMR, field
from plonky2_merkle_trees_tpu.circuits.mmr import verify_mmr_proof_circuit
from plonky2_merkle_trees_tpu.parallel.mesh import make_mesh
from plonky2_merkle_trees_tpu.plonk import PartialWitness
from plonky2_merkle_trees_tpu.plonk import device as dev
from plonky2_merkle_trees_tpu.plonk.config import CircuitConfig

from test_device_prover import _proof_bytes
from test_transcript_pin import (_digest, _merkle_case, _mmr_case,
                                 PIN_MERKLE_STANDARD, PIN_MMR_TEST)


def test_sharded_prove_matches_standard_pin():
    """Full standard-config prove as SPMD over all 8 devices — the result
    must hit the ABSOLUTE pinned transcript digest (not just pairwise
    equality with the single-chip path)."""
    data, pw = _merkle_case()
    mesh = make_mesh(8)
    proof = dev.prove_device_sharded(data, pw, mesh)
    data.verify(proof)
    assert _digest(proof) == PIN_MERKLE_STANDARD, \
        "sharded prover transcript diverged from the single-chip pin"


def test_sharded_prove_test_config_and_submesh():
    """test_config MMR circuit on a 4-device sub-mesh: byte-equal to the
    numpy prover's bytes and to the pinned digest."""
    data, pw = _mmr_case(CircuitConfig.test_config())
    proof_np = data.prove(pw)                      # numpy/native path
    mesh = make_mesh(4)
    proof_sh = dev.prove_device_sharded(data, pw, mesh)
    data.verify(proof_sh)
    assert _proof_bytes(proof_sh) == _proof_bytes(proof_np)
    assert _digest(proof_sh) == PIN_MMR_TEST
