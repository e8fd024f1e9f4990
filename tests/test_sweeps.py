"""Sweep tests — parity with the reference's exhaustive all-index sweeps
(SURVEY.md §4: naive MMR round-trips for 8/16/18/21 leaves over every index,
circuit sweeps over every leaf of every size 0..40).

Out-of-circuit sweeps run in full (hashing is cheap through the native lib).
In-circuit sweeps prove a reduced grid by default — a full prove costs ~1.5s
on this host — and the whole reference grid under PMT_SLOW_TESTS=1.
"""

import os

import numpy as np
import pytest

from plonky2_merkle_trees_tpu import MMR, NaiveMMR, field
from plonky2_merkle_trees_tpu.circuits import verify_mmr_proof_circuit
from plonky2_merkle_trees_tpu.plonk import PartialWitness
from plonky2_merkle_trees_tpu.plonk.config import CircuitConfig

SLOW = os.environ.get("PMT_SLOW_TESTS") == "1"


def _leaves(n, seed=0):
    return [int(v) for v in
            np.random.default_rng(seed).integers(0, field.P, n, dtype=np.uint64)]


def test_mmr_native_sweep_all_sizes_all_indices():
    """Optimized MMR: proof round-trip for EVERY leaf of EVERY size 1..40
    (the reference sweeps this grid through its circuit tests)."""
    for n in range(1, 41):
        leaves = _leaves(n, seed=n)
        mmr = MMR.from_leaves(leaves)
        root = mmr.bagging_the_peaks()
        for i in range(n):
            pr = mmr.get_proof_normal_index(i)
            assert pr.verify(leaves[i], root), (n, i)


def test_naive_mmr_native_sweep():
    """Naive MMR: every ordinal of the reference's 8/16/18/"21"-leaf sweeps.

    NB the reference's test_mmr_proof_tree_21_leaves_all_indices actually
    inserts 22 leaves (naive_merkle_mountain_ranges.rs:748-754) — with 21,
    ordinal 20 is a single-leaf peak, whose subtree Merkle proof is
    undefined in the naive implementation (both here and in the reference's
    index walk).  We mirror the 22-leaf construction."""
    from plonky2_merkle_trees_tpu import get_mmr_index
    for n in (8, 16, 18, 22):
        leaves = _leaves(n, seed=100 + n)
        mmr = NaiveMMR(leaves[0])
        for v in leaves[1:]:
            mmr.add_leaf(v)
        root = mmr.bagging_the_peaks().root
        for ordinal in range(n):
            pr = mmr.get_proof(get_mmr_index(ordinal))
            assert NaiveMMR.verify_proof(pr[2], leaves[ordinal], pr[0],
                                         pr[1], root), (n, ordinal)


def _prove_mmr_index(n, i, config):
    leaves = _leaves(n, seed=1000 + n)
    mmr = MMR.from_leaves(leaves)
    pr = mmr.get_proof_normal_index(i)
    root = mmr.bagging_the_peaks()
    data, leaf_t, proof_ts, peak_ts = verify_mmr_proof_circuit(
        len(pr.merkle_proof), len(pr.peaks), config=config)
    pw = PartialWitness()
    pw.set_target(leaf_t, leaves[i])
    for (ht, bt), (h, s) in zip(proof_ts, pr.merkle_proof):
        pw.set_hash_target(ht, h)
        pw.set_bool_target(bt, bool(s))
    for pt, pk in zip(peak_ts, pr.peaks):
        pw.set_hash_target(pt, pk)
    for t, v in zip(data.prover_only.public_inputs, root):
        pw.set_target(t, int(v))
    data.verify(data.prove(pw))


def test_flat_mmr_circuit_sweep_reduced():
    """In-circuit sweep over every index of two odd-shaped MMRs (sizes with
    multiple peaks); the pick_hash mux means one circuit per SHAPE serves
    every index with that shape."""
    cfg = CircuitConfig.test_config()
    for n in (5, 11):
        for i in range(n):
            _prove_mmr_index(n, i, cfg)


@pytest.mark.skipif(not SLOW, reason="full reference grid: set PMT_SLOW_TESTS=1")
def test_flat_mmr_circuit_sweep_full():
    """The reference's full grid: every index of every size 1..40."""
    cfg = CircuitConfig.test_config()
    for n in range(1, 41):
        for i in range(n):
            _prove_mmr_index(n, i, cfg)
