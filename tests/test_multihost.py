"""Multi-host runtime coverage (SURVEY.md §2.3 comm-backend row).

Two REAL processes, each owning 2 virtual CPU devices, joined by
``jax.distributed.initialize`` into one 4-device global mesh: both must
compute (and agree on) the sharded forest root, and it must equal the
single-process ``MerkleTree.build`` root.  This is the closest a single
host can get to exercising the pod-slice code path — the worker is the
same code a real per-host launcher runs.
"""

import os
import subprocess

import pytest
import sys

pytestmark = pytest.mark.slow  # spawns 2 real processes, ~100 s

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_global_mesh_forest_root():
    env = dict(os.environ)
    # the demo manages its own XLA flags / platforms; drop the suite's
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multihost_demo.py")],
        env=env, capture_output=True, text=True, timeout=570, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "OK: 2-process global-mesh root matches single-process build" \
        in proc.stdout


def test_init_distributed_single_process_noop():
    """With no coordinator configured, init_distributed is a safe no-op
    returning the local topology."""
    from plonky2_merkle_trees_tpu.parallel import runtime
    info = runtime.init_distributed()
    assert info.num_processes >= 1
    assert info.local_devices >= 1
    assert info.global_devices >= info.local_devices


def test_two_process_divergence_detected():
    """Fault injection: process 1 corrupts its root; every process must
    fail fast with CrossHostDivergence (SURVEY.md §5 failure-detection
    row)."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multihost_demo.py"),
         "--diverge"],
        env=env, capture_output=True, text=True, timeout=570, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "OK: injected divergence detected and attributed" in proc.stdout


def test_cross_host_agreement_single_process():
    """Single-process: the check is a local no-op returning one digest
    row; a synthetic 3-host digest table attributes the minority."""
    import numpy as np
    from plonky2_merkle_trees_tpu.parallel import runtime

    table = runtime.check_cross_host_agreement(np.arange(64), "demo")
    assert table.shape == (1, 4)
    # same value -> same digest; different value -> different digest
    t2 = runtime.check_cross_host_agreement(np.arange(64), "demo")
    assert (table == t2).all()
    t3 = runtime.check_cross_host_agreement(np.arange(1, 65), "demo")
    assert not (table == t3).all()

    err = runtime.CrossHostDivergence(
        "root", np.array([[1, 2, 3, 4], [1, 2, 3, 4], [9, 9, 9, 9]],
                         dtype=np.uint64))
    assert err.minority_processes == [2]
    assert "diverging=[2]" in str(err)
