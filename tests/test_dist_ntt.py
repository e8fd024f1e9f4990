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
    for r in rows:
        assert r["hashes_per_sec"] > 0
        assert 0 < r["scaling_efficiency"]
    assert rows[0]["scaling_efficiency"] == 1.0
