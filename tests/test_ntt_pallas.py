"""Pallas four-step NTT (ops/ntt_pallas.py) vs the XLA/numpy reference NTT,
run under the Pallas interpreter so the kernel logic is covered on the CPU
mesh (the real-TPU bit-exactness twin lives in tests/test_pallas_tpu.py).

The kernel must be bit-exact with plonk/ntt.py — the prover's transcripts
depend on it (device programs dispatch to it on TPU via ntt._pallas_backend).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from plonky2_merkle_trees_tpu import field
from plonky2_merkle_trees_tpu.plonk import ntt as nttmod
from plonky2_merkle_trees_tpu.ops import ntt_pallas


@pytest.fixture(autouse=True)
def _interpret_mode():
    old = ntt_pallas._INTERPRET
    ntt_pallas._INTERPRET = True
    yield
    ntt_pallas._INTERPRET = old


@pytest.mark.parametrize("log_n,batch", [(10, 3), (11, 2), (12, 1)])
@pytest.mark.parametrize("inverse", [False, True])
def test_ntt_pallas_matches_reference(log_n, batch, inverse):
    rng = np.random.default_rng(42 + log_n)
    x = rng.integers(0, field.P, size=(batch, 1 << log_n), dtype=np.uint64)
    want = nttmod.ntt(x, inverse=inverse)
    got = np.asarray(ntt_pallas.ntt_pallas(jnp.asarray(x), inverse))
    np.testing.assert_array_equal(want, got)


def test_ntt_pallas_roundtrip_and_1d():
    rng = np.random.default_rng(7)
    x = rng.integers(0, field.P, size=(1 << 10,), dtype=np.uint64)
    f = ntt_pallas.ntt_pallas(jnp.asarray(x), False)
    back = np.asarray(ntt_pallas.ntt_pallas(f, True))
    np.testing.assert_array_equal(x, back)


def test_supported_gate():
    assert not ntt_pallas.supported(1 << 9)      # R would be < 8 rows
    assert ntt_pallas.supported(1 << 10)
    assert ntt_pallas.supported(1 << 22)
    assert not ntt_pallas.supported(1 << 23)
    assert not ntt_pallas.supported(3 << 10)     # non-power-of-two
