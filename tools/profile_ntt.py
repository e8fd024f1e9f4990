"""NTT microbenchmark on the real device: XLA u64 path vs the fused Pallas
four-step kernel (ops/ntt_pallas.py), at the prover's hot shapes.

Run WITHOUT the test conftest so jax sees the accelerator:
    python tools/profile_ntt.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import plonky2_merkle_trees_tpu  # noqa: F401
import jax
import jax.numpy as jnp
from plonky2_merkle_trees_tpu import field
from plonky2_merkle_trees_tpu.plonk import ntt as nttmod
from plonky2_merkle_trees_tpu.ops import ntt_pallas


def timeit(label, fn, *args, iters=5):
    # barrier = tiny device->host fetch (block_until_ready under-reports
    # through the axon tunnel; fetching the WHOLE array would time the
    # tunnel, not the op — same methodology as tools/profile_p1.py)
    out = fn(*args)
    np.asarray(out[..., :4])
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    import jax as _jax
    _jax.block_until_ready(out)
    np.asarray(out[..., :4])
    dt = (time.perf_counter() - start) / iters
    print(f"{label:55s} {dt*1e3:9.2f} ms")
    return dt


def main():
    rng = np.random.default_rng(3)
    cases = [
        ("wires intt 135 x 2^15", (135, 1 << 15), True, 0),
        ("wires coset_lde 135 x 2^15 -> 2^18", (135, 1 << 15), False, 3),
        ("zsp coset_lde 20 x 2^15 -> 2^18", (20, 1 << 15), False, 3),
        ("single 2^20 fwd", (1, 1 << 20), False, 0),
    ]
    for label, shape, inverse, rate in cases:
        x = jnp.asarray(rng.integers(0, field.P, size=shape, dtype=np.uint64))
        for tag, flag in (("xla", "0"), ("pallas", "1")):
            os.environ["PMT_NTT_PALLAS"] = flag
            if rate:
                fn = jax.jit(lambda c, r=rate: nttmod.coset_lde(c, r))
            elif inverse:
                fn = jax.jit(nttmod.intt)
            else:
                fn = jax.jit(lambda c: nttmod.ntt(c))
            try:
                timeit(f"{label} [{tag}]", fn, x)
            except Exception as e:  # pragma: no cover
                print(f"{label} [{tag}] FAILED: {type(e).__name__}: {e}")
        # bit-exactness cross-check at this shape (XLA vs Pallas)
        os.environ["PMT_NTT_PALLAS"] = "1"
        if not rate and shape[1] <= (1 << 18):
            small = np.asarray(x)
            want = nttmod.ntt(small, inverse=inverse)
            got = np.asarray(ntt_pallas.ntt_pallas(x, inverse))
            ok = np.array_equal(want, got)
            print(f"{'  bit-exact vs host':55s} {ok}")
            assert ok


if __name__ == "__main__":
    main()
