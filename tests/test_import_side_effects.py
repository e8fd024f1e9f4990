"""Guard: importing the package must NOT initialize the XLA backend.

``jax.distributed.initialize()`` (the multi-host entry point,
``parallel/runtime.py``) raises if any JAX call has already initialized a
backend.  Round 4 shipped a regression where ``__init__.py`` called
``jax.default_backend()`` at import time to pick the compilation-cache
subdirectory, silently breaking the entire multi-host runtime for every
consumer.  This fast-tier test pins the invariant in-process so the
2-process slow-tier tests aren't the only line of defense.
"""

import subprocess
import sys

CHECK = r"""
import jax
import jax._src.xla_bridge as xb
import plonky2_merkle_trees_tpu
assert not xb._backends, (
    "importing plonky2_merkle_trees_tpu initialized XLA backends: %r"
    % (list(xb._backends),))
# the import must still have configured x64 + the persistent cache
assert jax.config.jax_enable_x64
print("IMPORT_CLEAN")
"""


def test_import_does_not_initialize_backend():
    proc = subprocess.run(
        [sys.executable, "-c", CHECK], capture_output=True, text=True,
        timeout=120)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "IMPORT_CLEAN" in proc.stdout
