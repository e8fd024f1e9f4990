"""Two-process (multi-host flavor) demo: a sharded Merkle-forest root over
the GLOBAL mesh, each process holding only its local leaf shard.

Worker mode (spawned per process):
    PMT_COORDINATOR=localhost:<port> PMT_NUM_PROCESSES=2 PMT_PROCESS_ID=<i> \
        python tools/multihost_demo.py --worker

Driver mode (default): spawns 2 CPU workers, checks both print the SAME
root, and that it equals the single-process ``MerkleTree.build`` root.
This is the documented 2-process run of SURVEY.md §2.3's comm-backend row;
on a real pod slice the same worker runs once per host with the TPU
backend and no flags besides the coordinator address.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG_LEAVES_PER_PROC = 10          # 1024 leaves per process, 2048 global


def worker() -> None:
    # CPU flavor: 2 virtual local devices per process, 4 global
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2")
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, REPO)
    import numpy as np
    import plonky2_merkle_trees_tpu as pmt  # noqa: F401 (x64 setup)
    from plonky2_merkle_trees_tpu import field
    from plonky2_merkle_trees_tpu.parallel import runtime
    from plonky2_merkle_trees_tpu.parallel.forest import _forest_root_shard_fn
    from plonky2_merkle_trees_tpu.parallel.mesh import SHARD_AXIS

    info = runtime.init_distributed()
    mesh = runtime.global_mesh()

    # every process generates the full leaf vector deterministically and
    # slices out its own shard (a real loader reads only the local slice)
    n_global = info.num_processes << LOG_LEAVES_PER_PROC
    leaves = np.random.default_rng(7).integers(
        0, field.P, size=n_global, dtype=np.uint64)
    per_proc = n_global // info.num_processes
    local = leaves[info.process_id * per_proc:(info.process_id + 1) * per_proc]

    x = runtime.make_global_array(local, mesh)
    import jax
    from jax.sharding import PartitionSpec as P
    fn = jax.jit(jax.shard_map(_forest_root_shard_fn, mesh=mesh,
                               in_specs=P(SHARD_AXIS), out_specs=P(),
                               check_vma=False))
    root = np.asarray(fn(x))
    if os.environ.get("PMT_DEMO_DIVERGE") == "1" and info.process_id == 1:
        # fault injection: host 1 silently corrupts its result — the
        # agreement check below must fail fast and name it
        root = (root + np.uint64(1)) % np.uint64(field.P)
    runtime.check_cross_host_agreement(root, "forest root")
    print(f"proc {info.process_id}/{info.num_processes} "
          f"devices {info.local_devices}/{info.global_devices} "
          f"root {' '.join(str(int(v)) for v in root)}", flush=True)


def driver(diverge: bool = False) -> int:
    import socket
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "PMT_COORDINATOR": f"localhost:{port}",
            "PMT_NUM_PROCESSES": "2",
            "PMT_PROCESS_ID": str(pid),
        })
        if diverge:
            env["PMT_DEMO_DIVERGE"] = "1"
        env.pop("PYTHONSTARTUP", None)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, cwd=REPO))
    if diverge:
        # failure-detection flavor: the corrupted run must fail fast with
        # a CrossHostDivergence naming process 1, on every process
        ok = True
        for p in procs:
            out, err = p.communicate(timeout=600)
            if p.returncode == 0 or "cross-host divergence" not in err:
                ok = False
        if ok:
            print("OK: injected divergence detected and attributed")
            return 0
        print("FAIL: injected divergence was not detected", file=sys.stderr)
        return 1
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        if p.returncode != 0:
            print(err[-2000:], file=sys.stderr)
            return p.returncode
        outs.append(out)

    roots = set()
    for out in outs:
        for line in out.splitlines():
            if " root " in line:
                print(line)
                roots.add(line.split(" root ")[1])
    if len(roots) != 1:
        print(f"FAIL: processes disagree: {roots}", file=sys.stderr)
        return 1

    # cross-check vs the single-process tree
    import numpy as np
    sys.path.insert(0, REPO)
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import plonky2_merkle_trees_tpu as pmt
    from plonky2_merkle_trees_tpu import field
    leaves = np.random.default_rng(7).integers(
        0, field.P, size=2 << LOG_LEAVES_PER_PROC, dtype=np.uint64)
    expected = pmt.MerkleTree.build([int(v) for v in leaves]).root
    got = roots.pop().split()
    if [int(v) for v in got] != [int(v) for v in expected]:
        print("FAIL: multi-process root != single-process root", file=sys.stderr)
        return 1
    print("OK: 2-process global-mesh root matches single-process build")
    return 0


if __name__ == "__main__":
    if "--worker" in sys.argv:
        worker()
    else:
        sys.exit(driver(diverge="--diverge" in sys.argv))
