"""Multi-host layer tested with REAL separate processes: two workers join
a local jax.distributed coordination service (CPU backend, 4 virtual
devices each), build the hybrid dp(DCN) x label(ICI) mesh, assemble a
globally-sharded array from host-local shards, and run a psum-backed
global reduction. Asserts run inside the workers; the pytest process
checks their exit codes and printed results."""
import os
import socket
import subprocess
import sys

HERE = os.path.abspath(__file__)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def worker(port: int, pid: int):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.dirname(os.path.dirname(HERE)))
    from madrigal_tpu.parallel.multihost import (
        gather_to_all_hosts,
        host_local_array,
        hybrid_mesh,
        initialize,
        sync_hosts,
    )

    initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2,
        process_id=pid,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()

    mesh = hybrid_mesh(("dp", "label"), dcn_axis="dp")
    assert dict(mesh.shape) == {"dp": 2, "label": 4}, mesh.shape
    # dp rows must be process-local: every device in row p belongs to
    # process p (dp traffic crosses DCN, label traffic stays on "ICI")
    arr = mesh.devices
    for p in range(2):
        assert all(d.process_index == p for d in arr[p]), arr

    # host-local data -> globally dp-sharded array (the
    # DistributedSampler replacement): each host contributes 8 rows
    local = (np.arange(8, dtype=np.float32) + 100 * pid).reshape(8, 1)
    ga = host_local_array(mesh, P("dp"), local)
    assert ga.shape == (16, 1), ga.shape

    @jax.jit
    def global_sum(x):
        return x.sum()

    total = float(global_sum(ga))
    expect = float(sum(range(8)) * 2 + 100 * 8)
    assert abs(total - expect) < 1e-5, (total, expect)

    gathered = gather_to_all_hosts(local)  # [2, 8, 1]
    assert gathered.shape == (2, 8, 1)
    assert abs(float(gathered.sum()) - expect) < 1e-5

    sync_hosts("test-done")
    print(f"worker {pid} OK: mesh {dict(mesh.shape)}, global_sum={total}")


def test_two_process_cluster():
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, HERE, "worker", str(port), str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"worker {pid} OK" in out, out


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]), int(sys.argv[3]))
