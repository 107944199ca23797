"""Multi-host (multi-process) runtime: jax.distributed init + hybrid mesh.

The reference is strictly single-process/single-GPU (SURVEY.md section 2.2:
DDP imports commented out, DistributedSampler TODO). Here the multi-host
story is explicit:

* `initialize()` wires the process into the jax.distributed coordination
  service (on Cloud TPU pods the arguments auto-detect; on CPU/test
  clusters pass coordinator/num_processes/process_id).
* `hybrid_mesh()` lays out a mesh whose LAST axes ride ICI (fast
  intra-pod interconnect) and whose FIRST axes cross DCN (inter-pod
  network), per the scaling-book recipe: put bandwidth-hungry axes
  ('label' tensor-parallel, graph-parallel edge sharding) on ICI and the
  embarrassingly-parallel 'dp' axis on DCN.
* `host_local_array()` assembles a globally-sharded array from each
  host's local shard (the DistributedSampler replacement: every host
  loads only its own slice of the triple table / drug batches).
* `gather_to_host0()` pulls a (possibly sharded) array to every host for
  artifact export (rank tensors, embeddings).

Tested with real separate processes over a local coordination service in
tests/test_multihost.py.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """Join the jax.distributed cluster (no-op if already initialized).

    On Cloud TPU all arguments are auto-detected from the environment; on
    other platforms pass them explicitly.

    Must run before ANY backend-initializing JAX call (jax.devices,
    device_put, any computation) -- the same ordering rule as
    __graft_entry__._force_cpu_devices.
    """
    if jax.distributed.is_initialized():
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:  # already initialized in this process
        if "already initialized" not in str(e):
            raise


def _balanced_factors(n: int, k: int) -> list:
    """Split n into k integer factors, product n, sorted ascending (so the
    last factor is the largest). Greedy: assign each prime factor
    (largest first) to the axis with the smallest running product."""
    primes = []
    d, m = 2, n
    while d * d <= m:
        while m % d == 0:
            primes.append(d)
            m //= d
        d += 1
    if m > 1:
        primes.append(m)
    factors = [1] * k
    for p in sorted(primes, reverse=True):
        factors[factors.index(min(factors))] *= p
    return sorted(factors)


def hybrid_mesh(
    axis_names: Sequence[str] = ("dp", "label"),
    dcn_axis: str = "dp",
    ici_sizes: Optional[dict] = None,
) -> Mesh:
    """Device mesh spanning all processes: `dcn_axis` crosses hosts (DCN),
    every other axis stays within a host (ICI). The per-host device count
    is split over the non-DCN axes as evenly as possible (the LAST axis
    gets the largest factor, matching the ICI-heavy 'label'/graph axes);
    pass `ici_sizes={axis: size}` to pin any ICI axis explicitly."""
    n_local = jax.local_device_count()
    n_proc = jax.process_count()
    others = [a for a in axis_names if a != dcn_axis]
    shape = {dcn_axis: n_proc}
    if others:
        pinned = {a: s for a, s in (ici_sizes or {}).items() if a in others}
        rem, free = n_local, [a for a in others if a not in pinned]
        for a, s in pinned.items():
            if rem % s:
                raise ValueError(
                    f"ici_sizes[{a!r}]={s} does not divide the per-host "
                    f"device count {n_local} (given {pinned})")
            rem //= s
        if free:
            for a, f in zip(free, _balanced_factors(rem, len(free))):
                shape[a] = f
        elif rem != 1:
            raise ValueError(
                f"ici_sizes {pinned} use only {n_local // rem} of "
                f"{n_local} per-host devices")
        shape.update(pinned)
    else:
        shape[dcn_axis] = n_proc * n_local

    devices = np.asarray(jax.devices())  # ordered process-major
    if others:
        mesh_arr = devices.reshape([n_proc] + [shape[a] for a in others])
        # move the dcn axis into its declared position
        order = list(axis_names)
        src = [dcn_axis] + others
        mesh_arr = np.moveaxis(
            mesh_arr, [src.index(a) for a in order], range(len(order))
        )
    else:
        mesh_arr = devices.reshape([shape[a] for a in axis_names])
    return Mesh(mesh_arr, tuple(axis_names))


def host_local_array(mesh: Mesh, spec: P, local_shard: np.ndarray):
    """Build one globally-sharded jax.Array from this host's local slice.

    Every host passes only ITS rows of the globally-sharded axis (the
    TPU-native DistributedSampler: the host input pipeline reads only its
    slice of the triple table / drug list). Requires the sharded axis to
    be the DCN/process axis so each host's devices hold host-local data.
    """
    from jax.experimental import multihost_utils

    return multihost_utils.host_local_array_to_global_array(
        local_shard, mesh, spec
    )


def gather_to_all_hosts(x) -> np.ndarray:
    """Replicate a (possibly sharded) array's full value onto every host
    (artifact export: rank tensors, embedding tables)."""
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=False))


def sync_hosts(name: str = "barrier") -> None:
    """Cross-host barrier (checkpoint commit points)."""
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
