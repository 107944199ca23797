"""Per-backend persistent compile-cache setup.

The JAX compilation cache stores AOT-compiled executables keyed by HLO,
but CPU executables additionally bake in host machine features; loading a
blob compiled under one backend/arch from another spams
`cpu_aot_loader.cc` warnings and can SIGILL. Isolate each backend in its
own subdirectory (``.jax_cache/<backend>``) so the CPU dryrun never sees
axon/TPU-compiled blobs and vice versa.
"""
from __future__ import annotations

import os


def _host_arch_tag() -> str:
    """Short fingerprint of the host CPU's feature set. CPU AOT blobs
    bake in machine features; the build driver hops between hosts with
    different CPUs (observed: amx-capable vs not), and loading a blob
    compiled elsewhere warns of possible SIGILL. Hashing the cpuinfo
    flags line keeps each host's CPU cache private to matching CPUs."""
    import hashlib

    try:
        parts = []
        with open("/proc/cpuinfo") as f:
            for line in f:
                # model name matters beyond the flags line: XLA derives
                # tuning features (e.g. +prefer-no-scatter/-gather) from
                # the CPU model, and two hosts with identical flags lines
                # can disagree on them (observed as cpu_aot_loader.cc
                # feature-mismatch warnings)
                if line.startswith(("flags", "model name")):
                    parts.append(line)
                    if len(parts) == 2:
                        break
        if parts:
            return hashlib.sha1("".join(parts).encode()).hexdigest()[:8]
    except OSError:
        pass
    import platform

    return platform.machine()


def enable_compile_cache(root: str | None = None) -> str:
    """Point the persistent compile cache at ``<root>/<backend>`` (CPU:
    ``<root>/cpu-<arch-hash>`` -- see _host_arch_tag).

    Must run after any platform forcing (``jax_platforms``) so the
    backend query reflects the platform the process will actually use.
    Returns the cache path.
    """
    import jax

    if root is None:
        root = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            ".jax_cache",
        )
    backend = jax.default_backend()
    if backend == "cpu":
        backend = f"cpu-{_host_arch_tag()}"
    path = os.path.join(root, backend)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
