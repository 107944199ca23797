"""Device-mesh helpers.

The framework's parallel axes:
  * 'dp'    -- data parallel over drug/pair batches (training)
  * 'label' -- outcome parallel over the decoder's [L, D, D] weight and the
               all-pairs score/rank tensor (serving; SURVEY.md section 2.2)

Single-chip runs use a trivial 1-device mesh so the same pjit'd programs
run everywhere.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_names: Sequence[str] = ("dp",),
              shape: Optional[Sequence[int]] = None,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = [n] + [1] * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def sharded(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0,
                    fill=0) -> Tuple[np.ndarray, int]:
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x, 0
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return np.pad(x, widths, constant_values=fill), pad
