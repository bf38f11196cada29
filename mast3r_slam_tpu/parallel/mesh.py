"""Device mesh + sharding helpers.

The reference system is single-GPU with multiprocess shared memory
(SURVEY.md §2.4); the TPU build scales by sharding the two embarrassingly
parallel axes of the workload over a named mesh:

  * ``edges`` — factor-graph edges in the global BA (per-edge Hessian blocks
    reduce with a psum, riding ICI);
  * the same axis doubles as the batch axis for multi-pair symmetric decoder
    inference (pure data parallelism, params replicated).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

EDGE_AXIS = "edges"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (EDGE_AXIS,))


def edge_sharding(mesh: Mesh) -> NamedSharding:
    """First-axis sharding for per-edge / per-batch arrays."""
    return NamedSharding(mesh, P(EDGE_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_edges(mesh: Mesh, *arrays):
    """Place arrays with leading edge/batch axis on the mesh."""
    s = edge_sharding(mesh)
    return tuple(jax.device_put(a, s) for a in arrays)


def replicate(mesh: Mesh, *arrays):
    s = replicated(mesh)
    return tuple(jax.device_put(a, s) for a in arrays)
