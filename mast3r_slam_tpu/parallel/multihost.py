"""Multi-host (N>=2) scale-out.

The engine's distributed axis is factor-graph EDGES (SURVEY.md §2.4): per-edge
Hessian blocks are embarrassingly parallel and reduce with one psum.  Across
hosts the same program runs under ``jax.distributed`` with a mesh spanning
all processes — XLA routes the intra-slice part of the reduction over ICI and
the cross-host part over DCN; nothing in the BA code changes.

Design choices for the multi-host regime:
  * keyframe pointmaps stay REPLICATED on device: every edge needs
    arbitrary (ii, jj) pairs, and replication turns the solve into pure
    compute scaling with zero resharding traffic.  Sharding poses/maps
    would add two all-gathers per iteration — the wrong trade.  BEYOND
    device memory, the r5 long-video plan applies unchanged per host:
    keyframe PAGING (`engine.device_keyframes`, frame.py) bounds the
    replicated pool and windowed solves + edge recycling bound what any
    solve touches — so the replicated set is O(window + live loop edges),
    not O(trajectory), at any video length (BASELINE.md r5 memory plan).
  * edges (and their dense (E, N) correspondence fields — the state that
    actually grows with trajectory length) are sharded on the flat device
    axis; a long-video run distributes both the matching inference for new
    factors and the BA across hosts.

The full engine across 2 real processes (trajectory parity vs
single-device) runs in tests/test_multihost.py::
test_two_process_distributed_engine via tests/distributed_engine_worker.py.

Launch (one process per host):
    python -c "import mast3r_slam_tpu.parallel.multihost as mh; mh.initialize(); ..."
with the standard JAX_COORDINATOR_ADDRESS / JAX_PROCESS_ID / JAX_NUM_PROCESSES
environment, or explicit arguments.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from .mesh import EDGE_AXIS


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Bring up jax.distributed (no-op when single-process)."""
    if num_processes in (None, 1) and coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_global_mesh() -> Mesh:
    """One flat edge axis over every device of every host.

    XLA decomposes the psum over this axis into an ICI reduction within each
    host's slice plus a DCN all-reduce across hosts.
    """
    return Mesh(np.asarray(jax.devices()), (EDGE_AXIS,))


def process_edge_slice(n_edges_padded: int) -> slice:
    """The contiguous edge range this process materialises locally
    (for jax.make_array_from_process_local_data-style construction)."""
    n_proc = jax.process_count()
    pid = jax.process_index()
    per = n_edges_padded // n_proc
    return slice(pid * per, (pid + 1) * per)
