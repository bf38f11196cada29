"""Worker for tests/test_multihost.py: one jax.distributed process.

Usage: python distributed_worker.py <pid> <nproc> <port>
Each process hosts 4 virtual CPU devices; the pair forms an 8-device global
mesh whose edge-axis psum crosses the process boundary — the DCN path of the
multi-host BA design (parallel/multihost.py) exercised without TPU pods.
"""

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from functools import partial  # noqa: E402

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import shard_map  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from mast3r_slam_tpu.parallel import multihost as mh  # noqa: E402
from mast3r_slam_tpu.parallel.mesh import EDGE_AXIS  # noqa: E402

mh.initialize(f"127.0.0.1:{port}", nproc, pid)
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.local_devices()) == 4
assert len(jax.devices()) == 4 * nproc

mesh = mh.make_global_mesh()
assert mesh.size == 4 * nproc
assert mesh.axis_names == (EDGE_AXIS,)

# edge-sharded global array assembled from process-local slices, reduced with
# the same psum the sharded BA uses — across the process (DCN) boundary
E = 16
sl = mh.process_edge_slice(E)
assert sl == slice(pid * (E // nproc), (pid + 1) * (E // nproc))
local = np.arange(E, dtype=np.float32)[sl]
garr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P(EDGE_AXIS)), local, (E,)
)


@jax.jit
@partial(shard_map, mesh=mesh, in_specs=P(EDGE_AXIS), out_specs=P())
def total(x):
    return jax.lax.psum(jnp.sum(x), EDGE_AXIS)


out = float(np.asarray(jax.device_get(total(garr))))
expect = E * (E - 1) / 2
assert out == expect, (out, expect)
print(f"worker {pid}: psum over {nproc}-process mesh OK ({out})", flush=True)
