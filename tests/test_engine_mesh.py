"""Engine-mode multi-chip: the SLAM pipeline on a mesh must produce the
same trajectory as single-device.

`engine.mesh: 8` routes FactorGraph.solve() through the edge-sharded
distributed GN (parallel/sharded_ba.py — psum of 7x7 pose blocks over the
mesh) and shards the add_factors symmetric-decode batch over the same axis.
This is the system-level proof VERDICT.md asked for: not the library test
(test_sharded_ba.py) but the engine producing the same answer end-to-end.

Reference scaling target: the whole backend process (main.py:74-143, the
gn_kernels.cu:1199-1206 SparseBlock reduction).
"""

import jax
import numpy as np
import pytest

from mast3r_slam_tpu.config import load_config
from mast3r_slam_tpu.slam.pipeline import SLAM

from oracle import OracleDataset, OracleModel, PlaneScene, arc_trajectory

HW = (48, 64)
N_FRAMES = 12


def _run(mesh_n):
    scene = PlaneScene(HW)
    gt = arc_trajectory(N_FRAMES, radius=0.6, max_angle=2.5)
    # noise=0 so the oracle consumes no RNG: mesh mode pads the decode batch
    # with extra pairs, which would otherwise advance the noise stream
    model = OracleModel(scene, gt, noise=0.0)
    cfg = load_config("base")
    cfg["engine"]["keyframe_buffer"] = 64
    cfg["engine"]["edge_buffer"] = 64
    cfg["engine"]["mesh"] = mesh_n
    cfg["single_thread"] = True
    slam = SLAM(model, cfg, HW)
    result = slam.run(OracleDataset(N_FRAMES, HW), verbose=False)
    return slam, result


def test_engine_mesh_trajectory_parity():
    if len(jax.devices()) < 8:
        pytest.skip("need 8 (virtual) devices")
    slam0, r0 = _run(0)
    slam8, r8 = _run(8)
    assert slam0.mesh is None and slam0.graph.mesh is None
    assert slam8.mesh is not None and slam8.graph.mesh.size == 8
    # the mesh run actually went through the backend (edges were added+solved)
    assert slam8.graph.n_edges >= 1
    assert r8.n_keyframes == r0.n_keyframes
    assert r8.n_reloc == 0
    # same trajectory up to f32 reduction order: padded edges are proven
    # exactly zero-contribution (padding-invariance of gauss_newton_poses is
    # bit-exact), so the only difference is the psum's f32 summation order,
    # amplified through ~30 frames of iterative GN (chaotic in the low
    # digits).  1e-2 on a ~1.2 m trajectory = <1% — well inside the e2e ATE
    # budget; observed max with the r3 bucket floors is ~5e-3.
    np.testing.assert_allclose(
        r8.frame_poses, r0.frame_poses, atol=1e-2, rtol=3e-3
    )
    np.testing.assert_allclose(
        r8.keyframe_poses, r0.keyframe_poses, atol=1e-2, rtol=3e-3
    )


def test_engine_mesh_auto():
    """mesh: "auto" builds a mesh over every visible device."""
    if len(jax.devices()) < 2:
        pytest.skip("need multiple devices")
    scene = PlaneScene(HW)
    gt = arc_trajectory(4, radius=0.3, max_angle=1.0)
    model = OracleModel(scene, gt, noise=0.0)
    cfg = load_config("base")
    cfg["engine"]["keyframe_buffer"] = 16
    cfg["engine"]["edge_buffer"] = 16
    cfg["engine"]["mesh"] = "auto"
    cfg["single_thread"] = True
    slam = SLAM(model, cfg, HW)
    assert slam.mesh.size == len(jax.devices())
