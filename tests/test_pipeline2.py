"""Pipeline-parallel frontend (engine.pipeline: 2) — trajectory parity.

VERDICT r2 item 3: the tracked frame splits almost evenly into
encode+decode+heads (model chip) and track_compute (tracker chip); pipeline
mode runs them on two devices with the next frame's decode issued
speculatively against the current keyframe (re-decoded on a keyframe
switch, so the math is IDENTICAL to the sequential engine).  On the 8-device
virtual CPU mesh both "chips" are the same silicon, so parity is exact.
"""

import numpy as np
import jax

from mast3r_slam_tpu.config import load_config
from mast3r_slam_tpu.slam.pipeline import SLAM

import sys, os
sys.path.insert(0, os.path.dirname(__file__))
from oracle import OracleDataset, OracleModel, PlaneScene, arc_trajectory

HW = (48, 64)
N_FRAMES = 30


def _run(pipeline: int):
    scene = PlaneScene(HW)
    gt = arc_trajectory(N_FRAMES, radius=0.6, max_angle=2.5)
    model = OracleModel(scene, gt, noise=0.002)
    cfg = load_config("base")
    cfg["engine"]["keyframe_buffer"] = 64
    cfg["engine"]["edge_buffer"] = 64
    cfg["engine"]["pipeline"] = pipeline
    cfg["single_thread"] = True
    slam = SLAM(model, cfg, HW)
    result = slam.run(OracleDataset(N_FRAMES, HW), verbose=False)
    return slam, result


def test_pipeline2_trajectory_parity():
    assert len(jax.devices()) >= 2, "conftest provides the 8-device CPU mesh"
    slam_seq, res_seq = _run(0)
    slam_pipe, res_pipe = _run(2)

    assert slam_pipe.pipeline == 2
    assert slam_pipe.tracker.compute_device == jax.devices()[1]
    # the pointmap side of the store lives on the tracker chip, feat on chip 0
    assert next(iter(slam_pipe.keyframes.X.devices())) == jax.devices()[1]
    assert next(iter(slam_pipe.keyframes.feat.devices())) == jax.devices()[0]

    assert res_pipe.n_keyframes == res_seq.n_keyframes
    assert res_pipe.n_reloc == res_seq.n_reloc == 0
    # speculation is corrected exactly -> identical trajectories
    np.testing.assert_allclose(
        res_pipe.frame_poses, res_seq.frame_poses, rtol=0, atol=1e-6
    )
    np.testing.assert_allclose(
        res_pipe.keyframe_poses, res_seq.keyframe_poses, rtol=0, atol=1e-6
    )


def test_pipeline2_with_async_backend():
    """pipeline mode composes with the async backend worker (the production
    live-mode shape: 2 chips + overlapped backend)."""
    scene = PlaneScene(HW)
    gt = arc_trajectory(N_FRAMES, radius=0.6, max_angle=2.5)
    model = OracleModel(scene, gt, noise=0.002)
    cfg = load_config("base")
    cfg["engine"]["keyframe_buffer"] = 64
    cfg["engine"]["edge_buffer"] = 64
    cfg["engine"]["pipeline"] = 2
    cfg["single_thread"] = False
    slam = SLAM(model, cfg, HW)
    result = slam.run(OracleDataset(N_FRAMES, HW), verbose=False)
    assert result.n_keyframes >= 2
    assert result.n_reloc == 0
    from mast3r_slam_tpu.eval.trajectory import umeyama_alignment

    est = result.frame_poses[:, :3]
    s, R, t = umeyama_alignment(est, gt[:, :3])
    aligned = (s * (R @ est.T)).T + t
    ate = float(np.sqrt(np.mean(np.linalg.norm(aligned - gt[:, :3], axis=-1) ** 2)))
    assert ate < 0.05, ate
