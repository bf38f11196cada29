"""Relocalization end-to-end: the camera teleports, tracking breaks, the
retrieval database proposes early keyframes, reloc edges re-anchor the pose.

Mirrors the reference mode machine (main.py:28-71, 282-292) using the
ground-truth oracle + the training-free random-init retrieval stack.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mast3r_slam_tpu.config import load_config
from mast3r_slam_tpu.retrieval import RetrievalDatabase
from mast3r_slam_tpu.retrieval.asmk import ASMKSettings
from mast3r_slam_tpu.retrieval.head import RetrievalHeadSettings, init_head_params
from mast3r_slam_tpu.slam.frame import Mode
from mast3r_slam_tpu.slam.pipeline import SLAM

from oracle import OracleDataset, OracleModel, PlaneScene, arc_trajectory

HW = (48, 64)


def teleport_trajectory(n_track=14, n_after=6):
    gt = arc_trajectory(n_track, radius=0.6, max_angle=2.5)
    # after the cut, the camera is back near the START of the arc
    back = arc_trajectory(n_track, radius=0.6, max_angle=2.5)[1 : n_after + 1]
    back[:, 0] += 0.02  # slight offset so it's not pixel-identical
    return np.concatenate([gt, back], axis=0)


@pytest.mark.slow
def test_reloc_recovers_from_teleport():
    scene = PlaneScene(HW)
    gt = teleport_trajectory()
    n = len(gt)
    model = OracleModel(scene, gt, noise=0.002)
    cfg = load_config("base")
    cfg["engine"]["keyframe_buffer"] = 64
    cfg["engine"]["edge_buffer"] = 64
    cfg["single_thread"] = True  # deterministic eval-protocol mode
    # the training-free random retrieval stack can't prune weak candidates by
    # score, so one bad candidate would veto strict (all-or-nothing) reloc;
    # use the reference's non-strict mode (config/eth3d.yaml `reloc.strict`)
    cfg["reloc"]["strict"] = False

    params = init_head_params(jax.random.key(0), model.feat_dim, hdims=(8,))
    centroids = jax.random.normal(jax.random.key(1), (64, 8)) * 0.3
    retrieval = RetrievalDatabase(
        params, centroids, RetrievalHeadSettings(nfeat=8),
        ASMKSettings(capacity=64 * 8, max_images=64),
    )

    slam = SLAM(model, cfg, HW, retrieval=retrieval)
    ds = OracleDataset(n, HW)
    result = slam.run(ds, verbose=False)

    assert result.n_reloc >= 1, "teleport should force relocalization"
    assert slam.mode == Mode.TRACKING, "engine should recover to TRACKING"

    # post-reloc frames must localize near the early-arc ground truth
    post = result.frame_poses[-3:, :3]
    gt_post = gt[-3:, :3]
    # compare relative to the first-frame anchor (gauge is pinned at kf0)
    err = np.linalg.norm(post - gt_post, axis=-1)
    assert err.max() < 0.15, err


@pytest.mark.slow
def test_reloc_parity_pipelined():
    """The depth-2 submit-ahead loop (engine.pipeline: 1) must produce the
    SEQUENTIAL trajectory through a tracking failure + relocalization: the
    chained submit speculated past the failing frame is discarded and the
    frame replays through the RELOC path (pipeline.finish_oldest drain)."""
    scene = PlaneScene(HW)
    gt = teleport_trajectory()
    n = len(gt)

    def run(pipeline):
        model = OracleModel(scene, gt, noise=0.002)
        cfg = load_config("base")
        cfg["engine"]["keyframe_buffer"] = 64
        cfg["engine"]["edge_buffer"] = 64
        cfg["engine"]["pipeline"] = pipeline
        cfg["single_thread"] = True
        cfg["reloc"]["strict"] = False
        params = init_head_params(jax.random.key(0), model.feat_dim, hdims=(8,))
        centroids = jax.random.normal(jax.random.key(1), (64, 8)) * 0.3
        retrieval = RetrievalDatabase(
            params, centroids, RetrievalHeadSettings(nfeat=8),
            ASMKSettings(capacity=64 * 8, max_images=64),
        )
        slam = SLAM(model, cfg, HW, retrieval=retrieval)
        return slam.run(OracleDataset(n, HW), verbose=False)

    res_seq = run(0)
    res_pipe = run(1)
    assert res_pipe.n_reloc == res_seq.n_reloc >= 1
    assert res_pipe.n_reloc_success == res_seq.n_reloc_success >= 1
    assert res_pipe.n_keyframes == res_seq.n_keyframes
    np.testing.assert_allclose(
        res_pipe.frame_poses, res_seq.frame_poses, rtol=0, atol=1e-6
    )
