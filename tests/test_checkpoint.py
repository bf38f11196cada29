"""Checkpoint/resume: save mid-run, reload into a fresh engine, continue."""

import numpy as np

from mast3r_slam_tpu.config import load_config
from mast3r_slam_tpu.slam.checkpoint import load_state, save_state
from mast3r_slam_tpu.slam.pipeline import SLAM

from oracle import OracleDataset, OracleModel, PlaneScene, arc_trajectory

HW = (48, 64)
N_FRAMES = 20


def _make(model, cfg):
    return SLAM(model, cfg, HW)


def test_checkpoint_roundtrip_and_resume(tmp_path):
    scene = PlaneScene(HW)
    gt = arc_trajectory(N_FRAMES, radius=0.6, max_angle=2.5)
    model = OracleModel(scene, gt, noise=0.002)
    cfg = load_config("base")
    cfg["engine"]["keyframe_buffer"] = 32
    cfg["engine"]["edge_buffer"] = 32
    cfg["single_thread"] = True  # deterministic eval-protocol mode
    ds = OracleDataset(N_FRAMES, HW)

    # run A: straight through
    slam_a = _make(model, cfg)
    res_a = slam_a.run(ds, verbose=False)

    # run B: first half, checkpoint, restore into a FRESH engine, second half
    slam_b1 = _make(model, cfg)
    half = N_FRAMES // 2
    last = None
    for i in range(half):
        t, img = ds[i]
        fr = slam_b1.process_frame(i, t, img, last_T_WC=last)
        last = fr.T_WC
    ckpt = tmp_path / "state.npz"
    save_state(ckpt, slam_b1)

    slam_b2 = _make(model, cfg)
    load_state(ckpt, slam_b2)
    assert len(slam_b2.keyframes) == len(slam_b1.keyframes)
    assert slam_b2.graph.n_edges == slam_b1.graph.n_edges
    np.testing.assert_allclose(
        np.asarray(slam_b2.keyframes.T_WC[: len(slam_b2.keyframes)]),
        np.asarray(slam_b1.keyframes.T_WC[: len(slam_b1.keyframes)]),
    )
    for i in range(half, N_FRAMES):
        t, img = ds[i]
        fr = slam_b2.process_frame(i, t, img, last_T_WC=last)
        last = fr.T_WC

    # resumed run must land close to the uninterrupted one (the only state
    # lost at the checkpoint boundary is the tracker's per-frame pointmap
    # accumulation of the in-flight frame)
    Ta = np.asarray(slam_a.keyframes.T_WC[: len(slam_a.keyframes)])
    Tb = np.asarray(slam_b2.keyframes.T_WC[: len(slam_b2.keyframes)])
    assert abs(len(Ta) - len(Tb)) <= 1
    k = min(len(Ta), len(Tb))
    np.testing.assert_allclose(Ta[:k, :3], Tb[:k, :3], atol=0.02)


def test_params_io_roundtrip(tmp_path):
    import jax

    from mast3r_slam_tpu.models import mast3r as M
    from mast3r_slam_tpu.models.io import load_params, save_params

    params = M.init_params(jax.random.key(0), M.VIT_TINY_TEST)
    f = tmp_path / "p.npz"
    save_params(f, params)
    back = load_params(f)
    flat_a = jax.tree.leaves(params)
    flat_b = jax.tree.leaves(back)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # structure must match too (same treedef)
    assert jax.tree.structure(params) == jax.tree.structure(back)
