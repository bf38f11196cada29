"""Backend pixel budget (`local_opt.pixel_stride`, VERDICT r4 item 8).

Factor-graph edges matched on an s-strided source grid: N/s^2 per-edge LM
problems and descriptor windows instead of N, scattered back into the
full-shape edge fields so nothing downstream (solve, cache, checkpoint)
changes shape.  Default 1 = reference-exact; these tests pin the strided
semantics and that the sparser constraint set still solves.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mast3r_slam_tpu.config import load_config
from mast3r_slam_tpu.lie import sim3
from mast3r_slam_tpu.slam.pipeline import SLAM

import sys, os

sys.path.insert(0, os.path.dirname(__file__))
from oracle import OracleDataset, OracleModel, PlaneScene, arc_trajectory

N_FRAMES = 30
HW = (48, 64)
STRIDE = 2


@pytest.fixture(scope="module")
def tracked_scene():
    scene = PlaneScene(HW)
    gt = arc_trajectory(N_FRAMES, radius=0.6, max_angle=2.5)
    model = OracleModel(scene, gt, noise=0.002)
    cfg = load_config("base")
    cfg["engine"]["keyframe_buffer"] = 64
    cfg["engine"]["edge_buffer"] = 64
    cfg["single_thread"] = True
    slam = SLAM(model, cfg, HW)
    slam.run(OracleDataset(N_FRAMES, HW), verbose=False)
    assert len(slam.keyframes) >= 4
    return model, cfg, slam.keyframes


def _fresh_graph(model, cfg, keyframes, stride: int):
    from mast3r_slam_tpu.slam.factor_graph import FactorGraph

    import copy

    cfg2 = copy.deepcopy(cfg)
    cfg2["local_opt"]["pixel_stride"] = stride
    return FactorGraph(model, cfg2, keyframes, HW, edge_capacity=16)


def test_strided_fields_live_on_the_grid(tracked_scene):
    """Strided edges: valid/Q only at s-grid source rows, zero elsewhere;
    on-grid fields match the full-density matcher's at those rows (same
    matcher, warm-started at the pixel's own position both ways)."""
    model, cfg, kf = tracked_scene
    n = len(kf)
    thresh = float(cfg["local_opt"]["min_match_frac"])
    g1 = _fresh_graph(model, cfg, kf, stride=1)
    gs = _fresh_graph(model, cfg, kf, stride=STRIDE)
    assert g1.add_factors([n - 2], [n - 1], thresh)
    assert gs.add_factors([n - 2], [n - 1], thresh)

    H, W = HW
    N = H * W
    grid = np.zeros((N,), bool)
    rows = (np.arange(0, H, STRIDE)[:, None] * W
            + np.arange(0, W, STRIDE)[None, :]).reshape(-1)
    grid[rows] = True

    vs = np.asarray(gs.valid_match_j[0]).reshape(-1)
    qs = np.asarray(gs.Q_ii2jj[0]).reshape(-1)
    # off-grid rows are exact zero-weight
    assert not vs[~grid].any()
    assert float(np.abs(qs[~grid]).max()) == 0.0
    # the strided grid carries a healthy valid fraction, comparable to the
    # full matcher's on the same rows
    v1 = np.asarray(g1.valid_match_j[0]).reshape(-1)
    frac_s = vs[grid].mean()
    frac_1 = v1[grid].mean()
    assert frac_s > 0.5 * frac_1 and frac_s > 0.3, (frac_s, frac_1)
    # matched target pixels agree with the full-density matcher on the
    # overwhelming majority of shared valid rows (allow the odd pixel to
    # land in a different refinement basin)
    i1 = np.asarray(g1.idx_ii2jj[0])
    is_ = np.asarray(gs.idx_ii2jj[0])
    both = grid & vs & v1
    du = np.abs((i1[both] % W) - (is_[both] % W))
    dv = np.abs((i1[both] // W) - (is_[both] // W))
    assert np.mean((du <= 1) & (dv <= 1)) > 0.9


def test_solve_recovers_through_strided_edges(tracked_scene):
    """The N/s^2-correspondence edges still anchor the pose solve: a
    perturbed trajectory recovers through strided factors."""
    model, cfg, kf = tracked_scene
    n = len(kf)
    gs = _fresh_graph(model, cfg, kf, stride=STRIDE)
    thresh = float(cfg["local_opt"]["min_match_frac"])
    ii = [k for k in range(n - 1)]
    jj = [k + 1 for k in range(n - 1)]
    gs.add_factors(ii, jj, thresh)
    assert gs.n_edges >= n - 1

    clean = np.asarray(kf.T_WC[:n]).copy()
    rng = np.random.default_rng(7)
    noise = rng.normal(size=(n, 7)).astype(np.float32) * 0.03
    noise[0] = 0
    noisy = np.asarray(sim3.retr(jnp.asarray(clean), jnp.asarray(noise)))
    kf.T_WC = kf.T_WC.at[:n].set(jnp.asarray(noisy))
    err_before = np.linalg.norm(noisy[:, :3] - clean[:, :3], axis=-1).mean()
    gs.solve()
    after = np.asarray(kf.T_WC[:n])
    err_after = np.linalg.norm(after[:, :3] - clean[:, :3], axis=-1).mean()
    kf.T_WC = kf.T_WC.at[:n].set(jnp.asarray(clean))  # restore
    assert err_after < 0.3 * err_before, (err_before, err_after)


@pytest.mark.slow
def test_engine_e2e_with_pixel_budget():
    """Full engine with the speed profile + pixel_stride 2: trajectory at
    the synthetic accuracy floor."""
    scene = PlaneScene(HW)
    gt = arc_trajectory(N_FRAMES, radius=0.6, max_angle=2.5)
    model = OracleModel(scene, gt, noise=0.002)
    cfg = load_config("speed")
    cfg["local_opt"]["pixel_stride"] = STRIDE
    cfg["engine"]["keyframe_buffer"] = 64
    cfg["engine"]["edge_buffer"] = 64
    cfg["single_thread"] = True
    slam = SLAM(model, cfg, HW)
    result = slam.run(OracleDataset(N_FRAMES, HW), verbose=False)
    assert result.n_reloc == 0

    from mast3r_slam_tpu.eval.trajectory import umeyama_alignment

    est = result.frame_poses[:, :3]
    s, R, t = umeyama_alignment(est, gt[:, :3])
    aligned = (s * (R @ est.T)).T + t
    ate = float(np.sqrt(np.mean(np.linalg.norm(aligned - gt[:, :3], axis=-1) ** 2)))
    assert ate < 0.05, f"pixel-budget e2e ATE {ate:.4f}"
