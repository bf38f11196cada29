"""Evaluation tooling: ATE alignment correctness, association, PLY roundtrip,
config inheritance."""

import numpy as np
import pytest

from mast3r_slam_tpu.config import load_config, merge_config
from mast3r_slam_tpu.eval.export import load_ply, save_ply
from mast3r_slam_tpu.eval.trajectory import (
    associate,
    ate_rmse,
    save_traj_tum,
    umeyama_alignment,
)


def test_umeyama_recovers_similarity(rng):
    x = rng.normal(size=(40, 3))
    from scipy.spatial.transform import Rotation

    R_true = Rotation.random(rng=rng).as_matrix()
    s_true, t_true = 1.7, np.array([0.3, -1.2, 2.0])
    y = s_true * x @ R_true.T + t_true
    s, R, t = umeyama_alignment(x, y)
    assert abs(s - s_true) < 1e-9
    np.testing.assert_allclose(R, R_true, atol=1e-9)
    np.testing.assert_allclose(t, t_true, atol=1e-9)


def test_ate_rmse_invariant_to_sim3(tmp_path, rng):
    """A trajectory differing from gt by any Sim(3) must score ~0 ATE."""
    n = 30
    ts = [f"{i / 10:.3f}" for i in range(n)]
    pos = np.cumsum(rng.normal(size=(n, 3)) * 0.1, axis=0)
    quat = np.tile([0, 0, 0, 1.0], (n, 1))
    gt = tmp_path / "gt.txt"
    save_traj_tum(gt, ts, np.concatenate([pos, quat], axis=1))

    from scipy.spatial.transform import Rotation

    R = Rotation.random(rng=rng).as_matrix()
    est_pos = 2.3 * pos @ R.T + [1, 2, 3]
    est = tmp_path / "est.txt"
    save_traj_tum(est, ts, np.concatenate([est_pos, quat], axis=1))

    assert ate_rmse(est, gt) < 1e-6

    # and a corrupted trajectory must NOT score 0
    est_pos[n // 2 :] += [0.5, 0, 0]
    save_traj_tum(est, ts, np.concatenate([est_pos, quat], axis=1))
    # (Sim(3) alignment absorbs part of a half-trajectory offset; what is
    # left must still be clearly nonzero)
    assert ate_rmse(est, gt) > 0.02


def test_associate_respects_max_dt():
    t_a = np.array([0.0, 1.0, 2.0, 3.0])
    t_b = np.array([0.005, 1.5, 2.004, 10.0])
    ia, ib = associate(t_a, t_b, max_dt=0.02)
    assert list(t_a[ia]) == [0.0, 2.0]
    assert list(t_b[ib]) == [0.005, 2.004]


def test_ply_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    col = (rng.random((100, 3)) * 255).astype(np.uint8)
    f = tmp_path / "x.ply"
    save_ply(f, pts, col)
    p2, c2 = load_ply(f)
    np.testing.assert_allclose(p2, pts, atol=1e-6)
    np.testing.assert_array_equal(c2, col)


def test_config_inherit_and_override():
    base = load_config("base")
    ec = load_config("eval_calib")
    assert base["use_calib"] is False and ec["use_calib"] is True
    assert ec["single_thread"] is True
    assert ec["dataset"]["subsample"] == 2
    # untouched subtrees inherited
    assert ec["tracking"]["huber"] == base["tracking"]["huber"]
    # sci-notation floats parsed as numbers
    assert isinstance(base["matching"]["lambda_init"], float)
    assert base["matching"]["lambda_init"] == pytest.approx(1e-8)
    # eth3d chains through eval_calib
    eth = load_config("eth3d")
    assert eth["use_calib"] is True
    assert eth["dataset"]["subsample"] == 1
    assert eth["reloc"]["strict"] is False
    # merge_config does not mutate its inputs' nested dicts destructively
    o = merge_config(base, {"tracking": {"huber": 9.9}})
    assert o["tracking"]["huber"] == 9.9
