"""Global BA solver correctness + sharded == single-device parity.

Problems are built with EXACT correspondences (shared world cloud), so GN
must recover ground truth to numerical precision; pixel-quantized real
matching is covered by the e2e oracle test instead.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mast3r_slam_tpu.geometry import backproject, get_pixel_coords
from mast3r_slam_tpu.lie import sim3
from mast3r_slam_tpu.ops.global_gn import GlobalGNSettings, gauss_newton_poses
from mast3r_slam_tpu.parallel.mesh import make_mesh, replicate, shard_edges
from mast3r_slam_tpu.parallel.sharded_ba import gauss_newton_poses_sharded

from oracle import arc_trajectory


def _chain_edges(n_kf):
    e_one = [(i, i + 1) for i in range(n_kf - 1)]
    ii = np.array([a for a, b in e_one] + [b for a, b in e_one], np.int32)
    jj = np.array([b for a, b in e_one] + [a for a, b in e_one], np.int32)
    return ii, jj


def _rays_problem(n_kf=4, N=500, noise=0.02, seed=0):
    """Shared world cloud, exact identity correspondences, perturbed poses."""
    rng = np.random.default_rng(seed)
    gt = arc_trajectory(n_kf, radius=0.4, max_angle=1.2)
    world = rng.uniform(-1, 1, size=(N, 3)).astype(np.float32) + [0, 0, 3]
    Xs = np.stack(
        [
            np.asarray(sim3.act(sim3.inv(jnp.asarray(gt[i])), jnp.asarray(world)))
            for i in range(n_kf)
        ]
    )
    Cs = np.full((n_kf, N, 1), 2.0, np.float32)
    ii, jj = _chain_edges(n_kf)
    E = len(ii)
    idx = np.tile(np.arange(N, dtype=np.int32), (E, 1))
    valid = np.ones((E, N, 1), bool)
    Q = np.full((E, N, 1), 2.0, np.float32)
    tau = rng.normal(size=(n_kf, 7)).astype(np.float32) * noise
    tau[0] = 0
    noisy = np.asarray(sim3.retr(jnp.asarray(gt), jnp.asarray(tau)))
    return gt, noisy, Xs, Cs, ii, jj, idx, valid, Q


def _calib_problem(n_kf=4, hw=(24, 32), noise=0.01, seed=0):
    """All keyframes share ONE pose and one grid-consistent pointmap, so
    identity correspondences and pixel targets are exact; GN must pull
    perturbed poses back to a common pose (relative errors -> 0)."""
    rng = np.random.default_rng(seed)
    H, W = hw
    f = 0.9 * W
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    uv = np.asarray(get_pixel_coords(hw)).reshape(-1, 2)
    z = (2.0 + 0.5 * rng.random((H * W, 1))).astype(np.float32)
    Xgrid = np.asarray(backproject(jnp.asarray(uv), jnp.asarray(z), jnp.asarray(K)))
    Xs = np.tile(Xgrid, (n_kf, 1, 1))
    N = H * W
    Cs = np.full((n_kf, N, 1), 2.0, np.float32)
    ii, jj = _chain_edges(n_kf)
    E = len(ii)
    idx = np.tile(np.arange(N, dtype=np.int32), (E, 1))
    valid = np.ones((E, N, 1), bool)
    Q = np.full((E, N, 1), 2.0, np.float32)
    gt = np.tile(np.asarray(sim3.identity()), (n_kf, 1))
    tau = rng.normal(size=(n_kf, 7)).astype(np.float32) * noise
    tau[0] = 0
    noisy = np.asarray(sim3.retr(jnp.asarray(gt), jnp.asarray(tau)))
    return K, hw, gt, noisy, Xs, Cs, ii, jj, idx, valid, Q


def test_global_gn_rays_recovers_gt():
    gt, noisy, Xs, Cs, ii, jj, idx, valid, Q = _rays_problem()
    settings = GlobalGNSettings(edge_batch=4)
    Twc, iters, ok, _ = gauss_newton_poses(
        jnp.asarray(noisy), jnp.asarray(Xs), jnp.asarray(Cs),
        jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(idx), jnp.asarray(valid),
        jnp.asarray(Q), jnp.eye(3, dtype=jnp.float32), (1, Xs.shape[1]),
        settings, "rays",
    )
    assert bool(ok)
    err_before = np.linalg.norm(noisy[:, :3] - gt[:, :3], axis=-1).mean()
    err_after = np.linalg.norm(np.asarray(Twc)[:, :3] - gt[:, :3], axis=-1).mean()
    assert err_after < 1e-4, (err_before, err_after)


def test_global_gn_calib_recovers_gt():
    K, hw, gt, noisy, Xs, Cs, ii, jj, idx, valid, Q = _calib_problem()
    settings = GlobalGNSettings(edge_batch=4)
    Twc, iters, ok, _ = gauss_newton_poses(
        jnp.asarray(noisy), jnp.asarray(Xs), jnp.asarray(Cs),
        jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(idx), jnp.asarray(valid),
        jnp.asarray(Q), jnp.asarray(K), hw, settings, "calib",
    )
    assert bool(ok)
    err_before = np.linalg.norm(noisy[:, :3] - gt[:, :3], axis=-1).mean()
    err_after = np.linalg.norm(np.asarray(Twc)[:, :3] - gt[:, :3], axis=-1).mean()
    assert err_after < 1e-4, (err_before, err_after)


@pytest.mark.parametrize("mode", ["rays", "calib"])
def test_sharded_matches_single_device(mode):
    if len(jax.devices()) < 2:
        pytest.skip("need multiple devices")
    if mode == "rays":
        gt, noisy, Xs, Cs, ii, jj, idx, valid, Q = _rays_problem(n_kf=5)
        K = np.eye(3, dtype=np.float32)
        hw = (1, Xs.shape[1])
    else:
        K, hw, gt, noisy, Xs, Cs, ii, jj, idx, valid, Q = _calib_problem(n_kf=5)

    mesh = make_mesh(8)
    E = len(ii)
    Epad = ((E + 7) // 8) * 8
    pad = Epad - E
    ii = np.concatenate([ii, np.zeros(pad, np.int32)])
    jj = np.concatenate([jj, np.zeros(pad, np.int32)])
    idx = np.concatenate([idx, np.zeros((pad, idx.shape[1]), np.int32)])
    valid = np.concatenate([valid, np.zeros((pad,) + valid.shape[1:], bool)])
    Q = np.concatenate([Q, np.zeros((pad,) + Q.shape[1:], np.float32)])

    settings = GlobalGNSettings(edge_batch=2)
    args = (
        jnp.asarray(noisy), jnp.asarray(Xs), jnp.asarray(Cs),
        jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(idx),
        jnp.asarray(valid), jnp.asarray(Q), jnp.asarray(K), hw, settings, mode,
    )
    Twc_ref, _, ok_ref, _ = gauss_newton_poses(*args)

    (Twc0, Xs_d, Cs_d) = replicate(mesh, args[0], args[1], args[2])
    (ii_d, jj_d, idx_d, valid_d, Q_d) = shard_edges(
        mesh, args[3], args[4], args[5], args[6], args[7]
    )
    Twc_sh, _, ok_sh, _ = gauss_newton_poses_sharded(
        mesh, Twc0, Xs_d, Cs_d, ii_d, jj_d, idx_d, valid_d, Q_d,
        jnp.asarray(K), hw, settings, mode,
    )
    assert bool(ok_ref) and bool(ok_sh)
    np.testing.assert_allclose(
        np.asarray(Twc_sh), np.asarray(Twc_ref), atol=5e-4, rtol=1e-3
    )


def test_global_gn_points_recovers_gt():
    """Point-to-point mode (point_align_kernel equivalent)."""
    gt, noisy, Xs, Cs, ii, jj, idx, valid, Q = _rays_problem()
    settings = GlobalGNSettings(edge_batch=4)
    Twc, iters, ok, _ = gauss_newton_poses(
        jnp.asarray(noisy), jnp.asarray(Xs), jnp.asarray(Cs),
        jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(idx), jnp.asarray(valid),
        jnp.asarray(Q), jnp.eye(3, dtype=jnp.float32), (1, Xs.shape[1]),
        settings, "points",
    )
    assert bool(ok)
    err_after = np.linalg.norm(np.asarray(Twc)[:, :3] - gt[:, :3], axis=-1).mean()
    assert err_after < 1e-4, err_after
