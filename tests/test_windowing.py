"""Windowed global solve (local_opt.window_size, VERDICT r3 item 2).

Beyond `window_size` free poses, FactorGraph.solve optimises only the most
recent window; older poses are pinned context.  This is the bounded-memory /
bounded-conditioning recipe for graphs past the dense knee — under
`solver: auto` it guarantees the known-diverging-on-TPU PCG GN path is never
selected (the reference sidesteps both problems with f64 Eigen,
gn_kernels.cu:57-159, and a hard 512-keyframe cap, frame.py:221).
"""

import numpy as np
import jax.numpy as jnp

from mast3r_slam_tpu.config import load_config
from mast3r_slam_tpu.lie import sim3
from mast3r_slam_tpu.ops.global_gn import GlobalGNSettings, gauss_newton_poses
from mast3r_slam_tpu.slam.factor_graph import FactorGraph
from mast3r_slam_tpu.slam.frame import Frame, Keyframes

import sys, os

sys.path.insert(0, os.path.dirname(__file__))
from oracle import arc_trajectory


def _make_problem(M=12, N=48, seed=0, perturb_from=None, noise=0.02):
    """Shared world cloud, identity correspondences; poses after
    `perturb_from` carry noise the solve must remove."""
    rng = np.random.default_rng(seed)
    gt = arc_trajectory(M, radius=0.4, max_angle=1.2)
    world = rng.uniform(-1, 1, size=(N, 3)).astype(np.float32) + [0, 0, 3]
    Xs = np.stack(
        [
            np.asarray(sim3.act(sim3.inv(jnp.asarray(gt[i])), jnp.asarray(world)))
            for i in range(M)
        ]
    )
    tau = np.zeros((M, 7), np.float32)
    if perturb_from is not None:
        tau[perturb_from:] = rng.normal(
            size=(M - perturb_from, 7)
        ).astype(np.float32) * noise
    noisy = np.asarray(sim3.retr(jnp.asarray(gt), jnp.asarray(tau)))
    return gt, noisy, Xs, world


def _build_graph(noisy, Xs, window_size, edges, N):
    """Keyframe store + FactorGraph with identity-correspondence edges
    installed directly (no model inference — solver-level test)."""
    M = len(noisy)
    cfg = load_config("base")
    cfg["local_opt"]["window_size"] = window_size
    cfg["local_opt"]["Q_conf"] = -1.0
    cfg["local_opt"]["C_conf"] = -1.0
    cfg["local_opt"]["edge_bucket_floor"] = 4
    cfg["local_opt"]["pose_bucket_floor"] = 4
    kf = Keyframes(capacity=M, num_pixels=N, num_patches=1, feat_dim=2)
    for i in range(M):
        kf.append(
            Frame(
                frame_id=i,
                img=None,
                T_WC=jnp.asarray(noisy[i]),
                X_canon=jnp.asarray(Xs[i]),
                C=jnp.full((N, 1), 2.0),
                n_fused=1,
                n_updates=1,
                feat=jnp.zeros((1, 1, 2)),
                pos=jnp.zeros((1, 1, 2), jnp.int32),
            )
        )
    g = FactorGraph(None, cfg, kf, img_hw=(1, N), edge_capacity=32)
    E = len(edges)
    for e, (a, b) in enumerate(edges):
        g.ii[e] = a
        g.jj[e] = b
    g.idx_ii2jj = g.idx_ii2jj.at[:E].set(jnp.arange(N, dtype=jnp.int32))
    g.idx_jj2ii = g.idx_jj2ii.at[:E].set(jnp.arange(N, dtype=jnp.int32))
    g.valid_match_j = g.valid_match_j.at[:E].set(True)
    g.valid_match_i = g.valid_match_i.at[:E].set(True)
    g.Q_ii2jj = g.Q_ii2jj.at[:E].set(2.0)
    g.Q_jj2ii = g.Q_jj2ii.at[:E].set(2.0)
    g.n_edges = E
    return g, kf


def test_windowed_solve_recovers_recent_and_freezes_old():
    M, N, W = 12, 48, 4
    gt, noisy, Xs, _ = _make_problem(M, N, perturb_from=M - W)
    edges = [(i, i + 1) for i in range(M - 1)] + [(2, 9)]  # chain + loop
    g, kf = _build_graph(noisy, Xs, W, edges, N)
    old = np.asarray(kf.T_WC[: M - W]).copy()
    g.solve(mode="rays")
    T = np.asarray(kf.T_WC[:M])
    # pre-window poses are bitwise untouched
    np.testing.assert_array_equal(T[: M - W], old)
    # window poses pulled back to ground truth (identity correspondences)
    err = np.linalg.norm(T[M - W :, :3] - gt[M - W :, :3], axis=-1)
    init = np.linalg.norm(noisy[M - W :, :3] - gt[M - W :, :3], axis=-1)
    assert err.max() < 0.02 * init.max(), (err.max(), init.max())


def test_windowed_matches_pinned_full_solve():
    """Windowed FactorGraph solve == direct full-graph GN with every
    pre-window pose pinned (the dropped old-old edges touch only pinned
    poses, so they cannot change the answer)."""
    M, N, W = 10, 32, 4
    gt, noisy, Xs, _ = _make_problem(M, N, perturb_from=M - W, seed=3)
    edges = [(i, i + 1) for i in range(M - 1)] + [(1, 7)]
    g, kf = _build_graph(noisy, Xs, W, edges, N)
    g.solve(mode="rays")
    T_win = np.asarray(kf.T_WC[:M])

    # oracle: full arrays, pin = first free pose
    E = len(edges)
    ii2 = np.array([a for a, b in edges] + [b for a, b in edges], np.int32)
    jj2 = np.array([b for a, b in edges] + [a for a, b in edges], np.int32)
    idx = np.tile(np.arange(N, dtype=np.int32), (2 * E, 1))
    valid = np.ones((2 * E, N, 1), bool)
    Q = np.full((2 * E, N, 1), 2.0, np.float32)
    s = GlobalGNSettings(edge_batch=4, pin=M - W, solver="dense")
    T_ref, _, ok, _ = gauss_newton_poses(
        jnp.asarray(noisy), jnp.asarray(Xs),
        jnp.full((M, N, 1), 2.0, jnp.float32),
        jnp.asarray(ii2), jnp.asarray(jj2), jnp.asarray(idx),
        jnp.asarray(valid), jnp.asarray(Q),
        jnp.eye(3, dtype=jnp.float32), (1, N), s, "rays",
    )
    assert bool(ok)
    np.testing.assert_allclose(T_win, np.asarray(T_ref), atol=2e-5)


def test_no_window_below_threshold():
    """window_size >= free poses: behaviour identical to the full solve."""
    M, N = 6, 32
    gt, noisy, Xs, _ = _make_problem(M, N, perturb_from=1, seed=5)
    edges = [(i, i + 1) for i in range(M - 1)]
    g_w, kf_w = _build_graph(noisy, Xs, 64, edges, N)
    g_f, kf_f = _build_graph(noisy, Xs, 0, edges, N)
    g_w.solve(mode="rays")
    g_f.solve(mode="rays")
    np.testing.assert_array_equal(
        np.asarray(kf_w.T_WC[:M]), np.asarray(kf_f.T_WC[:M])
    )


def test_auto_beyond_knee_routes_pcg_unwindowed():
    """solver=auto + unbounded window_size: past the dense knee the solve
    routes to PCG over ALL poses (no windowing clamp — the r3-era on-chip
    PCG divergence was root-caused to the Sim3-exp retraction and fixed in
    r4, lie/sim3.exp), and every perturbed pose is recovered."""
    M, N = 9, 32
    gt, noisy, Xs, _ = _make_problem(M, N, perturb_from=1, seed=7)
    edges = [(i, i + 1) for i in range(M - 1)]
    g, kf = _build_graph(noisy, Xs, int(1e6), edges, N)
    g.settings = g.settings._replace(dense_max_poses=4)  # knee below M-1
    g.solve(mode="rays")
    T = np.asarray(kf.T_WC[:M])
    err = np.linalg.norm(T[1:, :3] - gt[1:, :3], axis=-1)
    init = np.linalg.norm(noisy[1:, :3] - gt[1:, :3], axis=-1)
    # ALL free poses moved toward gt, including those before the knee
    assert err.max() < 0.05 * init.max()
