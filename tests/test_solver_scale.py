"""Large-graph solve: block-sparse PCG parity with the dense Cholesky and a
1024-pose soak (VERDICT r2 item 6).

The dense path scatters into an (M+1, M+1, 7, 7) array — O(M^2) memory with
an O(M^3) factor — fine to the reference's 512-keyframe cap
(frame.py:221), ruinous for this engine's growth policy.  The `auto` solver
policy (GlobalGNSettings.solver) switches to the O(E)-memory block-sparse
PCG past `dense_max_poses`; these tests pin (a) PCG == dense on the same
problem, (b) the policy switch, (c) a 1024-pose solve that the dense path
could not hold (the scatter alone would be 1025^2*49*4 B ≈ 206 MB per GN
iteration plus a 7168^2 factor).
"""

import numpy as np
import jax.numpy as jnp

from mast3r_slam_tpu.lie import sim3
from mast3r_slam_tpu.ops.global_gn import GlobalGNSettings, gauss_newton_poses

import sys, os
sys.path.insert(0, os.path.dirname(__file__))
from test_sharded_ba import _rays_problem, _chain_edges
from oracle import arc_trajectory


def _pose_err(a, b):
    return np.linalg.norm(np.asarray(a)[:, :3] - np.asarray(b)[:, :3], axis=-1)


def test_pcg_matches_dense_rays():
    gt, noisy, Xs, Cs, ii, jj, idx, valid, Q = _rays_problem(n_kf=6, N=400)
    args = (
        jnp.asarray(noisy), jnp.asarray(Xs), jnp.asarray(Cs),
        jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(idx),
        jnp.asarray(valid), jnp.asarray(Q),
        jnp.eye(3, dtype=jnp.float32), (1, 1),
    )
    dense = GlobalGNSettings(edge_batch=4, solver="dense")
    pcg = GlobalGNSettings(edge_batch=4, solver="pcg")
    Td, _, okd, _ = gauss_newton_poses(*args, dense, "rays")
    Tp, _, okp, _ = gauss_newton_poses(*args, pcg, "rays")
    assert bool(okd) and bool(okp)
    # both recover ground truth
    assert _pose_err(Td, gt).max() < 5e-3
    assert _pose_err(Tp, gt).max() < 5e-3
    # and agree with each other much tighter than with the noisy init
    init_err = _pose_err(noisy, gt).max()
    agree = np.linalg.norm(np.asarray(Td) - np.asarray(Tp), axis=-1).max()
    assert agree < 0.05 * init_err, (agree, init_err)


def test_auto_policy_switches_at_knee():
    """solver='auto' must pick dense below the knee and PCG above; both
    dispatches run and return finite poses."""
    gt, noisy, Xs, Cs, ii, jj, idx, valid, Q = _rays_problem(n_kf=5, N=200)
    args = (
        jnp.asarray(noisy), jnp.asarray(Xs), jnp.asarray(Cs),
        jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(idx),
        jnp.asarray(valid), jnp.asarray(Q),
        jnp.eye(3, dtype=jnp.float32), (1, 1),
    )
    # knee above the problem size -> dense; below -> pcg.  Both must solve.
    for knee in (64, 2):
        s = GlobalGNSettings(edge_batch=4, solver="auto", dense_max_poses=knee)
        T, _, ok, _ = gauss_newton_poses(*args, s, "rays")
        assert bool(ok)
        assert _pose_err(T, gt).max() < 5e-3, knee


def test_soak_1024_pose_graph_pcg():
    """1024 poses, chain + long-range loop edges, small per-edge fields.
    The PCG path must solve it (finite, improves the noisy init) without
    ever materialising an O(M^2) operator."""
    rng = np.random.default_rng(0)
    M = 1024
    N = 64  # pixels per edge: keeps the E x N fields small; the POSE count
    #         is what this test scales
    gt = arc_trajectory(M, radius=2.0, max_angle=6.0)
    world = rng.uniform(-1, 1, size=(N, 3)).astype(np.float32) + [0, 0, 3]
    Xs = np.stack([
        np.asarray(sim3.act(sim3.inv(jnp.asarray(gt[i])), jnp.asarray(world)))
        for i in range(M)
    ])
    Cs = np.full((M, N, 1), 2.0, np.float32)

    ii, jj = _chain_edges(M)
    # add loop closures every 64 poses (both directions)
    loops = [(i, i + 64) for i in range(0, M - 64, 64)]
    ii = np.concatenate([ii, [a for a, b in loops], [b for a, b in loops]]).astype(np.int32)
    jj = np.concatenate([jj, [b for a, b in loops], [a for a, b in loops]]).astype(np.int32)
    E = len(ii)
    idx = np.tile(np.arange(N, dtype=np.int32), (E, 1))
    valid = np.ones((E, N, 1), bool)
    Q = np.full((E, N, 1), 2.0, np.float32)

    tau = rng.normal(size=(M, 7)).astype(np.float32) * 0.01
    tau[0] = 0
    noisy = np.asarray(sim3.retr(jnp.asarray(gt), jnp.asarray(tau)))

    # explicit pcg: the auto knee prefers damped-dense through M=1024 (TPU
    # PCG loop-divergence, see GlobalGNSettings), but this test pins the
    # O(E)-memory path itself
    s = GlobalGNSettings(edge_batch=64, solver="pcg",
                         max_iters=4)
    T, iters, ok, _ = gauss_newton_poses(
        jnp.asarray(noisy), jnp.asarray(Xs), jnp.asarray(Cs),
        jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(idx),
        jnp.asarray(valid), jnp.asarray(Q),
        jnp.eye(3, dtype=jnp.float32), (1, 1), s, "rays",
    )
    assert bool(ok)
    T = np.asarray(T)
    assert np.isfinite(T).all()
    before = _pose_err(noisy, gt)
    after = _pose_err(T, gt)
    assert after.mean() < 0.2 * before.mean(), (before.mean(), after.mean())
