"""Solver health guard (VERDICT r4 item 6).

The global GN loop carries the robust cost (free from the augmented
[J|err] outer product, Mloc[7,7]) and checks monotonicity every
iteration: a cost-increasing step is REVERTED on device and flags
`diverged`.  FactorGraph.solve records the flag for PCG-routed solves and
demotes the NEXT solve to the windowed-dense route — the safety property
that retires the `ops/global_gn.py` preconditioner "divergence suspect"
note by construction rather than by probing.
"""

import numpy as np
import jax.numpy as jnp

from mast3r_slam_tpu.ops import global_gn
from mast3r_slam_tpu.ops.global_gn import GlobalGNSettings, gauss_newton_poses

import sys, os

sys.path.insert(0, os.path.dirname(__file__))
from test_sharded_ba import _rays_problem
from test_windowing import _build_graph, _make_problem


def _args(noisy, Xs, Cs, ii, jj, idx, valid, Q):
    return (
        jnp.asarray(noisy), jnp.asarray(Xs), jnp.asarray(Cs),
        jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(idx),
        jnp.asarray(valid), jnp.asarray(Q),
        jnp.eye(3, dtype=jnp.float32), (1, 1),
    )


def test_healthy_solve_reports_no_divergence():
    gt, noisy, Xs, Cs, ii, jj, idx, valid, Q = _rays_problem(n_kf=6, N=400)
    for solver in ("dense", "pcg"):
        s = GlobalGNSettings(edge_batch=4, solver=solver)
        T, _, ok, diverged = gauss_newton_poses(
            *_args(noisy, Xs, Cs, ii, jj, idx, valid, Q), s, "rays"
        )
        assert bool(ok) and not bool(diverged)
        err = np.linalg.norm(np.asarray(T)[:, :3] - gt[:, :3], axis=-1)
        assert err.max() < 5e-3


def test_guard_reverts_poisoned_step(monkeypatch):
    """Fault injection: a poisoned linear solve returns a large wrong step.
    The guard must detect the cost increase at the next iteration, revert
    to the last good poses (here: the initial ones) and flag diverged."""
    gt, noisy, Xs, Cs, ii, jj, idx, valid, Q = _rays_problem(n_kf=6, N=400)

    def poisoned(H_e, g_e, ii_, jj_, num_poses, pin, *a, **kw):
        M = num_poses - pin
        return jnp.full((M, 7), 0.5, jnp.float32), jnp.asarray(True)

    monkeypatch.setattr(global_gn, "_assemble_and_solve_pcg", poisoned)
    # unique settings tuple: gauss_newton_poses is jitted (static settings),
    # so an already-compiled healthy program would ignore the monkeypatch —
    # a fresh key forces a trace through the poisoned function
    s = GlobalGNSettings(edge_batch=4, solver="pcg", pcg_iters=97)
    T, iters, ok, diverged = gauss_newton_poses(
        *_args(noisy, Xs, Cs, ii, jj, idx, valid, Q), s, "rays"
    )
    assert bool(diverged)
    assert int(iters) == 2  # bad step taken once, detected + reverted next
    # output is the last GOOD iterate = the initial poses, bitwise
    np.testing.assert_array_equal(
        np.asarray(T), np.asarray(jnp.asarray(noisy))
    )


def test_factor_graph_demotes_after_divergence(monkeypatch):
    """Graph-level fallback: solve #1 on a poisoned PCG route diverges
    (poses untouched); solve #2 consumes the health flag and runs the
    windowed-DENSE route, recovering the trajectory."""
    M, N, W = 12, 48, 4
    gt, noisy, Xs, _ = _make_problem(M, N, perturb_from=M - W)
    edges = [(i, i + 1) for i in range(M - 1)] + [(2, 9)]
    # window_size unbounded; force the PCG route via solver: pcg.  A small
    # dense knee makes the recovery demote to the WINDOWED dense route
    # (window = dense_max_poses = W covers exactly the perturbed poses).
    g, kf = _build_graph(noisy, Xs, int(1e6), edges, N)
    # pcg_iters=93: unique jit key so the poisoned trace isn't shadowed by
    # a cached healthy compile (see test_guard_reverts_poisoned_step)
    g.settings = g.settings._replace(
        solver="pcg", dense_max_poses=W, pcg_iters=93
    )
    g._gcache_on = False

    calls = {"n": 0}
    real = global_gn._assemble_and_solve_pcg

    def poisoned(H_e, g_e, ii_, jj_, num_poses, pin, *a, **kw):
        calls["n"] += 1
        Mp = num_poses - pin
        return jnp.full((Mp, 7), 0.5, jnp.float32), jnp.asarray(True)

    monkeypatch.setattr(global_gn, "_assemble_and_solve_pcg", poisoned)
    T0 = np.asarray(kf.T_WC[:M]).copy()
    g.solve(mode="rays")
    assert calls["n"] > 0, "poisoned PCG route must have been taken"
    assert g._health_pending is not None
    # guard reverted the bad step on device: poses unchanged
    np.testing.assert_allclose(
        np.asarray(kf.T_WC[:M]), T0, rtol=0, atol=1e-7
    )

    monkeypatch.setattr(global_gn, "_assemble_and_solve_pcg", real)
    windowed = {"n": 0}
    orig_windowed = g._solve_windowed

    def spy(*a, **kw):
        windowed["n"] += 1
        return orig_windowed(*a, **kw)

    monkeypatch.setattr(g, "_solve_windowed", spy)
    g.solve(mode="rays")
    assert g.n_recoveries == 1
    assert windowed["n"] == 1, "recovery must demote to the windowed route"
    # the dense windowed recovery actually fixes the perturbed poses
    T = np.asarray(kf.T_WC[:M])
    err = np.linalg.norm(T[M - W:, :3] - gt[M - W:, :3], axis=-1)
    init = np.linalg.norm(noisy[M - W:, :3] - gt[M - W:, :3], axis=-1)
    assert err.max() < 0.05 * init.max(), (err.max(), init.max())
