"""Gathered-point cache parity (VERDICT r3 item 1 / BASELINE.md r3 lever).

The per-edge correspondence gather inside the global solve is
pose-INDEPENDENT: it changes only when an edge's source keyframe pointmap is
re-fused or the edge is new.  FactorGraph caches the gathered rows with
per-keyframe version stamps; these tests pin exact parity with the uncached
path across fusion updates and edge additions."""

import numpy as np
import jax.numpy as jnp

import sys, os

sys.path.insert(0, os.path.dirname(__file__))
from test_windowing import _build_graph, _make_problem


def _graph(noisy, Xs, N, edges, cache: bool):
    g, kf = _build_graph(noisy, Xs, 0, edges, N)
    g._gcache_on = cache
    return g, kf


def test_cached_solve_matches_uncached():
    M, N = 8, 48
    gt, noisy, Xs, _ = _make_problem(M, N, perturb_from=1)
    edges = [(i, i + 1) for i in range(M - 1)] + [(0, 5)]
    gc, kfc = _graph(noisy, Xs, N, edges, True)
    gu, kfu = _graph(noisy, Xs, N, edges, False)
    gc.solve(mode="rays")
    gu.solve(mode="rays")
    np.testing.assert_array_equal(
        np.asarray(kfc.T_WC[:M]), np.asarray(kfu.T_WC[:M])
    )
    assert gc._gf is not None  # the cached path actually ran
    assert (gc._stamp_f[: len(edges)] >= 0).all()


def test_cache_refreshes_on_pointmap_fusion():
    """Mutating a keyframe's pointmap between solves must invalidate every
    edge touching it — a stale cache would silently solve against old
    geometry."""
    M, N = 8, 48
    gt, noisy, Xs, world = _make_problem(M, N, perturb_from=1, seed=2)
    edges = [(i, i + 1) for i in range(M - 1)]
    gc, kfc = _graph(noisy, Xs, N, edges, True)
    gu, kfu = _graph(noisy, Xs, N, edges, False)
    gc.solve(mode="rays")
    gu.solve(mode="rays")

    # "fuse": overwrite keyframe 3's pointmap with shifted geometry + new conf
    rng = np.random.default_rng(0)
    X_new = Xs[3] + rng.normal(size=Xs[3].shape).astype(np.float32) * 0.05
    for kf in (kfc, kfu):
        kf.update_pointmap(
            3, jnp.asarray(X_new, jnp.float32),
            jnp.full((N, 1), 6.0, jnp.float32), jnp.int32(3),
            jnp.int32(2), jnp.float32(1.0),
        )
    gc.solve(mode="rays")
    gu.solve(mode="rays")
    np.testing.assert_array_equal(
        np.asarray(kfc.T_WC[:M]), np.asarray(kfu.T_WC[:M])
    )
    # only edges touching kf 3 were re-gathered on the second solve: stamps
    # of untouched edges still carry the original version (1 = append)
    touching = [e for e, (a, b) in enumerate(edges) if 3 in (a, b)]
    untouched = [e for e in range(len(edges)) if e not in touching]
    assert (gc._stamp_f[touching] == kfc.pm_version[[a for a, b in [edges[e] for e in touching]]]).all()
    assert (gc._stamp_f[untouched] == 1).all()


def test_cache_covers_edges_added_between_solves():
    M, N = 8, 48
    gt, noisy, Xs, _ = _make_problem(M, N, perturb_from=1, seed=4)
    chain = [(i, i + 1) for i in range(M - 1)]
    loop = (1, 6)
    gc, kfc = _graph(noisy, Xs, N, chain, True)
    gc.solve(mode="rays")
    # install one more edge the way add_factors does (store + stamp reset)
    e = len(chain)
    gc.ii[e], gc.jj[e] = loop
    gc.idx_ii2jj = gc.idx_ii2jj.at[e].set(jnp.arange(N, dtype=jnp.int32))
    gc.idx_jj2ii = gc.idx_jj2ii.at[e].set(jnp.arange(N, dtype=jnp.int32))
    gc.valid_match_j = gc.valid_match_j.at[e].set(True)
    gc.valid_match_i = gc.valid_match_i.at[e].set(True)
    gc.Q_ii2jj = gc.Q_ii2jj.at[e].set(2.0)
    gc.Q_jj2ii = gc.Q_jj2ii.at[e].set(2.0)
    gc.n_edges = e + 1
    gc._stamp_f[e] = -1
    gc._stamp_b[e] = -1
    gc.solve(mode="rays")

    # oracle: uncached graph given all edges and the SAME two-solve history
    gu, kfu = _graph(noisy, Xs, N, chain, False)
    gu.solve(mode="rays")
    gu.ii[e], gu.jj[e] = loop
    gu.idx_ii2jj = gc.idx_ii2jj
    gu.idx_jj2ii = gc.idx_jj2ii
    gu.valid_match_j = gc.valid_match_j
    gu.valid_match_i = gc.valid_match_i
    gu.Q_ii2jj = gc.Q_ii2jj
    gu.Q_jj2ii = gc.Q_jj2ii
    gu.n_edges = e + 1
    gu.solve(mode="rays")
    np.testing.assert_array_equal(
        np.asarray(kfc.T_WC[:M]), np.asarray(kfu.T_WC[:M])
    )


def test_calib_mode_cached_parity():
    """Calib solves gate on constrained depth; the cache stores
    ray-constrained rows — parity must hold there too."""
    M, N = 6, 48
    H, W = 6, 8
    assert H * W == N
    gt, noisy, Xs, _ = _make_problem(M, N, perturb_from=1, seed=6)
    Xs = np.abs(Xs) + 0.1  # positive depth for the calib gate
    edges = [(i, i + 1) for i in range(M - 1)]
    gc, kfc = _graph(noisy, Xs, N, edges, True)
    gu, kfu = _graph(noisy, Xs, N, edges, False)
    f = 0.9 * W
    K = jnp.asarray(
        [[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], jnp.float32
    )
    for g in (gc, gu):
        g.K = K
        g.img_hw = (H, W)
    gc.solve(mode="calib")
    gu.solve(mode="calib")
    np.testing.assert_array_equal(
        np.asarray(kfc.T_WC[:M]), np.asarray(kfu.T_WC[:M])
    )


def test_windowed_cached_matches_windowed_uncached():
    """The windowed solve's cached branch (compact row slices of the
    window-independent cache) must equal the uncached windowed solve —
    including after a fusion update between two windowed solves."""
    from test_windowing import _build_graph as _bg

    M, N, W = 12, 48, 4
    gt, noisy, Xs, _ = _make_problem(M, N, perturb_from=M - W, seed=9)
    edges = [(i, i + 1) for i in range(M - 1)] + [(2, 9)]
    gc, kfc = _bg(noisy, Xs, W, edges, N)
    gu, kfu = _bg(noisy, Xs, W, edges, N)
    gc._gcache_on = True
    gu._gcache_on = False
    gc.solve(mode="rays")
    gu.solve(mode="rays")
    np.testing.assert_array_equal(
        np.asarray(kfc.T_WC[:M]), np.asarray(kfu.T_WC[:M])
    )
    assert gc._gf is not None  # cached branch ran

    # fuse into an in-window keyframe, solve again: stale rows must refresh
    rng = np.random.default_rng(1)
    X_new = Xs[M - 2] + rng.normal(size=Xs[0].shape).astype(np.float32) * 0.05
    for kf in (kfc, kfu):
        kf.update_pointmap(
            M - 2, jnp.asarray(X_new, jnp.float32),
            jnp.full((N, 1), 5.0, jnp.float32), jnp.int32(2),
            jnp.int32(2), jnp.float32(1.0),
        )
    gc.solve(mode="rays")
    gu.solve(mode="rays")
    np.testing.assert_array_equal(
        np.asarray(kfc.T_WC[:M]), np.asarray(kfu.T_WC[:M])
    )
