"""Backend round-trip diet (VERDICT r4 item 2).

``local_opt.speculative_gate`` stores every loop-closure candidate with the
match-fraction gate computed ON DEVICE and masked into the edge weights —
rejected candidates become zero-weight rows, which the scatter-assembled
solve ignores exactly.  These tests pin:

1. solve parity: a speculative graph (with dead rows) solves to the same
   poses as the fetch-then-filter graph;
2. bookkeeping: verdicts resolve lazily into ``edge_live`` and the live
   (ii, jj) set equals the non-speculative edge set;
3. the round-trip count: one full backend task (retrieval + add_factors +
   solve) performs EXACTLY ONE blocking device->host fetch (retrieval's).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mast3r_slam_tpu.config import load_config
from mast3r_slam_tpu.lie import sim3
from mast3r_slam_tpu.slam.pipeline import SLAM

from oracle import OracleDataset, OracleModel, PlaneScene, arc_trajectory

N_FRAMES = 30
HW = (48, 64)


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
    assert len(slam.keyframes) >= 5
    return model, cfg, slam.keyframes


def _fresh_graph(model, cfg, keyframes, spec: bool, oneway: bool = True):
    from mast3r_slam_tpu.slam.factor_graph import FactorGraph

    import copy

    cfg2 = copy.deepcopy(cfg)
    cfg2["local_opt"]["oneway_nonconsec"] = oneway
    cfg2["local_opt"]["speculative_gate"] = spec
    return FactorGraph(model, cfg2, keyframes, HW, edge_capacity=16)


def _add_mixed(g, kf, thresh):
    """One consecutive edge + one overlapping candidate + one hopeless
    candidate (keyframe 0 vs last share no pixels on the arc)."""
    n = len(kf)
    return g.add_factors([n - 2, n - 3, 0], [n - 1] * 3, thresh)


def test_speculative_gate_bookkeeping(tracked_scene):
    model, cfg, kf = tracked_scene
    thresh = 0.5  # high enough that the far candidate fails its gate
    g_ref = _fresh_graph(model, cfg, kf, spec=False)
    g_spec = _fresh_graph(model, cfg, kf, spec=True)
    assert _add_mixed(g_ref, kf, thresh)
    assert _add_mixed(g_spec, kf, thresh)

    # speculative graph stored ALL candidates; verdicts pending
    assert g_spec.n_edges == 3
    assert len(g_spec._pending) > 0
    live = g_spec.n_live_edges  # resolves verdicts
    assert not g_spec._pending
    assert live == g_ref.n_edges
    live_pairs = {
        (int(g_spec.ii[e]), int(g_spec.jj[e]))
        for e in range(g_spec.n_edges) if g_spec.edge_live[e]
    }
    ref_pairs = {
        (int(g_ref.ii[e]), int(g_ref.jj[e])) for e in range(g_ref.n_edges)
    }
    assert live_pairs == ref_pairs
    # dead rows are zero-weight on device
    for e in range(g_spec.n_edges):
        if not g_spec.edge_live[e]:
            assert not np.asarray(g_spec.valid_match_j[e]).any()
            assert float(np.abs(np.asarray(g_spec.Q_ii2jj[e])).max()) == 0.0


def test_speculative_gate_solve_parity(tracked_scene):
    """Dead zero-weight rows must not change the solve: perturb poses,
    solve both graphs from the same start, compare recovered poses."""
    model, cfg, kf = tracked_scene
    thresh = float(cfg["local_opt"]["min_match_frac"])

    g_ref = _fresh_graph(model, cfg, kf, spec=False)
    g_spec = _fresh_graph(model, cfg, kf, spec=True)
    # same mixed batch incl. a gate-failing candidate
    _add_mixed(g_ref, kf, 0.5)
    _add_mixed(g_spec, kf, 0.5)
    assert g_spec.n_edges > g_ref.n_edges  # dead rows present

    T_save = kf.T_WC
    n = len(kf)
    # perturb the last pose so GN has real work
    tau = jnp.zeros((8,), jnp.float32).at[0].set(0.03).at[4].set(0.02)
    T_pert = kf.T_WC.at[n - 1].set(
        jnp.asarray(sim3.retr(kf.T_WC[n - 1], tau[:7]), kf.T_WC.dtype)
    )

    kf.T_WC = T_pert
    g_ref.solve()
    poses_ref = np.asarray(kf.T_WC[:n])

    kf.T_WC = T_pert
    g_spec.solve()
    poses_spec = np.asarray(kf.T_WC[:n])

    kf.T_WC = T_save  # restore for other tests
    np.testing.assert_allclose(poses_spec, poses_ref, rtol=0, atol=1e-6)


def test_backend_task_single_blocking_fetch(monkeypatch):
    """One steady-state backend task = retrieval + add_factors + solve with
    EXACTLY ONE blocking device->host fetch (retrieval's batched one).
    Counted by wrapping np.asarray / jax.device_get; the oracle model's own
    internal host math is excluded (a real model does no host readbacks)."""
    from mast3r_slam_tpu.retrieval import RetrievalDatabase
    from mast3r_slam_tpu.retrieval.asmk import ASMKSettings
    from mast3r_slam_tpu.retrieval.head import (
        RetrievalHeadSettings,
        init_head_params,
    )

    scene = PlaneScene(HW)
    gt = arc_trajectory(N_FRAMES, radius=0.6, max_angle=2.5)
    model = OracleModel(scene, gt, noise=0.002)
    cfg = load_config("speed")
    assert cfg["local_opt"]["speculative_gate"] is True
    cfg["engine"]["keyframe_buffer"] = 64
    cfg["engine"]["edge_buffer"] = 64
    cfg["single_thread"] = True

    params = init_head_params(jax.random.key(0), model.feat_dim, hdims=(8,))
    centroids = jax.random.normal(jax.random.key(1), (64, 8)) * 0.3
    retrieval = RetrievalDatabase(
        params, centroids, RetrievalHeadSettings(nfeat=8),
        ASMKSettings(capacity=64 * 8, max_images=64),
    )
    slam = SLAM(model, cfg, HW, retrieval=retrieval)
    slam.run(OracleDataset(N_FRAMES, HW), verbose=False)
    kf_idx = len(slam.keyframes) - 1
    assert kf_idx >= 3

    state = {"count": 0, "paused": 0}

    def pause(fn):
        def wrapped(*a, **k):
            state["paused"] += 1
            try:
                return fn(*a, **k)
            finally:
                state["paused"] -= 1
        return wrapped

    for name in ("encode", "asymmetric", "symmetric", "mono"):
        monkeypatch.setattr(model, name, pause(getattr(model, name)))

    real_asarray = np.asarray
    real_device_get = jax.device_get

    def counting_asarray(a, *args, **kw):
        if state["paused"] == 0 and isinstance(a, jax.Array):
            state["count"] += 1
        return real_asarray(a, *args, **kw)

    def counting_device_get(x, *args, **kw):
        if state["paused"] == 0 and any(
            isinstance(l, jax.Array) for l in jax.tree_util.tree_leaves(x)
        ):
            state["count"] += 1  # one batched transfer
        return real_device_get(x, *args, **kw)

    monkeypatch.setattr(np, "asarray", counting_asarray)
    monkeypatch.setattr(jax, "device_get", counting_device_get)
    # re-run a steady-state task for the newest keyframe
    slam._backend_update_impl(kf_idx)
    monkeypatch.setattr(np, "asarray", real_asarray)
    monkeypatch.setattr(jax, "device_get", real_device_get)

    assert state["count"] == 1, (
        f"expected 1 blocking fetch per backend task (retrieval's), "
        f"got {state['count']}"
    )
