"""local_opt.oneway_nonconsec: forward-only loop-closure factors.

The speed knob (factor_graph.add_factors) replaces the symmetric decode +
bidirectional matching of NON-consecutive candidates (global_opt.py:30-79)
with one asymmetric decode + forward matching.  These tests pin its
semantics against the reference-exact path on the ground-truth oracle:

1. the stored forward fields are identical to the symmetric path's forward
   half (same matcher, same Q aggregation),
2. the backward half-row is zero-weight (valid False / Q 0),
3. the graph still solves: a perturbed trajectory is recovered through
   forward-only loop-closure factors.
"""

import numpy as np
import pytest

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
    ds = OracleDataset(N_FRAMES, HW)
    slam.run(ds, verbose=False)
    assert len(slam.keyframes) >= 4
    return model, cfg, slam.keyframes


def _fresh_graph(model, cfg, keyframes, oneway: bool, reuse: bool = False):
    from mast3r_slam_tpu.slam.factor_graph import FactorGraph

    import copy

    cfg2 = copy.deepcopy(cfg)
    cfg2["local_opt"]["oneway_nonconsec"] = oneway
    cfg2["local_opt"]["reuse_tracker_match"] = reuse
    return FactorGraph(model, cfg2, keyframes, HW, edge_capacity=16)


def test_forward_fields_match_symmetric_path(tracked_scene):
    model, cfg, kf = tracked_scene
    n = len(kf)
    # one consecutive pair + one overlapping loop-closure candidate (two
    # keyframes back — far-apart arc keyframes share no pixels), store order
    ii = [n - 2, n - 3]
    jj = [n - 1, n - 1]
    thresh = float(cfg["local_opt"]["min_match_frac"])

    g_ref = _fresh_graph(model, cfg, kf, oneway=False)
    g_one = _fresh_graph(model, cfg, kf, oneway=True)
    assert g_ref.add_factors(ii, jj, thresh)
    assert g_one.add_factors(ii, jj, thresh)
    assert g_one.n_edges == g_ref.n_edges == 2
    assert list(g_one.ii[:2]) == ii and list(g_one.jj[:2]) == jj

    # forward halves identical (same matcher + Q aggregation on the same
    # decode outputs; the oracle is deterministic per pair)
    np.testing.assert_array_equal(
        np.asarray(g_one.idx_ii2jj[:2]), np.asarray(g_ref.idx_ii2jj[:2])
    )
    np.testing.assert_array_equal(
        np.asarray(g_one.valid_match_j[:2]), np.asarray(g_ref.valid_match_j[:2])
    )
    np.testing.assert_allclose(
        np.asarray(g_one.Q_ii2jj[:2]), np.asarray(g_ref.Q_ii2jj[:2]),
        rtol=0, atol=0,
    )

    # consecutive edge (row 0) keeps its bidirectional factor
    assert np.asarray(g_one.valid_match_i[0]).any()
    np.testing.assert_array_equal(
        np.asarray(g_one.idx_jj2ii[0]), np.asarray(g_ref.idx_jj2ii[0])
    )
    # loop-closure edge (row 1): backward half-row is zero-weight
    assert not np.asarray(g_one.valid_match_i[1]).any()
    assert float(np.abs(np.asarray(g_one.Q_jj2ii[1])).max()) == 0.0
    assert int(np.abs(np.asarray(g_one.idx_jj2ii[1])).max()) == 0


def test_gate_uses_forward_fraction_only(tracked_scene):
    model, cfg, kf = tracked_scene
    n = len(kf)
    g_one = _fresh_graph(model, cfg, kf, oneway=True)
    # an impossible threshold drops the loop-closure candidate but the
    # consecutive edge is kept unconditionally (global_opt.py:72-75)
    assert g_one.add_factors([n - 2, 0], [n - 1, n - 1], min_match_frac=2.0)
    assert g_one.n_edges == 1
    assert (g_one.ii[0], g_one.jj[0]) == (n - 2, n - 1)


def test_reloc_always_bidirectional_under_oneway(tracked_scene):
    """ADVICE r4 (medium): a relocalization call (is_reloc=True) must take
    the strict bidirectional path even with oneway_nonconsec on and
    reloc.strict=False (strict only controls all-or-nothing acceptance).
    Reloc edges are all non-consecutive, so before the fix they silently
    took the forward-only path."""
    model, cfg, kf = tracked_scene
    n = len(kf)
    thresh = float(cfg["local_opt"]["min_match_frac"])
    # reloc-shaped call: new keyframe ii vs a retrieved overlapping keyframe
    ii = [n - 1]
    jj = [n - 2]

    g_ref = _fresh_graph(model, cfg, kf, oneway=False)
    g_one = _fresh_graph(model, cfg, kf, oneway=True)
    assert g_ref.add_factors(ii, jj, thresh, is_reloc=True, strict=False)
    assert g_one.add_factors(ii, jj, thresh, is_reloc=True, strict=False)
    assert g_one.n_edges == g_ref.n_edges == 1

    # the backward direction must be populated and identical to the
    # reference-exact path — not the oneway zero-weight half-row
    assert np.asarray(g_one.valid_match_i[0]).any()
    np.testing.assert_array_equal(
        np.asarray(g_one.idx_jj2ii[0]), np.asarray(g_ref.idx_jj2ii[0])
    )
    np.testing.assert_array_equal(
        np.asarray(g_one.Q_jj2ii[0]), np.asarray(g_ref.Q_jj2ii[0])
    )


def test_reuse_capture_stored_as_backward(tracked_scene):
    """local_opt.reuse_tracker_match: the consecutive edge stores the
    tracker's captured match verbatim as its backward direction, with the
    forward half identical to the symmetric path's forward half."""
    model, cfg, kf = tracked_scene
    n = len(kf)
    N = HW[0] * HW[1]
    rng = np.random.default_rng(11)
    cap_idx = jnp.asarray(rng.integers(0, N, size=(N,)).astype(np.int32))
    cap_valid = jnp.asarray(rng.random((N, 1)) > 0.4)
    cap_q = jnp.asarray(rng.random((N, 1)).astype(np.float32) * 3.0)

    g_ref = _fresh_graph(model, cfg, kf, oneway=False)
    g_ru = _fresh_graph(model, cfg, kf, oneway=False, reuse=True)
    thresh = float(cfg["local_opt"]["min_match_frac"])
    pair = (n - 2, n - 1)
    assert g_ref.add_factors([pair[0]], [pair[1]], thresh)
    assert g_ru.add_factors(
        [pair[0]], [pair[1]], thresh,
        captures={pair: (cap_idx, cap_valid, cap_q)},
    )
    assert g_ru.n_edges == 1

    # backward = the capture, verbatim
    np.testing.assert_array_equal(np.asarray(g_ru.idx_jj2ii[0]),
                                  np.asarray(cap_idx))
    np.testing.assert_array_equal(np.asarray(g_ru.valid_match_i[0]),
                                  np.asarray(cap_valid))
    np.testing.assert_array_equal(np.asarray(g_ru.Q_jj2ii[0]),
                                  np.asarray(cap_q))
    # forward = the symmetric path's forward half
    np.testing.assert_array_equal(np.asarray(g_ru.idx_ii2jj[0]),
                                  np.asarray(g_ref.idx_ii2jj[0]))
    np.testing.assert_array_equal(np.asarray(g_ru.valid_match_j[0]),
                                  np.asarray(g_ref.valid_match_j[0]))
    np.testing.assert_array_equal(np.asarray(g_ru.Q_ii2jj[0]),
                                  np.asarray(g_ref.Q_ii2jj[0]))

    # without a matching capture the pair falls back to the symmetric path
    g_fb = _fresh_graph(model, cfg, kf, oneway=False, reuse=True)
    assert g_fb.add_factors(
        [pair[0]], [pair[1]], thresh,
        captures={(0, 1): (cap_idx, cap_valid, cap_q)},
    )
    np.testing.assert_array_equal(np.asarray(g_fb.idx_jj2ii[0]),
                                  np.asarray(g_ref.idx_jj2ii[0]))


@pytest.mark.slow
def test_engine_reuse_match_tracks():
    """Engine e2e with reuse_tracker_match (and oneway) on: consecutive
    edges carry a tracker-captured backward direction and the trajectory
    stays at the quantization floor."""
    import jax

    from mast3r_slam_tpu.eval.trajectory import umeyama_alignment
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
    cfg["local_opt"]["reuse_tracker_match"] = True
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
    result = slam.run(OracleDataset(N_FRAMES, HW), verbose=False)

    n_e = slam.graph.n_edges
    consec_with_backward = sum(
        1 for e in range(n_e)
        if slam.graph.ii[e] == slam.graph.jj[e] - 1
        and np.asarray(slam.graph.valid_match_i[e]).any()
    )
    assert consec_with_backward >= 2, "captures should reach the graph"

    est = result.frame_poses[:, :3]
    gt_t = gt[:, :3]
    s, R, t = umeyama_alignment(est, gt_t)
    aligned = (s * (R @ est.T)).T + t
    ate = float(np.sqrt(np.mean(np.linalg.norm(aligned - gt_t, axis=-1) ** 2)))
    assert ate < 0.04, f"reuse-profile ATE {ate:.4f}"


@pytest.mark.slow
def test_speed_profile_with_retrieval_tracks():
    """The shipped speed profile (oneway_nonconsec ON) with live retrieval:
    loop-closure candidates flow through the forward-only path inside the
    real engine loop and the trajectory stays at the quantization floor."""
    import jax

    from mast3r_slam_tpu.eval.trajectory import umeyama_alignment
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
    assert cfg["local_opt"]["oneway_nonconsec"] is True
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
    result = slam.run(OracleDataset(N_FRAMES, HW), verbose=False)

    n_e = slam.graph.n_edges
    nonconsec = sum(
        1 for a, b in zip(slam.graph.ii[:n_e], slam.graph.jj[:n_e])
        if a != b - 1
    )
    assert nonconsec >= 1, "retrieval should propose loop-closure candidates"
    # one-way edges carry no backward weight
    import numpy as _np

    for e in range(n_e):
        if slam.graph.ii[e] != slam.graph.jj[e] - 1:
            assert not _np.asarray(slam.graph.valid_match_i[e]).any()

    est = result.frame_poses[:, :3]
    gt_t = gt[:, :3]
    s, R, t = umeyama_alignment(est, gt_t)
    aligned = (s * (R @ est.T)).T + t
    ate = float(np.sqrt(np.mean(np.linalg.norm(aligned - gt_t, axis=-1) ** 2)))
    assert ate < 0.04, f"speed-profile ATE {ate:.4f}"


def test_solve_recovers_through_oneway_factors(tracked_scene):
    model, cfg, kf = tracked_scene
    n = len(kf)
    g_one = _fresh_graph(model, cfg, kf, oneway=True)
    thresh = float(cfg["local_opt"]["min_match_frac"])
    # chain + a forward-only loop factor spanning the trajectory
    ii = [k for k in range(n - 1)] + [0]
    jj = [k + 1 for k in range(n - 1)] + [n - 1]
    g_one.add_factors(ii, jj, thresh)
    assert g_one.n_edges >= n - 1

    clean = np.asarray(kf.T_WC[:n]).copy()
    rng = np.random.default_rng(7)
    noise = rng.normal(size=(n, 7)).astype(np.float32) * 0.03
    noise[0] = 0
    noisy = np.asarray(sim3.retr(jnp.asarray(clean), jnp.asarray(noise)))
    kf.T_WC = kf.T_WC.at[:n].set(jnp.asarray(noisy))
    err_before = np.linalg.norm(noisy[:, :3] - clean[:, :3], axis=-1).mean()
    g_one.solve()
    after = np.asarray(kf.T_WC[:n])
    err_after = np.linalg.norm(after[:, :3] - clean[:, :3], axis=-1).mean()
    kf.T_WC = kf.T_WC.at[:n].set(jnp.asarray(clean))  # restore for other tests
    assert err_after < 0.3 * err_before, (err_before, err_after)


def _out_and_back(n_out: int, max_angle: float = 1.2):
    """Loopy trajectory: out along the arc, then back the same way — the
    return pass overlaps old keyframes, so retrieval proposes real loop
    closures whose factors must correct accumulated drift.  Requires the
    CLOSED oracle box (the turnaround sweeps viewing directions the open
    scene renders as inconsistent sky — see PlaneScene)."""
    out = arc_trajectory(n_out, radius=0.6, max_angle=max_angle)
    return np.concatenate([out, out[::-1][1:]], axis=0)


def _run_drifty(oneway: bool, gt, noise=0.004):
    import jax

    from mast3r_slam_tpu.eval.trajectory import umeyama_alignment
    from mast3r_slam_tpu.retrieval import RetrievalDatabase
    from mast3r_slam_tpu.retrieval.asmk import ASMKSettings
    from mast3r_slam_tpu.retrieval.head import (
        RetrievalHeadSettings,
        init_head_params,
    )

    scene = PlaneScene(HW, closed=True)  # turnaround-valid geometry
    model = OracleModel(scene, gt, noise=noise)
    cfg = load_config("speed")
    cfg["local_opt"]["oneway_nonconsec"] = oneway
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
    result = slam.run(OracleDataset(len(gt), HW), verbose=False)

    est = result.frame_poses[:, :3]
    gt_t = gt[: len(est), :3]
    s, R, t = umeyama_alignment(est, gt_t)
    aligned = (s * (R @ est.T)).T + t
    ate = float(np.sqrt(np.mean(np.linalg.norm(aligned - gt_t, axis=-1) ** 2)))
    n_e = slam.graph.n_edges
    slam.graph.resolve_pending_verdicts()
    nonconsec = sum(
        1 for e in range(n_e)
        if slam.graph.ii[e] != slam.graph.jj[e] - 1 and slam.graph.edge_live[e]
    )
    return ate, nonconsec


@pytest.mark.slow
def test_oneway_ate_matches_symmetric_on_drifty_loop():
    """VERDICT r4 item 5: on a drift-heavy out-and-back scene where
    one-way loop-closure factors must correct ACCUMULATED error (2x the
    usual oracle noise over a 24-keyframe-out chain, loop closures on the
    return pass), the oneway profile's ATE must stay within ~1.1x of the
    symmetric profile's — the previous e2e sat at the quantization floor
    and could not see an accuracy regression.  Closed-box scene: the old
    open scene made the turnaround a chaotic-garbage regime where both
    arms failed identically and the comparison was vacuous (r5)."""
    gt = _out_and_back(24)
    ate_sym, lc_sym = _run_drifty(False, gt)
    ate_one, lc_one = _run_drifty(True, gt)
    # both runs must actually exercise loop closures
    assert lc_sym >= 1 and lc_one >= 1
    # drift is REAL at this noise (well above the quantization floor)
    assert ate_sym > 0.005, f"scene not drifty enough: {ate_sym}"
    assert ate_one <= 1.1 * ate_sym + 1e-3, (ate_one, ate_sym)
