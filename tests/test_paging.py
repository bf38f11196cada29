"""Long-video memory plan (VERDICT r4 item 3).

``engine.device_keyframes`` bounds the device-resident pool of the paged
per-keyframe arrays (pointmaps + encoder tokens): older keyframes evict to
host RAM and re-materialise on demand (loop closure / reloc / windowed-solve
pinned context).  Paging implies windowed solves (the effective window
clamps to the residency guarantee), and windowed solves retire old-old
edges into a reuse freelist — together the device bytes PLATEAU while the
logical map keeps growing, where the reference hard-caps the session at a
512-slot ring (/root/reference/mast3r_slam/frame.py:221).
"""

import numpy as np
import jax.numpy as jnp

from mast3r_slam_tpu.config import load_config
from mast3r_slam_tpu.slam.frame import Keyframes
from mast3r_slam_tpu.slam.pipeline import SLAM

import sys, os

sys.path.insert(0, os.path.dirname(__file__))
from oracle import OracleDataset, OracleModel, PlaneScene, arc_trajectory
from test_growth import _frame

HW = (48, 64)


def test_store_paging_eviction_and_refetch():
    kf = Keyframes(capacity=16, num_pixels=12, num_patches=3, feat_dim=4,
                   device_budget=4, keep_recent=2)
    originals = {}
    for i in range(10):
        f = _frame(i)
        originals[i] = np.asarray(f.X_canon)
        kf.append(f)
    # the paged pool never grew
    assert kf.dcap == 4 and kf.X.shape[0] == 4
    assert kf.n_evictions >= 6
    resident = [i for i in range(10) if kf.is_resident(i)]
    assert len(resident) == 4
    assert 8 in resident and 9 in resident  # keep_recent newest protected
    # every keyframe's rows are intact, resident or evicted
    for i in range(10):
        X, _ = kf.pointmap_np(i)
        np.testing.assert_array_equal(X, originals[i])
        ft, _ = kf.feat_np(i)
        assert float(ft[0, 0]) == float(i)
    # re-materialise an old keyframe: slot assigned, values identical
    assert not kf.is_resident(0)
    kf.ensure_resident([0])
    assert kf.is_resident(0)
    s = kf.snapshot()
    np.testing.assert_array_equal(
        np.asarray(s.X[int(s.slot_of[0])]), originals[0]
    )
    # sticky keyframes are never chosen as victims
    kf.sticky = {0}
    for i in range(10, 14):
        kf.append(_frame(i))
    assert kf.is_resident(0)


def _run_engine(n_frames, device_keyframes, window_size):
    scene = PlaneScene(HW)
    gt = arc_trajectory(n_frames, radius=0.6, max_angle=2.5)
    model = OracleModel(scene, gt, noise=0.002)
    cfg = load_config("base")
    cfg["engine"]["keyframe_buffer"] = 8  # initial; grows logically
    cfg["engine"]["edge_buffer"] = 8
    cfg["engine"]["device_keyframes"] = device_keyframes
    if window_size:
        cfg["local_opt"]["window_size"] = window_size
    cfg["single_thread"] = True
    slam = SLAM(model, cfg, HW)
    result = slam.run(OracleDataset(n_frames, HW), verbose=False)
    return slam, result, gt


def test_engine_paged_run_plateaus_and_matches_unpaged():
    """Engine soak with an 8-slot pool: the map outgrows the pool, device
    bytes plateau (paged arrays never grow), edges recycle — and the
    trajectory is IDENTICAL to the same engine with unbounded residency
    at the same (effective) solve window: paging is a pure memory policy,
    not an accuracy trade."""
    n_frames = 60
    # 8-slot budget -> keep_recent = 4 -> effective window 4; the control
    # runs unpaged with window_size 4 so the solver semantics match
    slam_p, res_p, gt = _run_engine(n_frames, device_keyframes=8,
                                    window_size=0)
    slam_u, res_u, _ = _run_engine(n_frames, device_keyframes=0,
                                   window_size=4)
    kf = slam_p.keyframes
    assert kf.paging and kf.dcap == 8

    assert len(kf) > kf.dcap, "map must outgrow the device pool"
    # paged pool plateaued at the budget while the unpaged control grew
    assert kf.X.shape[0] == 8 and kf.feat.shape[0] == 8
    assert slam_u.keyframes.X.shape[0] > 8
    assert kf.n_evictions > 0
    paged_bytes = sum(
        a.size * a.dtype.itemsize for a in (kf.X, kf.C, kf.feat, kf.pos)
    )
    expected = 8 * (
        kf.num_pixels * (3 + 1) * 4
        + kf.feat.shape[1] * (kf.feat.shape[2] * 4 + 2 * 4)
    )
    assert paged_bytes == expected
    # windowed solves retired old-old edges into the freelist, bounding
    # edge-array growth too
    g = slam_p.graph
    assert g.n_edges_recycled > 0
    assert len(g._free_edge_rows) > 0

    # paging is transparent: identical trajectory to the unpaged control
    assert res_p.n_keyframes == res_u.n_keyframes
    assert res_p.n_reloc == res_u.n_reloc
    np.testing.assert_allclose(
        res_p.frame_poses, res_u.frame_poses, rtol=0, atol=1e-6
    )

    # every keyframe still readable (export/checkpoint path), including
    # evicted ones
    for i in range(len(kf)):
        X, _ = kf.pointmap_np(i)
        assert np.isfinite(X).all()

    from mast3r_slam_tpu.eval.trajectory import umeyama_alignment

    est = res_p.frame_poses[:, :3]
    s, R, t = umeyama_alignment(est, gt[: len(est), :3])
    aligned = (s * (R @ est.T)).T + t
    ate = float(np.sqrt(np.mean(
        np.linalg.norm(aligned - gt[: len(est), :3], axis=-1) ** 2
    )))
    assert ate < 0.05, f"paged-engine ATE {ate:.4f}"


import pytest


@pytest.mark.slow
def test_long_ingest_soak_device_bytes_plateau():
    """Long-video ingest soak (VERDICT r4 item 3 'done' criterion): hundreds
    of frames with a FORCED dense keyframe cadence (every 3rd frame — the
    synthetic scene alone keyframes too rarely to stress the pager) so the
    logical map grows to ~70+ keyframes against an 8-slot device pool.
    Paged device bytes and edge rows must PLATEAU while host RAM absorbs
    the overflow; every historical keyframe stays readable."""
    n_frames = 220
    hw = (24, 32)
    scene = PlaneScene(hw)
    gt = arc_trajectory(n_frames, radius=0.6, max_angle=1.0)
    # noiseless oracle: the soak stresses MEMORY mechanics (append/evict/
    # recycle at scale), not accuracy — tiny 24x32 views with noise track
    # poorly and a mid-soak reloc would starve the keyframe stream
    model = OracleModel(scene, gt, noise=0.0)
    cfg = load_config("base")
    cfg["engine"]["keyframe_buffer"] = 8
    cfg["engine"]["edge_buffer"] = 8
    cfg["engine"]["device_keyframes"] = 8
    cfg["single_thread"] = True
    slam = SLAM(model, cfg, hw)
    kf = slam.keyframes

    counter = {"i": 0}
    orig = slam.tracker.track_finish

    def dense_kf(pending):
        new_kf, try_reloc = orig(pending)
        if try_reloc:
            return new_kf, try_reloc
        counter["i"] += 1
        if counter["i"] % 3 == 0 and not new_kf:
            slam.tracker.reset_idx_f2k()
            return True, False
        return new_kf, try_reloc

    slam.tracker.track_finish = dense_kf

    mid_bytes = {}
    orig_append = kf.append

    def spy_append(frame):
        idx = orig_append(frame)
        if idx == 20:  # capture mid-run to compare against the end
            mid_bytes["paged"] = sum(
                a.size * a.dtype.itemsize
                for a in (kf.X, kf.C, kf.feat, kf.pos)
            )
            mid_bytes["edges"] = slam.graph.capacity
        return idx

    kf.append = spy_append

    slam.run(OracleDataset(n_frames, hw), verbose=False)

    assert len(kf) >= 60, len(kf)
    end_paged = sum(
        a.size * a.dtype.itemsize for a in (kf.X, kf.C, kf.feat, kf.pos)
    )
    # the paged pool did NOT grow after mid-run (device bytes plateau)
    assert end_paged == mid_bytes["paged"]
    assert kf.dcap == 8
    # edge rows recycle instead of growing with trajectory length
    assert slam.graph.n_edges_recycled > 20
    assert slam.graph.capacity <= 2 * mid_bytes["edges"]
    assert kf.n_evictions >= len(kf) - kf.dcap
    # the whole history remains readable (host copies intact)
    for i in range(0, len(kf), 7):
        X, _ = kf.pointmap_np(i)
        assert np.isfinite(X).all()
