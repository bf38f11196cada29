"""Async-mode concurrency: tracking must genuinely OVERLAP backend tasks.

VERDICT r2 item 1: round-2's async mode serialized tracking against the
entire backend task through one coarse lock.  The redesign snapshots the
keyframe store in (immutable jnp references under a brief lock), runs
retrieval/decode/solve lock-free, and writes poses back with a generation
check — the reference's lock scope (frame.py:222, main.py:225).

These tests prove the overlap *behaviorally*: a backend task is blocked on
an event while the frontend keeps tracking frames.
"""

import threading
import time

import numpy as np

from mast3r_slam_tpu.config import load_config
from mast3r_slam_tpu.eval.trajectory import umeyama_alignment
from mast3r_slam_tpu.slam.pipeline import SLAM

from oracle import OracleDataset, OracleModel, PlaneScene, arc_trajectory

HW = (48, 64)
N_FRAMES = 30


def _make_slam(single_thread=False):
    scene = PlaneScene(HW)
    gt = arc_trajectory(N_FRAMES, radius=0.6, max_angle=2.5)
    model = OracleModel(scene, gt, noise=0.002)
    cfg = load_config("base")
    cfg["engine"]["keyframe_buffer"] = 64
    cfg["engine"]["edge_buffer"] = 64
    cfg["single_thread"] = single_thread
    return SLAM(model, cfg, HW), gt


def test_tracking_advances_while_backend_blocked():
    """Block the FIRST backend task on an event; the frontend must keep
    tracking frames (and may even append further keyframes) while the task
    is provably still in flight."""
    slam, gt = _make_slam(single_thread=False)
    ds = OracleDataset(N_FRAMES, HW)

    started = threading.Event()
    release = threading.Event()
    finished = threading.Event()
    orig = slam._backend_update_impl
    tracked_during_backend = []

    def gated(kf_idx, capture=None):
        started.set()
        assert release.wait(timeout=60), "test deadlock: release never set"
        orig(kf_idx, capture)
        finished.set()

    slam._backend_update_impl = gated

    # drive frames manually (what SLAM.run does, minus the prefetch thread)
    last_T = None
    for i in range(N_FRAMES):
        ts_, img = ds[i]
        frame = slam.process_frame(i, ts_, img, last_T_WC=last_T)
        last_T = frame.T_WC
        if started.is_set() and not finished.is_set():
            # backend task in flight: this frame completed concurrently
            np.asarray(frame.T_WC)  # force full completion of the track
            tracked_during_backend.append(i)
        if len(tracked_during_backend) >= 5 and not release.is_set():
            release.set()
    release.set()
    slam.join_backend()
    slam._backend_update_impl = orig

    assert started.is_set(), "no backend task ever ran"
    assert finished.is_set(), "backend task never completed"
    assert len(tracked_during_backend) >= 5, (
        f"only {len(tracked_during_backend)} frames tracked during the "
        "in-flight backend task — tracking is still serialized against it"
    )

    # and the result is still a valid trajectory
    est = np.stack([p for _, p in slam.frame_log])[:, :3]
    s, R, t = umeyama_alignment(est, gt[:, :3])
    aligned = (s * (R @ est.T)).T + t
    ate = float(np.sqrt(np.mean(np.linalg.norm(aligned - gt[:, :3], axis=-1) ** 2)))
    assert ate < 0.05, ate

    # the latency jitter stat exists for exactly this scenario
    stats = slam.timer.stats()
    assert "tracker.track" in stats and "jitter_ms" in stats["tracker.track"]


def test_writeback_generation_check():
    """A pop_last between a solve's snapshot and its write-back must reject
    the stale poses (slot identities changed)."""
    from mast3r_slam_tpu.slam.frame import Frame, Keyframes
    import jax.numpy as jnp
    from mast3r_slam_tpu.lie import sim3

    N = 16
    kf = Keyframes(capacity=8, num_pixels=N, num_patches=4, feat_dim=8)
    for fid in range(3):
        f = Frame(
            frame_id=fid,
            img=None,
            T_WC=sim3.identity(),
            X_canon=jnp.ones((N, 3)) * fid,
            C=jnp.ones((N, 1)),
            feat=jnp.zeros((1, 4, 8)),
            pos=jnp.zeros((1, 4, 2), jnp.int32),
        )
        f.n_fused = f.n_updates = 1
        kf.append(f)

    snap = kf.snapshot()
    before = np.asarray(kf.T_WC[:3]).copy()

    kf.pop_last()  # invalidates slot identity
    moved = jnp.tile(jnp.asarray([9.0, 9, 9, 0, 0, 0, 1, 1]), (8, 1))
    ok = kf.write_back_poses(1, snap.n, snap.generation, moved)
    assert not ok, "write-back must be rejected after pop_last"
    np.testing.assert_array_equal(np.asarray(kf.T_WC[:3]), before)

    # without the pop, the same write-back applies
    snap2 = kf.snapshot()
    ok2 = kf.write_back_poses(1, snap2.n, snap2.generation, moved)
    assert ok2
    np.testing.assert_allclose(np.asarray(kf.T_WC[1][:3]), [9, 9, 9])
    # pinned pose untouched
    np.testing.assert_array_equal(np.asarray(kf.T_WC[0]), before[0])


def test_async_latency_jitter_stat_recorded():
    """frame.latency is recorded by SLAM.run and reports p95/jitter with the
    backend active — the observable for backend-induced stalls (VERDICT r2
    item 1 'done' bar).  Overlap itself is proven deterministically by
    test_tracking_advances_while_backend_blocked; wall-clock ratios are not
    asserted here because CPU-contended CI timing is non-deterministic."""
    slam, gt = _make_slam(single_thread=False)
    orig = slam._backend_update_impl
    in_flight_frames = []

    backend_busy = threading.Event()

    def slow(kf_idx, capture=None):
        backend_busy.set()
        try:
            time.sleep(0.05)
            orig(kf_idx, capture)
        finally:
            backend_busy.clear()

    slam._backend_update_impl = slow
    result = slam.run(OracleDataset(N_FRAMES, HW), verbose=False)
    slam._backend_update_impl = orig

    assert result.n_keyframes >= 2
    stats = slam.timer.stats()
    assert "frame.latency" in stats
    lat = stats["frame.latency"]
    assert lat["count"] == N_FRAMES
    assert lat["jitter_ms"] >= 0.0
    assert lat["p95_ms"] >= lat["p50_ms"]
    # the async worker actually processed tasks
    assert "backend.update" in stats and stats["backend.update"]["count"] >= 1
