"""Serving layer e2e: REST session lifecycle + websocket frame streaming.

Covers the reference fork's full session semantics (new_fast.py +
slam_process_runner.py): POST /connect -> ws /ws/{id} -> frames -> events ->
end-of-session trajectory/PLY export; GET /active_sessions; idle/wedged
session force-termination.
"""

import asyncio
import base64
import json
import time
import urllib.request

import numpy as np
import pytest

from mast3r_slam_tpu.config import load_config
from mast3r_slam_tpu.serve.server import (
    SlamServer,
    SlamSession,
    decode_image_payload,
)
from mast3r_slam_tpu.slam.pipeline import SLAM

from oracle import OracleModel, PlaneScene, arc_trajectory

HW = (48, 64)
N_FRAMES = 6


def oracle_factory():
    scene = PlaneScene(HW)
    gt = arc_trajectory(N_FRAMES, radius=0.6, max_angle=2.0)
    model = OracleModel(scene, gt, noise=0.002)
    cfg = load_config("base")
    cfg["engine"]["keyframe_buffer"] = 32
    cfg["engine"]["edge_buffer"] = 32
    cfg["single_thread"] = True  # deterministic eval-protocol mode

    def make(raw_hw):
        return SLAM(model, cfg, HW)

    return make


def _encode_frame(i):
    import cv2

    rgb = OracleModel.image_for_frame(i, HW)
    ok, buf = cv2.imencode(
        ".png", cv2.cvtColor((rgb * 255).astype(np.uint8), cv2.COLOR_RGB2BGR)
    )
    assert ok
    return base64.b64encode(buf.tobytes()).decode()


def test_decode_image_payload():
    import cv2

    img = (np.random.default_rng(0).random((32, 48, 3)) * 255).astype(np.uint8)
    ok, buf = cv2.imencode(".png", cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    assert ok
    out = decode_image_payload(base64.b64encode(buf.tobytes()).decode())
    np.testing.assert_allclose(out, img.astype(np.float32) / 255.0, atol=1e-6)


def _http_json(url, method="GET"):
    req = urllib.request.Request(url, method=method,
                                 data=b"" if method == "POST" else None)
    with urllib.request.urlopen(req, timeout=10) as r:
        return json.loads(r.read().decode())


@pytest.mark.slow
def test_full_session_lifecycle(tmp_path):
    """connect -> ws/{id} -> stream -> live map events -> export -> list."""
    import websockets
    import websockets.asyncio.server as ws_server

    server = SlamServer(oracle_factory(), output_dir=tmp_path)

    async def run():
        async with ws_server.serve(
            server.handle, "127.0.0.1", 0,
            process_request=server.process_request,
        ) as srv:
            port = srv.sockets[0].getsockname()[1]
            base = f"http://127.0.0.1:{port}"
            loop = asyncio.get_running_loop()

            # REST surface (new_fast.py:145,418)
            root = await loop.run_in_executor(None, _http_json, base + "/")
            assert "message" in root
            empty = await loop.run_in_executor(
                None, _http_json, base + "/active_sessions"
            )
            assert empty["active_sessions_count"] == 0
            conn = await loop.run_in_executor(
                None, lambda: _http_json(base + "/connect")
            )
            sid = conn["sessionId"]
            assert sid

            async with websockets.connect(f"ws://127.0.0.1:{port}/ws/{sid}") as client:
                ready = json.loads(await client.recv())
                assert ready["type"] == "ready"
                assert ready["session_id"] == sid

                for i in range(N_FRAMES):
                    await client.send(
                        json.dumps({"type": "frame", "data": _encode_frame(i)})
                    )

                # the session must appear in the live listing under ITS id
                listing = await loop.run_in_executor(
                    None, _http_json, base + "/active_sessions"
                )
                assert listing["active_sessions_count"] == 1
                assert listing["sessions"][0]["session_id"] == sid

                events = []
                await client.send(json.dumps({"type": "close"}))
                while True:
                    try:
                        msg = json.loads(
                            await asyncio.wait_for(client.recv(), timeout=180)
                        )
                    except (asyncio.TimeoutError, websockets.ConnectionClosed):
                        break
                    events.append(msg)
                    if msg["type"] == "shutdown_complete":
                        break
                return sid, events

    sid, events = asyncio.run(run())
    types = [e["type"] for e in events]
    assert "pose_update" in types
    assert "shutdown_complete" in types
    final = events[-1]
    assert final["n_frames"] == N_FRAMES
    assert final["n_keyframes"] >= 1
    poses = [e for e in events if e["type"] == "pose_update"]
    assert len(poses) == N_FRAMES
    assert len(poses[0]["pose"]) == 8

    # live-map payload: keyframe events carry a downsampled pointcloud
    kfs = [e for e in events if e["type"] == "new_keyframe"]
    assert kfs, "expected at least the INIT keyframe event"
    assert len(kfs[0]["points"]) > 100
    assert len(kfs[0]["points"][0]) == 3
    assert len(kfs[0]["colors"]) == len(kfs[0]["points"])

    # end-of-session export (slam_process_runner.py:499-511)
    assert "trajectory_saved" in types and "reconstruction_saved" in types
    traj = tmp_path / f"{sid}.txt"
    ply = tmp_path / f"{sid}.ply"
    assert traj.exists() and ply.exists()
    assert len(traj.read_text().strip().splitlines()) == final["n_keyframes"]
    from mast3r_slam_tpu.eval.export import load_ply

    pts, col = load_ply(ply)
    assert len(pts) > 0 and len(pts) == len(col)


def test_reap_idle_sessions():
    """Wedged/idle sessions are force-terminated (new_fast.py:383-395)."""
    server = SlamServer(oracle_factory(), idle_timeout=5.0)
    s = SlamSession(server.slam_factory)
    server.sessions[s.session_id] = s
    s.start()
    s.last_activity = time.time() - 60.0  # simulate a long-idle session
    reaped = server.reap_idle_sessions()
    assert reaped == [s.session_id]
    assert s.session_id not in server.sessions
    assert not s.thread.is_alive()
    assert not s.wedged  # clean exit through the sentinel


def test_connect_ids_are_unique():
    server = SlamServer(oracle_factory())
    a = server.connect_info()["sessionId"]
    b = server.connect_info()["sessionId"]
    assert a != b
    assert {a, b} <= server.pending_ids


def test_event_broadcaster_replay_and_live():
    """--viz-ws fan-out: keyframe history replays to late joiners, then
    events stream live (the reference's main->viz queue role,
    visualization.py:98-188)."""
    import websockets

    from mast3r_slam_tpu.serve.broadcast import EventBroadcaster

    b = EventBroadcaster(port=0).start()
    try:
        kf_ev = {
            "type": "new_keyframe", "keyframe_index": 0, "frame_id": 0,
            "pose": [0.0] * 7 + [1.0],
            "points": [[0.0, 0.0, 1.0]], "colors": [[10, 20, 30]],
        }
        b.push(kf_ev)  # pushed BEFORE any client connects -> history

        async def client():
            async with websockets.connect(
                f"ws://127.0.0.1:{b.bound_port}"
            ) as ws:
                # generous waits: a loaded 2-core box can stall the event
                # loop for tens of seconds (VERDICT r4 item 7 deflake) —
                # these bound "wedged", not "slow"
                replay = json.loads(await asyncio.wait_for(ws.recv(), 120))
                assert replay["type"] == "new_keyframe"
                assert replay["points"] == [[0.0, 0.0, 1.0]]
                b.push({"type": "pose_update", "frame_id": 1,
                        "pose": [0.0] * 8, "mode": "TRACKING",
                        "timestamp": "1"})
                live = json.loads(await asyncio.wait_for(ws.recv(), 120))
                assert live["type"] == "pose_update"

        asyncio.run(client())
    finally:
        b.stop()


def test_engine_event_stream_local_run():
    """SLAM.on_event fires pose_update every frame and new_keyframe (with a
    world pointcloud) on every committed keyframe during a plain local run —
    what --viz-ws taps into."""
    from oracle import OracleDataset

    events = []
    scene = PlaneScene(HW)
    gt = arc_trajectory(N_FRAMES, radius=0.6, max_angle=2.0)
    model = OracleModel(scene, gt, noise=0.002)
    cfg = load_config("base")
    cfg["engine"]["keyframe_buffer"] = 32
    cfg["engine"]["edge_buffer"] = 32
    cfg["single_thread"] = True
    slam = SLAM(model, cfg, HW)
    slam.on_event = events.append
    result = slam.run(OracleDataset(N_FRAMES, HW), verbose=False)

    poses = [e for e in events if e["type"] == "pose_update"]
    kfs = [e for e in events if e["type"] == "new_keyframe"]
    assert len(poses) == N_FRAMES
    assert len(kfs) == result.n_keyframes
    assert len(kfs[0]["points"]) > 100
    assert len(kfs[0]["colors"]) == len(kfs[0]["points"])
    # world-frame points of the INIT keyframe: finite and at scene scale
    pts = np.asarray(kfs[0]["points"])
    assert np.isfinite(pts).all() and pts.shape[1] == 3
