"""Serving layer e2e: websocket client streams frames, receives events."""

import asyncio
import base64
import json

import numpy as np
import pytest

from mast3r_slam_tpu.config import load_config
from mast3r_slam_tpu.serve.server import SlamServer, decode_image_payload
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


def test_decode_image_payload():
    import cv2

    img = (np.random.default_rng(0).random((32, 48, 3)) * 255).astype(np.uint8)
    ok, buf = cv2.imencode(".png", cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    assert ok
    out = decode_image_payload(base64.b64encode(buf.tobytes()).decode())
    np.testing.assert_allclose(out, img.astype(np.float32) / 255.0, atol=1e-6)


@pytest.mark.slow
def test_websocket_session_stream():
    import cv2
    import websockets

    server = SlamServer(oracle_factory(), host="127.0.0.1", port=0)

    async def run():
        import websockets.asyncio.server as ws_server

        async with ws_server.serve(server.handle, "127.0.0.1", 0) as srv:
            port = srv.sockets[0].getsockname()[1]
            async with websockets.connect(f"ws://127.0.0.1:{port}") as client:
                ready = json.loads(await client.recv())
                assert ready["type"] == "ready"

                for i in range(N_FRAMES):
                    rgb = OracleModel.image_for_frame(i, HW)
                    ok, buf = cv2.imencode(
                        ".png",
                        cv2.cvtColor((rgb * 255).astype(np.uint8), cv2.COLOR_RGB2BGR),
                    )
                    await client.send(
                        json.dumps(
                            {"type": "frame",
                             "data": base64.b64encode(buf.tobytes()).decode()}
                        )
                    )

                events = []
                await client.send(json.dumps({"type": "close"}))
                while True:
                    try:
                        msg = json.loads(
                            await asyncio.wait_for(client.recv(), timeout=120)
                        )
                    except (asyncio.TimeoutError, websockets.ConnectionClosed):
                        break
                    events.append(msg)
                    if msg["type"] == "shutdown_complete":
                        break
                return events

    events = asyncio.run(run())
    types = [e["type"] for e in events]
    assert "pose_update" in types
    assert "shutdown_complete" in types
    final = events[-1]
    assert final["n_frames"] == N_FRAMES
    assert final["n_keyframes"] >= 1
    poses = [e for e in events if e["type"] == "pose_update"]
    assert len(poses) == N_FRAMES
    assert len(poses[0]["pose"]) == 8
