"""WebSocket live-SLAM session server.

Capability mirror of the reference fork's streaming API
(/root/reference/new_fast.py + slam_process_runner.py): clients open a
session, stream frames in (base64 JPEG), and receive pose_update /
new_keyframe / fps_update JSON events.

Design deltas for the TPU build:
  * plain ``websockets`` + asyncio instead of FastAPI/uvicorn (the whole
    HTTP surface the reference exposes is two endpoints; a lean server keeps
    the serving layer dependency-free);
  * one SLAM engine thread per session fed by a bounded queue (replaces the
    reference's per-session OS process + mp.Queue, new_fast.py:238-250);
  * sessions share the device; the engine thread serialises device work.

Protocol (JSON text messages):
  client -> {"type": "frame", "data": <b64 jpeg/png>, "timestamp": optional}
            {"type": "close"}
  server -> {"type": "ready", "session_id": ...}
            {"type": "pose_update", "frame_id", "timestamp", "pose": [8]}
            {"type": "new_keyframe", "keyframe_index", "frame_id", "pose"}
            {"type": "fps_update", "fps"}
            {"type": "shutdown_complete", "n_keyframes", "n_frames"}
"""

from __future__ import annotations

import asyncio
import base64
import io
import json
import queue
import threading
import time
import uuid
from typing import Dict, Optional

import numpy as np


class SlamSession:
    """One streaming SLAM session: frames in, events out (thread-backed)."""

    def __init__(self, slam_factory, session_id: Optional[str] = None,
                 max_queue: int = 8):
        self.session_id = session_id or str(uuid.uuid4())
        self.slam_factory = slam_factory
        self.frame_q: "queue.Queue" = queue.Queue(maxsize=max_queue)
        self.event_q: "queue.Queue" = queue.Queue()
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.running = False
        self.slam = None
        self._frame_counter = 0

    def start(self):
        self.running = True
        self.thread.start()

    def submit_frame(self, rgb01: np.ndarray, timestamp: Optional[str] = None):
        """Non-blocking; drops the OLDEST queued frame when full (live mode)."""
        fid = self._frame_counter
        self._frame_counter += 1
        ts = timestamp or f"{time.time():.6f}"
        item = (fid, ts, rgb01)
        try:
            self.frame_q.put_nowait(item)
        except queue.Full:
            try:
                self.frame_q.get_nowait()
            except queue.Empty:
                pass
            self.frame_q.put_nowait(item)
        return fid

    def close(self):
        self.frame_q.put(None)

    def _run(self):
        slam = None
        last_T = None
        n_done = 0
        t0 = time.time()
        try:
            while True:
                item = self.frame_q.get()
                if item is None:
                    break
                fid, ts, rgb = item
                if slam is None:
                    # size the engine from the first frame (new_fast.py:169-197)
                    slam = self.slam_factory(rgb.shape[:2])
                    self.slam = slam
                n_kf_before = len(slam.keyframes)
                frame = slam.process_frame(fid, ts, rgb, last_T_WC=last_T)
                last_T = frame.T_WC
                n_done += 1
                self.event_q.put(
                    {
                        "type": "pose_update",
                        "frame_id": fid,
                        "timestamp": ts,
                        "pose": np.asarray(frame.T_WC).tolist(),
                        "mode": slam.mode.name,
                    }
                )
                n_kf = len(slam.keyframes)
                if n_kf > n_kf_before:
                    self.event_q.put(
                        {
                            "type": "new_keyframe",
                            "keyframe_index": n_kf - 1,
                            "frame_id": fid,
                            "pose": np.asarray(frame.T_WC).tolist(),
                        }
                    )
                if n_done % 10 == 0:
                    self.event_q.put(
                        {
                            "type": "fps_update",
                            "fps": n_done / max(time.time() - t0, 1e-6),
                        }
                    )
        except Exception as e:  # surface engine errors to the client
            self.event_q.put({"type": "error", "message": repr(e)})
        finally:
            self.running = False
            self.event_q.put(
                {
                    "type": "shutdown_complete",
                    "n_keyframes": len(slam.keyframes) if slam else 0,
                    "n_frames": n_done,
                }
            )
            self.event_q.put(None)


def decode_image_payload(data_b64: str) -> np.ndarray:
    """base64 JPEG/PNG -> float RGB (H, W, 3) in [0, 1] (new_fast.py:114-142)."""
    raw = base64.b64decode(data_b64)
    try:
        import cv2

        arr = np.frombuffer(raw, dtype=np.uint8)
        img = cv2.imdecode(arr, cv2.IMREAD_COLOR)
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    except ImportError:  # pragma: no cover
        from PIL import Image

        img = np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"))
    return img.astype(np.float32) / 255.0


class SlamServer:
    """Session registry + websocket endpoint."""

    def __init__(self, slam_factory, host="0.0.0.0", port=8765):
        self.slam_factory = slam_factory
        self.host = host
        self.port = port
        self.sessions: Dict[str, SlamSession] = {}

    def active_sessions(self):
        return [
            {"session_id": sid, "running": s.running}
            for sid, s in self.sessions.items()
        ]

    async def handle(self, websocket):
        session = SlamSession(self.slam_factory)
        self.sessions[session.session_id] = session
        session.start()
        await websocket.send(
            json.dumps({"type": "ready", "session_id": session.session_id})
        )

        async def forward_events():
            loop = asyncio.get_running_loop()
            while True:
                ev = await loop.run_in_executor(None, session.event_q.get)
                if ev is None:
                    break
                await websocket.send(json.dumps(ev))

        forwarder = asyncio.create_task(forward_events())
        try:
            async for message in websocket:
                msg = json.loads(message)
                mtype = msg.get("type")
                if mtype == "frame":
                    rgb = decode_image_payload(msg["data"])
                    session.submit_frame(rgb, msg.get("timestamp"))
                elif mtype == "close":
                    break
                elif mtype == "active_sessions":
                    await websocket.send(
                        json.dumps(
                            {"type": "active_sessions",
                             "sessions": self.active_sessions()}
                        )
                    )
        finally:
            session.close()
            await forwarder
            self.sessions.pop(session.session_id, None)

    async def serve_forever(self):
        import websockets

        async with websockets.serve(self.handle, self.host, self.port):
            await asyncio.Future()

    def run(self):
        asyncio.run(self.serve_forever())


def default_slam_factory(cfg=None, checkpoint=None, preset="vit_large"):
    """Factory building a SLAM engine sized to the incoming stream."""

    def make(raw_hw):
        import jax

        from ..config import load_config
        from ..models import mast3r as M
        from ..models.interface import MASt3RModel
        from ..slam.pipeline import SLAM
        from ..utils.image import resize_img

        c = cfg or load_config("base")
        probe = resize_img(np.zeros((raw_hw[0], raw_hw[1], 3), np.float32), 512)
        h, w = (int(x) for x in probe["true_shape"][0])
        mcfg = M.VIT_LARGE if preset == "vit_large" else M.VIT_TINY_TEST
        if checkpoint:
            model = MASt3RModel.from_torch_checkpoint(checkpoint, (h, w), mcfg)
        else:
            model = MASt3RModel.random_init(jax.random.key(0), (h, w), mcfg)
        return SLAM(model, c, (h, w))

    return make


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="TPU SLAM websocket server")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8765)
    p.add_argument("--checkpoint", default="")
    p.add_argument("--config", default="base")
    p.add_argument("--model-preset", default="vit_large",
                   choices=["vit_large", "tiny"])
    args = p.parse_args(argv)

    from ..config import load_config

    factory = default_slam_factory(
        cfg=load_config(args.config),
        checkpoint=args.checkpoint or None,
        preset=args.model_preset,
    )
    server = SlamServer(factory, host=args.host, port=args.port)
    print(f"SLAM websocket server on ws://{args.host}:{args.port}")
    server.run()


if __name__ == "__main__":
    main()
