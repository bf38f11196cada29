"""WebSocket + REST live-SLAM session server.

Capability mirror of the reference fork's streaming API
(/root/reference/new_fast.py + slam_process_runner.py): clients call
``/connect`` for a session id (GET here — the websockets HTTP front end only
parses GET; the reference uses POST), open ``/ws/{session_id}``, stream frames in
(base64 JPEG), and receive pose_update / new_keyframe / fps_update events;
``GET /active_sessions`` lists running sessions; finished sessions export
their trajectory + PLY reconstruction (slam_process_runner.py:499-511); idle
or wedged sessions are force-terminated (new_fast.py:383-395).

Design deltas for the TPU build:
  * plain ``websockets`` + asyncio instead of FastAPI/uvicorn — the REST
    surface is two endpoints, served off the same port via the websocket
    server's HTTP ``process_request`` hook (dependency-free);
  * one SLAM engine thread per session fed by a bounded queue (replaces the
    reference's per-session OS process + mp.Queue, new_fast.py:238-250);
  * sessions share the device; the engine thread serialises device work;
  * ``new_keyframe`` events carry a downsampled world pointcloud + colors
    (built by the engine, slam/pipeline.py:_emit_keyframe) so the web viewer
    renders the live MAP, matching the reference visualizer's dirty-keyframe
    stream (visualization.py:98-188).

Protocol (JSON text messages):
  client -> {"type": "frame", "data": <b64 jpeg/png>, "timestamp": optional}
            {"type": "close"}
  server -> {"type": "ready", "session_id": ...}
            {"type": "pose_update", "frame_id", "timestamp", "pose": [8]}
            {"type": "new_keyframe", "keyframe_index", "frame_id", "pose",
             "points": [[xyz]...], "colors": [[rgb]...]}
            {"type": "fps_update", "fps"}
            {"type": "trajectory_saved"/"reconstruction_saved", "path"}
            {"type": "shutdown_complete", "n_keyframes", "n_frames"}
"""

from __future__ import annotations

import asyncio
import base64
import http
import io
import json
import pathlib
import queue
import threading
import time
import uuid
from typing import Dict, Optional

import numpy as np


class SlamSession:
    """One streaming SLAM session: frames in, events out (thread-backed)."""

    def __init__(self, slam_factory, session_id: Optional[str] = None,
                 max_queue: int = 8, output_dir=None):
        self.session_id = session_id or str(uuid.uuid4())
        self.slam_factory = slam_factory
        self.output_dir = pathlib.Path(output_dir) if output_dir else None
        self.frame_q: "queue.Queue" = queue.Queue(maxsize=max_queue)
        self.event_q: "queue.Queue" = queue.Queue()
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.running = False
        self.wedged = False
        self.slam = None
        self.created = time.time()
        self.last_activity = time.time()
        self._frame_counter = 0

    def start(self):
        self.running = True
        self.thread.start()

    def submit_frame(self, rgb01: np.ndarray, timestamp: Optional[str] = None):
        """Non-blocking; drops the OLDEST queued frame when full (live mode)."""
        fid = self._frame_counter
        self._frame_counter += 1
        self.last_activity = time.time()
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

    def terminate(self, timeout: float = 10.0) -> bool:
        """Graceful close + bounded join; mark wedged if the engine thread
        does not come back (the thread analogue of the reference's
        terminate-after-join force kill, new_fast.py:383-395 — a daemon
        thread cannot be SIGKILLed, so a wedged one is abandoned and the
        session is reported as such)."""
        self.close()
        self.thread.join(timeout)
        if self.thread.is_alive():
            self.wedged = True
            self.running = False
            self.event_q.put(
                {"type": "error",
                 "message": f"session {self.session_id} wedged; abandoned"}
            )
            self.event_q.put(None)
            return False
        return True

    def _export(self, slam):
        """End-of-session artifacts (slam_process_runner.py:499-511)."""
        if self.output_dir is None or slam is None or not len(slam.keyframes):
            return
        from ..eval.export import save_reconstruction

        out = self.output_dir
        out.mkdir(parents=True, exist_ok=True)
        kf = slam.keyframes
        traj_path = out / f"{self.session_id}.txt"
        from ..eval.trajectory import save_traj_tum
        from ..lie import sim3
        import jax.numpy as jnp

        n = len(kf)
        ts = [str(int(kf.frame_id[i])) for i in range(n)]
        poses_se3 = np.asarray(sim3.to_se3(jnp.asarray(kf.T_WC[:n])))
        save_traj_tum(traj_path, ts, poses_se3)
        self.event_q.put(
            {"type": "trajectory_saved", "path": str(traj_path)}
        )
        ply_path = out / f"{self.session_id}.ply"
        save_reconstruction(
            ply_path, kf, slam.img_hw, conf_threshold=1.5,
            use_calib=bool(slam.cfg.get("use_calib", False)),
        )
        self.event_q.put(
            {"type": "reconstruction_saved", "path": str(ply_path)}
        )

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
                    slam.on_event = self.event_q.put  # engine-emitted events
                    self.slam = slam
                frame = slam.process_frame(fid, ts, rgb, last_T_WC=last_T)
                last_T = frame.T_WC
                n_done += 1
                self.last_activity = time.time()
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
            try:
                self._export(slam)
            except Exception as e:  # pragma: no cover
                self.event_q.put(
                    {"type": "error", "message": f"export failed: {e!r}"}
                )
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
    """Session registry + websocket endpoint + REST surface."""

    def __init__(self, slam_factory, host="0.0.0.0", port=8765,
                 output_dir=None, idle_timeout: Optional[float] = 300.0):
        self.slam_factory = slam_factory
        self.host = host
        self.port = port
        self.output_dir = output_dir
        self.idle_timeout = idle_timeout
        self.sessions: Dict[str, SlamSession] = {}
        # ids handed out by /connect, awaiting their websocket
        self.pending_ids: set = set()
        self._lock = threading.Lock()

    # -- REST ----------------------------------------------------------

    def connect_info(self) -> dict:
        """GET /connect (new_fast.py:145-150; POST there)."""
        sid = str(uuid.uuid4())
        with self._lock:
            self.pending_ids.add(sid)
        return {
            "sessionId": sid,
            "message": f"Connect WebSocket to /ws/{sid} and stream frames.",
        }

    def active_sessions(self) -> dict:
        """GET /active_sessions (new_fast.py:418-440)."""
        with self._lock:
            sessions = [
                {
                    "session_id": sid,
                    "running": s.running,
                    "wedged": s.wedged,
                    "frames_submitted": s._frame_counter,
                    "keyframes": len(s.slam.keyframes) if s.slam else 0,
                    "age_s": round(time.time() - s.created, 1),
                    "idle_s": round(time.time() - s.last_activity, 1),
                }
                for sid, s in self.sessions.items()
            ]
        return {
            "active_sessions_count": len(sessions),
            "sessions": sessions,
        }

    def process_request(self, connection, request):
        """HTTP hook on the websocket port: serve the REST endpoints and let
        /ws/* continue into the websocket handshake."""
        path = request.path.split("?")[0]
        if path == "/connect":
            return connection.respond(
                http.HTTPStatus.OK, json.dumps(self.connect_info()) + "\n"
            )
        if path == "/active_sessions":
            return connection.respond(
                http.HTTPStatus.OK, json.dumps(self.active_sessions()) + "\n"
            )
        if path == "/":
            return connection.respond(
                http.HTTPStatus.OK,
                json.dumps({"message": "mast3r-slam-tpu serving"}) + "\n",
            )
        if path == "/ws" or path.startswith("/ws/"):
            return None  # proceed with the websocket handshake
        return connection.respond(http.HTTPStatus.NOT_FOUND, "not found\n")

    # -- sessions ------------------------------------------------------

    def reap_idle_sessions(self, now: Optional[float] = None) -> list:
        """Force-terminate sessions idle past the timeout (the reference's
        wedged-process cleanup, new_fast.py:383-395).  Returns reaped ids."""
        if self.idle_timeout is None:
            return []
        now = now or time.time()
        with self._lock:
            stale = [
                (sid, s) for sid, s in self.sessions.items()
                if s.running and now - s.last_activity > self.idle_timeout
            ]
        reaped = []
        for sid, s in stale:
            s.terminate(timeout=10.0)
            reaped.append(sid)
        with self._lock:
            for sid in reaped:
                self.sessions.pop(sid, None)
        return reaped

    async def handle(self, websocket):
        # session id from the /ws/{id} path (reference handshake,
        # new_fast.py:152) or a fresh one for bare /ws connections
        path = getattr(getattr(websocket, "request", None), "path", "") or ""
        sid = None
        parts = path.split("?")[0].strip("/").split("/")
        if len(parts) == 2 and parts[0] == "ws" and parts[1]:
            sid = parts[1]
        with self._lock:
            self.pending_ids.discard(sid)
        session = SlamSession(
            self.slam_factory, session_id=sid, output_dir=self.output_dir
        )
        with self._lock:
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
                if mtype in ("frame", "FRAME"):
                    rgb = decode_image_payload(msg.get("data") or msg["payload"])
                    session.submit_frame(
                        rgb, msg.get("timestamp") and str(msg["timestamp"])
                    )
                elif mtype == "close":
                    break
                elif mtype == "active_sessions":
                    await websocket.send(
                        json.dumps(
                            {"type": "active_sessions",
                             **self.active_sessions()}
                        )
                    )
        finally:
            session.close()
            await forwarder
            with self._lock:
                self.sessions.pop(session.session_id, None)

    async def serve_forever(self):
        import websockets

        async def reaper():
            while True:
                await asyncio.sleep(30.0)
                reaped = await asyncio.get_running_loop().run_in_executor(
                    None, self.reap_idle_sessions
                )
                for sid in reaped:
                    print(f"reaped idle/wedged session {sid}")

        async with websockets.serve(
            self.handle, self.host, self.port,
            process_request=self.process_request,
        ):
            reap_task = asyncio.create_task(reaper())
            try:
                await asyncio.Future()
            finally:
                reap_task.cancel()

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
    p.add_argument("--output-dir", default="logs/sessions",
                   help="end-of-session trajectory/PLY export dir")
    p.add_argument("--idle-timeout", type=float, default=300.0,
                   help="force-terminate sessions idle this long (s)")
    p.add_argument("--model-preset", default="vit_large",
                   choices=["vit_large", "tiny"])
    args = p.parse_args(argv)

    from ..config import load_config

    factory = default_slam_factory(
        cfg=load_config(args.config),
        checkpoint=args.checkpoint or None,
        preset=args.model_preset,
    )
    server = SlamServer(
        factory, host=args.host, port=args.port,
        output_dir=args.output_dir, idle_timeout=args.idle_timeout,
    )
    print(f"SLAM server on ws://{args.host}:{args.port} "
          f"(REST: POST /connect, GET /active_sessions)")
    server.run()


if __name__ == "__main__":
    main()
