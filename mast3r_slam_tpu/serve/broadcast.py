"""Live event broadcaster for local runs (`slam/run.py --viz-ws`).

The reference renders its live map in-process through an OpenGL window fed by
a main->viz queue (/root/reference/main.py:188-199, visualization.py:98-188).
On a headless TPU host the equivalent is a websocket fan-out: the engine's
``on_event`` stream (pose_update + new_keyframe-with-pointcloud) is pushed to
every connected viewer (viz/viewer.html?ws=...), with keyframe history
replayed to late joiners so the full map appears immediately.
"""

from __future__ import annotations

import asyncio
import json
import threading
import time
from typing import List, Optional


class RunControl:
    """Viewer -> engine run control (the reference's ``WindowMsg``,
    visualization.py:33-41, consumed at main.py:233-246).

    The engine polls :meth:`proceed` once per frame: it blocks while paused
    (consuming one queued single-step if present) and returns False once
    terminated.  ``conf_threshold`` filters the streamed keyframe
    pointclouds and the final PLY export (reference main.py:319).

    The default matches the engine's headless filter (conf > 1 + 1e-6,
    pipeline._emit_keyframe) so merely ATTACHING a viewer does not change
    what is streamed/exported; the slider raises it from there (ADVICE r3).
    """

    def __init__(self, conf_threshold: float = 1.0 + 1e-6):
        self._lock = threading.Lock()
        self.paused = False
        self.terminated = False
        self.conf_threshold = conf_threshold
        self._steps = 0

    def update(self, msg: dict):
        """Apply one viewer control message (thread-safe)."""
        with self._lock:
            if "paused" in msg:
                self.paused = bool(msg["paused"])
            if msg.get("step"):
                self._steps += 1
            if "conf_threshold" in msg:
                self.conf_threshold = float(msg["conf_threshold"])
            if msg.get("terminate"):
                self.terminated = True

    def proceed(self, poll: float = 0.01) -> bool:
        """Block while paused; True = process one frame, False = stop."""
        while True:
            with self._lock:
                if self.terminated:
                    return False
                if not self.paused:
                    return True
                if self._steps > 0:
                    self._steps -= 1
                    return True
            time.sleep(poll)


class EventBroadcaster:
    """Thread-hosted asyncio websocket fan-out with keyframe replay."""

    def __init__(self, host: str = "127.0.0.1", port: int = 8765,
                 history_limit: int = 4096):
        self.host = host
        self.port = port
        self.history_limit = history_limit
        self.control = RunControl()  # viewer->engine backchannel
        self._history: List[str] = []  # serialized new_keyframe events
        self._clients: set = set()
        self._loop: Optional[asyncio.AbstractEventLoop] = None
        self._ready = threading.Event()
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self.bound_port: Optional[int] = None

    # -- lifecycle -------------------------------------------------------

    def start(self):
        self._thread.start()
        # generous: a loaded box can starve the server thread for a while;
        # fail LOUDLY if it never comes up (bound_port None would otherwise
        # surface as a confusing downstream connect error)
        if not self._ready.wait(timeout=60):
            raise RuntimeError("EventBroadcaster failed to start within 60s")
        return self

    def stop(self):
        if self._loop is not None:
            self._loop.call_soon_threadsafe(self._loop.stop)
        self._thread.join(timeout=5)

    def _serve(self):
        import websockets.asyncio.server as ws_server

        loop = asyncio.new_event_loop()
        asyncio.set_event_loop(loop)
        self._loop = loop

        async def handler(websocket):
            # replay the map so far, then live-stream
            for payload in list(self._history):
                await websocket.send(payload)
            self._clients.add(websocket)
            try:
                async for raw in websocket:
                    # run-control backchannel: pause/step/conf-threshold/
                    # terminate messages from the viewer UI
                    try:
                        msg = json.loads(raw)
                    except (TypeError, ValueError):
                        continue
                    if isinstance(msg, dict) and msg.get("type") == "control":
                        self.control.update(msg)
            finally:
                self._clients.discard(websocket)

        async def up():
            server = await ws_server.serve(handler, self.host, self.port)
            self.bound_port = server.sockets[0].getsockname()[1]
            self._ready.set()
            return server

        server = loop.run_until_complete(up())
        try:
            loop.run_forever()
        finally:
            server.close()
            loop.run_until_complete(server.wait_closed())
            loop.close()

    # -- engine-facing ----------------------------------------------------

    def push(self, event: dict):
        """Engine event sink (SLAM.on_event); thread-safe, non-blocking."""
        payload = json.dumps(event)
        if event.get("type") == "new_keyframe":
            self._history.append(payload)
            if len(self._history) > self.history_limit:
                self._history = self._history[-self.history_limit:]
        loop = self._loop
        if loop is None or not self._clients:
            return

        def send_all():
            for ws in list(self._clients):
                asyncio.ensure_future(self._safe_send(ws, payload))

        loop.call_soon_threadsafe(send_all)

    @staticmethod
    async def _safe_send(ws, payload):
        try:
            await ws.send(payload)
        except Exception:
            pass  # client went away; handler cleanup removes it
