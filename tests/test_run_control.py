"""Viewer run-control backchannel (VERDICT r2 item 10).

The reference viewer's WindowMsg (pause / single-step / conf-threshold /
terminate, /root/reference/mast3r_slam/visualization.py:33-41) is consumed
by the frontend loop at main.py:233-246.  Here the equivalent flows from
viewer.html through the websocket broadcaster into `SLAM.run` via
`RunControl.proceed()`.
"""

import asyncio
import json
import threading
import time

import numpy as np
import pytest

from mast3r_slam_tpu.config import load_config
from mast3r_slam_tpu.serve.broadcast import EventBroadcaster, RunControl
from mast3r_slam_tpu.slam.pipeline import SLAM

import sys, os
sys.path.insert(0, os.path.dirname(__file__))
from oracle import OracleDataset, OracleModel, PlaneScene, arc_trajectory

HW = (48, 64)


def test_runcontrol_pause_step_terminate():
    c = RunControl()
    assert c.proceed()  # running by default

    c.update({"paused": True})
    done = []

    def worker():
        done.append(c.proceed())

    t = threading.Thread(target=worker)
    t.start()
    time.sleep(0.1)
    assert not done, "proceed() must block while paused"
    c.update({"step": True})  # single-step releases exactly one frame
    t.join(timeout=5)
    assert done == [True]

    # still paused after the step
    t2 = threading.Thread(target=lambda: done.append(c.proceed()))
    t2.start()
    time.sleep(0.1)
    assert len(done) == 1
    c.update({"terminate": True})
    t2.join(timeout=5)
    assert done == [True, False]

    c2 = RunControl()
    c2.update({"conf_threshold": 3.25})
    assert c2.conf_threshold == 3.25


def test_engine_run_stops_on_terminate():
    """A terminate mid-run stops the engine early and still returns a
    result (and the bounded-queue prefetcher is drained, no deadlock)."""
    n_frames = 30
    scene = PlaneScene(HW)
    gt = arc_trajectory(n_frames, radius=0.6, max_angle=2.5)
    model = OracleModel(scene, gt, noise=0.002)
    cfg = load_config("base")
    cfg["engine"]["keyframe_buffer"] = 64
    cfg["engine"]["edge_buffer"] = 64
    cfg["single_thread"] = True
    slam = SLAM(model, cfg, HW)
    control = RunControl()
    slam.control = control

    # terminate once 5 frames have been logged
    orig_log = slam._log

    def log_and_stop(ts, frame):
        orig_log(ts, frame)
        if len(slam.frame_log) >= 5:
            control.update({"terminate": True})

    slam._log = log_and_stop
    result = slam.run(OracleDataset(n_frames, HW), verbose=False)
    assert 5 <= len(result.frame_timestamps) < n_frames


def test_ws_control_roundtrip():
    """A browser-side control message reaches the broadcaster's RunControl."""
    websockets = pytest.importorskip("websockets")

    b = EventBroadcaster(port=0).start()
    try:
        async def client():
            import websockets as wslib

            async with wslib.connect(
                f"ws://127.0.0.1:{b.bound_port}"
            ) as ws:
                await ws.send(json.dumps(
                    {"type": "control", "paused": True, "conf_threshold": 2.5}
                ))
                await ws.send("not json")  # must not kill the handler
                await ws.send(json.dumps(
                    {"type": "control", "paused": False, "step": True}
                ))
                await asyncio.sleep(0.2)

        asyncio.run(client())
        deadline = time.time() + 5
        while time.time() < deadline and b.control.conf_threshold != 2.5:
            time.sleep(0.05)
        assert b.control.conf_threshold == 2.5
        assert b.control.paused is False  # second message unpaused
        assert b.control._steps >= 1
    finally:
        b.stop()
