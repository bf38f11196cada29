"""Smoke tests for the headless visualisation layer (viz/renderer.py) —
capability mirror of the reference's OpenGL viewer (visualization.py) per
docs/PARITY.md."""

import json

import numpy as np

from mast3r_slam_tpu.config import load_config
from mast3r_slam_tpu.slam.pipeline import SLAM
from mast3r_slam_tpu.viz.renderer import export_scene_json, render_topdown

import sys, os
sys.path.insert(0, os.path.dirname(__file__))
from oracle import OracleDataset, OracleModel, PlaneScene, arc_trajectory


def test_render_and_scene_export(tmp_path):
    hw = (48, 64)
    n_frames = 12
    scene = PlaneScene(hw)
    gt = arc_trajectory(n_frames, radius=0.6, max_angle=2.0)
    model = OracleModel(scene, gt, noise=0.002)
    cfg = load_config("base")
    cfg["engine"]["keyframe_buffer"] = 32
    cfg["engine"]["edge_buffer"] = 32
    cfg["single_thread"] = True
    slam = SLAM(model, cfg, hw)
    slam.run(OracleDataset(n_frames, hw), verbose=False)

    png = tmp_path / "map.png"
    render_topdown(slam.keyframes, png, edges=[(int(a), int(b)) for a, b in
                                              zip(slam.graph.ii[:slam.graph.n_edges],
                                                  slam.graph.jj[:slam.graph.n_edges])])
    assert png.exists() and png.stat().st_size > 1000

    sj = tmp_path / "scene.json"
    export_scene_json(slam, sj)
    data = json.loads(sj.read_text())
    n = len(slam.keyframes)
    assert len(data["keyframe_poses"]) == n
    assert all(len(p) == 8 for p in data["keyframe_poses"])
    assert data["mode"] == "TRACKING"
    for a, b in data["edges"]:
        assert 0 <= a < n and 0 <= b < n
