"""Map export: PLY pointclouds and keyframe images.

Mirrors /root/reference/mast3r_slam/evaluate.py:47-106 without the plyfile
dependency (binary-little-endian PLY written directly).
"""

from __future__ import annotations

import pathlib

import jax.numpy as jnp
import numpy as np

from ..geometry import constrain_points_to_ray
from ..lie import sim3


def save_ply(filename, points: np.ndarray, colors: np.ndarray):
    """points (N, 3) f32, colors (N, 3) uint8 -> binary PLY."""
    filename = pathlib.Path(filename)
    filename.parent.mkdir(parents=True, exist_ok=True)
    n = len(points)
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "end_header\n"
    )
    rec = np.empty(
        n,
        dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
               ("red", "u1"), ("green", "u1"), ("blue", "u1")],
    )
    rec["x"], rec["y"], rec["z"] = points.astype(np.float32).T
    rec["red"], rec["green"], rec["blue"] = colors.astype(np.uint8).T
    with open(filename, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(rec.tobytes())


def load_ply(filename):
    """Read back a PLY written by :func:`save_ply` (for tests/tools)."""
    with open(filename, "rb") as f:
        data = f.read()
    end = data.index(b"end_header\n") + len(b"end_header\n")
    header = data[:end].decode("ascii")
    n = int([l for l in header.splitlines() if l.startswith("element vertex")][0].split()[-1])
    rec = np.frombuffer(
        data[end:],
        dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
               ("red", "u1"), ("green", "u1"), ("blue", "u1")],
        count=n,
    )
    pts = np.stack([rec["x"], rec["y"], rec["z"]], axis=-1)
    col = np.stack([rec["red"], rec["green"], rec["blue"]], axis=-1)
    return pts, col


def save_reconstruction(
    filename, keyframes, img_hw, conf_threshold: float, use_calib: bool = False
):
    """Confidence-thresholded world pointcloud (evaluate.py:47-71)."""
    pointclouds, colors = [], []
    for i in range(len(keyframes)):
        # paging-aware row fetch (resident or host-evicted keyframes)
        X_np, C_np = keyframes.pointmap_np(i)
        X = jnp.asarray(X_np)
        if use_calib and keyframes.K is not None:
            X = constrain_points_to_ray(img_hw, X, keyframes.K)
        pW = np.asarray(sim3.act(keyframes.T_WC[i], X)).reshape(-1, 3)
        conf = (
            C_np / max(float(keyframes.n_fused[i]), 1.0)
        ).reshape(-1)
        uimg = keyframes.uimgs[i]
        if uimg is None or np.asarray(uimg).reshape(-1, 3).shape[0] != pW.shape[0]:
            # no image, or stored at a different resolution than the
            # pointmap (e.g. tiny-engine tests): colorless points
            color = np.full((pW.shape[0], 3), 128, dtype=np.uint8)
        else:
            color = np.asarray(uimg).reshape(-1, 3)
            if color.dtype != np.uint8:
                color = (color * 255).astype(np.uint8)
        valid = conf > conf_threshold
        pointclouds.append(pW[valid])
        colors.append(color[valid])
    save_ply(
        filename, np.concatenate(pointclouds, axis=0), np.concatenate(colors, axis=0)
    )


def save_keyframes(savedir, timestamps, keyframes):
    """Dump keyframe RGB images (evaluate.py:73-86)."""
    import cv2

    savedir = pathlib.Path(savedir)
    savedir.mkdir(parents=True, exist_ok=True)
    for i in range(len(keyframes)):
        uimg = keyframes.uimgs[i]
        if uimg is None:
            continue
        t = timestamps[int(keyframes.frame_id[i])]
        img = np.asarray(uimg)
        if img.dtype != np.uint8:
            img = (img * 255).astype(np.uint8)
        cv2.imwrite(str(savedir / f"{t}.png"), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
