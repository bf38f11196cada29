"""Headless map visualization.

Capability replacement for the reference's OpenGL/imgui live window
(/root/reference/mast3r_slam/visualization.py — surfel pointmap render,
camera frustums, graph edges): on a TPU host there is no GL stack, so the
same information is rendered offline to images (matplotlib) and exported for
the bundled three.js web viewer (viewer.html), which consumes the engine's
PLY + trajectory + graph JSON.
"""

from __future__ import annotations

import json
import pathlib

import numpy as np

from ..lie import sim3


def frustum_points(T_WC, scale=0.1):
    """8 line segments sketching a camera frustum in world coords."""
    import jax.numpy as jnp

    c = np.array(
        [[0, 0, 0], [-1, -0.75, 1.5], [1, -0.75, 1.5], [1, 0.75, 1.5],
         [-1, 0.75, 1.5]]
    ) * scale
    cw = np.asarray(sim3.act(jnp.asarray(T_WC), jnp.asarray(c, dtype=np.float32)))
    segs = []
    for i in range(1, 5):
        segs.append((cw[0], cw[i]))
    for i in range(1, 5):
        segs.append((cw[i], cw[i % 4 + 1]))
    return segs


def render_topdown(
    keyframes,
    out_path,
    conf_threshold: float = 1.5,
    axes=(0, 2),
    max_points: int = 200_000,
    edges=None,
):
    """Top-down scatter of the world pointcloud + trajectory + graph edges."""
    import matplotlib

    matplotlib.use("Agg")
    import jax.numpy as jnp
    import matplotlib.pyplot as plt

    n = len(keyframes)
    pts, cols = [], []
    for i in range(n):
        X_np, C_np = keyframes.pointmap_np(i)  # paging-aware
        pW = np.asarray(sim3.act(keyframes.T_WC[i], jnp.asarray(X_np)))
        conf = (C_np / max(float(keyframes.n_fused[i]), 1.0)).reshape(-1)
        sel = conf > conf_threshold
        uimg = keyframes.uimgs[i]
        npix = pW.shape[0]
        pW = pW[sel]
        if uimg is not None and np.asarray(uimg).reshape(-1, 3).shape[0] == npix:
            col = np.asarray(uimg).reshape(-1, 3)
            if col.dtype == np.uint8:
                col = col / 255.0
            col = col[sel]
        else:
            col = np.full((len(pW), 3), 0.5)
        pts.append(pW)
        cols.append(col)
    if not pts:
        return
    P = np.concatenate(pts)
    C = np.concatenate(cols)
    if len(P) > max_points:
        sel = np.random.default_rng(0).choice(len(P), max_points, replace=False)
        P, C = P[sel], C[sel]

    a, b = axes
    fig, ax = plt.subplots(figsize=(10, 10), dpi=110)
    ax.scatter(P[:, a], P[:, b], s=0.2, c=np.clip(C, 0, 1), linewidths=0)
    traj = np.asarray(keyframes.T_WC[:n, :3])
    ax.plot(traj[:, a], traj[:, b], "-o", color="#d97706", ms=3, lw=1.2,
            label="keyframes")
    if edges is not None and len(edges) > 0:
        for i, j in edges:
            ax.plot(
                [traj[i, a], traj[j, a]], [traj[i, b], traj[j, b]],
                color="#2563eb", lw=0.5, alpha=0.5,
            )
    ax.set_aspect("equal")
    ax.set_xlabel("xyz"[a])
    ax.set_ylabel("xyz"[b])
    ax.legend(loc="upper right")
    fig.tight_layout()
    pathlib.Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_path)
    plt.close(fig)


def export_scene_json(slam, out_path):
    """Trajectory + frustums + graph edges for the web viewer."""
    kf = slam.keyframes
    n = len(kf)
    g = slam.graph
    edges = [[int(g.ii[e]), int(g.jj[e])] for e in range(g.n_edges)]
    data = {
        "keyframe_poses": np.asarray(kf.T_WC[:n]).tolist(),
        "frame_ids": [int(x) for x in kf.frame_id[:n]],
        "edges": edges,
        "mode": slam.mode.name,
    }
    out_path = pathlib.Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(data))
