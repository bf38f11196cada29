"""Frames, pointmap fusion, and the fixed-capacity keyframe store.

TPU re-design of /root/reference/mast3r_slam/frame.py: the reference keeps a
512-slot shared-CUDA-memory SoA ring (``SharedKeyframes``) guarded by an
RLock across 3 processes.  Here the same SoA layout is a single device-resident
pytree of fixed-capacity jnp arrays updated functionally (``.at[]``) — static
shapes for every jit signature, no locks (single host loop), and trivially
shardable across a mesh later.
"""

from __future__ import annotations

import dataclasses
from enum import IntEnum
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..lie import sim3


class Mode(IntEnum):
    INIT = 0
    TRACKING = 1
    RELOC = 2
    TERMINATED = 3


# ---------------------------------------------------------------------------
# pointmap fusion (frame.py:41-108)
# ---------------------------------------------------------------------------

def fuse_pointmap(X, C, n_fused, X_new, C_new, mode: str = "weighted_pointmap",
                  score: Optional[jnp.ndarray] = None,
                  score_mode: str = "median"):
    """One fusion step of a canonical pointmap.

    X, X_new: (N, 3); C, C_new: (N, 1); n_fused: scalar count.
    Returns (X', C', n_fused', score').  ``first`` keeps the original,
    ``recent`` replaces, ``indep_conf`` picks the higher-confidence pixel,
    ``weighted_pointmap`` does confidence-weighted averaging (default),
    ``weighted_spherical`` averages in (r, phi, theta), ``best_score``
    keeps the map whose aggregate confidence is larger.
    """
    if mode == "first":
        return X, C, n_fused, score
    if mode == "recent":
        return X_new, C_new, jnp.ones_like(n_fused), score
    if mode == "indep_conf":
        take = C_new > C
        return (
            jnp.where(take, X_new, X),
            jnp.where(take, C_new, C),
            jnp.ones_like(n_fused),
            score,
        )
    if mode == "weighted_pointmap":
        Xo = (C * X + C_new * X_new) / (C + C_new)
        return Xo, C + C_new, n_fused + 1, score
    if mode == "weighted_spherical":
        def to_sph(P):
            r = jnp.linalg.norm(P, axis=-1, keepdims=True)
            x, y, z = P[..., 0:1], P[..., 1:2], P[..., 2:3]
            return jnp.concatenate(
                [r, jnp.arctan2(y, x), jnp.arccos(jnp.clip(z / r, -1, 1))], axis=-1
            )

        def to_cart(s):
            r, phi, theta = s[..., 0:1], s[..., 1:2], s[..., 2:3]
            st = jnp.sin(theta)
            return jnp.concatenate(
                [r * st * jnp.cos(phi), r * st * jnp.sin(phi), r * jnp.cos(theta)],
                axis=-1,
            )

        s = (C * to_sph(X) + C_new * to_sph(X_new)) / (C + C_new)
        return to_cart(s), C + C_new, n_fused + 1, score
    if mode == "best_score":
        agg = jnp.median(C_new) if score_mode == "median" else jnp.mean(C_new)
        take = agg > score
        return (
            jnp.where(take, X_new, X),
            jnp.where(take, C_new, C),
            jnp.ones_like(n_fused),
            jnp.maximum(agg, score),
        )
    raise ValueError(f"unknown filtering_mode {mode}")


# ---------------------------------------------------------------------------
# Frame
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class Frame:
    """Host-side view of one frame's device arrays (frame.py:17-108)."""

    frame_id: int
    img: jnp.ndarray          # (3, H, W) normalized
    T_WC: jnp.ndarray         # (8,) Sim3
    X_canon: Optional[jnp.ndarray] = None  # (N, 3)
    C: Optional[jnp.ndarray] = None        # (N, 1) summed confidence
    n_fused: int = 0
    feat: Optional[jnp.ndarray] = None     # (1, P, D) encoder tokens
    pos: Optional[jnp.ndarray] = None      # (1, P, 2)
    K: Optional[jnp.ndarray] = None
    score: float = -np.inf
    uimg: Optional[np.ndarray] = None      # (H, W, 3) for viz/export

    def update_pointmap(self, X_new, C_new, mode="weighted_pointmap",
                        score_mode="median"):
        if self.n_fused == 0 or self.X_canon is None:
            self.X_canon, self.C, self.n_fused = X_new, C_new, 1
            if mode == "best_score":
                agg = jnp.median(C_new) if score_mode == "median" else jnp.mean(C_new)
                self.score = agg
            return
        X, C, n, score = fuse_pointmap(
            self.X_canon, self.C, jnp.asarray(self.n_fused), X_new, C_new,
            mode=mode, score=self.score, score_mode=score_mode,
        )
        self.X_canon, self.C = X, C
        self.n_fused = int(n)
        self.score = score

    def average_conf(self):
        return self.C / self.n_fused if self.C is not None else None


# ---------------------------------------------------------------------------
# Keyframe store (SoA, fixed capacity)
# ---------------------------------------------------------------------------

class Keyframes:
    """Device-resident SoA keyframe buffer (cap slots, frame.py:220-327).

    All arrays are preallocated with static shapes; ``n`` is the host-side
    fill count.  Functional updates keep every jit signature stable.
    """

    def __init__(self, capacity: int, num_pixels: int, num_patches: int,
                 feat_dim: int, dtype=jnp.float32):
        self.capacity = capacity
        self.num_pixels = num_pixels
        self.n = 0
        self.frame_id = np.full((capacity,), -1, dtype=np.int64)
        self.T_WC = jnp.tile(sim3.identity(dtype=dtype), (capacity, 1))
        self.X = jnp.zeros((capacity, num_pixels, 3), dtype=dtype)
        self.C = jnp.zeros((capacity, num_pixels, 1), dtype=dtype)
        self.n_fused = jnp.zeros((capacity,), dtype=jnp.int32)
        self.feat = jnp.zeros((capacity, num_patches, feat_dim), dtype=dtype)
        self.pos = jnp.zeros((capacity, num_patches, 2), dtype=jnp.int32)
        self.K: Optional[jnp.ndarray] = None
        # host-side metadata for viz/export
        self.uimgs = [None] * capacity

    def __len__(self):
        return self.n

    def append(self, frame: Frame) -> int:
        idx = self.n
        assert idx < self.capacity, "keyframe buffer full"
        self.set_frame(idx, frame)
        self.n = idx + 1
        return idx

    def set_frame(self, idx: int, frame: Frame):
        self.frame_id[idx] = frame.frame_id
        self.T_WC = self.T_WC.at[idx].set(frame.T_WC)
        self.X = self.X.at[idx].set(frame.X_canon)
        self.C = self.C.at[idx].set(frame.C)
        self.n_fused = self.n_fused.at[idx].set(frame.n_fused)
        self.feat = self.feat.at[idx].set(frame.feat[0])
        self.pos = self.pos.at[idx].set(frame.pos[0])
        self.uimgs[idx] = frame.uimg

    def get_frame(self, idx: int) -> Frame:
        f = Frame(
            frame_id=int(self.frame_id[idx]),
            img=None,
            T_WC=self.T_WC[idx],
            X_canon=self.X[idx],
            C=self.C[idx],
            n_fused=int(self.n_fused[idx]),
            feat=self.feat[idx][None],
            pos=self.pos[idx][None],
            K=self.K,
            uimg=self.uimgs[idx],
        )
        return f

    def pop_last(self):
        self.n -= 1

    def last_idx(self) -> int:
        return self.n - 1

    def update_pose(self, idx: int, T_WC):
        self.T_WC = self.T_WC.at[idx].set(T_WC)

    def update_poses(self, idxs, T_WCs):
        self.T_WC = self.T_WC.at[jnp.asarray(idxs)].set(T_WCs)

    def update_pointmap(self, idx: int, X, C, n_fused):
        self.X = self.X.at[idx].set(X)
        self.C = self.C.at[idx].set(C)
        self.n_fused = self.n_fused.at[idx].set(n_fused)

    def average_conf(self, idx: int):
        return self.C[idx] / jnp.maximum(self.n_fused[idx].astype(self.C.dtype), 1.0)
