"""Synthetic ground-truth pointmap oracle implementing the model interface.

Lets the full SLAM engine (matching, GN tracking, fusion, keyframing, global
BA, retrieval) run end-to-end with KNOWN geometry and trajectory, no
pretrained checkpoint.  The "image" of frame k is a constant gray level
encoding k, so the oracle can recover the frame id after the resize pipeline;
"encoder features" carry the id in feat[0, 0, 0].
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from mast3r_slam_tpu.geometry import backproject, get_pixel_coords
from mast3r_slam_tpu.lie import sim3


class PlaneScene:
    """A few textured planes + camera intrinsics + descriptor field."""

    def __init__(self, img_hw=(48, 64), seed=0, closed=False):
        self.H, self.W = img_hw
        f = 0.8 * self.W
        self.K = np.array(
            [[f, 0, self.W / 2], [0, f, self.H / 2], [0, 0, 1.0]], dtype=np.float32
        )
        rng = np.random.default_rng(seed)
        # planes: n . x = c (floor + back wall + side wall), world frame.
        # Rays missing every plane become depth-10 "sky" pixels with NO
        # consistent world point — past ~2.3 rad of yaw most of the image
        # is geometric garbage and tracking/BA degenerate CHAOTICALLY
        # (r5 finding: the old drifty-loop scenarios all sat in that
        # regime, so their ATEs were coin flips).  ``closed=True`` seals
        # the box with three more walls so every viewing direction from
        # any interior pose hits real geometry — required for turnaround /
        # full-rotation trajectories.  Default stays open: the box change
        # shifts keyframe cadence, and the forward-arc test fixtures'
        # thresholds are calibrated against the open scene.
        self.planes = [
            (np.array([0.0, 1.0, 0.0]), 1.0),    # y = 1 (floor below)
            (np.array([0.0, 0.0, 1.0]), 4.0),    # z = 4 (back wall)
            (np.array([1.0, 0.0, 0.0]), 3.0),    # x = 3 (side wall)
        ]
        if closed:
            self.planes += [
                (np.array([-1.0, 0.0, 0.0]), 3.0),   # x = -3 (other side)
                (np.array([0.0, -1.0, 0.0]), 3.0),   # y = -3 (ceiling)
                (np.array([0.0, 0.0, -1.0]), 4.0),   # z = -4 (behind)
            ]
        # smooth random-Fourier descriptor field over world points
        self.Wd = rng.normal(size=(24, 3)).astype(np.float32) * 2.0
        self.bd = rng.uniform(0, 2 * np.pi, size=(24,)).astype(np.float32)

    def render_pointmap(self, T_WC: np.ndarray) -> np.ndarray:
        """(H, W, 3) camera-frame points for camera pose T_WC (Sim3 8-vec)."""
        uv = np.asarray(get_pixel_coords((self.H, self.W))).reshape(-1, 2)
        rays = np.array(
            backproject(jnp.asarray(uv), jnp.ones((uv.shape[0], 1)), jnp.asarray(self.K))
        )
        rays /= np.linalg.norm(rays, axis=-1, keepdims=True)
        R = np.asarray(sim3.quat_to_matrix(jnp.asarray(T_WC[3:7])))
        t = T_WC[:3]
        d_w = rays @ R.T  # world-frame ray dirs
        lam = np.full(rays.shape[0], np.inf, dtype=np.float32)
        for n, c in self.planes:
            denom = d_w @ n
            li = np.where(np.abs(denom) > 1e-6, (c - t @ n) / denom, np.inf)
            li = np.where(li > 0.1, li, np.inf)
            lam = np.minimum(lam, li)
        lam = np.where(np.isfinite(lam), lam, 10.0)
        X_cam = rays * lam[:, None]
        return X_cam.reshape(self.H, self.W, 3).astype(np.float32)

    def descriptors(self, X_cam: np.ndarray, T_WC: np.ndarray) -> np.ndarray:
        """View-invariant unit descriptors from world coordinates."""
        Xw = np.asarray(sim3.act(jnp.asarray(T_WC), jnp.asarray(X_cam)))
        D = np.sin(Xw @ self.Wd.T + self.bd)
        D /= np.linalg.norm(D, axis=-1, keepdims=True) + 1e-12
        return D.astype(np.float32)


class OracleModel:
    """Drop-in for MASt3RModel producing ground-truth predictions."""

    def __init__(self, scene: PlaneScene, gt_poses: np.ndarray, noise=0.0, seed=0):
        self.scene = scene
        self.gt = np.asarray(gt_poses, dtype=np.float32)  # (F, 8)
        self.noise = noise
        self.seed = seed
        self.img_hw = (scene.H, scene.W)
        self.feat_dim = 16
        grid = (scene.H // 16 or 1, scene.W // 16 or 1)
        self.num_patches = grid[0] * grid[1]
        self._grid = grid
        self._Wf = np.random.default_rng(7).normal(size=(self.feat_dim, 8)).astype(
            np.float32
        ) * 2.0

    # -- id plumbing ---------------------------------------------------

    @staticmethod
    def image_for_frame(frame_id: int, hw=(48, 64)) -> np.ndarray:
        v = (frame_id + 1) / 255.0
        return np.full((hw[0], hw[1], 3), v, dtype=np.float32)

    @staticmethod
    def _id_from_img(img) -> int:
        v = (float(jnp.mean(img)) + 1.0) / 2.0  # undo (x-0.5)/0.5
        return int(round(v * 255.0)) - 1

    def encode(self, img):
        fid = self._id_from_img(img)
        # pose-coded tokens: nearby poses give similar tokens, so the
        # retrieval head/ASMK stack has real signal to rank keyframes by;
        # token 0 is reserved to carry the frame id to the pair oracle.
        pose = self.gt[fid]
        phase = np.linspace(0, 2 * np.pi, self.num_patches)[:, None]
        tok = np.sin(pose @ self._Wf.T + phase).astype(np.float32)
        tok[0] = 0.0
        tok[0, 0] = float(fid)
        feat = jnp.asarray(tok[None])
        pos = jnp.zeros((1, self.num_patches, 2), dtype=jnp.int32)
        return feat, pos

    def _fid(self, feat) -> int:
        import jax as _jax

        if isinstance(feat, _jax.Array) and not feat.is_fully_addressable:
            # multi-process mesh runs shard the decode batch across
            # processes; the host-side oracle gathers the id it needs
            # (tests/test_multihost.py engine e2e)
            from jax.experimental import multihost_utils

            feat = multihost_utils.process_allgather(feat, tiled=True)
        return int(round(float(np.asarray(feat).reshape(-1)[0])))

    def _view(self, fid: int):
        T = self.gt[fid]
        X = self.scene.render_pointmap(T)
        D = self.scene.descriptors(X, T)
        return T, X, D

    def _noisify(self, X, key):
        """Deterministic noise per (call-site, view) — NOT a stateful stream:
        the pipelined engine legitimately issues speculative decodes (extra
        calls), which must not perturb every later observation."""
        if self.noise > 0:
            rng = np.random.default_rng((self.seed, *key))
            X = X + rng.normal(size=X.shape).astype(np.float32) * self.noise
        return X

    def _conf(self, X_cam: np.ndarray, fid: int) -> np.ndarray:
        """Structured confidence: depth-dependent per pixel + slow per-frame
        drift.  Constant confidence would degenerate ``indep_conf`` (C_new > C
        never fires) and ``best_score`` (median never beats the stored score)
        into keep-first — real models emit varying confidence, and the
        filtering modes only get genuine coverage when the oracle does too."""
        d = np.linalg.norm(X_cam, axis=-1)
        return (1.6 + 1.0 / (1.0 + d) + 0.15 * np.sin(0.9 * fid)).astype(
            np.float32
        )[None]

    def _pair(self, fid_i, fid_j):
        """(Xii, Cii, Dii, Qii), (Xji, ...): j's points in i's frame."""
        Ti, Xi, Di = self._view(fid_i)
        Tj, Xj, Dj = self._view(fid_j)
        H, W = self.img_hw
        T_CiCj = np.asarray(
            sim3.rel(jnp.asarray(Ti), jnp.asarray(Tj)), dtype=np.float32
        )
        Xji = np.asarray(sim3.act(jnp.asarray(T_CiCj), jnp.asarray(Xj)))
        ones = np.full((1, H, W), 2.0, dtype=np.float32)
        mk = lambda a: jnp.asarray(a[None])
        res_ii = (mk(self._noisify(Xi, (0, fid_i, fid_j))),
                  jnp.asarray(self._conf(Xi, fid_i)),
                  mk(Di), jnp.asarray(ones))
        res_ji = (mk(self._noisify(Xji, (1, fid_i, fid_j))),
                  jnp.asarray(self._conf(Xji, fid_j)),
                  mk(Dj), jnp.asarray(ones))
        return res_ii, res_ji

    # -- interface -----------------------------------------------------

    def asymmetric(self, feat_i, pos_i, feat_j, pos_j):
        B = feat_i.shape[0]
        if B == 1:
            return self._pair(self._fid(feat_i), self._fid(feat_j))
        outs_ii, outs_ji = [], []
        for b in range(B):
            r_ii, r_ji = self._pair(
                self._fid(feat_i[b][None]), self._fid(feat_j[b][None])
            )
            outs_ii.append(r_ii)
            outs_ji.append(r_ji)

        def cat(rs):
            return tuple(
                jnp.concatenate([r[k] for r in rs], axis=0) for k in range(4)
            )

        return cat(outs_ii), cat(outs_ji)

    def symmetric(self, feat_i, pos_i, feat_j, pos_j):
        B = feat_i.shape[0]
        outs_ii, outs_ji, outs_jj, outs_ij = [], [], [], []
        for b in range(B):
            fi = self._fid(feat_i[b][None])
            fj = self._fid(feat_j[b][None])
            r_ii, r_ji = self._pair(fi, fj)
            r_jj, r_ij = self._pair(fj, fi)
            outs_ii.append(r_ii)
            outs_ji.append(r_ji)
            outs_jj.append(r_jj)
            outs_ij.append(r_ij)

        def cat(rs):
            return tuple(jnp.concatenate([r[k] for r in rs], axis=0) for k in range(4))

        return cat(outs_ii), cat(outs_ji), cat(outs_jj), cat(outs_ij)

    def mono(self, feat, pos):
        fid = self._fid(feat)
        _, X, _ = self._view(fid)
        H, W = self.img_hw
        return (jnp.asarray(self._noisify(X, (2, fid, fid))[None]),
                jnp.asarray(self._conf(X, fid)))


def arc_trajectory(n_frames: int, radius=0.5, max_angle=0.5) -> np.ndarray:
    """Smooth sideways arc with slight rotation, looking roughly at +z."""
    poses = []
    for k in range(n_frames):
        s = k / max(n_frames - 1, 1)
        t = np.array([radius * np.sin(s * max_angle * 2), 0.2 * s, 0.3 * s])
        yaw = -0.4 * max_angle * s
        q = np.array([0.0, np.sin(yaw / 2), 0.0, np.cos(yaw / 2)])
        poses.append(np.concatenate([t, q, [1.0]]))
    return np.asarray(poses, dtype=np.float32)


class OracleDataset:
    """Minimal dataset of constant-gray id-encoding images."""

    def __init__(self, n_frames: int, hw=(48, 64)):
        self.n = n_frames
        self.hw = hw
        self.timestamps = [f"{i / 30.0:.6f}" for i in range(n_frames)]
        self.save_results = True

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return self.timestamps[i], OracleModel.image_for_frame(i, self.hw)
