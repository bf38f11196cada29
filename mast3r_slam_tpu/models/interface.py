"""Model interface used by the SLAM engine.

The tracker/backend consume a small protocol (encode / asymmetric /
symmetric / mono) rather than raw params, so the full engine can run against
a synthetic ground-truth oracle in tests (no pretrained checkpoint is needed
to exercise matching, GN tracking, fusion, keyframing and global BA e2e).

``MASt3RModel`` is the real implementation wrapping the jitted inference
entry points in :mod:`mast3r_slam_tpu.models.mast3r`.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from . import mast3r as M


class MASt3RModel:
    """Stateless convenience wrapper: params + config + image size."""

    def __init__(self, params, mcfg: M.ModelConfig, img_hw: Tuple[int, int]):
        # idempotent; covers the .npz load path (init/convert already cast)
        self.params = M.cast_head_weights(params, mcfg)
        self.mcfg = mcfg
        self.img_hw = img_hw
        self.grid = mcfg.grid(img_hw)

    @classmethod
    def random_init(cls, key, img_hw, mcfg: M.ModelConfig = M.VIT_LARGE):
        return cls(M.init_params(key, mcfg), mcfg, img_hw)

    @classmethod
    def from_torch_checkpoint(cls, path, img_hw, mcfg: M.ModelConfig = M.VIT_LARGE):
        from .convert import load_torch_checkpoint

        params, mcfg = load_torch_checkpoint(path, mcfg)
        return cls(params, mcfg, img_hw)

    # -- protocol ------------------------------------------------------

    def encode(self, img):
        """img (B, 3, H, W) in [-1, 1] -> (feat (B, N, D), pos (B, N, 2))."""
        return M.encode_image(self.params, self.mcfg, img)

    def asymmetric(self, feat_i, pos_i, feat_j, pos_j):
        """-> ((Xii, Cii, Dii, Qii), (Xji, Cji, Dji, Qji)), maps (B, H, W, *)."""
        return M.inference_asymmetric(
            self.params, self.mcfg, feat_i, pos_i, feat_j, pos_j, self.grid
        )

    def symmetric(self, feat_i, pos_i, feat_j, pos_j):
        """-> (res_ii, res_ji, res_jj, res_ij), each (X, C, D, Q)."""
        return M.inference_symmetric(
            self.params, self.mcfg, feat_i, pos_i, feat_j, pos_j, self.grid
        )

    def mono(self, feat, pos):
        """-> (X (B, H, W, 3), C (B, H, W)) canonical pointmap."""
        return M.inference_mono(self.params, self.mcfg, feat, pos, self.grid)

    @property
    def feat_dim(self):
        return self.mcfg.enc_embed_dim

    @property
    def num_patches(self):
        return self.grid[0] * self.grid[1]
