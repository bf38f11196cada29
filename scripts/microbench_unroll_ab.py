"""Interleaved repeated A/B of scan_unroll for encoder and dec+heads."""

import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mast3r_slam_tpu.models import mast3r as M

H, W = 384, 512
base = M.VIT_LARGE
grid = base.grid((H, W))
params = M.init_params(jax.random.key(0), base)
img = jax.random.normal(jax.random.key(1), (1, 3, H, W), jnp.float32) * 0.5
kf_feat = jax.random.normal(jax.random.key(2), (1, grid[0] * grid[1], base.enc_embed_dim))
kf_pos = M.patch_positions(1, grid)

encs, decs = {}, {}
for u in (1, 12):
    cfg = replace(base, scan_unroll=u)
    encs[u] = jax.jit(lambda p, im, cfg=cfg: M.encode_image(p, cfg, im))
    decs[u] = jax.jit(lambda p, f, po, cfg=cfg: M.inference_asymmetric(
        p, cfg, f, po, kf_feat, kf_pos, grid))

feat, pos = jax.block_until_ready(encs[12](params, img))
for u in (1, 12):
    _ = np.asarray(jax.tree.leaves(encs[u](params, img))[0]).ravel()[:1]
    _ = np.asarray(jax.tree.leaves(decs[u](params, feat, pos))[0]).ravel()[:1]


def t_once(fn, *args, n=10):
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    return (time.time() - t0) / n


for r in range(4):
    e1 = t_once(encs[1], params, img)
    e12 = t_once(encs[12], params, img)
    d1 = t_once(decs[1], params, feat, pos)
    d12 = t_once(decs[12], params, feat, pos)
    print(f"round {r}: enc u1 {e1*1e3:6.2f}  u12 {e12*1e3:6.2f} | "
          f"dec u1 {d1*1e3:6.2f}  u12 {d12*1e3:6.2f} ms", flush=True)
