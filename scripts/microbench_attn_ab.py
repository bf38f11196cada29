"""Interleaved A/B: dec+heads with attn_impl xla vs fused (Pallas)."""

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
feat = jax.random.normal(jax.random.key(1), (1, grid[0]*grid[1], base.enc_embed_dim))
pos = M.patch_positions(1, grid)
kf = jax.random.normal(jax.random.key(2), (1, grid[0]*grid[1], base.enc_embed_dim))

fns = {}
for impl in ("xla", "fused"):
    cfg = replace(base, attn_impl=impl)
    fns[impl] = jax.jit(lambda p, cfg=cfg: M.inference_asymmetric(
        p, cfg, feat, pos, kf, pos, grid))
    out = fns[impl](params)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]


def t_once(fn, n=12):
    t0 = time.time()
    for _ in range(n):
        out = fn(params)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    return (time.time() - t0) / n


for r in range(4):
    a = t_once(fns["xla"])
    b = t_once(fns["fused"])
    print(f"round {r}: xla {a*1e3:6.2f}  fused {b*1e3:6.2f} ms", flush=True)
