"""A/B: encode and dec+heads as two programs vs ONE fused model program.

The measured mega-jit regression fused the MATCHER with the model; this
tests whether the model-only boundary (encode | decode+heads) matters.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mast3r_slam_tpu.models import mast3r as M

H, W = 384, 512
cfg = M.VIT_LARGE
grid = cfg.grid((H, W))
params = M.init_params(jax.random.key(0), cfg)
img = jax.random.normal(jax.random.key(1), (1, 3, H, W), jnp.float32) * 0.5
kf = jax.random.normal(jax.random.key(2), (1, grid[0]*grid[1], cfg.enc_embed_dim))
kf_pos = M.patch_positions(1, grid)

enc = jax.jit(lambda p, im: M.encode_image(p, cfg, im))
dec = jax.jit(lambda p, f, po: M.inference_asymmetric(p, cfg, f, po, kf, kf_pos, grid))

@jax.jit
def fused(p, im):
    f, po = M.encode_image(p, cfg, im)
    return M.inference_asymmetric(p, cfg, f, po, kf, kf_pos, grid)

def two(p, im):
    f, po = enc(p, im)
    return dec(p, f, po)

for fn in (two, fused):
    out = fn(params, img)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]

def t_once(fn, n=10):
    t0 = time.time()
    for _ in range(n):
        out = fn(params, img)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    return (time.time() - t0) / n

for r in range(4):
    a = t_once(two)
    b = t_once(fused)
    print(f"round {r}: two-programs {a*1e3:6.2f}  fused {b*1e3:6.2f} ms", flush=True)
