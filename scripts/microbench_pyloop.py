"""Scan vs python-loop block stacks: the scan dynamic-slices (copies) its
stacked weights every trip (profiler: ~1.5 ms/run of pure weight copying in
the encoder); a python loop over static leading-axis slices should be views.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mast3r_slam_tpu.models import mast3r as M
from mast3r_slam_tpu.models.layers import encoder_block, decoder_block, layer_norm, linear, rope2d_tables

H, W = 384, 512
cfg = M.VIT_LARGE
grid = cfg.grid((H, W))
params = M.init_params(jax.random.key(0), cfg)
img = jax.random.normal(jax.random.key(1), (1, 3, H, W), jnp.float32) * 0.5
kf = jax.random.normal(jax.random.key(2), (1, grid[0]*grid[1], cfg.enc_embed_dim))
kf_pos = M.patch_positions(1, grid)


def encode_pyloop(p, im):
    x = M.patchify(im.astype(cfg.dtype), cfg.patch_size)
    x = linear(p["patch_embed"], x)
    pos = M.patch_positions(im.shape[0], grid)
    rope_cs = rope2d_tables(pos, cfg.head_dim_enc, cfg.rope_base)
    for i in range(cfg.enc_depth):
        bp = jax.tree.map(lambda a: a[i], p["enc_blocks"])
        x = encoder_block(bp, x, rope_cs, cfg.enc_num_heads, cfg.attn_impl)
    x = layer_norm(p["enc_norm"], x)
    return x.astype(jnp.float32), pos


def decode_pyloop(p, feat1, pos1, feat2, pos2):
    f1 = linear(p["decoder_embed"], feat1.astype(cfg.dtype))
    f2 = linear(p["decoder_embed"], feat2.astype(cfg.dtype))
    rope1 = rope2d_tables(pos1, cfg.head_dim_dec, cfg.rope_base)
    rope2 = rope2d_tables(pos2, cfg.head_dim_dec, cfg.rope_base)
    ys1, ys2 = [], []
    for i in range(cfg.dec_depth):
        b1 = jax.tree.map(lambda a: a[i], p["dec_blocks"])
        b2 = jax.tree.map(lambda a: a[i], p["dec_blocks2"])
        nf1 = decoder_block(b1, f1, f2, rope1, rope2, cfg.dec_num_heads, cfg.attn_impl)
        nf2 = decoder_block(b2, f2, f1, rope2, rope1, cfg.dec_num_heads, cfg.attn_impl)
        f1, f2 = nf1, nf2
        ys1.append(nf1); ys2.append(nf2)
    h = lambda ys: (ys[5].astype(jnp.float32), ys[8].astype(jnp.float32),
                    layer_norm(p["dec_norm"], ys[-1]).astype(jnp.float32))
    h61, h91, hf1 = h(ys1)
    h62, h92, hf2 = h(ys2)
    return (feat1, h61, h91, hf1), (feat2, h62, h92, hf2)


enc_scan = jax.jit(lambda p, im: M.encode_image(p, cfg, im))
enc_py = jax.jit(encode_pyloop)

feat, pos = jax.block_until_ready(enc_scan(params, img))

dec_scan = jax.jit(lambda p, f, po: M.decode(p, cfg, f, po, kf, kf_pos))
dec_py = jax.jit(lambda p, f, po: decode_pyloop(p, f, po, kf, kf_pos))

# numerics
o1 = enc_scan(params, img)[0]
o2 = enc_py(params, img)[0]
print(f"enc pyloop max|diff|: {float(jnp.max(jnp.abs(o1 - o2))):.2e}", flush=True)
d1 = dec_scan(params, feat, pos)
d2 = dec_py(params, feat, pos)
dd = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(jax.tree.leaves(d1), jax.tree.leaves(d2)))
print(f"dec pyloop max|diff|: {dd:.2e}", flush=True)


def timeit(fn, *args, n1=4, n2=16, reps=3):
    out = fn(*args); _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    def run(n):
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        return time.time() - t0
    run(2)
    t1 = min(run(n1) for _ in range(reps))
    t2 = min(run(n2) for _ in range(reps))
    return (t2 - t1) / (n2 - n1)


for r in range(3):
    es = timeit(enc_scan, params, img)
    ep = timeit(enc_py, params, img)
    ds = timeit(dec_scan, params, feat, pos)
    dp = timeit(dec_py, params, feat, pos)
    print(f"round {r}: enc scan {es*1e3:6.2f} py {ep*1e3:6.2f} | "
          f"dec scan {ds*1e3:6.2f} py {dp*1e3:6.2f} ms", flush=True)
