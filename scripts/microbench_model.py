"""Encoder/decoder timing vs scan unroll factor (and head dtype)."""

import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mast3r_slam_tpu.models import mast3r as M


def timeit(fn, *args, n1=3, n2=12, reps=3):
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]

    def run(n):
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        return time.time() - t0

    run(1)
    t1 = min(run(n1) for _ in range(reps))
    t2 = min(run(n2) for _ in range(reps))
    return (t2 - t1) / (n2 - n1)


H, W = 384, 512
base = M.VIT_LARGE
params = M.init_params(jax.random.key(0), base)
img = jax.random.normal(jax.random.key(1), (1, 3, H, W), jnp.float32) * 0.5
grid = base.grid((H, W))
kf_feat = jax.random.normal(jax.random.key(2), (1, grid[0] * grid[1], base.enc_embed_dim))
kf_pos = M.patch_positions(1, grid)

for unroll in (1, 4, 24):
    cfg = replace(base, scan_unroll=unroll)
    enc = jax.jit(lambda p, im, cfg=cfg: M.encode_image(p, cfg, im))
    print(f"encoder unroll={unroll:2d}:   {timeit(enc, params, img)*1e3:8.2f} ms", flush=True)

feat, pos = jax.block_until_ready(jax.jit(
    lambda p, im: M.encode_image(p, base, im))(params, img))

for unroll in (1, 4, 12):
    cfg = replace(base, scan_unroll=unroll)
    dec = jax.jit(lambda p, f, po, cfg=cfg: M.inference_asymmetric(
        p, cfg, f, po, kf_feat, kf_pos, grid))
    print(f"dec+heads unroll={unroll:2d}: {timeit(dec, params, feat, pos)*1e3:8.2f} ms", flush=True)

cfg = replace(base, scan_unroll=4, head_dtype=jnp.bfloat16)
dec = jax.jit(lambda p, f, po: M.inference_asymmetric(p, cfg, f, po, kf_feat, kf_pos, grid))
print(f"dec+heads bf16 heads: {timeit(dec, params, feat, pos)*1e3:8.2f} ms", flush=True)

# split: decoder trunk alone / DPT / local MLP
dec_only = jax.jit(lambda p, f, po: M.decode(p, base, f, po, kf_feat, kf_pos))
hooks1, hooks2 = jax.block_until_ready(dec_only(params, feat, pos))
print(f"decode trunk only:    {timeit(dec_only, params, feat, pos)*1e3:8.2f} ms", flush=True)

from mast3r_slam_tpu.models import dpt as dpt_mod
dpt_fn = jax.jit(lambda hp, h: dpt_mod.dpt_forward(hp, list(h), grid, 4))
print(f"DPT head x1:          {timeit(dpt_fn, params['head1']['dpt'], hooks1)*1e3:8.2f} ms", flush=True)

from mast3r_slam_tpu.models.layers import mlp as _mlp
mlp_fn = jax.jit(lambda hp, h: _mlp(hp, jnp.concatenate([h[0], h[3]], axis=-1)))
print(f"local MLP x1:         {timeit(mlp_fn, params['head1']['local_mlp'], hooks1)*1e3:8.2f} ms", flush=True)
