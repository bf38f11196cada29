"""Encoder/decoder attention experiments: XLA sdpa vs fused Pallas kernel.

Hypothesis: at 768 tokens the XLA attention materialises f32 logits +
softmax weights in HBM (~38 MB/block, ~0.9 GB over 24 encoder blocks) —
the gap between the encoder's 8.8 ms and its ~2 ms matmul floor.
"""

import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mast3r_slam_tpu.models import mast3r as M
from mast3r_slam_tpu.ops.attention import sdpa_fused, sdpa_xla


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


B, Hh, N, D = 1, 16, 768, 64
key = jax.random.key(0)
q = jax.random.normal(key, (B, Hh, N, D), jnp.bfloat16)
k = jax.random.normal(jax.random.key(1), (B, Hh, N, D), jnp.bfloat16)
v = jax.random.normal(jax.random.key(2), (B, Hh, N, D), jnp.bfloat16)

xla_fn = jax.jit(sdpa_xla)
fused_fn = jax.jit(sdpa_fused)

print(f"sdpa xla  1x16x768:   {timeit(xla_fn, q, k, v)*1e3:8.3f} ms", flush=True)
print(f"sdpa fused 1x16x768:  {timeit(fused_fn, q, k, v)*1e3:8.3f} ms", flush=True)
a = np.asarray(xla_fn(q, k, v), np.float32)
b = np.asarray(fused_fn(q, k, v), np.float32)
print(f"max abs diff: {np.abs(a - b).max():.3e}", flush=True)

H, W = 384, 512
base = M.VIT_LARGE
params = M.init_params(jax.random.key(0), base)
img = jax.random.normal(jax.random.key(1), (1, 3, H, W), jnp.float32) * 0.5
grid = base.grid((H, W))

for impl in ("xla", "fused"):
    cfg = replace(base, attn_impl=impl)
    enc = jax.jit(lambda p, im, cfg=cfg: M.encode_image(p, cfg, im))
    print(f"encoder attn={impl}: {timeit(enc, params, img)*1e3:8.2f} ms", flush=True)

feat, pos = jax.block_until_ready(
    jax.jit(lambda p, im: M.encode_image(p, base, im))(params, img))
kf_feat = jax.random.normal(jax.random.key(2), (1, grid[0] * grid[1], base.enc_embed_dim))
kf_pos = M.patch_positions(1, grid)

for impl in ("xla", "fused"):
    cfg = replace(base, attn_impl=impl)
    dec = jax.jit(lambda p, f, po, cfg=cfg: M.inference_asymmetric(
        p, cfg, f, po, kf_feat, kf_pos, grid))
    print(f"dec+heads attn={impl}: {timeit(dec, params, feat, pos)*1e3:8.2f} ms", flush=True)
