"""A/B: pixel-shuffle token layout — torch channel-major (C,P,P) vs
pixel-major (P,P,C) fc2 output columns.

The torch layout (catmlp_dpt_head.py:78-81) makes the un-shuffle transpose
gather stride-P*P scalars (innermost C walks stride-256 f32); permuting
fc2's output columns to (py,px,c) order at weight-load time makes the
transpose move contiguous P*C-element runs instead. Exact: each fc2 output
column is an independent dot product, so a column permutation (+ matching
bias permutation) changes nothing numerically.
"""

import os
import sys
import time

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
cfg = M.VIT_LARGE
grid = cfg.grid((H, W))
N = grid[0] * grid[1]
P = cfg.patch_size
C = cfg.desc_dim + 1

params = M.init_params(jax.random.key(0), cfg)
feat = jax.random.normal(jax.random.key(1), (1, N, cfg.enc_embed_dim))
pos = M.patch_positions(1, grid)
kf_feat = jax.random.normal(jax.random.key(2), (1, N, cfg.enc_embed_dim))

# The library is now pixel-major (this A/B landed); the variant below
# reconstructs the OLD torch channel-major layout for comparison.
# old o = c*P*P + pp  <->  new n = pp*C + c
pp_idx = np.arange(P * P)
perm = (np.arange(C)[None, :] * P * P + pp_idx[:, None]).reshape(-1)  # [n] -> o
inv_perm = np.argsort(perm)  # [o] -> n
params_perm = jax.tree.map(lambda x: x, params)  # shallow-ish copy via identity map
for hk in ("head1", "head2"):
    h = dict(params_perm[hk])
    lm = dict(h["local_mlp"])
    fc2 = dict(lm["fc2"])
    fc2["w"] = fc2["w"][:, inv_perm]
    fc2["b"] = fc2["b"][inv_perm]
    lm["fc2"] = fc2
    h["local_mlp"] = lm
    params_perm[hk] = h

orig_shuffle = M._pixel_shuffle_tokens


def shuffle_chan_major(tok, grid_hw, P, C):
    nh, nw = grid_hw
    B, Ntok, _ = tok.shape
    x = tok.reshape(B, nh, nw, C, P, P)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (B, nh, P, nw, P, C)
    return x.reshape(B, nh * P, nw * P, C)


def bench(name, p):
    # jit the UNDERLYING function: going through the module-level jitted
    # inference_asymmetric would reuse its cached trace and never see the
    # monkeypatched shuffle.
    f = jax.jit(lambda pp: M._decode_and_heads(pp, cfg, feat, pos, kf_feat, pos, grid))
    print(f"dec+heads {name}: {timeit(f, p)*1e3:8.2f} ms", flush=True)
    return f(p)


def main():
    o_base = bench("pixel-major (base)", params)
    try:
        M._pixel_shuffle_tokens = shuffle_chan_major
        o_perm = bench("chan-major (old)  ", params_perm)
    finally:
        M._pixel_shuffle_tokens = orig_shuffle
    bench("pixel-major (re)  ", params)

    d = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(jax.tree.leaves(o_base), jax.tree.leaves(o_perm)))
    print(f"max|diff| old-layout vs base: {d:.2e}", flush=True)


if __name__ == "__main__":
    main()
# measured 2026-08-20 (v5e, one process): chan-major 12.05/11.94 ms,
# pixel-major 11.37 ms, max|diff| 0.0 -> pixel-major landed as default.
