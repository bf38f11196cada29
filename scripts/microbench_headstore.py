"""A/B: f32-stored vs bf16-stored head weights on the real chip.

Beyond the halved weight traffic, if XLA's f32 dot path is multi-pass
(bf16_3x), bf16-stored weights also cut the pass count — measure, don't
guess.  Numerical identity was already established (microbench_dualbatch).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

from mast3r_slam_tpu.models import mast3r as M
from mast3r_slam_tpu.models import dpt as dpt_mod
from mast3r_slam_tpu.models.layers import mlp


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
cfg_f32 = dataclasses.replace(M.VIT_LARGE, head_store_dtype=None)
cfg_bf16 = dataclasses.replace(M.VIT_LARGE, head_store_dtype=jnp.bfloat16)
grid = cfg_f32.grid((H, W))
N = grid[0] * grid[1]

params = M.init_params(jax.random.key(0), cfg_f32)
params_bf = M.cast_head_weights(params, cfg_bf16)
assert params_bf["head1"]["local_mlp"]["fc1"]["w"].dtype == jnp.bfloat16

feat = jax.random.normal(jax.random.key(1), (1, N, cfg_f32.enc_embed_dim))
pos = M.patch_positions(1, grid)
kf_feat = jax.random.normal(jax.random.key(2), (1, N, cfg_f32.enc_embed_dim))

dec = jax.jit(lambda p: M.decode(p, cfg_f32, feat, pos, kf_feat, pos))
hooks1, hooks2 = jax.block_until_ready(dec(params))

for name, p in (("f32-stored", params), ("bf16-stored", params_bf)):
    dpt2 = jax.jit(lambda pp: (
        dpt_mod.dpt_forward(pp["head1"]["dpt"], list(hooks1), grid, 4),
        dpt_mod.dpt_forward(pp["head2"]["dpt"], list(hooks2), grid, 4),
    ))
    mlp2 = jax.jit(lambda pp: (
        mlp(pp["head1"]["local_mlp"], jnp.concatenate([hooks1[0], hooks1[3]], -1)),
        mlp(pp["head2"]["local_mlp"], jnp.concatenate([hooks2[0], hooks2[3]], -1)),
    ))
    print(f"DPT x2  {name}: {timeit(dpt2, p)*1e3:8.2f} ms", flush=True)
    print(f"MLP x2  {name}: {timeit(mlp2, p, n2=24)*1e3:8.2f} ms", flush=True)

# full dec+heads with each storage
for name, p in (("f32-stored", params), ("bf16-stored", params_bf)):
    f = jax.jit(lambda pp: M.inference_asymmetric(pp, cfg_f32, feat, pos, kf_feat, pos, grid))
    print(f"dec+heads {name}: {timeit(f, p)*1e3:8.2f} ms", flush=True)

o1 = jax.jit(lambda pp: M.inference_asymmetric(pp, cfg_f32, feat, pos, kf_feat, pos, grid))(params)
o2 = jax.jit(lambda pp: M.inference_asymmetric(pp, cfg_f32, feat, pos, kf_feat, pos, grid))(params_bf)
d = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(jax.tree.leaves(o1), jax.tree.leaves(o2)))
print(f"dec+heads bf16-stored max|diff|: {d:.2e}", flush=True)

# --- third variant: cast ONLY the DPT conv weights, not the local MLP ------
import copy
params_dptonly = dict(params)
for hk in ("head1", "head2"):
    h = dict(params[hk])
    h["dpt"] = jax.tree.map(lambda l: l.astype(jnp.bfloat16)
                            if l.ndim >= 2 else l, params[hk]["dpt"])
    params_dptonly[hk] = h

f = jax.jit(lambda pp: M.inference_asymmetric(pp, cfg_f32, feat, pos, kf_feat, pos, grid))
print(f"dec+heads dpt-only-bf16: {timeit(f, params_dptonly)*1e3:8.2f} ms", flush=True)
o3 = f(params_dptonly)
d = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(jax.tree.leaves(o1), jax.tree.leaves(o3)))
print(f"dpt-only max|diff| vs f32: {d:.2e}", flush=True)
# re-time the f32 baseline at the end to bracket session drift
print(f"dec+heads f32 (re-run):  {timeit(f, params)*1e3:8.2f} ms", flush=True)
