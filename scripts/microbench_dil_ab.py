"""Interleaved repeated A/B: match() with subset dilations (5,2,1) vs (5,2)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mast3r_slam_tpu.ops import matching

H, W = 384, 512
N = H * W
uu, vv = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                      jnp.arange(H, dtype=jnp.float32))
z = 2.0 + 0.4 * jnp.sin(uu / 37.0) * jnp.cos(vv / 29.0)
X = jnp.stack([(uu - W / 2) / 500.0 * z, (vv - H / 2) / 500.0 * z, z], -1)[None]
X2 = X + jnp.array([0.03, 0.01, 0.02])
D = jnp.asarray(np.random.default_rng(0).standard_normal((1, H, W, 24)), jnp.float32)
D = D / jnp.linalg.norm(D, axis=-1, keepdims=True)
idx0 = jnp.arange(N, dtype=jnp.int32)[None]

SPEED = dict(proj_gate="converged", refine_gate="converged", proj_init="best",
             proj_pre_iters=0, proj_budget_frac=0.0625,
             refine_budget_frac=0.0625, refine_final_radius=1)

fns = {}
for name, dil in (("521", (5, 2, 1)), ("52", (5, 2))):
    fns[name] = jax.jit(lambda a, b, c, d, e, dil=dil: matching.match(
        a, b, c, d, e, refine_subset_dilations=dil, **SPEED))
    out = fns[name](X, X2, D, D, idx0)
    _ = np.asarray(out[0]).ravel()[:1]


def t_once(fn, n=8):
    t0 = time.time()
    for _ in range(n):
        out = fn(X, X2, D, D, idx0)
    _ = np.asarray(out[0]).ravel()[:1]
    return (time.time() - t0) / n


for r in range(5):
    a = t_once(fns["521"])
    b = t_once(fns["52"])
    print(f"round {r}: (5,2,1) {a*1e3:7.2f} ms   (5,2) {b*1e3:7.2f} ms", flush=True)
