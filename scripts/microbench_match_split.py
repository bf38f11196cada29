"""Split match() cost: prep / iter_proj / refine, at speed settings."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mast3r_slam_tpu.ops import matching


def timeit(fn, *args, n1=3, n2=9, reps=3):
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
N = H * W
key = jax.random.key(1)
uu, vv = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                      jnp.arange(H, dtype=jnp.float32))
z = 2.0 + 0.4 * jnp.sin(uu / 37.0) * jnp.cos(vv / 29.0)
X = jnp.stack([(uu - W / 2) / 500.0 * z, (vv - H / 2) / 500.0 * z, z], -1)[None]
X2 = X + jnp.array([0.03, 0.01, 0.02])
D = jnp.asarray(np.random.default_rng(0).standard_normal((1, H, W, 24)), jnp.float32)
D = D / jnp.linalg.norm(D, axis=-1, keepdims=True)
idx0 = jnp.arange(N, dtype=jnp.int32)[None]

prep = jax.jit(lambda a, b, i: matching.prep_for_iter_proj(a, b, i))
rays, tgt, p0 = jax.block_until_ready(prep(X, X2, idx0))
print(f"prep:                {timeit(prep, X, X2, idx0)*1e3:7.2f} ms", flush=True)

pin = jax.jit(lambda r, t: matching.pinhole_init(r, t))
p_pin = jax.block_until_ready(pin(rays, tgt))
print(f"pinhole_init:        {timeit(pin, rays, tgt)*1e3:7.2f} ms", flush=True)

ip = jax.jit(lambda r, t, p, pa, e: matching.iter_proj(
    r, t, p, max_iter=10, gate="converged", pre_iters=0, budget_frac=0.0625,
    p_init_alt=pa, extra_img=e))
(p1, conv, xat) = jax.block_until_ready(ip(rays, tgt, p0, p_pin, X))
print(f"iter_proj (speed):   {timeit(ip, rays, tgt, p0, p_pin, X)*1e3:7.2f} ms", flush=True)

# iter_proj with a single init (no 'best' second sample)
ip1 = jax.jit(lambda r, t, p, e: matching.iter_proj(
    r, t, p, max_iter=10, gate="converged", pre_iters=0, budget_frac=0.0625,
    extra_img=e))
print(f"iter_proj (1 init):  {timeit(ip1, rays, tgt, p_pin, X)*1e3:7.2f} ms", flush=True)

p1i = p1.astype(jnp.int32)
D21 = D.reshape(1, N, 24)
for dil in ((5, 2, 1), (5, 2)):
    rg = jax.jit(lambda D11, D21f, p, c, dil=dil: matching.refine_matches_gated(
        D11, D21f, p, c, radius=3, dilation_max=5, budget_frac=0.0625,
        subset_dilations=dil, final_radius=1))
    print(f"refine_gated {dil}: {timeit(rg, D, D21, p1i, conv)*1e3:7.2f} ms", flush=True)
