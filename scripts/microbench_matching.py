"""Micro-benchmark for the dense-matching ops on the real chip.

Times isolated variants of iter_proj / refine_matches at production shapes
so kernel changes can be evaluated without running the full frame path.
Usage: python scripts/microbench_matching.py [stage ...]
"""

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
F = 24


def timeit(fn, *args, n1=3, n2=9, reps=3):
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]  # compile + fence

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


def make_inputs(seed=0):
    key = jax.random.key(seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    # plausible pointmaps: smooth positive-z surfaces
    uv = jnp.stack(
        jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                     jnp.arange(H, dtype=jnp.float32), indexing="xy"),
        axis=-1,
    )
    z = 2.0 + 0.5 * jnp.sin(uv[..., 0] / 64.0) * jnp.cos(uv[..., 1] / 48.0)
    x = (uv[..., 0] - W / 2) / 300.0 * z
    y = (uv[..., 1] - H / 2) / 300.0 * z
    X11 = jnp.stack([x, y, z], axis=-1)[None]
    X21 = X11 + 0.02 * jax.random.normal(k1, X11.shape)
    D11 = jax.random.normal(k2, (1, H, W, F)).astype(jnp.float32)
    D11 = D11 / jnp.linalg.norm(D11, axis=-1, keepdims=True)
    D21 = jax.random.normal(k3, (1, H, W, F)).astype(jnp.float32)
    D21 = D21 / jnp.linalg.norm(D21, axis=-1, keepdims=True)
    p1 = jnp.stack(
        [jax.random.randint(k4, (1, N), 0, W),
         jax.random.randint(k4, (1, N), 0, H)], axis=-1
    ).astype(jnp.int32)
    return X11, X21, D11, D21, p1


def main(stages):
    X11, X21, D11, D21, p1 = make_inputs()
    rays, tgt, p_init = matching.prep_for_iter_proj(X11, X21, None)
    rays = jax.block_until_ready(rays)

    if not stages or "iter_proj" in stages:
        for mi in (10, 4, 2):
            fn = jax.jit(lambda r, t, p, mi=mi: matching.iter_proj(r, t, p, max_iter=mi))
            dt = timeit(fn, rays, tgt, p_init)
            print(f"iter_proj max_iter={mi}: {dt*1e3:8.2f} ms")
        fn = jax.jit(lambda r, t, p: matching.iter_proj(r, t, p, gate="converged"))
        print(f"iter_proj gated:      {timeit(fn, rays, tgt, p_init)*1e3:8.2f} ms")
        fn = jax.jit(lambda r, t, p: matching.iter_proj(
            r, t, p, gate="converged", p_init_alt=matching.pinhole_init(r, t)))
        print(f"iter_proj gated+best: {timeit(fn, rays, tgt, p_init)*1e3:8.2f} ms")
        fn = jax.jit(matching.pinhole_init)
        print(f"pinhole_init alone:   {timeit(fn, rays, tgt)*1e3:8.2f} ms")

    if not stages or "refine" in stages:
        D21f = D21.reshape(1, N, F)
        fn = jax.jit(lambda a, b, c: matching.refine_matches(a, b, c))
        print(f"refine full pyramid:  {timeit(fn, D11, D21f, p1)*1e3:8.2f} ms")
        for dm in (1, 2, 3):
            fn = jax.jit(lambda a, b, c, dm=dm: matching.refine_matches(a, b, c, dilation_max=dm))
            print(f"refine dilation_max={dm}: {timeit(fn, D11, D21f, p1)*1e3:8.2f} ms")
        conv = jnp.zeros((1, N), bool).at[:, : int(N * 0.9)].set(True)
        for bf in (0.25, 0.125):
            fn = jax.jit(lambda a, b, c, cv, bf=bf: matching.refine_matches_gated(
                a, b, c, cv, budget_frac=bf))
            print(f"refine gated bf={bf}:  {timeit(fn, D11, D21f, p1, conv)*1e3:8.2f} ms")

    if not stages or "match" in stages:
        fn = jax.jit(lambda a, b, c, d: matching.match(a, b, c, d)[0])
        print(f"match() exact:        {timeit(fn, X11, X21, D11, D21)*1e3:8.2f} ms")
        fn = jax.jit(lambda a, b, c, d: matching.match(
            a, b, c, d, proj_gate="converged", proj_init="best",
            refine_gate="converged")[0])
        print(f"match() speed:        {timeit(fn, X11, X21, D11, D21)*1e3:8.2f} ms")


if __name__ == "__main__":
    main(sys.argv[1:])
