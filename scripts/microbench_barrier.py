"""Does materialising the packed gather tables (optimization_barrier) beat
XLA's fused slice-gather (which turns each row into K scattered chunk reads)?
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

H, W, F = 384, 512, 24
N = H * W
radius, d = 3, 1
diam, ncand = 7, 49
max_rd = 15


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


key = jax.random.key(0)
D11q = jax.random.randint(key, (1, H, W, F), -127, 127, jnp.int8)
D21q = jax.random.randint(key, (1, N, F), -127, 127, jnp.int8)
idx = jax.random.randint(key, (1, N), 0, N, jnp.int32)
rays = jax.random.normal(key, (1, H, W, 9), jnp.float32)
tgt = jax.random.normal(key, (1, N, 3), jnp.float32)
Dpad = jnp.pad(D11q, ((0, 0), (max_rd, max_rd), (max_rd, max_rd), (0, 0)))
Dpad = jax.block_until_ready(Dpad)


def build_table(Dpad):
    rd = radius * d
    wins = [
        Dpad[:, max_rd + dy : max_rd + dy + H, max_rd + dx : max_rd + dx + W]
        for dy in range(-rd, rd + 1, d)
        for dx in range(-rd, rd + 1, d)
    ]
    return jnp.stack(wins, axis=3).reshape(1, H * W, ncand * F)


def level(table, idx, D21q, n):
    rows = jnp.take_along_axis(table, idx[..., None], axis=1)
    cand = rows.reshape(1, n, ncand, F)
    s = jnp.einsum("bnkf,bnf->bnk", cand.astype(jnp.bfloat16),
                   D21q.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    return jnp.argmax(s, axis=-1)


@jax.jit
def fused(Dpad, idx, D21q):
    return level(build_table(Dpad), idx, D21q, N)


print(f"level fused:          {timeit(fused, Dpad, idx, D21q)*1e3:8.2f} ms", flush=True)


@jax.jit
def barriered(Dpad, idx, D21q):
    table = jax.lax.optimization_barrier(build_table(Dpad))
    return level(table, idx, D21q, N)


print(f"level barriered:      {timeit(barriered, Dpad, idx, D21q)*1e3:8.2f} ms", flush=True)


@jax.jit
def barriered_small(Dpad, idx, D21q):
    table = jax.lax.optimization_barrier(build_table(Dpad))
    return level(table, idx[:, :24576], D21q[:, :24576], 24576)


print(f"level barrier 24.5k:  {timeit(barriered_small, Dpad, idx, D21q)*1e3:8.2f} ms", flush=True)

# iter_proj-shaped: one table, 10 gathers
from mast3r_slam_tpu.ops.matching import _pack_bilinear_table, _sample_packed

u = jax.random.uniform(key, (1, N), minval=1.0, maxval=W - 2.0)
v = jax.random.uniform(key, (1, N), minval=1.0, maxval=H - 2.0)


@jax.jit
def proj_fused(rays, u, v):
    table = _pack_bilinear_table(rays)
    acc = jnp.zeros((1, N, 9))
    for i in range(10):
        acc = acc + _sample_packed(table, W, u + i * 0.1, v)
    return acc


print(f"10x sample fused:     {timeit(proj_fused, rays, u, v)*1e3:8.2f} ms", flush=True)


@jax.jit
def proj_barrier(rays, u, v):
    table = jax.lax.optimization_barrier(_pack_bilinear_table(rays))
    acc = jnp.zeros((1, N, 9))
    for i in range(10):
        acc = acc + _sample_packed(table, W, u + i * 0.1, v)
    return acc


print(f"10x sample barrier:   {timeit(proj_barrier, rays, u, v)*1e3:8.2f} ms", flush=True)
