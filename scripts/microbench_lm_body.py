"""Where does the iter_proj LM iteration cost go (gather vs math vs carry)?"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mast3r_slam_tpu.ops.matching import (
    _lm_body, _pack_bilinear_table, _ray_err, _sample_packed,
)

H, W = 384, 512
N = H * W


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
rays = jax.random.normal(key, (1, H, W, 9), jnp.float32)
tgt = jax.random.normal(key, (1, N, 3), jnp.float32)
tgt = tgt / jnp.linalg.norm(tgt, axis=-1, keepdims=True)
u0 = jax.random.uniform(key, (1, N), minval=1.0, maxval=W - 2.0)
v0 = jax.random.uniform(key, (1, N), minval=1.0, maxval=H - 2.0)


@jax.jit
def full10(rays, tgt, u, v):
    table = _pack_bilinear_table(rays)
    lam = jnp.full(u.shape, 1e-8)
    conv = jnp.zeros(u.shape, bool)
    err, cost, gx, gy = _ray_err(_sample_packed(table, W, u, v), tgt)
    body = _lm_body(table, W, H, tgt, 1e-6)
    state = (u, v, lam, conv, err, cost, gx, gy)
    out = jax.lax.fori_loop(0, 10, body, state)
    return out[0]


print(f"10 iters fori_loop:     {timeit(full10, rays, tgt, u0, v0)*1e3:8.2f} ms", flush=True)


@jax.jit
def full10_unrolled(rays, tgt, u, v):
    table = _pack_bilinear_table(rays)
    lam = jnp.full(u.shape, 1e-8)
    conv = jnp.zeros(u.shape, bool)
    err, cost, gx, gy = _ray_err(_sample_packed(table, W, u, v), tgt)
    body = _lm_body(table, W, H, tgt, 1e-6)
    state = (u, v, lam, conv, err, cost, gx, gy)
    for i in range(10):
        state = body(i, state)
    return state[0]


print(f"10 iters unrolled:      {timeit(full10_unrolled, rays, tgt, u0, v0)*1e3:8.2f} ms", flush=True)


@jax.jit
def math_only10(rays, tgt, u, v):
    """Same body but sampling replaced by a fixed (already-gathered) sample:
    isolates the non-gather cost."""
    table = _pack_bilinear_table(rays)
    fixed = _sample_packed(table, W, u, v)

    lam = jnp.full(u.shape, 1e-8)
    conv = jnp.zeros(u.shape, bool)
    err, cost, gx, gy = _ray_err(fixed, tgt)

    def body(_, state):
        u, v, lam, conv, err, cost, gx, gy = state
        A00 = jnp.sum(gx * gx, axis=-1) + lam
        A01 = jnp.sum(gx * gy, axis=-1)
        A11 = jnp.sum(gy * gy, axis=-1) + lam
        b0 = -jnp.sum(err * gx, axis=-1)
        b1 = -jnp.sum(err * gy, axis=-1)
        det = A00 * A11 - A01 * A01
        det_inv = jnp.where(det == 0, 0.0, 1.0 / det)
        du = det_inv * (A11 * b0 - A01 * b1)
        dv = det_inv * (-A01 * b0 + A00 * b1)
        u_new = jnp.clip(u + du, 1.0, W - 2.0)
        v_new = jnp.clip(v + dv, 1.0, H - 2.0)
        n_err, n_cost, n_gx, n_gy = _ray_err(
            fixed + u_new[..., None] * 1e-9, tgt
        )
        accept = n_cost < cost
        acc1 = accept[..., None]
        u = jnp.where(accept, u_new, u)
        v = jnp.where(accept, v_new, v)
        lam = jnp.where(accept, lam * 0.1, lam * 10.0)
        conv = jnp.where(accept, n_cost < 1e-6, cost < 1e-6)
        err = jnp.where(acc1, n_err, err)
        gx = jnp.where(acc1, n_gx, gx)
        gy = jnp.where(acc1, n_gy, gy)
        cost = jnp.where(accept, n_cost, cost)
        return u, v, lam, conv, err, cost, gx, gy

    state = (u, v, lam, conv, err, cost, gx, gy)
    out = jax.lax.fori_loop(0, 10, body, state)
    return out[0]


print(f"10 iters math-only:     {timeit(math_only10, rays, tgt, u0, v0)*1e3:8.2f} ms", flush=True)


@jax.jit
def gather_only10(rays, tgt, u, v):
    table = _pack_bilinear_table(rays)

    def body(i, acc):
        s = _sample_packed(table, W, u + i * 0.01, v)
        return acc + s[..., 0]

    return jax.lax.fori_loop(0, 10, body, jnp.zeros_like(u))


print(f"10 gathers fori_loop:   {timeit(gather_only10, rays, tgt, u0, v0)*1e3:8.2f} ms", flush=True)
