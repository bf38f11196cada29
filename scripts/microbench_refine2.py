"""Building blocks for the speed-mode refine redesign:

* strip level at the 24k subset: current (N,K,F) einsum vs (K,F,N) layout —
  at subset size the score dot, not the gather, dominates (microbench_score).
* radius-1 finest level at full N: wide-row (9F) gather + both score layouts.
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
radius = 3
diam = 2 * radius + 1
ncand = diam * diam
max_rd = 15
Hp = H + 2 * max_rd
budget = 24576
d = 5


def timeit(fn, *args, n1=5, n2=20, reps=4):
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
D21s = jax.random.randint(key, (1, budget, F), -127, 127, jnp.int8)
D21N = jax.random.randint(key, (1, N, F), -127, 127, jnp.int8)
us = jax.random.randint(key, (1, budget), 1, W - 1, jnp.int32)
vs = jax.random.randint(jax.random.key(1), (1, budget), 1, H - 1, jnp.int32)
uN = jax.random.randint(jax.random.key(2), (1, N), 1, W - 1, jnp.int32)
vN = jax.random.randint(jax.random.key(3), (1, N), 1, H - 1, jnp.int32)
Dpad = jax.block_until_ready(
    jnp.pad(D11q, ((0, 0), (max_rd, max_rd), (max_rd, max_rd), (0, 0)))
)
doff = jnp.arange(diam, dtype=jnp.int32) - radius


def strip_rows(u0, v0):
    strips = [
        Dpad[:, :, max_rd + dx * d : max_rd + dx * d + W]
        for dx in range(-radius, radius + 1)
    ]
    table = jnp.concatenate(strips, axis=-1).reshape(1, Hp * W, diam * F)
    vp = v0[..., None] + doff[None, None, :] * d + max_rd
    idx = vp * W + u0[..., None]
    n = u0.shape[1]
    rows = jnp.take_along_axis(table, idx.reshape(1, -1)[..., None], axis=1)
    return rows.reshape(n, ncand, F)


@jax.jit
def strip_cur(u0, v0, D21):
    cand = strip_rows(u0, v0)[None]
    s = jnp.einsum("bnkf,bnf->bnk", cand.astype(jnp.bfloat16),
                   D21.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    return jnp.argmax(s, axis=-1)


@jax.jit
def strip_kfn(u0, v0, D21):
    cand = strip_rows(u0, v0).transpose(1, 2, 0).astype(jnp.bfloat16)  # (49,24,n)
    t = D21[0].T.astype(jnp.bfloat16)                                  # (24,n)
    s = jnp.sum(cand * t[None], axis=1, dtype=jnp.float32)             # (49,n)
    return jnp.argmax(s, axis=0)[None]


def r1_rows(u0, v0, r):
    dm = 2 * r + 1
    wins = [
        Dpad[:, max_rd + dy : max_rd + dy + H, max_rd + dx : max_rd + dx + W]
        for dy in range(-r, r + 1)
        for dx in range(-r, r + 1)
    ]
    table = jnp.stack(wins, axis=3).reshape(1, H * W, dm * dm * F)
    idx = v0 * W + u0
    rows = jnp.take_along_axis(table, idx[..., None], axis=1)
    return rows.reshape(N, dm * dm, F)


@jax.jit
def r1_cur(u0, v0, D21):
    cand = r1_rows(u0, v0, 1)[None]
    s = jnp.einsum("bnkf,bnf->bnk", cand.astype(jnp.bfloat16),
                   D21.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    return jnp.argmax(s, axis=-1)


@jax.jit
def r1_kfn(u0, v0, D21):
    cand = r1_rows(u0, v0, 1).transpose(1, 2, 0).astype(jnp.bfloat16)
    t = D21[0].T.astype(jnp.bfloat16)
    s = jnp.sum(cand * t[None], axis=1, dtype=jnp.float32)
    return jnp.argmax(s, axis=0)[None]


@jax.jit
def r1_gather_only(u0, v0):
    return jnp.sum(r1_rows(u0, v0, 1).astype(jnp.int32))


if __name__ == "__main__":
    print(f"strip24k cur:    {timeit(strip_cur, us, vs, D21s)*1e3:8.2f} ms", flush=True)
    print(f"strip24k (KFN):  {timeit(strip_kfn, us, vs, D21s)*1e3:8.2f} ms", flush=True)
    print(f"r1 fullN gather: {timeit(r1_gather_only, uN, vN)*1e3:8.2f} ms", flush=True)
    print(f"r1 fullN cur:    {timeit(r1_cur, uN, vN, D21N)*1e3:8.2f} ms", flush=True)
    print(f"r1 fullN (KFN):  {timeit(r1_kfn, uN, vN, D21N)*1e3:8.2f} ms", flush=True)
    a = np.asarray(strip_cur(us, vs, D21s))
    b = np.asarray(strip_kfn(us, vs, D21s))
    print("strip agree:", (a == b).mean(), flush=True)
    a = np.asarray(r1_cur(uN, vN, D21N))
    b = np.asarray(r1_kfn(uN, vN, D21N))
    print("r1 agree:", (a == b).mean(), flush=True)
