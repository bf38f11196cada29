"""Strip-level scoring without the cross-row relayout.

The gathered strip rows are (n*diam, diam*F); reshaping to (n, ncand, F)
merges data ACROSS gathered rows (a real relayout).  Row-local variant:
split each row to (diam, F) in place, repeat D21 per dy, dot, then reshape
the (n*diam, diam) scores — contiguity-preserving throughout.
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
radius, d = 3, 5
diam = 2 * radius + 1
ncand = diam * diam
max_rd = 15
Hp = H + 2 * max_rd
budget = 24576


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
D21q = jax.random.randint(key, (1, budget, F), -127, 127, jnp.int8)
u0 = jax.random.randint(key, (1, budget), 1, W - 1, jnp.int32)
v0 = jax.random.randint(jax.random.key(1), (1, budget), 1, H - 1, jnp.int32)
Dpad = jax.block_until_ready(
    jnp.pad(D11q, ((0, 0), (max_rd, max_rd), (max_rd, max_rd), (0, 0)))
)
doff = jnp.arange(diam, dtype=jnp.int32) - radius


def gather(u0, v0):
    strips = [
        Dpad[:, :, max_rd + dx * d : max_rd + dx * d + W]
        for dx in range(-radius, radius + 1)
    ]
    table = jnp.concatenate(strips, axis=-1).reshape(1, Hp * W, diam * F)
    vp = v0[..., None] + doff[None, None, :] * d + max_rd
    idx = vp * W + u0[..., None]
    return jnp.take_along_axis(table, idx.reshape(1, -1)[..., None], axis=1)


@jax.jit
def strip_cur(u0, v0, D21q):
    rows = gather(u0, v0)
    cand = rows.reshape(1, budget, ncand, F)
    s = jnp.einsum("bnkf,bnf->bnk", cand.astype(jnp.bfloat16),
                   D21q.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    return jnp.argmax(s, axis=-1)


@jax.jit
def strip_rowlocal(u0, v0, D21q):
    rows = gather(u0, v0)                                  # (1, n*diam, diam*F)
    cand = rows.reshape(1, budget * diam, diam, F)         # row-local split
    t = jnp.repeat(D21q, diam, axis=1)                     # (1, n*diam, F)
    s = jnp.einsum("bmkf,bmf->bmk", cand.astype(jnp.bfloat16),
                   t.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    return jnp.argmax(s.reshape(1, budget, ncand), axis=-1)


@jax.jit
def strip_rowlocal_vpu(u0, v0, D21q):
    """Row-local, scored by broadcast-multiply + trailing-F reduce."""
    rows = gather(u0, v0)
    cand = rows.reshape(1, budget * diam, diam, F).astype(jnp.bfloat16)
    t = jnp.repeat(D21q, diam, axis=1).astype(jnp.bfloat16)
    s = jnp.sum(cand * t[:, :, None, :], axis=-1, dtype=jnp.float32)
    return jnp.argmax(s.reshape(1, budget, ncand), axis=-1)


if __name__ == "__main__":
    print(f"strip cur:       {timeit(strip_cur, u0, v0, D21q)*1e3:8.2f} ms", flush=True)
    print(f"strip row-local: {timeit(strip_rowlocal, u0, v0, D21q)*1e3:8.2f} ms", flush=True)
    print(f"strip rl-vpu:    {timeit(strip_rowlocal_vpu, u0, v0, D21q)*1e3:8.2f} ms", flush=True)
    a = np.asarray(strip_cur(u0, v0, D21q))
    print("agree rl :", (a == np.asarray(strip_rowlocal(u0, v0, D21q))).mean(), flush=True)
    print("agree vpu:", (a == np.asarray(strip_rowlocal_vpu(u0, v0, D21q))).mean(), flush=True)
