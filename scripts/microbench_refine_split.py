"""Decompose refine_matches / gating costs: gather, dot variants, compaction.

Note: a standalone jit that RETURNS the packed window table forces a 231MB
int8 materialisation that XLA otherwise fuses away into the row gather —
never benchmark the table build in isolation.
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
diam, ncand = 7, 49
radius, d = 3, 1
max_rd = 15
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
D21q = jax.random.randint(key, (1, N, F), -127, 127, jnp.int8)
idx = jax.random.randint(key, (1, N), 0, N, jnp.int32)
conv = jax.random.uniform(key, (1, N)) < 0.92  # ~8% unconverged
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


@jax.jit
def level_reduce(Dpad, idx, D21q):
    """Full level, reduce to argmax (current refine_matches shape)."""
    table = build_table(Dpad)
    rows = jnp.take_along_axis(table, idx[..., None], axis=1)
    cand = rows.reshape(1, N, ncand, F)
    s = jnp.einsum("bnkf,bnf->bnk", cand.astype(jnp.int32), D21q.astype(jnp.int32),
                   preferred_element_type=jnp.int32)
    return jnp.argmax(s, axis=-1)


print(f"level int32-cast dot:   {timeit(level_reduce, Dpad, idx, D21q)*1e3:8.2f} ms", flush=True)


@jax.jit
def level_reduce_i8(Dpad, idx, D21q):
    table = build_table(Dpad)
    rows = jnp.take_along_axis(table, idx[..., None], axis=1)
    cand = rows.reshape(1, N, ncand, F)
    s = jnp.einsum("bnkf,bnf->bnk", cand, D21q, preferred_element_type=jnp.int32)
    return jnp.argmax(s, axis=-1)


print(f"level int8-direct dot:  {timeit(level_reduce_i8, Dpad, idx, D21q)*1e3:8.2f} ms", flush=True)


@jax.jit
def level_reduce_bf16(Dpad, idx, D21q):
    table = build_table(Dpad)
    rows = jnp.take_along_axis(table, idx[..., None], axis=1)
    cand = rows.reshape(1, N, ncand, F)
    s = jnp.einsum("bnkf,bnf->bnk", cand.astype(jnp.bfloat16),
                   D21q.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    return jnp.argmax(s, axis=-1)


print(f"level bf16 dot:         {timeit(level_reduce_bf16, Dpad, idx, D21q)*1e3:8.2f} ms", flush=True)


@jax.jit
def level_small(Dpad, idx_s, D21s):
    table = build_table(Dpad)
    rows = jnp.take_along_axis(table, idx_s[..., None], axis=1)
    cand = rows.reshape(1, budget, ncand, F)
    s = jnp.einsum("bnkf,bnf->bnk", cand.astype(jnp.int32), D21s.astype(jnp.int32),
                   preferred_element_type=jnp.int32)
    return jnp.argmax(s, axis=-1)


print(f"level 24.5k rows:       {timeit(level_small, Dpad, idx[:, :budget], D21q[:, :budget])*1e3:8.2f} ms", flush=True)


@jax.jit
def compact_argsort(conv):
    order = jnp.argsort(conv.astype(jnp.int32), axis=-1, stable=True)
    return order[:, :budget]


print(f"compaction argsort:     {timeit(compact_argsort, conv)*1e3:8.2f} ms", flush=True)


@jax.jit
def compact_cumsum(conv):
    unconv = (~conv).astype(jnp.int32)
    rank = jnp.cumsum(unconv, axis=-1) - 1
    pos = jnp.where(unconv == 1, rank, budget)  # budget = out-of-bounds, dropped
    idxs = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), conv.shape)
    base = jnp.broadcast_to(jnp.arange(budget, dtype=jnp.int32), (conv.shape[0], budget))
    return jax.vmap(lambda b, p, i: b.at[p].set(i, mode="drop"))(base, pos, idxs)


print(f"compaction cumsum:      {timeit(compact_cumsum, conv)*1e3:8.2f} ms", flush=True)

a = compact_argsort(conv)
c = compact_cumsum(conv)
sa = np.sort(np.asarray(a[0]))
sc = np.unique(np.asarray(c[0]))
unc = np.asarray(~conv[0]).nonzero()[0]
print("cumsum covers all unconverged:", bool(np.isin(unc, np.asarray(c[0])).all()), flush=True)
