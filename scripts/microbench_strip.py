"""Dissect the strip-table coarse refine level (gated path) on the chip.

One level at dilation d on a `budget`-pixel subset: strip-table build ->
diam-row gather -> dot -> argmax, plus variants (F padded to 32 lanes,
int32 dot, gather-only) to find where the time goes.
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


def strips_table(Dpad, F_out):
    strips = [
        Dpad[:, :, max_rd + dx * d : max_rd + dx * d + W]
        for dx in range(-radius, radius + 1)
    ]
    t = jnp.concatenate(strips, axis=-1)
    if F_out != F:
        t = jnp.pad(t.reshape(1, Hp, W, diam, F),
                    ((0, 0),) * 4 + ((0, F_out - F),)).reshape(1, Hp, W, diam * F_out)
    return t.reshape(1, Hp * W, diam * F_out)


def gather_rows(table, u0, v0):
    vp = v0[..., None] + doff[None, None, :] * d + max_rd
    idx = vp * W + u0[..., None]
    return jnp.take_along_axis(table, idx.reshape(1, -1)[..., None], axis=1)


@jax.jit
def gather_only(Dpad, u0, v0):
    rows = gather_rows(strips_table(Dpad, F), u0, v0)
    return jnp.sum(rows.astype(jnp.int32))


@jax.jit
def level_bf16(Dpad, u0, v0, D21q):
    rows = gather_rows(strips_table(Dpad, F), u0, v0)
    cand = rows.reshape(1, budget, ncand, F)
    s = jnp.einsum("bnkf,bnf->bnk", cand.astype(jnp.bfloat16),
                   D21q.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    return jnp.argmax(s, axis=-1)


@jax.jit
def level_bf16_pad32(Dpad, u0, v0, D21q):
    F2 = 32
    rows = gather_rows(strips_table(Dpad, F2), u0, v0)
    cand = rows.reshape(1, budget, ncand, F2)
    D21p = jnp.pad(D21q, ((0, 0), (0, 0), (0, F2 - F)))
    s = jnp.einsum("bnkf,bnf->bnk", cand.astype(jnp.bfloat16),
                   D21p.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    return jnp.argmax(s, axis=-1)


@jax.jit
def level_i32(Dpad, u0, v0, D21q):
    rows = gather_rows(strips_table(Dpad, F), u0, v0)
    cand = rows.reshape(1, budget, ncand, F)
    s = jnp.einsum("bnkf,bnf->bnk", cand.astype(jnp.int32),
                   D21q.astype(jnp.int32), preferred_element_type=jnp.int32)
    return jnp.argmax(s, axis=-1)


@jax.jit
def level_bf16_mat(Dpad, u0, v0, D21q):
    """Strip level with the table MATERIALISED (optimization_barrier):
    the gather then reads contiguous 168B rows instead of 7 fused 24B
    strided chunks per row."""
    table = jax.lax.optimization_barrier(strips_table(Dpad, F))
    rows = gather_rows(table, u0, v0)
    cand = rows.reshape(1, budget, ncand, F)
    s = jnp.einsum("bnkf,bnf->bnk", cand.astype(jnp.bfloat16),
                   D21q.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    return jnp.argmax(s, axis=-1)


def _widerow(Dpad, u0, v0, D21q, materialise, nrows=None):
    rd = radius * d
    wins = [
        Dpad[:, max_rd + dy : max_rd + dy + H, max_rd + dx : max_rd + dx + W]
        for dy in range(-rd, rd + 1, d)
        for dx in range(-rd, rd + 1, d)
    ]
    table = jnp.stack(wins, axis=3).reshape(1, H * W, ncand * F)
    if materialise:
        table = jax.lax.optimization_barrier(table)
    idx = v0 * W + u0
    rows = jnp.take_along_axis(table, idx[..., None], axis=1)
    n = idx.shape[1]
    cand = rows.reshape(1, n, ncand, F)
    s = jnp.einsum("bnkf,bnf->bnk", cand.astype(jnp.bfloat16),
                   D21q.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    return jnp.argmax(s, axis=-1)


widerow_level = jax.jit(lambda Dp, u, v, D2: _widerow(Dp, u, v, D2, False))
widerow_level_mat = jax.jit(lambda Dp, u, v, D2: _widerow(Dp, u, v, D2, True))


if __name__ == "__main__":
    print(f"strip gather-only:   {timeit(gather_only, Dpad, u0, v0)*1e3:8.2f} ms", flush=True)
    print(f"strip level bf16:    {timeit(level_bf16, Dpad, u0, v0, D21q)*1e3:8.2f} ms", flush=True)
    print(f"strip level pad32:   {timeit(level_bf16_pad32, Dpad, u0, v0, D21q)*1e3:8.2f} ms", flush=True)
    print(f"strip level i32:     {timeit(level_i32, Dpad, u0, v0, D21q)*1e3:8.2f} ms", flush=True)
    print(f"strip level MAT:     {timeit(level_bf16_mat, Dpad, u0, v0, D21q)*1e3:8.2f} ms", flush=True)
    print(f"widerow level (old): {timeit(widerow_level, Dpad, u0, v0, D21q)*1e3:8.2f} ms", flush=True)
    print(f"widerow level MAT:   {timeit(widerow_level_mat, Dpad, u0, v0, D21q)*1e3:8.2f} ms", flush=True)

    # full-N finest level with materialised table (refine d=1 candidate)
    uN = jax.random.randint(jax.random.key(2), (1, N), 1, W - 1, jnp.int32)
    vN = jax.random.randint(jax.random.key(3), (1, N), 1, H - 1, jnp.int32)
    D21N = jax.random.randint(key, (1, N, F), -127, 127, jnp.int8)
    fullN = jax.jit(lambda Dp, u, v, D2: _widerow(Dp, u, v, D2, False))
    fullN_mat = jax.jit(lambda Dp, u, v, D2: _widerow(Dp, u, v, D2, True))
    print(f"widerow full-N:      {timeit(fullN, Dpad, uN, vN, D21N)*1e3:8.2f} ms", flush=True)
    print(f"widerow full-N MAT:  {timeit(fullN_mat, Dpad, uN, vN, D21N)*1e3:8.2f} ms", flush=True)
