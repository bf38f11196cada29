"""Decompose the refine level: gather vs score-dot vs argmax, and try
lane-friendly scoring layouts.

microbench_strip.py showed the row gather is ~1.0 ms while the full level
is 2.3 ms (24k px) / 8.9 ms (full N): the einsum+argmax dominate.  The
(N, 49, 24) layout reduces over a 24-wide minormost dim (24 of 128 lanes
used); these variants move N (or 49) into the lane dim.
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
diam = 2 * radius + 1
ncand = diam * diam
max_rd = 15


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
u0 = jax.random.randint(key, (1, N), 1, W - 1, jnp.int32)
v0 = jax.random.randint(jax.random.key(1), (1, N), 1, H - 1, jnp.int32)
Dpad = jax.block_until_ready(
    jnp.pad(D11q, ((0, 0), (max_rd, max_rd), (max_rd, max_rd), (0, 0)))
)


def build_table(Dpad):
    rd = radius * d
    wins = [
        Dpad[:, max_rd + dy : max_rd + dy + H, max_rd + dx : max_rd + dx + W]
        for dy in range(-rd, rd + 1, d)
        for dx in range(-rd, rd + 1, d)
    ]
    return jnp.stack(wins, axis=3).reshape(1, H * W, ncand * F)


def gather_rows(u0, v0):
    table = build_table(Dpad)
    idx = v0 * W + u0
    return jnp.take_along_axis(table, idx[..., None], axis=1)  # (1, N, 49F)


@jax.jit
def g_only(u0, v0):
    return jnp.sum(gather_rows(u0, v0).astype(jnp.int32))


@jax.jit
def level_cur(u0, v0, D21q):
    """Current refine_matches scoring."""
    cand = gather_rows(u0, v0).reshape(1, N, ncand, F)
    s = jnp.einsum("bnkf,bnf->bnk", cand.astype(jnp.bfloat16),
                   D21q.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    return jnp.argmax(s, axis=-1)


@jax.jit
def score_noargmax(u0, v0, D21q):
    cand = gather_rows(u0, v0).reshape(1, N, ncand, F)
    s = jnp.einsum("bnkf,bnf->bnk", cand.astype(jnp.bfloat16),
                   D21q.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    return jnp.sum(s)


@jax.jit
def level_tr(u0, v0, D21q):
    """Score in (K, F, N) layout: N in lanes, reduce over sublane F."""
    rows = gather_rows(u0, v0).reshape(N, ncand, F)  # B=1
    c = rows.transpose(1, 2, 0).astype(jnp.bfloat16)          # (49, 24, N)
    t = D21q.reshape(N, F).T.astype(jnp.bfloat16)             # (24, N)
    s = jnp.sum(c * t[None], axis=1, dtype=jnp.float32)       # (49, N)
    return jnp.argmax(s, axis=0)[None]


@jax.jit
def level_tr_nof32(u0, v0, D21q):
    rows = gather_rows(u0, v0).reshape(N, ncand, F)
    c = rows.transpose(1, 2, 0).astype(jnp.bfloat16)
    t = D21q.reshape(N, F).T.astype(jnp.bfloat16)
    s = jnp.sum(c * t[None], axis=1)                          # bf16 accum
    return jnp.argmax(s, axis=0)[None]


@jax.jit
def level_kn(u0, v0, D21q):
    """(N, K) scores via one multiply-reduce in (N, F, K)?  keep K minor."""
    rows = gather_rows(u0, v0).reshape(N, ncand, F)
    c = rows.transpose(0, 2, 1).astype(jnp.bfloat16)          # (N, 24, 49)
    t = D21q.reshape(N, F).astype(jnp.bfloat16)               # (N, 24)
    s = jnp.sum(c * t[:, :, None], axis=1, dtype=jnp.float32)  # (N, 49)
    return jnp.argmax(s, axis=-1)[None]


@jax.jit
def level_i8_tr(u0, v0, D21q):
    """int8 multiply in i32 accumulate, (49, 24, N) layout."""
    rows = gather_rows(u0, v0).reshape(N, ncand, F)
    c = rows.transpose(1, 2, 0)
    t = D21q.reshape(N, F).T
    s = jnp.sum(c.astype(jnp.int32) * t[None].astype(jnp.int32), axis=1)
    return jnp.argmax(s, axis=0)[None]


@jax.jit
def argmax_only(s):
    return jnp.argmax(s, axis=-1)


@jax.jit
def level_mxu(u0, v0, D21q):
    """MXU block trick: per 128-px tile, (128*49, F) @ (F, 128) then take
    the matching column per row — 128x redundant FLOPs, all on the MXU."""
    P = 128
    T = N // P
    rows = gather_rows(u0, v0).reshape(T, P * ncand, F).astype(jnp.bfloat16)
    t = D21q.reshape(T, P, F).astype(jnp.bfloat16)
    s = jax.lax.dot_general(
        rows, t,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (T, P*49, P)
    s = s.reshape(T, P, ncand, P)
    diag = jnp.einsum("tpkp->tpk", s)  # take matching pixel column
    return jnp.argmax(diag, axis=-1).reshape(1, N)


if __name__ == "__main__":
    print(f"gather only:        {timeit(g_only, u0, v0)*1e3:8.2f} ms", flush=True)
    print(f"level current:      {timeit(level_cur, u0, v0, D21q)*1e3:8.2f} ms", flush=True)
    print(f"score no-argmax:    {timeit(score_noargmax, u0, v0, D21q)*1e3:8.2f} ms", flush=True)
    print(f"level (K,F,N):      {timeit(level_tr, u0, v0, D21q)*1e3:8.2f} ms", flush=True)
    print(f"level (K,F,N) bf16: {timeit(level_tr_nof32, u0, v0, D21q)*1e3:8.2f} ms", flush=True)
    print(f"level (N,F,K):      {timeit(level_kn, u0, v0, D21q)*1e3:8.2f} ms", flush=True)
    print(f"level i8 (K,F,N):   {timeit(level_i8_tr, u0, v0, D21q)*1e3:8.2f} ms", flush=True)
    print(f"level MXU blockdiag:{timeit(level_mxu, u0, v0, D21q)*1e3:8.2f} ms", flush=True)
    s = jax.block_until_ready(
        jax.random.normal(key, (1, N, ncand), jnp.float32))
    print(f"argmax only:        {timeit(argmax_only, s)*1e3:8.2f} ms", flush=True)
    # agreement
    a = np.asarray(level_cur(u0, v0, D21q))
    for name, fn in [("tr", level_tr), ("kn", level_kn), ("i8", level_i8_tr),
                     ("mxu", level_mxu)]:
        b = np.asarray(fn(u0, v0, D21q))
        print(f"agree {name}: {(a == b).mean():.4f}", flush=True)
