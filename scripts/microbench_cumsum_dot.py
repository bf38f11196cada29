"""Fix candidates from the track_compute device profile:
(a) XLA's cumsum lowers as a slow sequential scan (~0.95 ms per compaction);
    a log-doubling shift-add cumsum is 18 cheap passes.
(b) the refine einsum materialises a (N,49,24) f32 intermediate; an
    int8 x int8 -> int32 dot keeps products integral and un-materialised.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = 384 * 512
rng = np.random.default_rng(0)
conv = jnp.asarray(rng.random((1, N)) < 0.9)


def timeit(fn, *args, n1=5, n2=25, reps=3):
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    def run(n):
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        return time.time() - t0
    run(2)
    t1 = min(run(n1) for _ in range(reps))
    t2 = min(run(n2) for _ in range(reps))
    return (t2 - t1) / (n2 - n1)


def cumsum_xla(x):
    return jnp.cumsum(x, axis=-1)


def cumsum_doubling(x):
    n = x.shape[-1]
    s = 1
    while s < n:
        shifted = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(s, 0)])[..., :n]
        x = x + shifted
        s *= 2
    return x


x = (~conv).astype(jnp.int32)
a = jax.jit(cumsum_xla)(x)
b = jax.jit(cumsum_doubling)(x)
print("cumsum equal:", bool(jnp.all(a == b)), flush=True)
print(f"cumsum xla:      {timeit(jax.jit(cumsum_xla), x)*1e3:7.3f} ms", flush=True)
print(f"cumsum doubling: {timeit(jax.jit(cumsum_doubling), x)*1e3:7.3f} ms", flush=True)

# (b) refine scoring dot
Nsel, K, F = 12288, 49, 24
cand = jnp.asarray(rng.integers(-127, 128, (1, Nsel, K, F)), jnp.int8)
d21 = jnp.asarray(rng.integers(-127, 128, (1, Nsel, F)), jnp.int8)

def score_bf16(cand, d21):
    return jnp.einsum("bnkf,bnf->bnk", cand.astype(jnp.bfloat16),
                      d21.astype(jnp.bfloat16), preferred_element_type=jnp.float32)

def score_i32(cand, d21):
    return jax.lax.dot_general(
        cand, d21,
        dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32,
    )

sa = jax.jit(score_bf16)(cand, d21)
sb = jax.jit(score_i32)(cand, d21)
print("argmax agree:", float((jnp.argmax(sa, -1) == jnp.argmax(sb, -1)).mean()), flush=True)
print(f"score bf16:  {timeit(jax.jit(score_bf16), cand, d21)*1e3:7.3f} ms", flush=True)
print(f"score i32:   {timeit(jax.jit(score_i32), cand, d21)*1e3:7.3f} ms", flush=True)

# full-N final level (216-wide rows, K=9)
Kf = 9
candf = jnp.asarray(rng.integers(-127, 128, (1, N, Kf, F)), jnp.int8)
d21f = jnp.asarray(rng.integers(-127, 128, (1, N, F)), jnp.int8)
print(f"finest bf16: {timeit(jax.jit(score_bf16), candf, d21f)*1e3:7.3f} ms", flush=True)
print(f"finest i32:  {timeit(jax.jit(score_i32), candf, d21f)*1e3:7.3f} ms", flush=True)
