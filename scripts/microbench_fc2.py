"""The local-MLP fc2 dot (768x7168 @ 7168x6400, f32) is the single
costliest op in dec+heads (profiler: 1.4 + 0.9 ms for the two heads).
Measure dot variants and their numerics vs the DEFAULT f32 dot."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n1=20, n2=120, reps=3):
    out = fn(*args)
    _ = np.asarray(out).ravel()[:1]

    def run(n):
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        _ = np.asarray(out).ravel()[:1]
        return time.time() - t0

    run(1)
    t1 = min(run(n1) for _ in range(reps))
    t2 = min(run(n2) for _ in range(reps))
    return (t2 - t1) / (n2 - n1)


M_, K, N_ = 768, 7168, 6400
x = jax.random.normal(jax.random.key(0), (M_, K), jnp.float32)
w = jax.random.normal(jax.random.key(1), (K, N_), jnp.float32) * 0.02
w_bf = w.astype(jnp.bfloat16)

f_def = jax.jit(lambda x, w: x @ w)
f_hi = jax.jit(lambda x, w: jax.lax.dot_general(
    x, w, (((1,), (0,)), ((), ())), precision=jax.lax.Precision.HIGHEST))
f_bf = jax.jit(lambda x, w: jax.lax.dot_general(
    x.astype(jnp.bfloat16), w, (((1,), (0,)), ((), ())),
    preferred_element_type=jnp.float32))

y_def = f_def(x, w)
y_hi = f_hi(x, w)
y_bf = f_bf(x, w_bf)
scale = float(jnp.max(jnp.abs(y_def)))
print(f"default vs both-bf16 max|diff|: {float(jnp.max(jnp.abs(y_def - y_bf))):.3e} (scale {scale:.2e})", flush=True)
print(f"default vs HIGHEST   max|diff|: {float(jnp.max(jnp.abs(y_def - y_hi))):.3e}", flush=True)

print(f"f32 DEFAULT:   {timeit(f_def, x, w)*1e3:7.3f} ms", flush=True)
print(f"f32 HIGHEST:   {timeit(f_hi, x, w)*1e3:7.3f} ms", flush=True)
print(f"bf16 x bf16:   {timeit(f_bf, x, w_bf)*1e3:7.3f} ms", flush=True)
print(f"mixed f32@bf16:{timeit(jax.jit(lambda a, b: a @ b.astype(a.dtype)), x, w_bf)*1e3:7.3f} ms", flush=True)
