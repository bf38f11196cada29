"""A/B the LayerNorm statistics implementation inside the full ViT-L encoder.

Motivation: the encoder device profile (2026-08-20, profile_stages.py enc)
shows 98 `convert_reduce_fusion` events totalling 2.21 ms of the 5.1 ms
program — 43% of encoder device time is LN mean/var reductions, ~0.076 ms
for the expensive one in each block.  Reductions over the minor (lane)
axis run on the VPU; the TPU trick is to reduce with an MXU dot against a
ones vector instead.

Variants (all reduce over the last axis d of (B, N, d) f32):
  twopass   mu = mean(x); var = mean((x-mu)^2)          [current]
  onepass   mu = mean(x); var = mean(x*x) - mu^2        [cancellation risk]
  dot2      mu = (x @ 1)/d; var = ((x-mu)^2 @ 1)/d      [exact math of
            twopass up to sum order; both reductions on the MXU]
  dot1      s = [x, x*x] @ 1 in ONE dot via feature concat; var = s2-mu^2

Run on the TPU in ONE process; interleaved timing, deltas only.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mast3r_slam_tpu.models import layers as L
from mast3r_slam_tpu.models import mast3r as M

LN_EPS = L.LN_EPS


def ln_twopass(p, x):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + LN_EPS)
    y = y * p["w"] + p["b"]
    return y.astype(x.dtype)


def ln_onepass(p, x):
    xf = x.astype(jnp.float32)
    d = xf.shape[-1]
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    m2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = jnp.maximum(m2 - mu * mu, 0.0)
    y = (xf - mu) * jax.lax.rsqrt(var + LN_EPS)
    y = y * p["w"] + p["b"]
    return y.astype(x.dtype)


def ln_dot2(p, x):
    """Both reductions as MXU dots.  precision=HIGHEST is mandatory for
    correctness on TPU: DEFAULT truncates the f32 operands to bf16 in the
    MXU, giving ~1e-3 LN drift instead of sum-reorder noise (ADVICE r2)."""
    xf = x.astype(jnp.float32)
    d = xf.shape[-1]
    ones = jnp.ones((d, 1), jnp.float32)
    hi = jax.lax.Precision.HIGHEST
    mu = jnp.matmul(xf, ones, precision=hi) / d
    c = xf - mu
    var = jnp.matmul(c * c, ones, precision=hi) / d
    y = c * jax.lax.rsqrt(var + LN_EPS)
    y = y * p["w"] + p["b"]
    return y.astype(x.dtype)


def ln_dot2_default(p, x):
    """dot2 at DEFAULT precision — perf reference only: numerically WRONG on
    TPU (bf16-truncated operands), printed drift vs twopass quantifies it."""
    xf = x.astype(jnp.float32)
    d = xf.shape[-1]
    ones = jnp.ones((d, 1), jnp.float32)
    mu = (xf @ ones) / d
    c = xf - mu
    var = ((c * c) @ ones) / d
    y = c * jax.lax.rsqrt(var + LN_EPS)
    y = y * p["w"] + p["b"]
    return y.astype(x.dtype)


def ln_dot1(p, x):
    xf = x.astype(jnp.float32)
    d = xf.shape[-1]
    ones = jnp.ones((d, 1), jnp.float32)
    s = jnp.concatenate([xf, xf * xf], axis=-1) @ jnp.concatenate(
        [jnp.concatenate([ones, jnp.zeros((d, 1), jnp.float32)]),
         jnp.concatenate([jnp.zeros((d, 1), jnp.float32), ones])], axis=1
    )  # (B, N, 2): [sum x, sum x^2]
    mu = s[..., 0:1] / d
    var = jnp.maximum(s[..., 1:2] / d - mu * mu, 0.0)
    y = (xf - mu) * jax.lax.rsqrt(var + LN_EPS)
    y = y * p["w"] + p["b"]
    return y.astype(x.dtype)


VARIANTS = {
    "twopass": ln_twopass,
    "onepass": ln_onepass,
    "dot2": ln_dot2,
    "dot2_def": ln_dot2_default,
    "dot1": ln_dot1,
}


def main():
    H, W = 384, 512
    cfg = M.VIT_LARGE
    params = M.init_params(jax.random.key(0), cfg)
    img = jax.random.normal(jax.random.key(1), (1, 3, H, W), jnp.float32) * 0.5

    fns = {}
    for name, impl in VARIANTS.items():
        def make(impl):
            def run(p, im):
                # patch BOTH namespaces: mast3r.py binds layer_norm by
                # `from .layers import layer_norm`, so patching only L
                # leaves the final enc_norm (mast3r.py:291) on the old
                # form (ADVICE r2)
                old_l, old_m = L.layer_norm, M.layer_norm
                L.layer_norm = M.layer_norm = impl
                try:
                    out = M.encode_image(p, cfg, im)[0]
                finally:
                    L.layer_norm, M.layer_norm = old_l, old_m
                return out
            return jax.jit(run)
        fns[name] = make(impl)

    # compile + numerics check vs twopass
    outs = {}
    for name, fn in fns.items():
        t0 = time.time()
        outs[name] = np.asarray(fn(params, img))
        print(f"{name}: compile+first {time.time()-t0:.1f}s", flush=True)
    for name in VARIANTS:
        d = np.max(np.abs(outs[name] - outs["twopass"]))
        print(f"max|{name} - twopass| = {d:.3e}", flush=True)

    def time_fn(fn, n):
        t0 = time.time()
        for _ in range(n):
            out = fn(params, img)
        _ = np.asarray(out).ravel()[:1]
        return time.time() - t0

    for fn in fns.values():
        time_fn(fn, 3)  # warm

    # interleaved rounds, differential timing
    n1, n2, rounds = 4, 12, 4
    res = {k: [] for k in fns}
    for r in range(rounds):
        for name, fn in fns.items():
            t1 = time_fn(fn, n1)
            t2 = time_fn(fn, n2)
            res[name].append((t2 - t1) / (n2 - n1) * 1e3)
    print("\nencoder ms/iter (median over interleaved rounds):")
    for name, ts in res.items():
        print(f"  {name:8s} {np.median(ts):6.2f} ms   runs={['%.2f'%t for t in ts]}",
              flush=True)


if __name__ == "__main__":
    main()
