"""Transformer primitives for the MASt3R-class two-view ViT, pure-jnp.

TPU-first re-design of the reference blocks
(/root/reference/thirdparty/mast3r/dust3r/croco/models/blocks.py and
pos_embed.py:112-159):

* params are plain nested dicts of jnp arrays; identical blocks are STACKED
  along a leading depth axis and driven by ``lax.scan`` — one compiled block
  body instead of 24 inlined ones (fast compile, same MXU throughput).
* linear weights are stored (in, out) so application is a single ``x @ w``.
* RoPE2D is a closed-form cos/sin table computed from the (y, x) patch grid —
  replaces the reference's cuRoPE2D CUDA kernel
  (croco/models/curope/kernels.cu) with fused VPU elementwise math.
* compute dtype is a parameter: trunk runs bf16 on the MXU, heads run f32
  (mirrors the reference's autocast-off heads, mast3r_utils.py:36-39).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..ops.attention import sdpa

LN_EPS = 1e-6  # croco.py:33 norm_layer eps


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

# How LN mean/var are reduced.  The encoder device profile (2026-08-20)
# showed the VPU lane-reductions of the default two-pass form costing 2.2 ms
# of the 5.1 ms ViT-L encode (98 convert_reduce_fusion events); "dot" moves
# both reductions onto the MXU via a ones-vector matmul — same math as the
# two-pass form up to f32 summation order (centered second pass: no
# cancellation risk).  Module-level switch (not a threaded arg) because
# layer_norm has 30+ call sites; set it BEFORE tracing/jit (engine reads
# engine.ln_stats at model build).  See scripts/microbench_ln.py.
LN_STATS = "twopass"


def set_ln_stats(impl: str):
    global LN_STATS
    assert impl in ("twopass", "dot"), impl
    LN_STATS = impl


def layer_norm(p, x):
    """LayerNorm over the last axis; params/statistics in f32."""
    xf = x.astype(jnp.float32)
    if LN_STATS == "dot":
        d = xf.shape[-1]
        ones = jnp.ones((d, 1), jnp.float32)
        # precision=HIGHEST: TPU DEFAULT-precision f32 dots truncate operands
        # to bf16 in the MXU (see CLAUDE.md perf rules), which would give
        # ~1e-3 LN drift — NOT sum-reorder noise.  HIGHEST keeps true-f32
        # accumulation via the MXU multi-pass scheme; whether that still
        # beats the VPU two-pass reduction is what scripts/microbench_ln.py
        # measures on device.
        hi = jax.lax.Precision.HIGHEST
        mu = jnp.matmul(xf, ones, precision=hi) / d
        c = xf - mu
        var = jnp.matmul(c * c, ones, precision=hi) / d
        y = c * jax.lax.rsqrt(var + LN_EPS)
    else:
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + LN_EPS)
    y = y * p["w"] + p["b"]
    return y.astype(x.dtype)


def linear(p, x):
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def mlp(p, x):
    h = jax.nn.gelu(linear(p["fc1"], x), approximate=False)
    return linear(p["fc2"], h)


# ---------------------------------------------------------------------------
# RoPE2D
# ---------------------------------------------------------------------------

def rope2d_tables(pos, head_dim: int, base: float = 100.0, dtype=jnp.float32):
    """cos/sin tables for 2D rotary embedding.

    pos: (B, N, 2) integer (y, x) patch coordinates.
    Returns (cos, sin): each (B, N, head_dim) laid out as
    [y-half: d/4 freqs twice | x-half: d/4 freqs twice] matching the
    reference split-half scheme (pos_embed.py:137-159).
    """
    d_half = head_dim // 2
    n_freq = d_half // 2
    inv_freq = 1.0 / (base ** (jnp.arange(n_freq, dtype=jnp.float32) * 2.0 / d_half))
    ang_y = pos[..., 0:1].astype(jnp.float32) * inv_freq  # (B, N, n_freq)
    ang_x = pos[..., 1:2].astype(jnp.float32) * inv_freq
    ang = jnp.concatenate([ang_y, ang_y, ang_x, ang_x], axis=-1)  # (B, N, head_dim)
    return jnp.cos(ang).astype(dtype), jnp.sin(ang).astype(dtype)


def _rotate_half_per_half(x):
    """rotate_half applied independently to the y-half and x-half."""
    d = x.shape[-1]
    q = d // 4
    x1, x2, x3, x4 = (
        x[..., :q],
        x[..., q : 2 * q],
        x[..., 2 * q : 3 * q],
        x[..., 3 * q :],
    )
    return jnp.concatenate([-x2, x1, -x4, x3], axis=-1)


def apply_rope2d(tokens, cos, sin):
    """tokens: (B, H, N, D); cos/sin: (B, N, D) broadcast over heads."""
    c = cos[:, None, :, :].astype(tokens.dtype)
    s = sin[:, None, :, :].astype(tokens.dtype)
    return tokens * c + _rotate_half_per_half(tokens) * s


# ---------------------------------------------------------------------------
# attention
# ---------------------------------------------------------------------------

def _split_heads(x, num_heads):
    B, N, C = x.shape
    return x.reshape(B, N, num_heads, C // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x):
    B, H, N, D = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, N, H * D)


def self_attention(p, x, rope_cs, num_heads: int, attn_impl: str = "xla"):
    """Fused-qkv self-attention with RoPE on q, k (blocks.py:81-112)."""
    B, N, C = x.shape
    qkv = linear(p["qkv"], x).reshape(B, N, 3, num_heads, C // num_heads)
    qkv = qkv.transpose(2, 0, 3, 1, 4)  # (3, B, H, N, D)
    q, k, v = qkv[0], qkv[1], qkv[2]
    if rope_cs is not None:
        cos, sin = rope_cs
        q = apply_rope2d(q, cos, sin)
        k = apply_rope2d(k, cos, sin)
    out = _merge_heads(sdpa(q, k, v, attn_impl))
    return linear(p["proj"], out)


def cross_attention(p, x, mem, rope_q, rope_k, num_heads: int,
                    attn_impl: str = "xla"):
    """Cross-attention, separate q/k/v projections (blocks.py:132-169)."""
    q = _split_heads(linear(p["q"], x), num_heads)
    k = _split_heads(linear(p["k"], mem), num_heads)
    v = _split_heads(linear(p["v"], mem), num_heads)
    if rope_q is not None:
        q = apply_rope2d(q, *rope_q)
    if rope_k is not None:
        k = apply_rope2d(k, *rope_k)
    out = _merge_heads(sdpa(q, k, v, attn_impl))
    return linear(p["proj"], out)


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------

def encoder_block(p, x, rope_cs, num_heads: int, attn_impl: str = "xla"):
    x = x + self_attention(
        p["attn"], layer_norm(p["norm1"], x), rope_cs, num_heads, attn_impl
    )
    x = x + mlp(p["mlp"], layer_norm(p["norm2"], x))
    return x


def decoder_block(p, x, y, rope_x, rope_y, num_heads: int, attn_impl: str = "xla"):
    """Self-attn -> cross-attn over (normed) memory y -> MLP (blocks.py:171-193)."""
    x = x + self_attention(
        p["attn"], layer_norm(p["norm1"], x), rope_x, num_heads, attn_impl
    )
    y_ = layer_norm(p["norm_y"], y)
    x = x + cross_attention(
        p["cross_attn"], layer_norm(p["norm2"], x), y_, rope_x, rope_y,
        num_heads, attn_impl,
    )
    x = x + mlp(p["mlp"], layer_norm(p["norm3"], x))
    return x


# ---------------------------------------------------------------------------
# parameter initialisation (matches reference init for from-scratch runs)
# ---------------------------------------------------------------------------

def _xavier(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[1]
    a = (6.0 / (fan_in + fan_out)) ** 0.5
    return jax.random.uniform(key, shape, dtype, -a, a)


def init_linear(key, d_in, d_out, bias=True):
    p = {"w": _xavier(key, (d_in, d_out))}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype=jnp.float32)
    return p


def init_layer_norm(dim):
    return {"w": jnp.ones((dim,), dtype=jnp.float32), "b": jnp.zeros((dim,), dtype=jnp.float32)}


def init_mlp(key, dim, hidden):
    k1, k2 = jax.random.split(key)
    return {"fc1": init_linear(k1, dim, hidden), "fc2": init_linear(k2, hidden, dim)}


def init_encoder_block(key, dim, mlp_ratio=4):
    ks = jax.random.split(key, 4)
    return {
        "norm1": init_layer_norm(dim),
        "attn": {
            "qkv": init_linear(ks[0], dim, 3 * dim),
            "proj": init_linear(ks[1], dim, dim),
        },
        "norm2": init_layer_norm(dim),
        "mlp": init_mlp(ks[2], dim, dim * mlp_ratio),
    }


def init_decoder_block(key, dim, mlp_ratio=4):
    ks = jax.random.split(key, 8)
    return {
        "norm1": init_layer_norm(dim),
        "attn": {
            "qkv": init_linear(ks[0], dim, 3 * dim),
            "proj": init_linear(ks[1], dim, dim),
        },
        "norm2": init_layer_norm(dim),
        "norm3": init_layer_norm(dim),
        "norm_y": init_layer_norm(dim),
        "cross_attn": {
            "q": init_linear(ks[2], dim, dim),
            "k": init_linear(ks[3], dim, dim),
            "v": init_linear(ks[4], dim, dim),
            "proj": init_linear(ks[5], dim, dim),
        },
        "mlp": init_mlp(ks[6], dim, dim * mlp_ratio),
    }


def stack_params(param_list):
    """List of identical pytrees -> one pytree with leading depth axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *param_list)
