"""Fused scaled-dot-product attention (Pallas, TPU).

The trunk's attention is small (N <= ~800 tokens, head_dim 64): the whole
per-head problem — q, k, v and the (N, N) f32 logits — fits in VMEM at once.
The XLA lowering materialises the f32 logits and the softmaxed weights in
HBM between the two matmuls (~38 MB per ViT-L block at 768 tokens), which is
pure bandwidth waste; this kernel keeps the entire softmax(QKᵀ)V dataflow
on-chip.  One grid step per (batch, head).

Not a flash/streaming implementation on purpose: at N=768 the logits tile is
2.4 MB — far under VMEM — so tiling would only add overhead.  Numerics match
``ops/attention.sdpa_xla`` (f32 logits, max-subtracted f32 softmax, bf16
weights matmul): the reference computes attention under fp16 autocast with
fp32 softmax inside torch SDPA (blocks.py:81-112), so both paths sit at or
above the reference's precision.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sdpa_xla(q, k, v):
    """Reference XLA path. q, k, v: (B, H, N, D); softmax in f32."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
    w = jax.nn.softmax(logits * scale, axis=-1).astype(v.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", w, v)


def _fused_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    logits = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    logits = logits * scale
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    w = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = jax.lax.dot_general(
        w.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=())
def sdpa_fused(q, k, v):
    """Fused on-chip attention. q: (B, H, N, D), k/v: (B, H, M, D)."""
    B, H, N, D = q.shape
    M = k.shape[2]
    scale = D ** -0.5
    qf = q.reshape(B * H, N, D)
    kf = k.reshape(B * H, M, D)
    vf = v.reshape(B * H, M, D)
    out = pl.pallas_call(
        functools.partial(_fused_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B * H, N, D), q.dtype),
        grid=(B * H,),
        in_specs=[
            pl.BlockSpec((1, N, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, M, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, M, D), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, N, D), lambda i: (i, 0, 0)),
    )(qf, kf, vf)
    return out.reshape(B, H, N, D)


def sdpa(q, k, v, impl: str = "xla"):
    if impl == "fused":
        return sdpa_fused(q, k, v)
    return sdpa_xla(q, k, v)
