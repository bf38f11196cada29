"""DPT dense-prediction head, NHWC / MXU-friendly.

Re-design of the reference DPT stack
(/root/reference/thirdparty/mast3r/dust3r/croco/models/dpt_block.py and
dust3r/heads/dpt_head.py): 4 hook tokens -> reassemble convs -> 4 fused
refinement stages -> regression head.  TPU-specific choices:

* all convs run NHWC (`lax.conv_general_dilated` with NHWC/HWIO), the
  native TPU layout;
* k==stride transposed convs (4x4 s4 and 2x2 s2 reassembly) are expressed as
  a matmul + pixel-shuffle reshape — exact, and it lands on the MXU instead
  of a scatter;
* align_corners=True bilinear x2 upsampling is expressed as two small
  interpolation-matrix matmuls (einsum over H then W) — again MXU work,
  bit-matching torch's align_corners semantics;
* the whole head runs f32 (reference disables autocast for heads,
  mast3r_utils.py:36-39).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# conv primitives (NHWC)
# ---------------------------------------------------------------------------

def conv2d(p, x, stride: int = 1, padding: int = 0):
    """x (B, H, W, Cin) -> (B, H', W', Cout); weight stored HWIO."""
    y = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def conv_transpose_same_k_s(p, x, k: int):
    """ConvTranspose2d with kernel==stride: matmul + depth-to-space.

    weight stored as (Cin, k*k*Cout) so y[b, i*k+di, j*k+dj, o]
    = sum_c x[b,i,j,c] w[c, (di*k+dj)*Cout + o].
    """
    B, H, W, Cin = x.shape
    w = p["w"].astype(x.dtype)
    Cout = w.shape[1] // (k * k)
    y = x @ w  # (B, H, W, k*k*Cout)
    y = y.reshape(B, H, W, k, k, Cout)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(B, H * k, W * k, Cout)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


@lru_cache(maxsize=64)
def _interp_matrix_ac(n_out: int, n_in: int) -> np.ndarray:
    """align_corners=True bilinear interpolation matrix (n_out, n_in)."""
    A = np.zeros((n_out, n_in), dtype=np.float32)
    if n_in == 1:
        A[:, 0] = 1.0
        return A
    src = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    i0 = np.floor(src).astype(np.int64)
    i0 = np.clip(i0, 0, n_in - 2)
    frac = src - i0
    A[np.arange(n_out), i0] = 1.0 - frac
    A[np.arange(n_out), i0 + 1] = frac
    return A


def upsample2x_align_corners(x):
    """(B, H, W, C) -> (B, 2H, 2W, C), torch bilinear align_corners=True."""
    B, H, W, C = x.shape
    Ah = jnp.asarray(_interp_matrix_ac(2 * H, H), dtype=x.dtype)
    Aw = jnp.asarray(_interp_matrix_ac(2 * W, W), dtype=x.dtype)
    y = jnp.einsum("oh,bhwc->bowc", Ah, x)
    return jnp.einsum("pw,bowc->bopc", Aw, y)


# ---------------------------------------------------------------------------
# DPT blocks
# ---------------------------------------------------------------------------

def residual_conv_unit(p, x):
    """relu-conv-relu-conv with skip (dpt_block.py:80-140, bn=False)."""
    out = jax.nn.relu(x)
    out = conv2d(p["conv1"], out, stride=1, padding=1)
    out = jax.nn.relu(out)
    out = conv2d(p["conv2"], out, stride=1, padding=1)
    return out + x


def feature_fusion_block(p, x, res=None):
    """Fusion stage: optional skip-merge, refine, x2 upsample, 1x1 conv.

    (dpt_block.py:144-213, deconv=False, expand=False, align_corners=True).
    The reference order is upsample -> 1x1 out_conv; a 1x1 conv is a
    per-pixel channel map and bilinear interpolation is a convex (rows sum
    to 1) spatial map on each channel, so they commute EXACTLY (incl. the
    bias) — applying out_conv before the x2 upsample computes the same
    function on 1/4 the pixels (saves ~3/4 of its MACs and a full-res
    256-ch intermediate per stage).
    """
    if res is not None:
        x = x + residual_conv_unit(p["res1"], res)
    x = residual_conv_unit(p["res2"], x)
    x = conv2d(p["out_conv"], x, stride=1, padding=0)
    return upsample2x_align_corners(x)


def dpt_forward(p, hook_tokens, grid_hw, num_channels: int):
    """Run the DPT adapter.

    hook_tokens: list of 4 token arrays (B, N, C_hook) at the configured
    hooks; grid_hw: (nh, nw) static patch-grid size.  Returns
    (B, H, W, num_channels) where H = nh*16, W = nw*16.
    Mirrors DPTOutputAdapter_fix.forward (dust3r/heads/dpt_head.py:34-65).
    """
    nh, nw = grid_hw

    def to_map(tok):
        B, N, C = tok.shape
        return tok.reshape(B, nh, nw, C)

    l1, l2, l3, l4 = [to_map(t) for t in hook_tokens]

    # reassemble to 4 scales (act_postprocess, dpt_block.py:355-414)
    l1 = conv2d(p["act1"]["conv"], l1)               # 1x1 -> 96
    l1 = conv_transpose_same_k_s(p["act1"]["convt"], l1, 4)   # x4
    l2 = conv2d(p["act2"]["conv"], l2)               # 1x1 -> 192
    l2 = conv_transpose_same_k_s(p["act2"]["convt"], l2, 2)   # x2
    l3 = conv2d(p["act3"]["conv"], l3)               # 1x1 -> 384
    l4 = conv2d(p["act4"]["conv"], l4)               # 1x1 -> 768
    l4 = conv2d(p["act4"]["conv2"], l4, stride=2, padding=1)  # /2

    # project to feature_dim=256 (scratch.layer_rn, 3x3 no-bias convs)
    l1 = conv2d(p["rn1"], l1, padding=1)
    l2 = conv2d(p["rn2"], l2, padding=1)
    l3 = conv2d(p["rn3"], l3, padding=1)
    l4 = conv2d(p["rn4"], l4, padding=1)

    # fusion pyramid with crop-to-skip (dpt_head.py:56-60)
    path4 = feature_fusion_block(p["refine4"], l4)
    path4 = path4[:, : l3.shape[1], : l3.shape[2], :]
    path3 = feature_fusion_block(p["refine3"], path4, l3)
    path3 = path3[:, : l2.shape[1], : l2.shape[2], :]
    path2 = feature_fusion_block(p["refine2"], path3, l2)
    path2 = path2[:, : l1.shape[1], : l1.shape[2], :]
    path1 = feature_fusion_block(p["refine1"], path2, l1)

    # regression head (dpt_block.py:318-325)
    out = conv2d(p["head"]["conv1"], path1, padding=1)
    out = upsample2x_align_corners(out)
    out = conv2d(p["head"]["conv2"], out, padding=1)
    out = jax.nn.relu(out)
    out = conv2d(p["head"]["conv3"], out)
    return out  # (B, H, W, num_channels)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _kaiming_conv(key, kh, kw, cin, cout):
    fan_in = kh * kw * cin
    a = (1.0 / fan_in) ** 0.5 * (3.0**0.5)  # torch default kaiming_uniform(a=sqrt(5)) approx
    return jax.random.uniform(key, (kh, kw, cin, cout), jnp.float32, -a, a)


def init_conv(key, kh, kw, cin, cout, bias=True):
    p = {"w": _kaiming_conv(key, kh, kw, cin, cout)}
    if bias:
        p["b"] = jnp.zeros((cout,), dtype=jnp.float32)
    return p


def init_conv_t(key, cin, cout, k):
    return {
        "w": jax.random.normal(key, (cin, k * k * cout)) * 0.02,
        "b": jnp.zeros((cout,), dtype=jnp.float32),
    }


def init_rcu(key, c):
    k1, k2 = jax.random.split(key)
    return {"conv1": init_conv(k1, 3, 3, c, c), "conv2": init_conv(k2, 3, 3, c, c)}


def init_fusion(key, c):
    ks = jax.random.split(key, 3)
    return {
        "res1": init_rcu(ks[0], c),
        "res2": init_rcu(ks[1], c),
        "out_conv": init_conv(ks[2], 1, 1, c, c),
    }


def init_dpt(key, dim_tokens, layer_dims=(96, 192, 384, 768), feature_dim=256,
             last_dim=128, num_channels=4):
    """dim_tokens: per-hook token dims, e.g. (1024, 768, 768, 768)."""
    ks = jax.random.split(key, 16)
    d1, d2, d3, d4 = layer_dims
    return {
        "act1": {
            "conv": init_conv(ks[0], 1, 1, dim_tokens[0], d1),
            "convt": init_conv_t(ks[1], d1, d1, 4),
        },
        "act2": {
            "conv": init_conv(ks[2], 1, 1, dim_tokens[1], d2),
            "convt": init_conv_t(ks[3], d2, d2, 2),
        },
        "act3": {"conv": init_conv(ks[4], 1, 1, dim_tokens[2], d3)},
        "act4": {
            "conv": init_conv(ks[5], 1, 1, dim_tokens[3], d4),
            "conv2": init_conv(ks[6], 3, 3, d4, d4),
        },
        "rn1": init_conv(ks[7], 3, 3, d1, feature_dim, bias=False),
        "rn2": init_conv(ks[8], 3, 3, d2, feature_dim, bias=False),
        "rn3": init_conv(ks[9], 3, 3, d3, feature_dim, bias=False),
        "rn4": init_conv(ks[10], 3, 3, d4, feature_dim, bias=False),
        "refine1": init_fusion(ks[11], feature_dim),
        "refine2": init_fusion(ks[12], feature_dim),
        "refine3": init_fusion(ks[13], feature_dim),
        "refine4": init_fusion(ks[14], feature_dim),
        "head": {
            "conv1": init_conv(ks[15], 3, 3, feature_dim, feature_dim // 2),
            "conv2": init_conv(ks[15], 3, 3, feature_dim // 2, last_dim),
            "conv3": init_conv(ks[15], 1, 1, last_dim, num_channels),
        },
    }
