"""Two-view pointmap ViT (MASt3R-class) — pure-JAX, TPU-first.

Architecture replicated from the reference stack (capability, not code):
  * siamese ViT-L encoder, 24 blocks, RoPE100
    (/root/reference/thirdparty/mast3r/dust3r/dust3r/model.py:127-139)
  * dual 12-block cross-attention decoder collecting all intermediates
    (dust3r/model.py:171-196)
  * DPT pts3d+conf head and catMLP 24-D local-descriptor head
    (/root/reference/thirdparty/mast3r/mast3r/catmlp_dpt_head.py:42-123)
  * exp-depth / exp-conf / L2-desc postprocess
    (dust3r/dust3r/heads/postprocess.py:22-58)

TPU design: stacked block params + lax.scan, bf16 trunk / f32 heads, fully
batched symmetric decode (the reference loops Python-side over the batch,
mast3r_utils.py:88-107 — here one batched program).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from . import dpt as dpt_mod
from ..utils.numerics import vnorm, vnormalize
from .layers import (
    decoder_block,
    encoder_block,
    init_decoder_block,
    init_encoder_block,
    init_layer_norm,
    init_linear,
    layer_norm,
    linear,
    mlp,
    rope2d_tables,
    stack_params,
)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    patch_size: int = 16
    enc_embed_dim: int = 1024
    enc_depth: int = 24
    enc_num_heads: int = 16
    dec_embed_dim: int = 768
    dec_depth: int = 12
    dec_num_heads: int = 12
    mlp_ratio: int = 4
    rope_base: float = 100.0
    desc_dim: int = 24
    feature_dim: int = 256  # DPT internal dim
    layer_dims: Tuple[int, int, int, int] = (96, 192, 384, 768)
    conf_offset: float = 1.0       # conf_mode=('exp', 1, inf)
    desc_conf_offset: float = 0.0  # desc_conf_mode=('exp', 0, inf)
    dtype: Any = jnp.bfloat16      # trunk compute dtype
    head_dtype: Any = jnp.float32  # DPT/MLP head dtype (reference pins f32,
                                   # mast3r_utils.py:36-39; bf16 is a perf
                                   # knob pending real-ATE validation)
    head_store_dtype: Any = None   # storage dtype of head matmul/conv weights
                                   # ("auto" = bf16 on TPU, f32 on CPU; None
                                   # disables). bf16 is bitwise IDENTICAL on
                                   # TPU (XLA's DEFAULT f32 dot/conv precision
                                   # truncates BOTH operands to bf16 in the
                                   # MXU; max|diff| 0.0 for the DPT convs AND
                                   # the 7168x6400 fc2 dot) and wins standalone
                                   # (fc2 0.54 -> 0.36 ms), but LOSES ~3 ms in
                                   # the full dec+heads program — confirmed in
                                   # two sessions (bench 35.8 -> 39.1 ms):
                                   # mixed-dtype weights flip XLA's layout/
                                   # fusion choices for the worse. Keep f32.
    scan_unroll: int = 1           # lax.scan unroll factor for block stacks
    enc_loop: str = "python"       # "python" | "scan" encoder block stack.
                                   # lax.scan dynamic-slices (COPIES) its
                                   # stacked ViT-L weights every trip — the
                                   # profiler shows ~1.5 ms/run of pure weight
                                   # copying; a python loop over static
                                   # leading-axis slices reads them in place
                                   # (enc 6.5 -> 5.2 ms, all A/B rounds,
                                   # scripts/microbench_pyloop.py)
    dec_loop: str = "python"       # python loop wins ~0.6 ms avg in the full
                                   # dec+heads program (weight copies again;
                                   # smaller effect than the encoder's —
                                   # 768-dim weights are 3x smaller)
    attn_impl: str = "xla"         # "xla" | "fused" (Pallas on-chip softmax;
                                   # same f32-softmax numerics, no HBM logits)

    @property
    def head_dim_enc(self):
        return self.enc_embed_dim // self.enc_num_heads

    @property
    def head_dim_dec(self):
        return self.dec_embed_dim // self.dec_num_heads

    def grid(self, img_hw):
        return (img_hw[0] // self.patch_size, img_hw[1] // self.patch_size)


# scan_unroll=12 divides both depths; unrolled block stacks let XLA pipeline
# weight prefetch with compute (measured: encoder -23%, decoder -14% on v5e)
VIT_LARGE = ModelConfig(scan_unroll=12)
# Tiny trunk for tests; DPT dims stay at reference defaults because the
# reference head is not scaled with trunk size (catmlp_dpt_head.py:104-113).
VIT_TINY_TEST = ModelConfig(
    enc_embed_dim=64, enc_depth=2, enc_num_heads=2,
    dec_embed_dim=48, dec_depth=12, dec_num_heads=4,
    dtype=jnp.float32,
)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _resolve_head_store_dtype(cfg: ModelConfig):
    hs = cfg.head_store_dtype
    if isinstance(hs, str) and hs == "auto":  # opt-in: TPU-only fast path
        plat = jax.devices()[0].platform
        return jnp.bfloat16 if plat in ("tpu", "axon") else None
    return hs


def cast_head_weights(params, cfg: ModelConfig) -> Dict[str, Any]:
    """Store head matmul/conv weights in the resolved head-store dtype.

    Halves ~630 MB of per-frame head weight traffic at ViT-L (two DPT +
    two 1792->7168->6400 local-MLP heads).  Only "w" leaves are cast;
    biases stay f32 and every use site upcasts to the f32 compute dtype
    (``conv2d``/``linear`` compute in ``x.dtype``), so on TPU — where the
    MXU truncates f32 dot/conv operands to bf16 regardless — results are
    bitwise identical to f32 storage.  Idempotent.
    """
    dt = _resolve_head_store_dtype(cfg)
    if dt is None:
        return params

    def cast_tree(tree):
        def go(path, leaf):
            keys = [p.key for p in path if hasattr(p, "key")]
            if keys and keys[-1] == "w":
                return leaf.astype(dt)
            return leaf

        return jax.tree_util.tree_map_with_path(go, tree)

    out = dict(params)
    for k in ("head1", "head2"):
        if k in out:
            out[k] = cast_tree(out[k])
    return out


def cast_trunk_params(params, cfg: ModelConfig) -> Dict[str, Any]:
    """Store trunk matmul weights in the trunk compute dtype.

    ``linear`` computes in ``x.dtype`` (bf16 in the trunk), so the f32 master
    weights were being re-read from HBM and cast on every block — ~2 GB of
    weight traffic per tracked frame at ViT-L.  Storing them pre-cast halves
    that traffic with bitwise-identical results (same f32->bf16 rounding,
    applied once instead of per use).  Layer-norm parameters and biases stay
    f32 (`layer_norm` computes in f32; bias adds are epilogue-fused).
    Head COMPUTE stays f32 (reference pins f32 heads, mast3r_utils.py:36-39);
    head weight STORAGE follows ``cast_head_weights`` (free on TPU).
    """
    params = cast_head_weights(params, cfg)
    if cfg.dtype == jnp.float32:
        return params

    def cast_tree(tree):
        def go(path, leaf):
            keys = [p.key for p in path if hasattr(p, "key")]
            if keys and keys[-1] == "w" and not any(
                k.startswith("norm") for k in keys
            ):
                return leaf.astype(cfg.dtype)
            return leaf

        return jax.tree_util.tree_map_with_path(go, tree)

    out = dict(params)
    for k in ("patch_embed", "enc_blocks", "decoder_embed", "dec_blocks", "dec_blocks2"):
        out[k] = cast_tree(params[k])
    return out


def init_params(key, cfg: ModelConfig = VIT_LARGE) -> Dict[str, Any]:
    ks = jax.random.split(key, 12)
    P = cfg.patch_size

    def head(key):
        k1, k2, k3 = jax.random.split(key, 3)
        idim = cfg.enc_embed_dim + cfg.dec_embed_dim
        out_feat = (cfg.desc_dim + 1) * P * P  # +1: desc_conf (two_confs)
        return {
            "dpt": dpt_mod.init_dpt(
                k1,
                (cfg.enc_embed_dim, cfg.dec_embed_dim, cfg.dec_embed_dim, cfg.dec_embed_dim),
                layer_dims=cfg.layer_dims,
                feature_dim=cfg.feature_dim,
                last_dim=cfg.feature_dim // 2,
                num_channels=4,
            ),
            "local_mlp": {
                "fc1": init_linear(k2, idim, 4 * idim),
                "fc2": init_linear(k3, 4 * idim, out_feat),
            },
        }

    return cast_trunk_params({
        "patch_embed": {
            "w": jax.random.normal(ks[0], (P * P * 3, cfg.enc_embed_dim)) * 0.02,
            "b": jnp.zeros((cfg.enc_embed_dim,), dtype=jnp.float32),
        },
        "enc_blocks": stack_params(
            [
                init_encoder_block(k, cfg.enc_embed_dim, cfg.mlp_ratio)
                for k in jax.random.split(ks[1], cfg.enc_depth)
            ]
        ),
        "enc_norm": init_layer_norm(cfg.enc_embed_dim),
        "decoder_embed": init_linear(ks[2], cfg.enc_embed_dim, cfg.dec_embed_dim),
        "dec_blocks": stack_params(
            [
                init_decoder_block(k, cfg.dec_embed_dim, cfg.mlp_ratio)
                for k in jax.random.split(ks[3], cfg.dec_depth)
            ]
        ),
        "dec_blocks2": stack_params(
            [
                init_decoder_block(k, cfg.dec_embed_dim, cfg.mlp_ratio)
                for k in jax.random.split(ks[4], cfg.dec_depth)
            ]
        ),
        "dec_norm": init_layer_norm(cfg.dec_embed_dim),
        "head1": head(ks[5]),
        "head2": head(ks[6]),
    }, cfg)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def patch_positions(batch: int, grid_hw) -> jnp.ndarray:
    """(B, N, 2) integer (y, x) positions, row-major token order."""
    nh, nw = grid_hw
    y = jnp.arange(nh, dtype=jnp.int32)
    x = jnp.arange(nw, dtype=jnp.int32)
    yy, xx = jnp.meshgrid(y, x, indexing="ij")
    pos = jnp.stack([yy.reshape(-1), xx.reshape(-1)], axis=-1)
    return jnp.broadcast_to(pos, (batch, nh * nw, 2))


def patchify(img, patch_size: int):
    """(B, 3, H, W) -> (B, N, P*P*3) with (dy, dx, c) intra-patch order."""
    B, C, H, W = img.shape
    P = patch_size
    x = img.transpose(0, 2, 3, 1)  # NHWC
    x = x.reshape(B, H // P, P, W // P, P, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, nh, nw, P, P, C)
    return x.reshape(B, (H // P) * (W // P), P * P * C)


@partial(jax.jit, static_argnames=("cfg",))
def encode_image(params, cfg: ModelConfig, img):
    """img (B, 3, H, W) normalized to [-1, 1] -> (feat (B, N, D) f32, pos).

    Reference call stack: dust3r/model.py:127-139 (_encode_image).

    jitted like the other inference entry points — r3's system device
    profile caught the ENGINE running the encoder EAGERLY (hundreds of op
    dispatches per frame; bench.py had masked it by wrapping its own jit).
    """
    B, _, H, W = img.shape
    grid = cfg.grid((H, W))
    x = patchify(img.astype(cfg.dtype), cfg.patch_size)
    x = linear(params["patch_embed"], x)
    pos = patch_positions(B, grid)
    rope_cs = rope2d_tables(pos, cfg.head_dim_enc, cfg.rope_base)

    if cfg.enc_loop == "python":
        for i in range(cfg.enc_depth):
            bp = jax.tree.map(lambda a: a[i], params["enc_blocks"])
            x = encoder_block(bp, x, rope_cs, cfg.enc_num_heads, cfg.attn_impl)
    else:
        def step(h, bp):
            return encoder_block(
                bp, h, rope_cs, cfg.enc_num_heads, cfg.attn_impl
            ), None

        x, _ = jax.lax.scan(step, x, params["enc_blocks"], unroll=cfg.scan_unroll)
    x = layer_norm(params["enc_norm"], x)
    return x.astype(jnp.float32), pos


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def decode(params, cfg: ModelConfig, feat1, pos1, feat2, pos2):
    """Dual-branch cross-attention decode (dust3r/model.py:171-191).

    Returns per-branch hook tokens: (enc_out, y_h6, y_h9, y_final_normed),
    each f32, where hooks follow dpt hooks_idx=[0, 6, 9, 12]
    (catmlp_dpt_head.py:115).
    """
    f1 = linear(params["decoder_embed"], feat1.astype(cfg.dtype))
    f2 = linear(params["decoder_embed"], feat2.astype(cfg.dtype))
    rope1 = rope2d_tables(pos1, cfg.head_dim_dec, cfg.rope_base)
    rope2 = rope2d_tables(pos2, cfg.head_dim_dec, cfg.rope_base)

    if cfg.dec_loop == "python":
        l1, l2 = [], []
        for i in range(cfg.dec_depth):
            b1 = jax.tree.map(lambda a: a[i], params["dec_blocks"])
            b2 = jax.tree.map(lambda a: a[i], params["dec_blocks2"])
            nf1 = decoder_block(
                b1, f1, f2, rope1, rope2, cfg.dec_num_heads, cfg.attn_impl
            )
            nf2 = decoder_block(
                b2, f2, f1, rope2, rope1, cfg.dec_num_heads, cfg.attn_impl
            )
            f1, f2 = nf1, nf2
            l1.append(nf1)
            l2.append(nf2)
        ys1, ys2 = l1, l2  # list-indexed below exactly like the scanned stack
    else:
        blocks = {"b1": params["dec_blocks"], "b2": params["dec_blocks2"]}

        def step(carry, bp):
            f1, f2 = carry
            nf1 = decoder_block(
                bp["b1"], f1, f2, rope1, rope2, cfg.dec_num_heads, cfg.attn_impl
            )
            nf2 = decoder_block(
                bp["b2"], f2, f1, rope2, rope1, cfg.dec_num_heads, cfg.attn_impl
            )
            return (nf1, nf2), (nf1, nf2)

        (_, _), (ys1, ys2) = jax.lax.scan(
            step, (f1, f2), blocks, unroll=cfg.scan_unroll
        )

    # hooks [0, 6, 9, 12] over [enc, blk1..blk12]; only the last is dec-normed
    h6_1, h9_1 = ys1[5].astype(jnp.float32), ys1[8].astype(jnp.float32)
    h6_2, h9_2 = ys2[5].astype(jnp.float32), ys2[8].astype(jnp.float32)
    hf_1 = layer_norm(params["dec_norm"], ys1[-1]).astype(jnp.float32)
    hf_2 = layer_norm(params["dec_norm"], ys2[-1]).astype(jnp.float32)
    return (feat1, h6_1, h9_1, hf_1), (feat2, h6_2, h9_2, hf_2)


# ---------------------------------------------------------------------------
# heads + postprocess
# ---------------------------------------------------------------------------

def _pixel_shuffle_tokens(tok, grid_hw, P: int, C: int):
    """(B, N, P*P*C) pixel-major tokens -> (B, H, W, C) pixel map.

    Semantics of torch F.pixel_shuffle after the (B,S,D)->(B,D,h,w) reshape
    (catmlp_dpt_head.py:78-81), but with the fc2 output columns stored in
    (py, px, c) order instead of torch's channel-major (c, py, px): the
    un-shuffle transpose then moves contiguous P*C-element runs instead of
    gathering stride-P*P scalars (~0.6 ms/frame on v5e,
    scripts/microbench_shuffle.py). The checkpoint converter permutes fc2's
    columns to match (models/convert.py), which is numerically exact — each
    fc2 output column is an independent dot product.
    """
    nh, nw = grid_hw
    B, N, _ = tok.shape
    x = tok.reshape(B, nh, nw, P, P, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, nh, P, nw, P, C)
    return x.reshape(B, nh * P, nw * P, C)


def head_forward(head_params, cfg: ModelConfig, hook_tokens, grid_hw):
    """DPT + local-feature head -> raw (B, H, W, 4 + desc_dim + 1) f32 map."""
    hd = cfg.head_dtype
    hook_tokens = [t.astype(hd) for t in hook_tokens]
    pts_conf = dpt_mod.dpt_forward(head_params["dpt"], list(hook_tokens), grid_hw, 4)

    enc_out, _, _, dec_out = hook_tokens
    cat = jnp.concatenate([enc_out, dec_out], axis=-1)
    local = mlp(head_params["local_mlp"], cat)  # (B, N, (desc+1)*P*P)
    local_map = _pixel_shuffle_tokens(
        local, grid_hw, cfg.patch_size, cfg.desc_dim + 1
    )
    return jnp.concatenate([pts_conf, local_map], axis=-1).astype(jnp.float32)


def postprocess(raw, cfg: ModelConfig):
    """Raw head map -> (X, C, D, Q).

    X: (B, H, W, 3) pointmap    dir * expm1(|xyz|)   (postprocess.py:22-46)
    C: (B, H, W) confidence     1 + exp              (postprocess.py:49-58)
    D: (B, H, W, desc) unit descriptors              (catmlp head reg_desc)
    Q: (B, H, W) descriptor confidence
    """
    xyz = raw[..., 0:3]
    d = vnorm(xyz)  # VPU-exact (utils.numerics)
    X = xyz / jnp.maximum(d, 1e-8) * jnp.expm1(d)
    C = cfg.conf_offset + jnp.exp(raw[..., 3])
    desc = raw[..., 4 : 4 + cfg.desc_dim]
    D = vnormalize(desc)
    Q = cfg.desc_conf_offset + jnp.exp(raw[..., 4 + cfg.desc_dim])
    return X, C, D, Q


# ---------------------------------------------------------------------------
# inference entry points (mirror mast3r_utils.py:55-242 semantics)
# ---------------------------------------------------------------------------

def _decode_and_heads(params, cfg, feat1, pos1, feat2, pos2, grid):
    hooks1, hooks2 = decode(params, cfg, feat1, pos1, feat2, pos2)
    raw1 = head_forward(params["head1"], cfg, hooks1, grid)
    raw2 = head_forward(params["head2"], cfg, hooks2, grid)
    return postprocess(raw1, cfg), postprocess(raw2, cfg)


@partial(jax.jit, static_argnames=("cfg", "grid_hw"))
def inference_asymmetric(params, cfg: ModelConfig, feat_i, pos_i, feat_j, pos_j,
                         grid_hw):
    """One-direction two-view inference: predicts (Xii, Cii, Dii, Qii) and
    (Xji, Cji, Dji, Qji) — j's geometry in i's frame (mast3r_utils.py:183-206).

    grid_hw must be a static (nh, nw) tuple.
    """
    return _decode_and_heads(params, cfg, feat_i, pos_i, feat_j, pos_j, grid_hw)


@partial(jax.jit, static_argnames=("cfg", "grid_hw"))
def inference_symmetric(params, cfg: ModelConfig, feat_i, pos_i, feat_j, pos_j,
                        grid_hw):
    """Both directions in ONE batched decoder call.

    Where the reference loops per pair and per direction
    (mast3r_decode_symmetric_batch, mast3r_utils.py:83-115), we stack
    [i->(i,j), j->(j,i)] into a single 2B batch — the TPU win called out in
    SURVEY.md §2.4 item 3.

    Returns ((Xii, Cii, Dii, Qii), (Xji, Cji, Dji, Qji),
             (Xjj, Cjj, Djj, Qjj), (Xij, Cij, Dij, Qij)).
    """
    featA = jnp.concatenate([feat_i, feat_j], axis=0)
    posA = jnp.concatenate([pos_i, pos_j], axis=0)
    featB = jnp.concatenate([feat_j, feat_i], axis=0)
    posB = jnp.concatenate([pos_j, pos_i], axis=0)
    (XA, CA, DA, QA), (XB, CB, DB, QB) = _decode_and_heads(
        params, cfg, featA, posA, featB, posB, grid_hw
    )
    B = feat_i.shape[0]
    res_ii = (XA[:B], CA[:B], DA[:B], QA[:B])
    res_jj = (XA[B:], CA[B:], DA[B:], QA[B:])
    res_ji = (XB[:B], CB[:B], DB[:B], QB[:B])
    res_ij = (XB[B:], CB[B:], DB[B:], QB[B:])
    return res_ii, res_ji, res_jj, res_ij


@partial(jax.jit, static_argnames=("cfg", "grid_hw"))
def inference_mono(params, cfg: ModelConfig, feat, pos, grid_hw):
    """(I, I) decoder pass for canonical pointmap init/reloc
    (mast3r_utils.py:118-139).

    Only the pointmap + confidence are consumed (mast3r_utils.py:135-139),
    so the local-descriptor MLP head (the costliest single op in dec+heads)
    and the second view's heads are skipped — identical X, C.
    """
    hooks1, _ = decode(params, cfg, feat, pos, feat, pos)
    hd = cfg.head_dtype
    pts_conf = dpt_mod.dpt_forward(
        params["head1"]["dpt"], [t.astype(hd) for t in hooks1], grid_hw, 4
    ).astype(jnp.float32)
    xyz = pts_conf[..., 0:3]
    d = vnorm(xyz)  # VPU-exact (utils.numerics)
    X = xyz / jnp.maximum(d, 1e-8) * jnp.expm1(d)
    C = cfg.conf_offset + jnp.exp(pts_conf[..., 3])
    return X, C
