"""PyTorch MASt3R checkpoint -> JAX param pytree converter.

Maps the reference state-dict layout (AsymmetricMASt3R, see
/root/reference/thirdparty/mast3r/mast3r/model.py:21-37 for the loader and
dust3r/model.py:92-99 for the dec_blocks2 duplication rule) onto the stacked
param tree produced by :func:`mast3r_slam_tpu.models.mast3r.init_params`.

Layout transforms applied here once, so apply-side code is pure matmul:
  linear  (O, I)        -> (I, O)
  conv    (O, I, kh, kw)-> (kh, kw, I, O)   [HWIO]
  convT   (I, O, k, k)  -> (I, k*k*O)       [matmul + depth-to-space]
  patch   (D, 3, P, P)  -> (P*P*3, D)       [(dy, dx, c) patch order]
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np
import jax.numpy as jnp

from .mast3r import ModelConfig, VIT_LARGE


def _t(sd, k):
    return np.asarray(sd[k], dtype=np.float32)


def _linear(sd, prefix, bias=True):
    p = {"w": jnp.asarray(_t(sd, prefix + ".weight").T)}
    if bias:
        p["b"] = jnp.asarray(_t(sd, prefix + ".bias"))
    return p


def _conv(sd, prefix, bias=True):
    w = _t(sd, prefix + ".weight")  # (O, I, kh, kw)
    p = {"w": jnp.asarray(w.transpose(2, 3, 1, 0))}
    if bias:
        p["b"] = jnp.asarray(_t(sd, prefix + ".bias"))
    return p


def _conv_t(sd, prefix):
    w = _t(sd, prefix + ".weight")  # (I, O, k, k)
    cin, cout, k, _ = w.shape
    p = {"w": jnp.asarray(w.transpose(0, 2, 3, 1).reshape(cin, k * k * cout))}
    p["b"] = jnp.asarray(_t(sd, prefix + ".bias"))
    return p


def _norm(sd, prefix):
    return {
        "w": jnp.asarray(_t(sd, prefix + ".weight")),
        "b": jnp.asarray(_t(sd, prefix + ".bias")),
    }


def _enc_block(sd, prefix):
    return {
        "norm1": _norm(sd, prefix + ".norm1"),
        "attn": {
            "qkv": _linear(sd, prefix + ".attn.qkv"),
            "proj": _linear(sd, prefix + ".attn.proj"),
        },
        "norm2": _norm(sd, prefix + ".norm2"),
        "mlp": {
            "fc1": _linear(sd, prefix + ".mlp.fc1"),
            "fc2": _linear(sd, prefix + ".mlp.fc2"),
        },
    }


def _dec_block(sd, prefix):
    return {
        "norm1": _norm(sd, prefix + ".norm1"),
        "attn": {
            "qkv": _linear(sd, prefix + ".attn.qkv"),
            "proj": _linear(sd, prefix + ".attn.proj"),
        },
        "norm2": _norm(sd, prefix + ".norm2"),
        "norm3": _norm(sd, prefix + ".norm3"),
        "norm_y": _norm(sd, prefix + ".norm_y"),
        "cross_attn": {
            "q": _linear(sd, prefix + ".cross_attn.projq"),
            "k": _linear(sd, prefix + ".cross_attn.projk"),
            "v": _linear(sd, prefix + ".cross_attn.projv"),
            "proj": _linear(sd, prefix + ".cross_attn.proj"),
        },
        "mlp": {
            "fc1": _linear(sd, prefix + ".mlp.fc1"),
            "fc2": _linear(sd, prefix + ".mlp.fc2"),
        },
    }


def _stack(blocks):
    import jax

    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *blocks)


def _dpt(sd, prefix):
    sc = prefix + ".dpt.scratch"
    ap = prefix + ".dpt.act_postprocess"

    def fusion(i):
        rp = f"{sc}.refinenet{i}"
        return {
            "res1": {
                "conv1": _conv(sd, rp + ".resConfUnit1.conv1"),
                "conv2": _conv(sd, rp + ".resConfUnit1.conv2"),
            },
            "res2": {
                "conv1": _conv(sd, rp + ".resConfUnit2.conv1"),
                "conv2": _conv(sd, rp + ".resConfUnit2.conv2"),
            },
            "out_conv": _conv(sd, rp + ".out_conv"),
        }

    return {
        "act1": {"conv": _conv(sd, ap + ".0.0"), "convt": _conv_t(sd, ap + ".0.1")},
        "act2": {"conv": _conv(sd, ap + ".1.0"), "convt": _conv_t(sd, ap + ".1.1")},
        "act3": {"conv": _conv(sd, ap + ".2.0")},
        "act4": {"conv": _conv(sd, ap + ".3.0"), "conv2": _conv(sd, ap + ".3.1")},
        "rn1": _conv(sd, sc + ".layer1_rn", bias=False),
        "rn2": _conv(sd, sc + ".layer2_rn", bias=False),
        "rn3": _conv(sd, sc + ".layer3_rn", bias=False),
        "rn4": _conv(sd, sc + ".layer4_rn", bias=False),
        "refine1": fusion(1),
        "refine2": fusion(2),
        "refine3": fusion(3),
        "refine4": fusion(4),
        "head": {
            "conv1": _conv(sd, prefix + ".dpt.head.0"),
            "conv2": _conv(sd, prefix + ".dpt.head.2"),
            "conv3": _conv(sd, prefix + ".dpt.head.4"),
        },
    }


def torch_state_dict_to_params(
    sd: Dict[str, Any], cfg: ModelConfig = VIT_LARGE
) -> Dict[str, Any]:
    """sd: torch state_dict (tensors or numpy arrays) -> JAX param pytree."""
    # allow tensors
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in sd.items()}

    # dec_blocks2 fallback: duplicate dec_blocks if absent (dust3r model.py:92-99)
    if not any(k.startswith("dec_blocks2") for k in sd):
        for k in list(sd.keys()):
            if k.startswith("dec_blocks."):
                sd[k.replace("dec_blocks.", "dec_blocks2.", 1)] = sd[k]

    pw = _t(sd, "patch_embed.proj.weight")  # (D, 3, P, P)
    D = pw.shape[0]
    patch = {
        "w": jnp.asarray(pw.transpose(2, 3, 1, 0).reshape(-1, D)),
        "b": jnp.asarray(_t(sd, "patch_embed.proj.bias")),
    }

    def head(i):
        hp = f"downstream_head{i}"
        fc2 = _linear(sd, hp + ".head_local_features.fc2")
        # permute fc2 output columns from torch pixel_shuffle channel-major
        # order o=(c,py,px) to pixel-major n=(py,px,c) — the layout
        # _pixel_shuffle_tokens un-shuffles with contiguous runs (exact:
        # column permutation of an output layer). C inferred from the
        # checkpoint itself: out_feat = (desc_dim + 1) * P * P.
        P = cfg.patch_size
        if fc2["w"].shape[1] % (P * P) != 0:
            raise ValueError(
                f"{hp}.head_local_features.fc2 out_features "
                f"{fc2['w'].shape[1]} is not a multiple of patch_size^2 "
                f"({P * P}); checkpoint/config mismatch"
            )
        C = fc2["w"].shape[1] // (P * P)
        perm = (np.arange(C)[None, :] * P * P
                + np.arange(P * P)[:, None]).reshape(-1)
        fc2 = {"w": fc2["w"][:, perm], "b": fc2["b"][perm]}
        return {
            "dpt": _dpt(sd, hp),
            "local_mlp": {
                "fc1": _linear(sd, hp + ".head_local_features.fc1"),
                "fc2": fc2,
            },
        }

    from .mast3r import cast_trunk_params

    return cast_trunk_params({
        "patch_embed": patch,
        "enc_blocks": _stack(
            [_enc_block(sd, f"enc_blocks.{i}") for i in range(cfg.enc_depth)]
        ),
        "enc_norm": _norm(sd, "enc_norm"),
        "decoder_embed": _linear(sd, "decoder_embed"),
        "dec_blocks": _stack(
            [_dec_block(sd, f"dec_blocks.{i}") for i in range(cfg.dec_depth)]
        ),
        "dec_blocks2": _stack(
            [_dec_block(sd, f"dec_blocks2.{i}") for i in range(cfg.dec_depth)]
        ),
        "dec_norm": _norm(sd, "dec_norm"),
        "head1": head(1),
        "head2": head(2),
    }, cfg)


def parse_arch_string(arch: str) -> Dict[str, Any]:
    """PARSE (never eval) the checkpoint's pickled model-constructor string.

    The released checkpoints store e.g.
      "AsymmetricMASt3R(pos_embed='RoPE100', patch_embed_cls='ManyAR_...',
       img_size=(512, 512), head_type='catmlp+dpt', output_mode='pts3d+desc24',
       depth_mode=('exp', -inf, inf), conf_mode=('exp', 1, inf),
       enc_embed_dim=1024, ..., two_confs=True, desc_conf_mode=('exp', 0, inf))"
    and the reference `eval()`s it (mast3r/model.py:21-37) — arbitrary code
    execution from a pickle.  Here the string is parsed as an AST call
    expression and reduced with a constants-only walker (`inf` being the one
    non-literal name).  Returns {class_name, kwargs}.
    """
    import ast

    node = ast.parse(arch.strip(), mode="eval").body
    if not isinstance(node, ast.Call) or not isinstance(node.func, ast.Name):
        raise ValueError(f"arch string is not a plain constructor call: {arch!r}")

    def const(n):
        if isinstance(n, ast.Constant):
            return n.value
        if isinstance(n, ast.Name) and n.id == "inf":
            return float("inf")
        if isinstance(n, ast.UnaryOp) and isinstance(n.op, ast.USub):
            return -const(n.operand)
        if isinstance(n, (ast.Tuple, ast.List)):
            return tuple(const(e) for e in n.elts)
        raise ValueError(
            f"non-literal node {ast.dump(n)} in arch string — refusing"
        )

    return {
        "class_name": node.func.id,
        "kwargs": {kw.arg: const(kw.value) for kw in node.keywords},
    }


def config_from_arch(arch: str, base: ModelConfig = VIT_LARGE) -> ModelConfig:
    """ModelConfig from a checkpoint arch string (released .pth naming).

    Cross-checked fields: trunk dims/depths/heads, RoPE base, conf-mode
    offsets, and the descriptor width encoded in output_mode
    ('pts3d+desc24' -> 24).  Unknown/behavioural kwargs the TPU build fixes
    by design (landscape_only handling, patch_embed_cls) are ignored.
    """
    import dataclasses
    import re

    kw = parse_arch_string(arch)["kwargs"]
    upd = {}
    for k in ("enc_embed_dim", "enc_depth", "enc_num_heads",
              "dec_embed_dim", "dec_depth", "dec_num_heads", "patch_size"):
        if k in kw:
            upd[k] = int(kw[k])
    if "pos_embed" in kw:
        m = re.fullmatch(r"RoPE(\d+(?:\.\d+)?)", str(kw["pos_embed"]))
        if not m:
            raise ValueError(f"unsupported pos_embed {kw['pos_embed']!r}")
        upd["rope_base"] = float(m.group(1))
    if "output_mode" in kw:
        m = re.fullmatch(r"pts3d\+desc(\d+)", str(kw["output_mode"]))
        if not m:
            raise ValueError(f"unsupported output_mode {kw['output_mode']!r}")
        upd["desc_dim"] = int(m.group(1))
    for mode_key, field in (("conf_mode", "conf_offset"),
                            ("desc_conf_mode", "desc_conf_offset")):
        if mode_key in kw and kw[mode_key] is not None:
            mode = kw[mode_key]
            if mode[0] != "exp":
                raise ValueError(f"unsupported {mode_key} {mode!r}")
            upd[field] = float(mode[1])
    return dataclasses.replace(base, **upd)


def load_torch_checkpoint(path: str, cfg: ModelConfig = None):
    """Load a reference .pth checkpoint into (params, cfg).

    When the checkpoint carries its constructor args (released .pth files
    do), the arch string is PARSED — never eval'd like the reference does
    (mast3r/model.py:21-37) — into the ModelConfig; pass an explicit `cfg`
    to override.  The tensor-derived dims are validated either way.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["model"] if isinstance(ckpt, dict) and "model" in ckpt else ckpt
    base = cfg if cfg is not None else VIT_LARGE
    arch = None
    args = ckpt.get("args") if isinstance(ckpt, dict) else None
    if args is not None:
        arch = args.get("model") if isinstance(args, dict) else getattr(
            args, "model", None
        )
    # structural fields (dims/depths/rope/desc/conf offsets) come from the
    # checkpoint's own arch string; behavioural knobs (compute dtypes, loop
    # strategies, attn impl) stay with the caller's base config
    cfg = config_from_arch(arch, base=base) if arch else base
    return torch_state_dict_to_params(sd, cfg), cfg
