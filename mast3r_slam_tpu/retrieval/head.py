"""Retrieval feature head: whiten -> project -> attention -> top-k select.

Functional mirror of the reference RetrievalModel forward path
(/root/reference/thirdparty/mast3r/mast3r/retrieval/model.py:107-157 and the
SLAM-side re-implementation retrieval_database.py:25-41): backbone encoder
tokens are pre-whitened (center + PCA), projected by an MLP (Linear
[+ affine LayerNorm + GELU]* Linear), attention is the L2 norm of the
projected feature, the projected features are post-whitened, and the nfeat
highest-attention tokens are kept.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class RetrievalHeadSettings(NamedTuple):
    nfeat: int = 300
    residual: bool = False


def init_head_params(key, backbone_dim: int, hdims=(1024,)):
    """Random init (identity whiteners) — for tests / training-free fallback."""
    ks = jax.random.split(key, max(len(hdims), 1))
    layers = []
    d = backbone_dim
    for i, h in enumerate(hdims):
        w = jax.random.normal(ks[i], (d, h)) * (1.0 / np.sqrt(d))
        ln = (
            {"w": jnp.ones((h,), jnp.float32), "b": jnp.zeros((h,), jnp.float32)}
            if i < len(hdims) - 1
            else None
        )
        layers.append({"w": w, "b": jnp.zeros((h,), jnp.float32), "ln": ln})
        d = h
    dim = hdims[-1] if hdims else backbone_dim
    return {
        "prewhiten": {
            "m": jnp.zeros((backbone_dim,), jnp.float32),
            "p": jnp.eye(backbone_dim, dtype=jnp.float32),
        },
        "projector": layers,
        "postwhiten": {
            "m": jnp.zeros((dim,), jnp.float32),
            "p": jnp.eye(dim, dtype=jnp.float32),
        },
    }


def _whiten(p, x):
    if p is None or p.get("p") is None:
        return x
    return (x - p["m"]) @ p["p"]


def _project(layers, x):
    """Linear [+ affine LayerNorm + GELU between] stack (model.py:144-157)."""
    for lay in layers:
        x = x @ lay["w"] + lay["b"]
        if lay.get("ln") is not None:
            mu = jnp.mean(x, axis=-1, keepdims=True)
            var = jnp.var(x, axis=-1, keepdims=True)
            x = (x - mu) * jax.lax.rsqrt(var + 1e-5)
            x = x * lay["ln"]["w"] + lay["ln"]["b"]
            x = jax.nn.gelu(x, approximate=False)
    return x


@partial(jax.jit, static_argnames=("settings",))
def extract_topk_features(params, feat, settings: RetrievalHeadSettings):
    """feat: (B, N, D) backbone tokens -> (B, nfeat, dim) selected features."""
    x = _whiten(params["prewhiten"], feat)
    proj = _project(params["projector"], x)
    if settings.residual:
        proj = proj + x
    attn = jnp.linalg.norm(proj, axis=-1)  # featweights='l2norm' (model.py:132)
    whitened = _whiten(params["postwhiten"], proj)
    k = min(settings.nfeat, feat.shape[1])
    _, top_idx = jax.lax.top_k(attn, k)
    return jnp.take_along_axis(whitened, top_idx[..., None], axis=1)


def convert_torch_retrieval_head(sd) -> dict:
    """Torch retrieval checkpoint state_dict -> head params.

    The Whitener stores `m` (1, D) and a column matrix `p` applied as x @ p
    (model.py:56-80) — no transpose needed; Linear weights transpose.
    Projector is a Sequential [Linear, LayerNorm, GELU]* + Linear whose
    module indices stride by 3.
    """

    def arr(k):
        v = sd[k]
        return np.asarray(
            v.detach().cpu().numpy() if hasattr(v, "detach") else v,
            dtype=np.float32,
        )

    # collect linear (2D weight) and layernorm (1D weight) indices in order
    proj_idx = sorted(
        int(k.split(".")[1]) for k in sd if k.startswith("projector.") and k.endswith(".weight")
    )
    layers = []
    pending = None
    for i in proj_idx:
        w = arr(f"projector.{i}.weight")
        if w.ndim == 2:
            if pending is not None:
                layers.append(pending)
            pending = {
                "w": jnp.asarray(w.T),
                "b": jnp.asarray(arr(f"projector.{i}.bias")),
                "ln": None,
            }
        else:  # LayerNorm following the pending Linear
            pending["ln"] = {
                "w": jnp.asarray(w),
                "b": jnp.asarray(arr(f"projector.{i}.bias")),
            }
    if pending is not None:
        layers.append(pending)

    def whiten(prefix):
        if f"{prefix}.m" not in sd:
            return None
        return {
            "m": jnp.asarray(arr(f"{prefix}.m").reshape(-1)),
            "p": jnp.asarray(arr(f"{prefix}.p")),
        }

    return {
        "prewhiten": whiten("prewhiten"),
        "projector": layers,
        "postwhiten": whiten("postwhiten"),
    }
