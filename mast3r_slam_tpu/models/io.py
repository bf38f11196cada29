"""Param pytree persistence (npz).

Converting the reference torch checkpoint takes tens of seconds (torch load +
layout transposes); cache the converted pytree once and reload in ~1s:

    params, cfg = load_torch_checkpoint("MASt3R....pth")
    save_params("mast3r_vitl.npz", params)
    params = load_params("mast3r_vitl.npz")
"""

from __future__ import annotations

import pathlib

import jax
import jax.numpy as jnp
import numpy as np

_SEP = "/"

# Bump whenever the converted layout changes incompatibly. v2: local_mlp fc2
# output columns stored pixel-major (py,px,c) — see models/convert.py; a v1
# npz loaded into v2 code would silently scramble descriptors.
_FORMAT_VERSION = 2
_VERSION_KEY = "__format_version__"


# npz has no bfloat16: np.savez writes ml_dtypes.bfloat16 arrays as raw
# void-2 records that np.load cannot hand back to jax (dtype |V2).  Store
# bf16 leaves as a uint16 bit-view under a tagged key and view them back on
# load — bitwise exact.
_BF16_TAG = "__bf16__"


def _flatten(params):
    flat = {}

    def rec(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(f"{prefix}{_SEP}{k}" if prefix else k, v)
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                rec(f"{prefix}{_SEP}{i}", v)
        elif node is None:
            flat[f"{prefix}{_SEP}__none__"] = np.zeros((0,))
        else:
            a = np.asarray(node)
            if a.dtype == jnp.bfloat16:
                flat[f"{prefix}{_SEP}{_BF16_TAG}"] = a.view(np.uint16)
            else:
                flat[prefix] = a

    rec("", params)
    return flat


def save_params(path, params) -> None:
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    flat = _flatten(params)
    flat[_VERSION_KEY] = np.asarray(_FORMAT_VERSION)
    np.savez(path, **flat)


def load_params(path):
    data = np.load(path)
    version = int(data[_VERSION_KEY]) if _VERSION_KEY in data.files else 1
    if version != _FORMAT_VERSION:
        raise ValueError(
            f"{path}: converted-checkpoint format v{version}, this build "
            f"expects v{_FORMAT_VERSION} — re-run tools/convert_checkpoint.py "
            "on the original .pth"
        )
    tree: dict = {}
    for key in data.files:
        if key == _VERSION_KEY:
            continue
        parts = key.split(_SEP)
        value = None
        if parts[-1] == _BF16_TAG:  # uint16 bit-view of a bf16 leaf
            parts = parts[:-1]
            value = jnp.asarray(data[key].view(jnp.bfloat16))
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        leaf = parts[-1]
        if leaf == "__none__":
            # collapse to None at the parent level handled below
            node["__none_marker__"] = True
            continue
        node[leaf] = value if value is not None else jnp.asarray(data[key])

    def fix(node):
        if isinstance(node, dict):
            if node.get("__none_marker__"):
                return None
            keys = list(node.keys())
            # integer-keyed dicts were lists
            if keys and all(k.isdigit() for k in keys):
                return [fix(node[str(i)]) for i in range(len(keys))]
            return {k: fix(v) for k, v in node.items()}
        return node

    return fix(tree)
