"""YAML config system with ``inherit`` chains and recursive merge.

Capability mirror of /root/reference/mast3r_slam/config.py (inherit +
deep-merge + scientific-notation floats) with one design change for the TPU
build: configs are plain immutable-by-convention nested dicts returned from
``load_config`` and passed explicitly — there is no mutable module-global that
must be re-seeded per process (we are single-process by design, §2.4 of
SURVEY.md).
"""

from __future__ import annotations

import copy
import os
import re
from typing import Any, Dict, Optional

import yaml

_CONFIG_DIR = os.path.join(os.path.dirname(__file__), "configs")

# YAML 1.1 does not treat `1e-8` as a float; install a resolver that does.
_FLOAT_RE = re.compile(
    r"""^(?:
        [-+]?(?:[0-9][0-9_]*)\.[0-9_]*(?:[eE][-+]?[0-9]+)?
        |[-+]?(?:[0-9][0-9_]*)(?:[eE][-+]?[0-9]+)
        |\.[0-9_]+(?:[eE][-+][0-9]+)?
        |[-+]?\.(?:inf|Inf|INF)
        |\.(?:nan|NaN|NAN))$""",
    re.X,
)


class _Loader(yaml.SafeLoader):
    pass


_Loader.add_implicit_resolver(
    "tag:yaml.org,2002:float", _FLOAT_RE, list("-+0123456789.")
)


def merge_config(base: Dict[str, Any], override: Dict[str, Any]) -> Dict[str, Any]:
    """Recursively merge ``override`` into a copy of ``base``."""
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = merge_config(out[k], v)
        else:
            out[k] = v
    return out


def _resolve_path(path: str, relative_to: Optional[str]) -> str:
    if os.path.isabs(path) or os.path.exists(path):
        return path
    # allow bare names like "base" or "calib" to hit the packaged defaults
    cand = os.path.join(_CONFIG_DIR, path)
    if os.path.exists(cand):
        return cand
    cand_yaml = cand if cand.endswith(".yaml") else cand + ".yaml"
    if os.path.exists(cand_yaml):
        return cand_yaml
    if relative_to is not None:
        cand = os.path.join(os.path.dirname(relative_to), path)
        if os.path.exists(cand):
            return cand
    return path


def load_config(path: str = "base") -> Dict[str, Any]:
    """Load a YAML config, following ``inherit`` chains."""
    path = _resolve_path(path, None)
    with open(path, "r") as f:
        cfg = yaml.load(f, Loader=_Loader) or {}
    inherit = cfg.pop("inherit", None)
    if inherit is not None:
        parent = load_config(_resolve_path(inherit, path))
        cfg = merge_config(parent, cfg)
    return cfg


def default_config() -> Dict[str, Any]:
    return load_config("base")


def config_for_eval(calib: bool) -> Dict[str, Any]:
    return load_config("eval_calib" if calib else "eval_no_calib")


def deep_freeze(cfg: Dict[str, Any]) -> Dict[str, Any]:
    """Defensive copy for callers that want to stash a config."""
    return copy.deepcopy(cfg)
