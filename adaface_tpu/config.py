"""YAML config trees with target/params instantiation + dotlist overrides.

The reference composes OmegaConf YAMLs and instantiates components by
dotted class path (`instantiate_from_config`, `ldm/util.py:105-112`;
config merge + CLI dotlist overrides, `main.py:853-864`). OmegaConf isn't
in this environment, and a plain dict tree + three helpers cover exactly
what the framework uses.
"""

from __future__ import annotations

import importlib
from typing import Any, Dict, List, Optional, Sequence


def load_config(*paths: str) -> Dict:
    """Load and deep-merge YAML files left-to-right (later wins) — the
    `OmegaConf.merge(*configs)` behavior (`main.py:856`)."""
    import yaml

    cfg: Dict = {}
    for p in paths:
        with open(p) as f:
            cfg = merge_dicts(cfg, yaml.safe_load(f) or {})
    return cfg


def merge_dicts(base: Dict, override: Dict) -> Dict:
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = merge_dicts(out[k], v)
        else:
            out[k] = v
    return out


def apply_dotlist(cfg: Dict, dotlist: Sequence[str]) -> Dict:
    """Apply `a.b.c=value` overrides (values YAML-parsed) — the
    `OmegaConf.from_dotlist(unknown)` merge (`main.py:853-857`)."""
    import yaml

    for item in dotlist:
        if "=" not in item:
            raise ValueError(f"override {item!r} is not key=value")
        key, raw = item.split("=", 1)
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = yaml.safe_load(raw)
    return cfg


def get_obj_from_str(string: str, reload: bool = False) -> Any:
    module, cls = string.rsplit(".", 1)
    mod = importlib.import_module(module)
    if reload:
        importlib.reload(mod)
    return getattr(mod, cls)


def instantiate_from_config(config: Dict, **extra) -> Any:
    """`{'target': 'pkg.mod.Cls', 'params': {...}}` -> instance
    (`ldm/util.py:105-112`)."""
    if "target" not in config:
        raise KeyError("Expected key `target` to instantiate.")
    params = dict(config.get("params") or {})
    params.update(extra)
    return get_obj_from_str(config["target"])(**params)
