"""Minimal yacs-compatible config node.

The reference stack builds a three-level frozen config tree with yacs
(``vlnce_baselines/config/default.py:155-181``, habitat's ``Config``).  We
re-provide the same public surface (attribute access, ``merge_from_file``,
``merge_from_list``, ``clone``, ``freeze``/``defrost``) without depending on
yacs or habitat, so the TPU framework is self-contained.
"""
from __future__ import annotations

import copy
import io
from typing import Any, Dict, List, Optional

import yaml


class Config(dict):
    """A nested, freezable dict with attribute access (yacs CfgNode surface)."""

    _FROZEN_KEY = "__frozen__"

    def __init__(self, init: Optional[Dict[str, Any]] = None):
        super().__init__()
        object.__setattr__(self, "_frozen", False)
        if init:
            for k, v in init.items():
                self[k] = Config(v) if isinstance(v, dict) else v

    # -- attribute protocol -------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        if object.__getattribute__(self, "_frozen"):
            raise AttributeError(f"Config is frozen; cannot set {name}")
        if isinstance(value, dict) and not isinstance(value, Config):
            value = Config(value)
        self[name] = value

    def __setitem__(self, key, value):
        if object.__getattribute__(self, "_frozen"):
            raise AttributeError(f"Config is frozen; cannot set {key}")
        super().__setitem__(key, value)

    # -- yacs surface --------------------------------------------------------
    def clone(self) -> "Config":
        out = Config()
        for k, v in self.items():
            out[k] = v.clone() if isinstance(v, Config) else copy.deepcopy(v)
        return out

    def freeze(self) -> None:
        object.__setattr__(self, "_frozen", True)
        for v in self.values():
            if isinstance(v, Config):
                v.freeze()

    def defrost(self) -> None:
        object.__setattr__(self, "_frozen", False)
        for v in self.values():
            if isinstance(v, Config):
                v.defrost()

    def is_frozen(self) -> bool:
        return object.__getattribute__(self, "_frozen")

    def merge_from_other_cfg(self, other: "Config") -> None:
        for k, v in other.items():
            if isinstance(v, dict) and isinstance(self.get(k), Config):
                self[k].merge_from_other_cfg(v if isinstance(v, Config) else Config(v))
            else:
                self[k] = Config(v) if isinstance(v, dict) else v

    def merge_from_file(self, path: str) -> None:
        with open(path, "r") as f:
            loaded = yaml.safe_load(f) or {}
        self.merge_from_other_cfg(Config(loaded))

    def merge_from_list(self, opts: List[Any]) -> None:
        assert len(opts) % 2 == 0, f"Override list must be key/value pairs: {opts}"
        for key, value in zip(opts[0::2], opts[1::2]):
            node = self
            parts = str(key).split(".")
            for p in parts[:-1]:
                if p not in node:
                    node[p] = Config()
                node = node[p]
            node[parts[-1]] = _coerce(value, node.get(parts[-1]))

    def to_dict(self) -> Dict[str, Any]:
        return {
            k: (v.to_dict() if isinstance(v, Config) else v) for k, v in self.items()
        }

    def dump(self) -> str:
        buf = io.StringIO()
        yaml.safe_dump(self.to_dict(), buf, default_flow_style=False)
        return buf.getvalue()

    def __str__(self) -> str:  # matches yacs-ish printing for config dumps
        return self.dump()

    def __deepcopy__(self, memo):
        return self.clone()

    def __reduce__(self):
        # dict-subclass pickling bypasses __init__; rebuild from plain dicts
        # (unpickled configs come back unfrozen, which env workers rely on).
        return (Config, (self.to_dict(),))


def _coerce(value: Any, old: Any) -> Any:
    """Coerce a CLI string to the type of the existing value (yacs behavior)."""
    if not isinstance(value, str):
        return value
    try:
        parsed = yaml.safe_load(value)
    except yaml.YAMLError:
        return value
    if old is not None and isinstance(old, str) and not isinstance(parsed, str):
        # keep strings that look like numbers if the default was a string
        return value
    return parsed


CN = Config
