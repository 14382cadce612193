"""Lightweight hierarchical config: YAML files + dot-path CLI overrides.

Replaces the reference's Hydra/OmegaConf stack (compressai_vision/config/,
cfgs/*.yaml, `++key=value` overrides used by the sweep scripts, e.g.
scripts/evaluation/sfu_hw_obj/eval_on_sfu_hw_obj_vtm.sh:124-148) with a
dependency-free equivalent:

  * `Config` — a dict-backed node with attribute access, `.get`, deep merge.
  * `${a.b.c}` interpolation resolved lazily against the root.
  * `load_config(path, overrides=[...])` — YAML load + `key.path=value`
    overrides (typed via YAML scalar parsing).
"""

from __future__ import annotations

import copy
import re
from pathlib import Path
from typing import Any, Dict, Iterable, Optional, Union

import yaml

_INTERP = re.compile(r"\$\{([^}]+)\}")


class Config:
    """Nested attribute-accessible config node."""

    def __init__(self, data: Optional[Dict[str, Any]] = None, _root: "Config" = None):
        object.__setattr__(self, "_data", {})
        object.__setattr__(self, "_root", _root)
        if data:
            for k, v in data.items():
                self._data[k] = self._wrap(v)

    # -- construction helpers -------------------------------------------------
    def _wrap(self, v: Any) -> Any:
        if isinstance(v, Config):
            object.__setattr__(v, "_root", self._root_node())
            return v
        if isinstance(v, dict):
            return Config(v, _root=self._root_node())
        if isinstance(v, (list, tuple)):
            return [self._wrap(x) for x in v]
        return v

    def _root_node(self) -> "Config":
        return self._root if self._root is not None else self

    # -- access ----------------------------------------------------------------
    def __getattr__(self, key: str) -> Any:
        try:
            return self._resolve(self._data[key])
        except KeyError:
            raise AttributeError(key) from None

    def __getitem__(self, key: str) -> Any:
        return self._resolve(self._data[key])

    def __setattr__(self, key: str, value: Any) -> None:
        self._data[key] = self._wrap(value)

    def __setitem__(self, key: str, value: Any) -> None:
        self._data[key] = self._wrap(value)

    def __contains__(self, key: str) -> bool:
        return key in self._data

    def get(self, key: str, default: Any = None) -> Any:
        if key in self._data:
            return self._resolve(self._data[key])
        return default

    def select(self, dotted: str, default: Any = None) -> Any:
        node: Any = self
        for part in dotted.split("."):
            if not isinstance(node, Config) or part not in node:
                return default
            node = node[part]
        return node

    def keys(self):
        return self._data.keys()

    def items(self):
        return [(k, self._resolve(v)) for k, v in self._data.items()]

    def __iter__(self):
        return iter(self._data)

    def __repr__(self) -> str:
        return f"Config({self.to_dict()!r})"

    # -- interpolation ----------------------------------------------------------
    def _resolve(self, v: Any) -> Any:
        if isinstance(v, str):
            return self._interpolate(v)
        return v

    def _interpolate(self, s: str) -> Any:
        m = _INTERP.fullmatch(s)
        root = self._root_node()
        if m:  # whole-string interpolation keeps the referenced type
            val = root.select(m.group(1))
            if val is None:
                raise KeyError(f"unresolvable interpolation: {s}")
            return val

        def sub(match: re.Match) -> str:
            val = root.select(match.group(1))
            if val is None:
                raise KeyError(f"unresolvable interpolation: {match.group(0)}")
            return str(val)

        return _INTERP.sub(sub, s)

    # -- mutation ----------------------------------------------------------------
    def merge(self, other: Union["Config", Dict[str, Any]]) -> "Config":
        """Deep-merge `other` into self (other wins)."""
        items = other.items() if isinstance(other, Config) else other.items()
        for k, v in items:
            if (
                k in self._data
                and isinstance(self._data[k], Config)
                and isinstance(v, (dict, Config))
            ):
                self._data[k].merge(v)
            else:
                self._data[k] = self._wrap(
                    v.to_dict() if isinstance(v, Config) else v
                )
        return self

    def set_dotted(self, dotted: str, value: Any) -> None:
        parts = dotted.split(".")
        node = self
        for p in parts[:-1]:
            if p not in node or not isinstance(node._data[p], Config):
                node._data[p] = Config(_root=node._root_node())
            node = node._data[p]
        node._data[parts[-1]] = node._wrap(value)

    # -- export ----------------------------------------------------------------
    def to_dict(self, resolve: bool = False) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        for k, v in self._data.items():
            if isinstance(v, Config):
                out[k] = v.to_dict(resolve)
            elif isinstance(v, list):
                out[k] = [
                    x.to_dict(resolve) if isinstance(x, Config) else x for x in v
                ]
            elif resolve:
                out[k] = self._resolve(v)
            else:
                out[k] = v
        return out

    def to_yaml(self, resolve: bool = True) -> str:
        return yaml.safe_dump(self.to_dict(resolve=resolve), sort_keys=False)

    def copy(self) -> "Config":
        return Config(copy.deepcopy(self.to_dict()))


def _parse_scalar(text: str) -> Any:
    return yaml.safe_load(text)


def load_config(
    path: Union[str, Path, None] = None,
    overrides: Optional[Iterable[str]] = None,
    defaults: Optional[Dict[str, Any]] = None,
) -> Config:
    """Load a YAML config, apply `key.path=value` overrides.

    A top-level `includes: [relative.yaml, ...]` list is resolved first
    (depth-first, later files win), standing in for Hydra config groups
    (ref cfgs/eval_split_inference_example.yaml:1-10).
    """
    cfg = Config(defaults or {})
    if path is not None:
        cfg.merge(_load_file(Path(path)))
    for ov in overrides or []:
        if "=" not in ov:
            raise ValueError(f"override must be key.path=value, got {ov!r}")
        key, _, raw = ov.partition("=")
        cfg.set_dotted(key.lstrip("+"), _parse_scalar(raw))
    return cfg


def _load_file(path: Path) -> Dict[str, Any]:
    with open(path) as f:
        data = yaml.safe_load(f) or {}
    includes = data.pop("includes", [])
    merged: Dict[str, Any] = {}
    for inc in includes:
        sub = _load_file((path.parent / inc).resolve())
        merged = _deep_merge(merged, sub)
    return _deep_merge(merged, data)


def _deep_merge(base: Dict[str, Any], over: Dict[str, Any]) -> Dict[str, Any]:
    out = dict(base)
    for k, v in over.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out
