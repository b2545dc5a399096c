"""A minimal YACS-style config node.

Re-implements the subset of ``fvcore.common.config.CfgNode`` semantics the
reference framework relies on (reference: ``configs/defaults.py:2``,
``utils/parser.py:29-52``): attribute access, ``clone()``,
``merge_from_file(yaml)``, ``merge_from_list([k, v, ...])``, and type-checked
merges with string-literal coercion for ``--opts`` overrides.

Written from scratch so the framework has zero torch-ecosystem dependencies.
"""

from __future__ import annotations

import ast
import copy
from typing import Any, Dict, List

import yaml

_VALID_SCALARS = (int, float, bool, str, type(None))


class CfgNode(dict):
    """A dict with attribute access and YACS merge semantics."""

    def __init__(self, init_dict: Dict[str, Any] | None = None):
        super().__init__()
        if init_dict:
            for k, v in init_dict.items():
                self[k] = self._convert(v)

    @classmethod
    def _convert(cls, value: Any) -> Any:
        if isinstance(value, dict) and not isinstance(value, CfgNode):
            return cls(value)
        return value

    # -- attribute access -------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError:
            raise AttributeError(
                f"Config has no attribute {name!r}. "
                f"Known keys: {sorted(self.keys())[:20]}..."
            )

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = self._convert(value)

    def __delattr__(self, name: str) -> None:
        del self[name]

    # -- clone / dump ------------------------------------------------------
    def clone(self) -> "CfgNode":
        return copy.deepcopy(self)

    def dump(self) -> str:
        def to_plain(node):
            if isinstance(node, CfgNode):
                return {k: to_plain(v) for k, v in node.items()}
            if isinstance(node, (list, tuple)):
                return [to_plain(v) for v in node]
            return node

        return yaml.safe_dump(to_plain(self), default_flow_style=False)

    def to_dict(self) -> Dict[str, Any]:
        return yaml.safe_load(self.dump())

    # -- merging -----------------------------------------------------------
    def merge_from_file(self, cfg_filename: str) -> None:
        with open(cfg_filename, "r") as f:
            loaded = yaml.safe_load(f)
        if loaded is None:
            return
        self._merge_dict(loaded, key_path="")

    def merge_from_other_cfg(self, other: "CfgNode") -> None:
        self._merge_dict(other, key_path="")

    def merge_from_list(self, opts: List[str]) -> None:
        assert len(opts) % 2 == 0, f"--opts must be key value pairs, got {opts}"
        for full_key, value in zip(opts[0::2], opts[1::2]):
            node = self
            key_parts = full_key.split(".")
            for part in key_parts[:-1]:
                if part not in node:
                    raise KeyError(f"Non-existent config key: {full_key}")
                node = node[part]
            leaf = key_parts[-1]
            if leaf not in node:
                raise KeyError(f"Non-existent config key: {full_key}")
            node[leaf] = _coerce(_decode(value), node[leaf], full_key)

    def _merge_dict(self, src: Dict[str, Any], key_path: str) -> None:
        for key, value in src.items():
            full_key = f"{key_path}.{key}" if key_path else key
            if key not in self:
                # YACS raises on unknown keys; we do too, to catch typos.
                raise KeyError(f"Non-existent config key: {full_key}")
            old = self[key]
            if isinstance(old, CfgNode):
                if not isinstance(value, dict):
                    raise TypeError(
                        f"Cannot merge non-dict into config section {full_key}"
                    )
                old._merge_dict(value, full_key)
            else:
                self[key] = _coerce(value, old, full_key)

    # -- misc ----------------------------------------------------------------
    def key_is_deprecated(self, key: str) -> bool:  # parity shim
        return False

    def __repr__(self) -> str:
        return f"CfgNode({super().__repr__()})"

    def __reduce__(self):
        # Plain-dict reduce so CfgNode survives pickling (dataloader workers).
        return (CfgNode, (dict(self),))


class CfgRef:
    """Attribute-transparent non-dict wrapper around a CfgNode.

    Flax converts dict-typed module attributes to FrozenDict (losing
    attribute access); passing ``CfgRef(cfg)`` as a module field avoids the
    conversion while keeping ``cfg.SECTION.KEY`` access."""

    __slots__ = ("node",)

    def __init__(self, node: "CfgNode"):
        object.__setattr__(self, "node", node)

    def __getattr__(self, name: str) -> Any:
        return getattr(object.__getattribute__(self, "node"), name)

    def __repr__(self) -> str:
        return f"CfgRef({self.node!r})"


def _decode(value: str) -> Any:
    """Decode a string from --opts into a python literal when possible."""
    if not isinstance(value, str):
        return value
    try:
        return ast.literal_eval(value)
    except (ValueError, SyntaxError):
        return value


def _coerce(new: Any, old: Any, full_key: str) -> Any:
    """Type-check replacement value against the default, with the YACS
    tuple<->list and int->float relaxations."""
    if old is None or new is None:
        return CfgNode._convert(new)
    if isinstance(new, str) and not isinstance(old, str):
        # YAML 1.1 parses "4e-2" (no dot) as a string and "(0.9, 0.999)" as
        # a string; recover the python literal when the key is non-string.
        try:
            new = ast.literal_eval(new)
        except (ValueError, SyntaxError):
            if isinstance(old, (int, float)) and not isinstance(old, bool):
                try:
                    new = float(new)
                except ValueError:
                    pass
    if isinstance(old, tuple) and isinstance(new, list):
        return tuple(new)
    if isinstance(old, list) and isinstance(new, tuple):
        return list(new)
    if isinstance(old, float) and isinstance(new, int):
        return float(new)
    if isinstance(old, bool) is not isinstance(new, bool) and {
        type(old),
        type(new),
    } <= {bool, int}:
        raise TypeError(f"Cannot assign {new!r} to bool key {full_key}")
    if not isinstance(new, type(old)) and isinstance(old, _VALID_SCALARS):
        if isinstance(old, str):
            return str(new)
        raise TypeError(
            f"Type mismatch for key {full_key}: "
            f"expected {type(old).__name__}, got {type(new).__name__} ({new!r})"
        )
    return CfgNode._convert(new)
