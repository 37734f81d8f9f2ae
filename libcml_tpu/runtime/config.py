"""Dotted-name parameter system with YAML presets and strict unused-key errors.

TPU-native replacement for the reference's Parameter/AbstractFunction config
tier (reference: src/cml/base/Parameter.h:18 typed observable cells,
AbstractFunction.h:102-114 dotted-alias lookup bubbling, AbstractSlam.h:70-83
YAML application with FATAL unused-parameter check).

Here configuration is a tree of frozen dataclasses (e.g. DirectConfig). YAML
keys address fields by dotted path ("direct.max_frames: 6"); apply_config
returns new dataclass instances (configs stay immutable/hashable so they keep
working as jit static arguments) and raises on any key that matches nothing —
the reference's unused-key fatal, which catches preset typos before a run
silently ignores them."""

from __future__ import annotations

import dataclasses
from typing import Any


class UnusedConfigKey(KeyError):
    pass


def _set_path(obj: Any, path: list[str], value: Any) -> Any:
    """Return a copy of the (possibly nested) frozen dataclass with the field
    at `path` replaced. Raises UnusedConfigKey when the path doesn't exist."""
    if not dataclasses.is_dataclass(obj):
        raise UnusedConfigKey(".".join(path))
    name = path[0]
    fields = {f.name: f for f in dataclasses.fields(obj)}
    if name not in fields:
        raise UnusedConfigKey(".".join(path))
    if len(path) == 1:
        cur = getattr(obj, name)
        if cur is not None and not isinstance(value, type(cur)):
            # YAML int -> float promotion etc.; keep the declared field type
            value = type(cur)(value)
        return dataclasses.replace(obj, **{name: value})
    child = _set_path(getattr(obj, name), path[1:], value)
    return dataclasses.replace(obj, **{name: child})


def apply_config(root: Any, settings: dict[str, Any]) -> Any:
    """Apply {dotted.key: value} settings onto a dataclass tree. Every key
    must resolve — unknown keys raise (reference: AbstractSlam.h:77-82)."""
    unused = []
    for key, value in settings.items():
        try:
            root = _set_path(root, key.split("."), value)
        except UnusedConfigKey:
            unused.append(key)
    if unused:
        raise UnusedConfigKey(
            f"configuration keys matched nothing: {unused} — "
            "check spelling against the config dataclasses"
        )
    return root


def _flatten_yaml(node: Any, prefix: str = "") -> dict[str, Any]:
    out: dict[str, Any] = {}
    if isinstance(node, dict):
        for k, v in node.items():
            key = f"{prefix}.{k}" if prefix else str(k)
            out.update(_flatten_yaml(v, key))
    else:
        out[prefix] = node
    return out


def load_yaml_config(root: Any, path: str) -> Any:
    """Apply a YAML preset file; nested mappings and dotted keys both work
    (reference preset format: evaluation/modslam.yaml etc.)."""
    import yaml

    with open(path) as f:
        data = yaml.safe_load(f) or {}
    return apply_config(root, _flatten_yaml(data))
