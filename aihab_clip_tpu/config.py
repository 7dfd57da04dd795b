"""Two-layer YAML configuration system.

Capability parity with the reference's config stack
(`/root/reference/utils.py:84-210`, `/root/reference/main.py:51-61`,
`/root/reference/tools/run_ft_sweep.py:67-130`) in one unified
implementation:

  * ``ConfigNode`` — dict subclass with attribute access and pretty printing.
  * ``load_config_file`` — YAML -> ConfigNode.
  * ``load_configs`` — base + dataset layering (dataset shallow-overrides base).
  * ``merge_from_pairs`` — ``--opts KEY VALUE ...`` overrides restricted to
    existing top-level keys (last dotted segment), with literal-eval decoding
    and strict type coercion.
  * ``set_by_dotted_path`` / ``get_by_dotted_path`` — nested dotted-key
    overrides that *may create* new nested keys (the sweep-launcher semantic).
"""

from __future__ import annotations

import copy
import os
from ast import literal_eval
from pathlib import Path
from typing import Any, Iterable, List, Optional, Sequence

import yaml


class ConfigNode(dict):
    """Dict-like config tree with attribute access.

    Mirrors the access pattern of the reference runner: both ``cfg['key']``
    and ``cfg.key`` work, and ``cfg.get(...)`` falls back permissively.
    """

    def __init__(self, init_dict: Optional[dict] = None):
        init_dict = {} if init_dict is None else dict(init_dict)
        for k, v in init_dict.items():
            if type(v) is dict:
                init_dict[k] = ConfigNode(v)
        super().__init__(init_dict)

    def __getattr__(self, name: str) -> Any:
        if name in self:
            return self[name]
        raise AttributeError(name)

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __str__(self) -> str:
        return "\n".join(self._render_lines(""))

    def _render_lines(self, prefix: str):
        """Yield pretty-printed ``key: value`` lines, nesting by two-space
        prefixes (subtrees recurse with a deeper prefix)."""
        for key in sorted(self):
            value = self[key]
            if isinstance(value, ConfigNode):
                yield f"{prefix}{key}:"
                yield from value._render_lines(prefix + "  ")
            else:
                yield f"{prefix}{key}: {value}"

    def __repr__(self) -> str:
        return f"{self.__class__.__name__}({super().__repr__()})"

    def clone(self) -> "ConfigNode":
        return copy.deepcopy(self)

    def to_dict(self) -> dict:
        out = {}
        for k, v in self.items():
            out[k] = v.to_dict() if isinstance(v, ConfigNode) else v
        return out


def decode_value(v: Any) -> Any:
    """Decode a string override into a Python literal when possible."""
    if not isinstance(v, str):
        return v
    try:
        return literal_eval(v)
    except (ValueError, SyntaxError):
        return v


def coerce_value_type(replacement: Any, original: Any, full_key: str) -> Any:
    """Coerce ``replacement`` to the type of ``original`` or raise.

    Same contract as the reference's coercion: exact type match passes,
    tuple<->list converts, anything else is a hard error (catches typo'd
    override values early).  ``None`` originals accept anything.
    """
    if original is None or replacement is None:
        return replacement
    original_type, replacement_type = type(original), type(replacement)
    if replacement_type is original_type:
        return replacement
    # numeric widening: int -> float is safe
    if replacement_type is int and original_type is float:
        return float(replacement)
    if isinstance(replacement, tuple) and isinstance(original, list):
        return list(replacement)
    if isinstance(replacement, list) and isinstance(original, tuple):
        return tuple(replacement)
    if isinstance(original, bool) and isinstance(replacement, str):
        low = replacement.lower()
        if low in ("true", "1", "yes"):
            return True
        if low in ("false", "0", "no"):
            return False
    # tri-state keys (e.g. device_dataset: true | false | 'auto') accept
    # bool overrides over a string default
    if isinstance(original, str) and isinstance(replacement, bool):
        return replacement
    raise ValueError(
        f"Type mismatch ({original_type} vs. {replacement_type}) with values "
        f"({original} vs. {replacement}) for config key: {full_key}"
    )


def load_config_file(path: str | Path) -> ConfigNode:
    path = str(path)
    if not (os.path.isfile(path) and path.endswith((".yaml", ".yml"))):
        raise ValueError(f"{path} is not a yaml file")
    with open(path, "r") as f:
        raw = yaml.safe_load(f) or {}
    return ConfigNode(raw)


def resolve_config_path(p: str, anchors: Sequence[Path] = ()) -> str:
    """Resolve a config path relative to cwd or the given anchor dirs."""
    cand = Path(p)
    if cand.is_file():
        return str(cand)
    for anchor in anchors:
        c = Path(anchor) / p
        if c.is_file():
            return str(c)
    tried = [str(cand)] + [str(Path(a) / p) for a in anchors]
    raise FileNotFoundError(f"Config not found at '{p}' (tried: {tried})")


def load_configs(base_config: str, dataset_config: Optional[str] = None,
                 opts: Optional[List[str]] = None,
                 anchors: Sequence[Path] = ()) -> ConfigNode:
    """base + dataset layering: dataset shallow-overrides base top-level keys."""
    cfg = load_config_file(resolve_config_path(base_config, anchors))
    if dataset_config:
        ds = load_config_file(resolve_config_path(dataset_config, anchors))
        cfg.update(ds)
    if opts:
        cfg = merge_from_pairs(cfg, opts)
    return cfg


def merge_from_pairs(cfg: ConfigNode, pairs: Sequence[str]) -> ConfigNode:
    """Apply ``--opts KEY VALUE ...`` overrides.

    A fully-dotted key that resolves in the nested tree is set in place
    (``--opts finetune.lora_rank 8`` — the sweep launcher's semantics);
    otherwise the reference semantic applies: the *last* dotted segment
    must name an existing top-level key (`/root/reference/utils.py:197-210`).
    Unknown keys raise either way.  Values are literal-eval'd and
    type-coerced against the existing value.
    """
    new_cfg = copy.deepcopy(cfg)
    if len(pairs) % 2 != 0:
        raise ValueError(f"--opts expects KEY VALUE pairs, got: {list(pairs)}")
    _missing = object()
    for full_key, v in zip(pairs[0::2], pairs[1::2]):
        value = decode_value(v)
        nested = get_by_dotted_path(cfg, full_key, _missing)
        if "." in full_key and nested is not _missing:
            # strict --opts coercion, then the shared dotted writer
            set_by_dotted_path(new_cfg, full_key,
                               coerce_value_type(value, nested, full_key),
                               coerce=False)
            continue
        subkey = full_key.split(".")[-1]
        if subkey not in cfg:
            raise KeyError(f"Non-existent key: {full_key}")
        value = coerce_value_type(value, cfg[subkey], full_key)
        setattr(new_cfg, subkey, value)
    return new_cfg


def get_by_dotted_path(cfg: ConfigNode, dotted: str, default: Any = None) -> Any:
    node: Any = cfg
    for part in dotted.split("."):
        if isinstance(node, dict) and part in node:
            node = node[part]
        else:
            return default
    return node


def set_by_dotted_path(cfg: ConfigNode, dotted: str, value: Any,
                       coerce: bool = True) -> None:
    """Write a (possibly new) nested key via a dotted path, in place.

    This is the sweep-launcher semantic: intermediate ConfigNodes are
    created as needed and existing leaf types are coerced when possible.
    """
    parts = dotted.split(".")
    node: Any = cfg
    for part in parts[:-1]:
        if part not in node or not isinstance(node[part], dict):
            node[part] = ConfigNode()
        node = node[part]
    leaf = parts[-1]
    value = decode_value(value)
    if coerce and leaf in node and node[leaf] is not None:
        try:
            value = coerce_value_type(value, node[leaf], dotted)
        except ValueError:
            pass  # sweep overrides are permissive; keep the decoded value
    node[leaf] = value


def apply_dotted_overrides(cfg: ConfigNode,
                           overrides: Iterable[tuple[str, Any]]) -> ConfigNode:
    out = copy.deepcopy(cfg)
    for dotted, value in overrides:
        set_by_dotted_path(out, dotted, value)
    return out
