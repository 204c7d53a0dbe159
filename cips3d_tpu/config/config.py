"""Layered YAML config system + component registry.

Native replacement for the tl2 config machinery the reference depends on
(SURVEY §1 "external framework dependency"; semantics from
`exp/cips3d/configs/ffhq_exp.yaml` + launcher usage at
`exp/tests/test_cips3d.py:844-946`):

  * one YAML file holds many named "command" nodes;
  * ``--command`` selects one node;
  * ``base: other_node`` gives single-inheritance (deep-merged, child wins);
  * ``--opts key.subkey value ...`` applies dotted overrides;
  * model nodes carry a ``name`` resolved through a registry to a builder.

The resolved node is an attribute-accessible ``Config`` (nested dict wrapper).
No process-global config: the resolved object is passed explicitly.
"""

from __future__ import annotations

import argparse
import copy
from typing import Any, Callable, Dict, List, Optional

import yaml


class Config(dict):
    """Dict with attribute access, recursively."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return Config(v) if isinstance(v, dict) and not isinstance(v, Config) else v

    def __setattr__(self, k, v):
        self[k] = v

    @staticmethod
    def wrap(obj):
        if isinstance(obj, dict):
            return Config({k: Config.wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [Config.wrap(v) for v in obj]
        return obj

    def to_dict(self) -> dict:
        def unwrap(o):
            if isinstance(o, dict):
                return {k: unwrap(v) for k, v in o.items()}
            if isinstance(o, list):
                return [unwrap(v) for v in o]
            return o

        return unwrap(self)


def deep_merge(base: dict, override: dict) -> dict:
    """Recursive merge; override wins; dicts merge, everything else replaces."""
    out = copy.deepcopy(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def _parse_value(s: str) -> Any:
    """YAML-parse a CLI override value ('true' → True, '1e-4' → float, ...).

    YAML 1.1 doesn't recognize bare scientific notation like '1e-5' (needs
    '1e-05' or a dot), so try a plain float parse first for number-likes.
    """
    try:
        out = yaml.safe_load(s)
    except yaml.YAMLError:
        return s
    if isinstance(out, str):
        try:
            return float(out)
        except ValueError:
            return out
    return out


def apply_dotted_overrides(node: dict, opts: List[str]) -> dict:
    """Apply ``key.sub value`` pairs (`--tl_opts` analogue)."""
    if len(opts) % 2 != 0:
        raise ValueError("--opts expects key value pairs")
    node = copy.deepcopy(node)
    for i in range(0, len(opts), 2):
        keys = opts[i].split(".")
        value = _parse_value(opts[i + 1])
        cur = node
        for k in keys[:-1]:
            if k not in cur or not isinstance(cur[k], dict):
                cur[k] = {}
            cur = cur[k]
        cur[keys[-1]] = value
    return node


def resolve_command(
    config_file: str,
    command: str,
    opts: Optional[List[str]] = None,
) -> Config:
    """Load a YAML file, resolve ``command`` with its ``base:`` chain, apply
    dotted overrides, and return the resolved Config."""
    with open(config_file) as f:
        doc = yaml.safe_load(f) or {}

    def resolve(name: str, seen=()) -> dict:
        if name in seen:
            raise ValueError(f"base: cycle at {name}")
        if name not in doc:
            raise KeyError(f"command node {name!r} not in {config_file}")
        node = copy.deepcopy(doc[name]) or {}
        base_name = node.pop("base", None)
        if base_name:
            node = deep_merge(resolve(base_name, seen + (name,)), node)
        return node

    node = resolve(command)
    if opts:
        node = apply_dotted_overrides(node, opts)
    node["command"] = command
    node["config_file"] = config_file
    return Config.wrap(node)


def dump_config(cfg: Config) -> str:
    return yaml.safe_dump(cfg.to_dict(), sort_keys=False)


# --------------------------------------------------------------------- #
# registry (`MODEL_REGISTRY`/`build_model` analogue)

_REGISTRY: Dict[str, Callable] = {}


def register(name: Optional[str] = None):
    """Decorator: register a builder/class under ``name`` (default: qualname)."""

    def deco(fn):
        _REGISTRY[name or f"{fn.__module__}.{fn.__qualname__}"] = fn
        return fn

    return deco


def registry_get(name: str) -> Callable:
    if name not in _REGISTRY:
        raise KeyError(f"{name!r} not registered; known: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def build_model(cfg: Config, **kwargs_priority):
    """Instantiate a registered component from a config node with ``name``
    (`tl2.proj.fvcore.build_model` analogue; extra kwargs win)."""
    node = cfg.to_dict() if isinstance(cfg, Config) else dict(cfg)
    name = node.pop("name")
    node.pop("register_modules", None)
    node.update(kwargs_priority)
    return registry_get(name)(**node)


def parse_args(argv=None) -> argparse.Namespace:
    """Standard launcher flags (`--tl_config_file/--tl_command/--tl_opts`
    analogues)."""
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True, help="YAML config file")
    p.add_argument("--command", required=True, help="command node to run")
    p.add_argument("--opts", nargs="*", default=[], help="dotted overrides: key value ...")
    p.add_argument("--outdir", default="results", help="output root")
    p.add_argument("--debug", action="store_true", help="tiny smoke-run mode")
    return p.parse_args(argv)
