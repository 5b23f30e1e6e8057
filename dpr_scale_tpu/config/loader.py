"""Config system: YAML groups + dotted CLI overrides, no Hydra dependency.

Keeps the reference's config-group structure (conf/config.py:9-38 —
groups ``task``, ``task/model``, ``task/transform``, ``task/optim``,
``datamodule``, ``trainer``, ``checkpoint_callback``) but avoids its
anti-patterns (SURVEY.md §5): no ``_target_`` string rewriting by entry
scripts — entry points pick tasks from an explicit registry.

A config file may declare hydra-style group defaults::

    defaults:
      - task/model: bert_base      # merges conf/task/model/bert_base.yaml
      - datamodule: jsonl          #   under cfg.task.model / cfg.datamodule
    task:
      softmax_temperature: 0.05    # file body overrides defaults

CLI overrides are ``dotted.path=value`` with YAML-parsed values
(``trainer.max_steps=1000``, ``task.use_title=true``).
"""
from __future__ import annotations

import copy
import os
from typing import Any, Dict, List, Optional, Sequence

import yaml


class Config(dict):
    """dict with attribute access, recursively."""

    def __getattr__(self, key: str) -> Any:
        try:
            val = self[key]
        except KeyError as e:
            raise AttributeError(key) from e
        return val

    def __setattr__(self, key: str, value: Any) -> None:
        self[key] = value

    @staticmethod
    def wrap(obj: Any) -> Any:
        if isinstance(obj, dict):
            return Config({k: Config.wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [Config.wrap(v) for v in obj]
        return obj

    def get_path(self, dotted: str, default: Any = None) -> Any:
        node: Any = self
        for part in dotted.split("."):
            if not isinstance(node, dict) or part not in node:
                return default
            node = node[part]
        return node


def deep_merge(base: Dict, override: Dict) -> Dict:
    """Recursively merge ``override`` into ``base`` (override wins)."""
    out = dict(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def _nest(path_parts: Sequence[str], value: Any) -> Dict:
    for part in reversed(path_parts):
        value = {part: value}
    return value


def _resolve_defaults(cfg: Dict, conf_dir: str) -> Dict:
    defaults = cfg.pop("defaults", None)
    if not defaults:
        return cfg
    merged: Dict = {}
    for entry in defaults:
        if isinstance(entry, dict):
            (group, name), = entry.items()
        else:
            group, _, name = str(entry).rpartition("/")
        group_parts = [p for p in group.split("/") if p]
        path = os.path.join(conf_dir, *group_parts, f"{name}.yaml")
        with open(path) as f:
            sub = yaml.safe_load(f) or {}
        sub = _resolve_defaults(sub, conf_dir)
        merged = deep_merge(merged, _nest(group_parts, sub))
    return deep_merge(merged, cfg)


def parse_overrides(args: Sequence[str]) -> Dict:
    """``a.b.c=value`` strings -> nested dict with YAML-typed values."""
    out: Dict = {}
    for arg in args:
        if "=" not in arg:
            raise ValueError(f"override must look like key=value: {arg!r}")
        key, _, raw = arg.partition("=")
        value = yaml.safe_load(raw) if raw != "" else None
        if isinstance(value, str):
            # YAML 1.1 only floats mantissas with a dot, so "1e-3" (a very
            # common CLI form, hydra accepts it) would stay a string
            try:
                value = int(value)
            except ValueError:
                try:
                    value = float(value)
                except ValueError:
                    pass
        out = deep_merge(out, _nest(key.split("."), value))
    return out


def load_config(
    path: str,
    overrides: Optional[Sequence[str]] = None,
    conf_dir: Optional[str] = None,
) -> Config:
    with open(path) as f:
        cfg = yaml.safe_load(f) or {}
    cfg = _resolve_defaults(cfg, conf_dir or os.path.dirname(os.path.abspath(path)))
    if overrides:
        cfg = deep_merge(cfg, parse_overrides(overrides))
    return Config.wrap(cfg)
