"""Config serialization: the tag + kwargs round-trip used across the
framework.

Mirrors the reference's ``export_description`` / ``load_from_description``
pattern (reference diffsci/models/karras/karrasmodule.py:343-365,
nets/punetg_config.py:7-122) with a central registry so any component can be
rebuilt from a plain-JSON description.
"""

from __future__ import annotations

import json
import pathlib
from typing import Any, Callable

_REGISTRY: dict[str, Callable[..., Any]] = {}


def register(tag: str):
    """Class decorator registering a constructor under ``tag``."""
    def deco(cls):
        _REGISTRY[tag] = cls
        cls.tag = tag
        return cls
    return deco


def build(description: dict[str, Any]):
    """Rebuild a registered component from ``{"tag": ..., "extra_args": ...}``."""
    tag = description["tag"]
    if tag not in _REGISTRY:
        raise ValueError(f"unknown config tag: {tag!r}")
    ctor = _REGISTRY[tag]
    extra = description.get("extra_args", {})
    factory = description.get("factory")
    if factory is not None:
        ctor = getattr(ctor, factory)
    return ctor(**extra)


def save_description(description: dict[str, Any],
                     path: str | pathlib.Path) -> None:
    pathlib.Path(path).write_text(json.dumps(description, indent=2))


def load_description(path: str | pathlib.Path) -> dict[str, Any]:
    return json.loads(pathlib.Path(path).read_text())
