"""Layered TOML configuration loading
(mirror of python/rscm/config/loader.py:27-128)."""

from __future__ import annotations

import logging
import tomllib
from pathlib import Path

from .validation import find_unknown_keys

logger = logging.getLogger(__name__)

__all__ = ["deep_merge", "load_config", "load_config_layers"]

KNOWN_TOP_LEVEL = {
    "schema",
    "time",
    "components",
    "inputs",
    "outputs",
    "model",
    "initial_values",
}


def deep_merge(base: dict, override: dict) -> dict:
    """Recursive dict merge; override wins, lists replaced not concatenated."""
    result = base.copy()
    for key, value in override.items():
        if key in result and isinstance(result[key], dict) and isinstance(value, dict):
            result[key] = deep_merge(result[key], value)
        else:
            result[key] = value
    return result


def load_config(path) -> dict:
    """Load one TOML file, warning on unknown top-level keys."""
    path = Path(path)
    with path.open("rb") as f:
        config = tomllib.load(f)
    unknown = find_unknown_keys(config, KNOWN_TOP_LEVEL)
    if unknown:
        logger.warning(
            f"Unknown configuration keys in {path}: {', '.join(unknown)}. "
            "These will be ignored."
        )
    # remember where the config lives so relative input files resolve
    config["_base_dir"] = str(path.parent)
    return config


def load_config_layers(*paths) -> dict:
    """Merge configs left-to-right (defaults -> tuning -> experiment)."""
    if not paths:
        return {}
    result = load_config(paths[0])
    for path in paths[1:]:
        result = deep_merge(result, load_config(path))
    return result
