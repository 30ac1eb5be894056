"""Bidirectional mapping between MAGICC .CFG format and nested configs.

Behavioral mirror of ``python/rscm/config/models/magicc/legacy.py:15-109``
with one deliberate extension: parameters the reference registry tracks as
NOT_IMPLEMENTED but this engine implements (the GHG forcing method and
rapid adjustments) are SUPPORTED here and map through — see
ARCHITECTURE.md "Known deviations".  The mapping table derives from
``MAGICC_PARAMETERS`` dot-paths; nested get/set walks plain dicts so the
output feeds ``build_model``'s TOML-shaped configs directly.
"""

from __future__ import annotations

import logging
from typing import Any, Dict

from .parameters import MAGICC_PARAMETERS, ParameterStatus

logger = logging.getLogger(__name__)

__all__ = ["LEGACY_MAPPING", "from_legacy_dict", "to_legacy_dict"]

LEGACY_MAPPING: Dict[str, str] = {
    p.name.lower(): p.rscm_path
    for p in MAGICC_PARAMETERS.values()
    if p.status == ParameterStatus.SUPPORTED and p.rscm_path
}


def _set_nested(obj: dict, path: str, value: Any):
    keys = path.split(".")
    d = obj
    for key in keys[:-1]:
        d = d.setdefault(key, {})
    d[keys[-1]] = value


def _get_nested(obj: dict, path: str, default: Any = None) -> Any:
    d = obj
    for key in path.split("."):
        if not isinstance(d, dict) or key not in d:
            return default
        d = d[key]
    return d


def from_legacy_dict(legacy: Dict[str, Any]) -> Dict[str, Any]:
    """Flat MAGICC .CFG dict -> nested config dict.

    SUPPORTED parameters map through; NOT_IMPLEMENTED log at INFO;
    DEPRECATED warn; NOT_NEEDED are silent; unknown keys warn.
    """
    config: Dict[str, Any] = {}
    for key, value in legacy.items():
        key_lower = key.lower()
        if key_lower in LEGACY_MAPPING:
            _set_nested(config, LEGACY_MAPPING[key_lower], value)
        elif key_lower in MAGICC_PARAMETERS:
            param = MAGICC_PARAMETERS[key_lower]
            if param.status == ParameterStatus.NOT_IMPLEMENTED:
                logger.info(f"Parameter '{key}' not implemented, ignoring")
            elif param.status == ParameterStatus.DEPRECATED:
                logger.warning(f"Parameter '{key}' is deprecated, ignoring")
        else:
            logger.warning(f"Unknown legacy parameter '{key}', ignoring")
    return config


def to_legacy_dict(config: Dict[str, Any]) -> Dict[str, Any]:
    """Nested config dict -> flat MAGICC .CFG dict (supported keys only)."""
    legacy: Dict[str, Any] = {}
    for legacy_key, rscm_path in LEGACY_MAPPING.items():
        value = _get_nested(config, rscm_path)
        if value is not None:
            legacy[legacy_key] = value
    return legacy
