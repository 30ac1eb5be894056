"""Parameter metadata for configuration dataclasses
(mirror of python/rscm/config/parameters.py)."""

from __future__ import annotations

import warnings
from dataclasses import MISSING, dataclass, field, fields
from typing import Any, List, Optional, Tuple

__all__ = [
    "ParameterMetadata",
    "parameter",
    "get_parameter_metadata",
    "validate_parameters",
]


@dataclass
class ParameterMetadata:
    name: str
    unit: Optional[str] = None
    description: Optional[str] = None
    range: Optional[Tuple[float, float]] = None
    typical_range: Optional[Tuple[float, float]] = None
    choices: Optional[List[Any]] = None
    source: Optional[str] = None
    deprecated: bool = False
    deprecated_message: Optional[str] = None


def parameter(
    default: Any = MISSING,
    unit: Optional[str] = None,
    description: Optional[str] = None,
    range: Optional[Tuple[float, float]] = None,
    typical_range: Optional[Tuple[float, float]] = None,
    choices: Optional[List[Any]] = None,
    source: Optional[str] = None,
    deprecated: bool = False,
    deprecated_message: Optional[str] = None,
) -> Any:
    """Dataclass field with validation/documentation metadata attached."""
    metadata = {
        "param": ParameterMetadata(
            name="",
            unit=unit,
            description=description,
            range=range,
            typical_range=typical_range,
            choices=choices,
            source=source,
            deprecated=deprecated,
            deprecated_message=deprecated_message,
        )
    }
    if default is MISSING:
        return field(metadata=metadata)
    return field(default=default, metadata=metadata)


def get_parameter_metadata(cls: type) -> dict:
    result = {}
    for f in fields(cls):
        if "param" in f.metadata:
            meta = f.metadata["param"]
            meta.name = f.name
            result[f.name] = meta
    return result


def validate_parameters(instance: Any) -> list:
    """Validate an instance against its metadata; returns error messages."""
    errors = []
    metadata = get_parameter_metadata(type(instance))
    for name, meta in metadata.items():
        value = getattr(instance, name)
        if meta.deprecated:
            warnings.warn(
                meta.deprecated_message or f"Parameter '{name}' is deprecated",
                DeprecationWarning,
                stacklevel=2,
            )
        if meta.range is not None:
            min_val, max_val = meta.range
            if value < min_val or value > max_val:
                errors.append(
                    f"Parameter '{name}' value {value} is outside valid range "
                    f"[{min_val}, {max_val}]"
                )
        if meta.choices is not None and value not in meta.choices:
            errors.append(
                f"Parameter '{name}' value {value!r} is not in valid choices: "
                f"{meta.choices}"
            )
    return errors
