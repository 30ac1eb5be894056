"""Config-driven model assembly
(mirror of python/rscm/config/builder.py:19-108).

``build_model`` dispatches on ``model.type``; model-family builders read the
component parameter tables, pull builders from the registry, and assemble a
:class:`~rscm_tpu.core.model.Model`.
"""

from __future__ import annotations

from dataclasses import asdict, is_dataclass
from typing import Any

import numpy as np

from .registry import component_registry

__all__ = ["build_model", "build_two_layer_model"]


def build_model(config: Any):
    """Build a model from a ModelConfig instance or a TOML dict."""
    if isinstance(config, dict):
        model_type = config.get("model", {}).get("type", "")
    else:
        model_type = config.model_type
    if model_type == "two-layer":
        return build_two_layer_model(config)
    raise ValueError(f"Unknown model type: {model_type!r}")


def _extract(config: Any):
    if isinstance(config, dict):
        components = config.get("components", {})
        time_config = config.get("time", {})
        initial_values = config.get("initial_values", {}) or {}
    else:
        components = {
            "climate": {
                "parameters": asdict(config.climate)
                if hasattr(config, "climate") and is_dataclass(config.climate)
                else {}
            }
        }
        time_config = (
            {"start": config.time.start, "end": config.time.end}
            if getattr(config, "time", None)
            else {}
        )
        initial_values = getattr(config, "initial_values", {}) or {}
    return components, time_config, initial_values


def build_two_layer_model(config: Any):
    from rscm_tpu.core import ModelBuilder, TimeAxis
    from . import models  # noqa: F401  (side-effect: registers builders)

    components, time_config, initial_values = _extract(config)
    params = components.get("climate", {}).get("parameters", {})

    builder_cls = component_registry.get("TwoLayer")
    component = builder_cls.from_parameters(params).build()

    model_builder = ModelBuilder()
    if time_config:
        start = time_config.get("start", 1750)
        end = time_config.get("end", 2100)
        model_builder = model_builder.with_time_axis(
            TimeAxis.from_values(np.arange(start, end + 1, dtype=float))
        )
    model_builder = model_builder.with_component(component)

    defaults = {"Surface Temperature": 0.0, "Deep Ocean Temperature": 0.0}
    defaults.update(initial_values)
    model_builder = model_builder.with_initial_values(defaults)
    return model_builder.build()
