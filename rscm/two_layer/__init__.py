"""Two-layer climate model component (reference surface)."""

from rscm_tpu.components import TwoLayerBuilder

__all__ = ["TwoLayerBuilder"]
