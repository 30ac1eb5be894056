"""``rscm.two_layer`` — the Held et al. (2010) two-layer energy-balance
component, resolved to the JAX engine's implementation (the reference
binds this name to its Rust component)."""

from rscm_tpu.components import TwoLayerBuilder

__all__ = ["TwoLayerBuilder"]
