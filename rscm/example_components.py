"""Example components (reference surface)."""

from rscm_tpu.core.example_components import TestComponent, TestComponentBuilder

__all__ = ["TestComponent", "TestComponentBuilder"]
