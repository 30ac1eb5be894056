"""Model-family config modules; importing registers their builders."""

from . import magicc, two_layer  # noqa: F401

__all__ = ["magicc", "two_layer"]
