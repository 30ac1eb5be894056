"""Model-family config modules; importing registers their builders."""

from . import two_layer  # noqa: F401

__all__ = ["two_layer"]
