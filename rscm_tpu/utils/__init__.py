"""Utility helpers: linear algebra kernels, TOML encoding."""

from .linear_algebra import invert_4x4, thomas_solve, thomas_solve_assoc, thomas_solve_batched
from .toml_writer import dumps_toml

__all__ = ["thomas_solve", "thomas_solve_batched", "thomas_solve_assoc", "invert_4x4", "dumps_toml"]
