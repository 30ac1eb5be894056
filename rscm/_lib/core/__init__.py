"""``rscm._lib.core`` — the reference's native core module surface."""

from rscm.core import *  # noqa: F401,F403
from rscm.core import __all__ as _core_all
from rscm.example_components import TestComponent, TestComponentBuilder  # noqa: F401

from . import spatial, state  # noqa: F401

__all__ = list(_core_all) + [
    "TestComponent",
    "TestComponentBuilder",
    "state",
    "spatial",
]
