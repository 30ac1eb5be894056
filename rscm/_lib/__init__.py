"""Stand-in for the reference's native extension module.

The reference builds ``rscm._lib`` from Rust (PyO3) with submodules
``core`` / ``core.state`` / ``core.spatial`` / ``two_layer`` /
``components`` / ``magicc`` / ``calibrate``; here the same import paths
resolve to the pure-JAX engine so code written against the reference —
including its own test suite — imports unchanged.
"""

from rscm_tpu import __version__

from . import calibrate, components, core, magicc, two_layer  # noqa: F401

__all__ = [
    "__version__",
    "core",
    "two_layer",
    "components",
    "magicc",
    "calibrate",
]
