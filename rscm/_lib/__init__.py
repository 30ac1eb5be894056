"""Stand-in for the reference's native extension module.

The reference builds ``rscm._lib`` from Rust (PyO3); here the same surface
is provided by the pure-JAX engine, re-exported through the sibling
modules.
"""

from rscm_tpu import __version__

__all__ = ["__version__"]
