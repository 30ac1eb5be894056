"""
rscm — compatibility surface over the TPU-native rscm_tpu engine.

This package preserves the reference's public Python API
(``python/rscm/``) so code and notebooks written against
``lewisjared/rscm`` run against the JAX engine unchanged:

- ``rscm.core`` — engine types (ModelBuilder, TimeAxis, Timeseries, ...)
- ``rscm.component`` — typed Python components (Input/Output/State)
- ``rscm.components`` / ``rscm.two_layer`` / ``rscm.magicc`` — builders
- ``rscm.calibrate`` — calibration framework
- ``rscm.config`` — layered TOML config system
"""

# The reference engine is Rust float64; code written against it assumes
# double precision (its regression tolerances are 1e-5 and tighter).  The
# compat surface therefore enables JAX x64 mode on import — exactly the
# precision contract `import rscm` promised.  (TPU-first users wanting
# float32 speed import `rscm_tpu` directly, which leaves the flag alone.)
import jax as _jax

_jax.config.update("jax_enable_x64", True)

from rscm._lib import __version__ as _lib_version  # noqa: E402

__version__ = _lib_version
