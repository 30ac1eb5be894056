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

from rscm._lib import __version__ as _lib_version

__version__ = _lib_version
