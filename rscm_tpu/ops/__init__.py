"""Pallas TPU kernels for the framework's hot ops.

Each kernel has a pure-XLA counterpart elsewhere in the tree; kernels are
opt-in per component and differentially tested against the XLA path
(interpret mode on CPU, real Mosaic on TPU).
"""

from .udeb_month import udeb_year_update

__all__ = ["udeb_year_update"]
