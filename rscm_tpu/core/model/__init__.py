"""
Model assembly and execution.

- :mod:`builder` — ``ModelBuilder``: component graph construction, variable
  classification, unit/grid validation, transform planning, collection
  allocation (mirror of ``crates/rscm-core/src/model/builder.rs``).
- :mod:`runtime` — ``Model``: stepping API, checkpointing, debug info
  (mirror of ``model/runtime.rs``/``model/debug.rs``), executing either
  eagerly on host or through the compiled program.
- :mod:`program` — the TPU-native engine: emits one fused step function and
  runs it under ``lax.scan``; ensembles ``vmap``/shard over it.
"""

from .builder import ModelBuilder
from .runtime import Model

__all__ = ["ModelBuilder", "Model"]
