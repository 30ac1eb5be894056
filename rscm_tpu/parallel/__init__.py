"""
Multi-chip ensemble execution: vmap over members, shard over a device mesh.

The reference's only parallelism is rayon threads over ensemble members
(SURVEY.md §2.9, ``crates/rscm-calibrate/src/model_runner.rs:251-265``).
The TPU-native equivalent implemented here:

- a parameter/scenario ensemble is **one device program**: ``jax.vmap`` over
  stacked parameter pytrees (and optionally stacked exogenous forcings)
  of the model's fused ``lax.scan`` program;
- scaling beyond one chip is ``jax.sharding``: the batch axis is laid out
  over a 1-D ``Mesh`` so XLA slices members across chips with no
  collectives on the hot path (members are independent; ICI traffic is
  zero during the scan).
"""

from .ensemble import EnsembleRunner, make_mesh, stack_params

__all__ = ["EnsembleRunner", "make_mesh", "stack_params"]
