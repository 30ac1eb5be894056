"""
rscm_tpu — a TPU-native framework for reduced-complexity (simple) climate models.

A ground-up JAX/XLA rebuild of the capabilities of ``lewisjared/rscm``
(the Rust Simple Climate Model framework): a component-graph engine where
each component encapsulates a piece of climate physics, declares named
input/output/state variables with units and spatial grids, and is solved
over an annual time axis.

Architecture (TPU-first, not a port):

- The component graph compiles to a **single fused XLA program**: the
  sequential time loop is ``lax.scan`` over timesteps, per-step RK4/monthly
  sub-stepping is unrolled inside the step function, and all inter-component
  state exchange is pure array dataflow resolved at trace time.
- Parameter/scenario ensembles ``vmap`` over a batch axis and shard across
  chips with ``jax.sharding`` meshes — thousands of runs execute as one
  device program.
- The calibration subsystem (priors, likelihoods, ensemble MCMC) runs
  on-device with autodiff gradients through the full model.
- A host (eager, float64 numpy) execution path provides exact step-by-step
  semantics parity with the reference implementation and supports arbitrary
  (untraceable) user Python components.

Subpackages
-----------
core        Engine: time axis, timeseries, grids, units, components, model
components  Generic component library (TwoLayer, CarbonCycle, CO2ERF, ...)
magicc      MAGICC7-derived component library
calibrate   Calibration: priors, targets, likelihoods, on-device MCMC
config      Layered TOML config system
parallel    Mesh/sharding helpers for multi-chip ensembles
ops         Low-level kernels (tridiagonal solves, ...)
"""

__version__ = "0.1.0"
