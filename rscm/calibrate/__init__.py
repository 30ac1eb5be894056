"""Calibration framework (reference surface of ``rscm.calibrate``)."""

from rscm_tpu.calibrate import (
    Bound,
    Chain,
    CompiledModelRunner,
    DefaultModelRunner,
    EnsembleSampler,
    GaussianLikelihood,
    LogNormal,
    ModelRunner,
    Normal,
    Observation,
    ParameterSet,
    PointEstimate as OptimizationResult,
    PointEstimator,
    ProgressInfo,
    RandomSearch,
    Target,
    Uniform,
    VariableTarget,
    WalkerInit,
)
from rscm_tpu.calibrate import progress  # noqa: F401

import sys as _sys

_sys.modules[__name__ + ".progress"] = progress

try:
    from rscm_tpu.calibrate import chain_to_dataframe, target_from_dataframe

    HAS_PANDAS = True
except ImportError:  # pragma: no cover
    HAS_PANDAS = False
    chain_to_dataframe = None
    target_from_dataframe = None


class Optimizer:
    """Enum-style optimizer selection matching the reference
    (``optimizer.rs``: only RandomSearch existed there; the engine also
    provides gradient-based optimizers via rscm_tpu.calibrate)."""

    RandomSearch = RandomSearch()

    @staticmethod
    def random_search(seed=None):
        return RandomSearch(seed)


__all__ = [
    "HAS_PANDAS",
    "Bound",
    "Chain",
    "CompiledModelRunner",
    "DefaultModelRunner",
    "EnsembleSampler",
    "GaussianLikelihood",
    "LogNormal",
    "ModelRunner",
    "Normal",
    "Observation",
    "OptimizationResult",
    "Optimizer",
    "ParameterSet",
    "PointEstimator",
    "ProgressInfo",
    "RandomSearch",
    "Target",
    "Uniform",
    "VariableTarget",
    "WalkerInit",
    "chain_to_dataframe",
    "progress",
    "target_from_dataframe",
]
