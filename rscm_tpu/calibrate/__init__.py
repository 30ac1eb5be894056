"""
Calibration: priors, targets, likelihoods, ensemble MCMC, point estimation.

Mirror of ``crates/rscm-calibrate`` with TPU-native execution:

- the reference evaluates walkers with rayon threads, one model per thread
  (``model_runner.rs:251-265``); here the whole posterior batch is one
  ``vmap`` of the compiled model program, and the **entire MCMC loop** runs
  on-device as a ``lax.scan`` over iterations (stretch moves, complement
  draws, accept/reject — all traced, following the vectorised-ensemble
  pattern of Goodman & Weare samplers on accelerators);
- autodiff through the model enables gradient-based point estimation
  (Adam / L-BFGS) where the reference only had RandomSearch.

A host execution path (``EnsembleSampler`` with any user ``ModelRunner``)
preserves the reference's API and semantics for arbitrary Python models.
"""

from .distribution import Bound, Distribution, LogNormal, Normal, Uniform
from .parameter_set import ParameterSet
from .target import Observation, Target, VariableTarget
from .likelihood import GaussianLikelihood, LikelihoodFn, ModelOutput, VariableOutput
from .model_runner import (
    CompiledModelRunner,
    DefaultModelRunner,
    ModelRunner,
    SensitivityAnalyzer,
)
from .chain import Chain
from .sampler import (
    DEMove,
    EnsembleSampler,
    ProgressInfo,
    SamplerState,
    StretchMove,
    WalkerInit,
)
from .nuts import NUTSSampler
from .point_estimator import (
    AdamOptimizer,
    EstimateKind,
    LBFGSOptimizer,
    Optimizer,
    PointEstimate,
    PointEstimator,
    RandomSearch,
)

# pandas integration (graceful without pandas, mirroring the reference)
try:
    from .pandas_helpers import chain_to_dataframe, target_from_dataframe

    def _chain_to_dataframe(self, discard: int = 0):
        """Convert chain to a pandas DataFrame (walker/iteration index)."""
        return chain_to_dataframe(self, discard=discard)

    Chain.to_dataframe = _chain_to_dataframe
    Target.from_dataframe = staticmethod(target_from_dataframe)
    HAS_PANDAS = True
except ImportError:  # pragma: no cover
    HAS_PANDAS = False
    chain_to_dataframe = None
    target_from_dataframe = None

from . import progress  # noqa: E402

__all__ = [
    "Bound",
    "Chain",
    "CompiledModelRunner",
    "DefaultModelRunner",
    "Distribution",
    "EnsembleSampler",
    "EstimateKind",
    "GaussianLikelihood",
    "AdamOptimizer",
    "LBFGSOptimizer",
    "LikelihoodFn",
    "LogNormal",
    "ModelOutput",
    "ModelRunner",
    "NUTSSampler",
    "Normal",
    "Observation",
    "Optimizer",
    "ParameterSet",
    "PointEstimate",
    "PointEstimator",
    "ProgressInfo",
    "RandomSearch",
    "SamplerState",
    "SensitivityAnalyzer",
    "StretchMove",
    "DEMove",
    "Target",
    "Uniform",
    "VariableOutput",
    "VariableTarget",
    "WalkerInit",
]
