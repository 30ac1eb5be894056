"""
Point estimation (MAP / maximum-likelihood) with pluggable optimizers.

Mirror of ``crates/rscm-calibrate/src/point_estimator.rs`` +
``optimizer.rs``: :class:`PointEstimator` evaluates log-posteriors and
tracks the evaluation history; :class:`RandomSearch` matches the
reference's only optimizer.

TPU-native additions the reference only aspired to (its docs mention
L-BFGS-B/NM/PSO "aspirationally"): because the model is differentiable
end-to-end, :class:`AdamOptimizer` and :class:`LBFGSOptimizer` run true
gradient-based optimisation through the compiled model program.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum
from typing import List, Optional

import numpy as np

from .likelihood import GaussianLikelihood, LikelihoodFn
from .model_runner import CompiledModelRunner, ModelRunner
from .parameter_set import ParameterSet
from .target import Target

__all__ = [
    "EstimateKind",
    "PointEstimate",
    "PointEstimator",
    "Optimizer",
    "RandomSearch",
    "AdamOptimizer",
    "LBFGSOptimizer",
]


class EstimateKind(Enum):
    MAP = "MAP"  # maximise prior + likelihood
    ML = "ML"  # maximise likelihood only


@dataclass
class PointEstimate:
    best_params: List[float]
    best_log_likelihood: float
    best_log_posterior: float
    n_evaluations: int
    converged: bool


class PointEstimator:
    def __init__(
        self,
        params: ParameterSet,
        runner: ModelRunner,
        likelihood: LikelihoodFn,
        target: Target,
    ):
        self.params = params
        self.runner = runner
        self.likelihood = likelihood
        self.target = target
        self._evaluated_params: List[List[float]] = []
        self._evaluated_log_likelihoods: List[float] = []

    # reference API: counts/names are attributes, history via methods
    @property
    def n_params(self) -> int:
        return len(self.params)

    @property
    def param_names(self) -> list:
        return self.params.param_names()

    @property
    def n_evaluations(self) -> int:
        return len(self._evaluated_params)

    def evaluated_params(self) -> list:
        return list(self._evaluated_params)

    def evaluated_log_likelihoods(self) -> list:
        return list(self._evaluated_log_likelihoods)

    def clear_history(self) -> None:
        self._evaluated_params.clear()
        self._evaluated_log_likelihoods.clear()

    def best(self):
        """(params, log_likelihood) of the best finite evaluation, or None."""
        if not self._evaluated_params:
            return None
        lls = np.asarray(self._evaluated_log_likelihoods, dtype=float)
        if not np.any(np.isfinite(lls)):
            return None
        i = int(np.nanargmax(np.where(np.isfinite(lls), lls, -np.inf)))
        return list(self._evaluated_params[i]), float(lls[i])

    def bounds(self):
        return self.params.bounds()

    def evaluate(self, theta) -> float:
        theta = list(np.asarray(theta, dtype=np.float64))

        def record(ll):
            self._evaluated_params.append(theta)
            self._evaluated_log_likelihoods.append(ll)

        try:
            log_prior = float(self.params.log_prior(np.asarray(theta)))
        except Exception:
            record(-np.inf)
            return -np.inf
        if not np.isfinite(log_prior):
            record(-np.inf)
            return -np.inf
        try:
            output = self.runner.run(theta)
            log_likelihood = float(self.likelihood.ln_likelihood(output, self.target))
        except Exception:
            record(-np.inf)
            return -np.inf
        record(log_likelihood)
        return log_prior + log_likelihood

    # -- traced objective (gradient path) -----------------------------------

    def _traced_objective(self, kind: EstimateKind):
        if not isinstance(self.runner, CompiledModelRunner):
            return None
        if not isinstance(self.likelihood, GaussianLikelihood):
            return None
        compiled_target = self.target.compile(
            self.runner.model.time_axis, self.runner.model.collection
        )
        traj_fn = self.runner.trajectories_fn()
        likelihood = self.likelihood
        params = self.params

        def negative_log_prob(theta):
            ll = likelihood.ln_likelihood_traced(traj_fn(theta), compiled_target)
            if kind is EstimateKind.MAP:
                ll = ll + params.log_prior(theta)
            return -ll

        return negative_log_prob

    def optimize(self, optimizer: "Optimizer", n_samples=None, **kwargs) -> PointEstimate:
        """Run an optimizer; accepts the reference's positional
        ``optimize(Optimizer.RandomSearch, n_samples)`` calling style."""
        if isinstance(optimizer, type):
            optimizer = optimizer()
        if n_samples is not None:
            kwargs["n_samples"] = n_samples
        return optimizer.optimize(self, **kwargs)


class Optimizer:
    @staticmethod
    def random_search(seed=None) -> "RandomSearch":
        """Reference-style factory: ``Optimizer.random_search()``."""
        return RandomSearch(seed)

    def optimize(self, estimator: PointEstimator, **kwargs) -> PointEstimate:
        raise NotImplementedError


class RandomSearch(Optimizer):
    """Uniform sampling within the prior bounds (reference parity)."""

    def __init__(self, seed: Optional[int] = None):
        self.seed = seed

    def optimize(self, estimator: PointEstimator, n_samples: int = 100) -> PointEstimate:
        rng = np.random.default_rng(self.seed)
        lower, upper = estimator.bounds()
        lower = np.asarray(lower)
        upper = np.asarray(upper)
        finite = np.isfinite(lower) & np.isfinite(upper)
        span_low = np.where(finite, lower, -10.0)
        span_high = np.where(finite, upper, 10.0)

        best_params = None
        best_log_posterior = -np.inf
        best_log_likelihood = -np.inf
        for _ in range(n_samples):
            theta = span_low + rng.random(len(lower)) * (span_high - span_low)
            log_posterior = estimator.evaluate(theta)
            if log_posterior > best_log_posterior:
                best_log_posterior = log_posterior
                best_log_likelihood = estimator._evaluated_log_likelihoods[-1]
                best_params = list(theta)
        if best_params is None:
            raise RuntimeError("Random search found no valid samples")
        return PointEstimate(
            best_params, best_log_likelihood, best_log_posterior, n_samples, True
        )


class AdamOptimizer(Optimizer):
    """Gradient ascent through the compiled model (optax Adam).

    The whole optimisation is ONE ``lax.scan`` compiled on device (a
    Python step loop pays a dispatch round-trip per step — fatal through
    a remote-TPU tunnel).  Gradients use batched forward mode for small
    parameter vectors (D JVPs ride the model's forward scan with no
    residual traffic; same engine as NUTS ``grad_mode='fwd'``) and
    reverse mode above ``fwd_threshold``.  Iterates are clipped to the
    prior bounds so the line search cannot leave the support (-inf walls
    make gradients vanish).
    """

    def __init__(self, learning_rate: float = 0.05, n_steps: int = 200,
                 kind: EstimateKind = EstimateKind.MAP,
                 fwd_threshold: int = 32):
        self.learning_rate = learning_rate
        self.n_steps = n_steps
        self.kind = kind
        self.fwd_threshold = int(fwd_threshold)

    def optimize(self, estimator: PointEstimator, x0=None) -> PointEstimate:
        import jax
        import jax.numpy as jnp
        import optax

        objective = estimator._traced_objective(self.kind)
        if objective is None:
            raise ValueError("Gradient optimisation requires a CompiledModelRunner")

        lower, upper = estimator.bounds()
        lower = np.asarray(lower, dtype=np.float64)
        upper = np.asarray(upper, dtype=np.float64)
        if x0 is None:
            x0 = [
                (lo + hi) / 2.0 if np.isfinite(lo) and np.isfinite(hi) else 0.0
                for lo, hi in zip(lower, upper)
            ]
        dtype = estimator.runner.program.dtype
        theta0 = jnp.asarray(x0, dtype=dtype)
        D = theta0.shape[0]
        # clip just inside the support: the prior is -inf outside, and ON
        # a bound a one-sided density can still be degenerate
        span = np.where(np.isfinite(upper - lower), upper - lower, 1.0)
        lo_clip = jnp.asarray(
            np.where(np.isfinite(lower), lower + 1e-9 * span, -np.inf),
            dtype=dtype,
        )
        hi_clip = jnp.asarray(
            np.where(np.isfinite(upper), upper - 1e-9 * span, np.inf),
            dtype=dtype,
        )

        if D <= self.fwd_threshold:
            basis = jnp.eye(D, dtype=dtype)

            def value_and_grad(q):
                vals, tangents = jax.vmap(
                    lambda e: jax.jvp(objective, (q,), (e,))
                )(basis)
                return vals[0], tangents

        else:
            value_and_grad = jax.value_and_grad(objective)

        opt = optax.adam(self.learning_rate)

        @jax.jit
        def run(theta):
            def body(carry, _):
                theta, opt_state, best_theta, best_value = carry
                value, grads = value_and_grad(theta)
                grads = jnp.where(jnp.isfinite(grads), grads, 0.0)
                better = value < best_value
                best_theta = jnp.where(better, theta, best_theta)
                best_value = jnp.where(better, value, best_value)
                updates, opt_state = opt.update(grads, opt_state)
                theta = optax.apply_updates(theta, updates)
                theta = jnp.clip(theta, lo_clip, hi_clip)
                return (theta, opt_state, best_theta, best_value), value

            init = (theta0, opt.init(theta0), theta0, jnp.asarray(np.inf, dtype))
            (theta, _, best_theta, best_value), values = jax.lax.scan(
                body, init, None, length=self.n_steps
            )
            # the final iterate may beat every recorded best
            final_value, _ = value_and_grad(theta)
            better = final_value < best_value
            best_theta = jnp.where(better, theta, best_theta)
            best_value = jnp.where(better, final_value, best_value)
            return best_theta, best_value

        best_theta, best_value = run(theta0)
        best_value = float(best_value)

        final = estimator.evaluate(np.asarray(best_theta, dtype=np.float64))
        return PointEstimate(
            list(np.asarray(best_theta, dtype=np.float64)),
            estimator._evaluated_log_likelihoods[-1],
            final,
            self.n_steps,
            bool(np.isfinite(best_value)),
        )


class LBFGSOptimizer(Optimizer):
    """Quasi-Newton optimisation through the compiled model (jax BFGS)."""

    def __init__(self, n_steps: int = 100, kind: EstimateKind = EstimateKind.MAP):
        self.n_steps = n_steps
        self.kind = kind

    def optimize(self, estimator: PointEstimator, x0=None) -> PointEstimate:
        import jax.numpy as jnp
        from jax.scipy.optimize import minimize

        objective = estimator._traced_objective(self.kind)
        if objective is None:
            raise ValueError("Gradient optimisation requires a CompiledModelRunner")

        if x0 is None:
            lower, upper = estimator.bounds()
            x0 = [
                (lo + hi) / 2.0 if np.isfinite(lo) and np.isfinite(hi) else 0.0
                for lo, hi in zip(lower, upper)
            ]
        result = minimize(
            objective,
            jnp.asarray(x0, dtype=estimator.runner.program.dtype),
            method="BFGS",
            options={"maxiter": self.n_steps},
        )
        theta = np.asarray(result.x, dtype=np.float64)
        final = estimator.evaluate(theta)
        return PointEstimate(
            list(theta),
            estimator._evaluated_log_likelihoods[-1],
            final,
            int(result.nit) if hasattr(result, "nit") else self.n_steps,
            bool(result.success),
        )
