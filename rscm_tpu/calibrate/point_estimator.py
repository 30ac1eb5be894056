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

import functools
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

    def laplace_covariance(self, theta, rel_step: float = 1e-4):
        """Laplace-approximation covariance ``H(theta)^-1`` at a MAP point.

        The Hessian of the negative log posterior is built from central
        finite differences of the TRACED gradient — ``2 D`` dispatches of
        the same forward-mode value+grad program class the Adam path
        compiles.  (An exact nested ``jax.hessian`` through a
        MAGICC-length time scan is a worker-killing program on the
        tunneled TPU; FD-of-analytic-gradient is numerically ample for a
        walker-init covariance.)

        Degenerate directions are handled for the init use case: the
        Hessian is symmetrized, eigenvalues are floored at a curvature
        corresponding to a std of 1/4 of the prior span (flat posterior
        directions otherwise invert to near-infinite variance), and the
        per-dimension std is capped at 1/4 span.  Use with
        :meth:`WalkerInit.gaussian <rscm_tpu.calibrate.sampler.WalkerInit.gaussian>`.
        """
        import jax
        import jax.numpy as jnp

        objective = self._traced_objective(EstimateKind.MAP)
        if objective is None:
            raise ValueError("laplace_covariance requires a CompiledModelRunner")
        dtype = self.runner.program.dtype
        theta = np.asarray(theta, dtype=np.float64)
        D = theta.shape[0]
        basis = jnp.eye(D, dtype=dtype)

        @jax.jit
        def grad_fn(q):
            return jax.vmap(lambda e: jax.jvp(objective, (q,), (e,))[1])(basis)

        lower, upper = map(np.asarray, self.bounds())
        span = np.where(np.isfinite(upper - lower), upper - lower, 1.0)
        h = rel_step * span
        rows = []
        for j in range(D):
            e = np.zeros(D)
            e[j] = h[j]
            g_plus = np.asarray(grad_fn(jnp.asarray(theta + e, dtype=dtype)))
            g_minus = np.asarray(grad_fn(jnp.asarray(theta - e, dtype=dtype)))
            rows.append((g_plus - g_minus) / (2.0 * h[j]))
        hess = np.asarray(rows, dtype=np.float64)
        hess = 0.5 * (hess + hess.T)

        # scale-free eigen-floor: work in span units so one badly-scaled
        # parameter cannot dominate the spectrum
        scale = np.diag(span)
        hess_u = scale @ hess @ scale  # curvature per unit span
        eigval, eigvec = np.linalg.eigh(hess_u)
        floor = 1.0 / (0.25**2)  # std of 1/4 span in span units
        eigval = np.maximum(eigval, floor)
        cov_u = (eigvec / eigval) @ eigvec.T
        cov = scale @ cov_u @ scale
        # cap per-dimension std at 1/4 of the prior span
        std = np.sqrt(np.diag(cov))
        shrink = np.minimum(1.0, (0.25 * span) / np.maximum(std, 1e-300))
        return cov * np.outer(shrink, shrink)

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
                 fwd_threshold: int = 32,
                 dispatch_chunk: Optional[int] = None):
        self.learning_rate = learning_rate
        self.n_steps = n_steps
        self.kind = kind
        self.fwd_threshold = int(fwd_threshold)
        if dispatch_chunk is not None:
            # exact-int check, same contract as NUTSSampler.run
            if isinstance(dispatch_chunk, bool) or not (
                isinstance(dispatch_chunk, (int, np.integer))
                or (
                    isinstance(dispatch_chunk, float)
                    and dispatch_chunk == int(dispatch_chunk)
                )
            ):
                raise TypeError(
                    f"dispatch_chunk must be an integer, got {dispatch_chunk!r}"
                )
            if dispatch_chunk < 1:
                raise ValueError(
                    f"dispatch_chunk must be >= 1, got {dispatch_chunk}"
                )
            dispatch_chunk = int(dispatch_chunk)
        self.dispatch_chunk = dispatch_chunk

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

        @functools.partial(jax.jit, static_argnames=("length",))
        def run_chunk(carry, length):
            return jax.lax.scan(body, carry, None, length=length)

        @jax.jit
        def finish(carry):
            # the final iterate may beat every recorded best
            theta, _, best_theta, best_value = carry
            final_value, _ = value_and_grad(theta)
            better = final_value < best_value
            best_theta = jnp.where(better, theta, best_theta)
            best_value = jnp.where(better, final_value, best_value)
            return best_theta, best_value

        # Cap scan trips per device dispatch.  The tunneled TPU worker
        # reproducibly dies ("kernel fault", ~10 min outage) executing a
        # single dispatch holding hundreds of gradient steps through a
        # MAGICC-sized graph — the same worker-fault ladder the NUTS
        # sampler fences (nuts.py:_finish_run, docs/performance.md "Known
        # issue").  Chunking is bitwise-invisible: the carry (theta, Adam
        # state, best-so-far) threads through at the Python level and the
        # chunk dispatches pipeline without host syncs.  Chunk lengths are
        # balanced to at most two distinct values, so a run costs at most
        # two compiles.
        chunk = self.dispatch_chunk
        if chunk is None:
            chunk = 16 if jax.default_backend() != "cpu" else self.n_steps
        chunk = max(1, min(chunk, self.n_steps))
        n_chunks = -(-self.n_steps // chunk)
        base, rem = divmod(self.n_steps, n_chunks)
        lengths = [base + 1] * rem + [base] * (n_chunks - rem)

        carry = (theta0, opt.init(theta0), theta0, jnp.asarray(np.inf, dtype))
        for length in lengths:
            carry, _ = run_chunk(carry, length)
        best_theta, best_value = finish(carry)
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
