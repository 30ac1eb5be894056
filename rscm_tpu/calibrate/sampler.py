"""
Affine-invariant ensemble MCMC (Goodman & Weare 2010 stretch move).

Mirror of ``crates/rscm-calibrate/src/sampler/`` — walkers split into two
halves updated alternately, z ~ g(z; a) stretch proposals against a random
complement walker, acceptance ``min(1, z^(D-1) * p_new/p_old)``, default
walkers ``max(2*n_params, 32)``, checkpoint/resume, progress callbacks.

Two engines:

- **device** (default for :class:`CompiledModelRunner`): the complete
  sampling loop — proposals, posterior evaluation through the compiled
  model, accept/reject — is one ``lax.scan`` over iterations with walkers
  vmapped, so an entire calibration runs as a single XLA program without
  host round-trips.
- **host**: reference-faithful Python loop for arbitrary ``ModelRunner``
  implementations (the GIL-bound Python-model path of the reference).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable, List, Optional

import numpy as np

from .chain import Chain
from .likelihood import GaussianLikelihood, LikelihoodFn
from .model_runner import CompiledModelRunner, ModelRunner
from .parameter_set import ParameterSet
from .target import Target

__all__ = [
    "StretchMove",
    "DEMove",
    "WalkerInit",
    "SamplerState",
    "ProgressInfo",
    "EnsembleSampler",
]


@dataclass
class ProgressInfo:
    iteration: int
    total: int
    acceptance_rate: float
    mean_log_prob: float


class StretchMove:
    def __init__(self, a: float = 2.0):
        if a <= 1.0:
            raise ValueError(
                f"Stretch move scale parameter must be > 1.0, got {a}"
            )
        self.a = float(a)

    def sample_z(self, rng: np.random.Generator) -> float:
        u = rng.random()
        return ((self.a - 1.0) * u + 1.0) ** 2 / self.a

    def acceptance_probability(self, z, n_params, log_prob_old, log_prob_new):
        if not np.isfinite(log_prob_new):
            return 0.0
        log_ratio = (n_params - 1.0) * np.log(z) + (log_prob_new - log_prob_old)
        return min(np.exp(log_ratio), 1.0)

    def signature(self):
        """Hashable device-engine cache key component."""
        return ("stretch", self.a)


class DEMove:
    """Differential-evolution proposal (ter Braak 2006; emcee's ``DEMove``).

    Proposal ``x' = x + gamma (x_a - x_b) + sigma N(0, I)`` with ``x_a``,
    ``x_b`` two DISTINCT walkers drawn from the complementary half.  The
    difference vector is distributed like the walker cloud itself, so
    proposals are automatically scaled and oriented along the posterior's
    correlated and flat directions — where the stretch move's 1-d line
    proposals mix diffusively (on the 8-d MAGICC posterior, whose
    gas-exchange direction is nearly flat across its prior, stretch
    stalls near R-hat 1.8 at ~0.09 acceptance; DE converges — measured
    ladder in docs/performance.md).  ``gamma`` defaults to the
    ``2.38 / sqrt(2 D)`` random-walk optimum at run time; with
    probability ``gamma1_prob`` a full ``gamma = 1`` proposal is made
    instead (ter Braak's mode-jumping trick).  The proposal is symmetric,
    so acceptance is plain Metropolis — no stretch Jacobian term.

    Beyond the reference (``sampler/moves.rs`` implements only the
    stretch move); the ensemble-splitting schedule, state, checkpointing
    and diagnostics are shared with :class:`StretchMove` runs.
    """

    def __init__(self, gamma: Optional[float] = None,
                 gamma1_prob: float = 0.1, sigma: float = 1e-5):
        if not 0.0 <= gamma1_prob <= 1.0:
            raise ValueError(f"gamma1_prob must be in [0, 1], got {gamma1_prob}")
        if sigma < 0.0:
            raise ValueError(f"sigma must be >= 0, got {sigma}")
        self.gamma = None if gamma is None else float(gamma)
        self.gamma1_prob = float(gamma1_prob)
        self.sigma = float(sigma)

    def resolve_gamma(self, n_params: int) -> float:
        if self.gamma is not None:
            return self.gamma
        return 2.38 / np.sqrt(2.0 * n_params)

    def signature(self):
        """Hashable device-engine cache key component."""
        return ("de", self.gamma, self.gamma1_prob, self.sigma)


class WalkerInit:
    """FromPrior / Ball / Gaussian / Explicit initial walker positions."""

    def __init__(self, kind: str, center=None, radius=None, positions=None):
        self.kind = kind
        self.center = center
        self.radius = radius
        self.positions = positions

    @staticmethod
    def from_prior() -> "WalkerInit":
        return WalkerInit("FromPrior")

    @staticmethod
    def ball(center, radius) -> "WalkerInit":
        """Walkers in a uniform box around ``center``.

        ``radius`` is a scalar (the reference's ``Ball`` semantics,
        ``sampler/init.rs:12-60``) or a per-parameter array — calibration
        parameters rarely share a scale, so a per-dimension radius (e.g.
        a fraction of each prior's span around a MAP estimate) is the
        form that actually initialises every dimension sensibly.
        """
        radius = np.asarray(radius, dtype=np.float64)
        if radius.ndim == 0:
            radius = float(radius)
        return WalkerInit("Ball", center=list(center), radius=radius)

    @staticmethod
    def gaussian(center, cov) -> "WalkerInit":
        """Walkers drawn from ``N(center, cov)``, clipped just inside the
        prior support.

        The natural companion of a Laplace approximation: draw the
        ensemble from ``N(theta_MAP, H^-1)`` (see
        :meth:`PointEstimator.laplace_covariance <rscm_tpu.calibrate.point_estimator.PointEstimator.laplace_covariance>`)
        and the walker cloud starts with the posterior's own scales AND
        correlations — an isotropic ball must first diffuse into shape
        along every flat/correlated direction before it can mix.
        """
        cov = np.atleast_2d(np.asarray(cov, dtype=np.float64))
        center = np.asarray(center, dtype=np.float64)
        if cov.shape != (center.shape[0], center.shape[0]):
            raise ValueError(
                f"gaussian init cov shape {cov.shape} does not match "
                f"center length {center.shape[0]}"
            )
        return WalkerInit("Gaussian", center=list(center), radius=cov)

    @staticmethod
    def explicit(positions) -> "WalkerInit":
        return WalkerInit("Explicit", positions=np.asarray(positions, dtype=np.float64))

    def initialize(self, n_walkers: int, params: ParameterSet, rng) -> np.ndarray:
        if self.kind == "FromPrior":
            return params.sample_random(n_walkers, rng)
        if self.kind == "Ball":
            if len(self.center) != len(params):
                raise ValueError(
                    f"Ball center length {len(self.center)} does not match "
                    f"parameter count {len(params)}"
                )
            radius = np.asarray(self.radius)
            if radius.ndim == 1 and radius.shape[0] != len(params):
                raise ValueError(
                    f"Ball radius length {radius.shape[0]} does not match "
                    f"parameter count {len(params)}"
                )
            offsets = rng.random((n_walkers, len(params))) - 0.5
            return np.asarray(self.center) + offsets * radius
        if self.kind == "Gaussian":
            if len(self.center) != len(params):
                raise ValueError(
                    f"Gaussian init center length {len(self.center)} does "
                    f"not match parameter count {len(params)}"
                )
            draws = rng.multivariate_normal(
                np.asarray(self.center), self.radius, size=n_walkers,
                method="svd",
            )
            # clip just inside the support: a draw outside a bounded prior
            # would start at -inf posterior
            lower, upper = map(np.asarray, params.bounds())
            span = np.where(np.isfinite(upper - lower), upper - lower, 1.0)
            lo = np.where(np.isfinite(lower), lower + 1e-9 * span, -np.inf)
            hi = np.where(np.isfinite(upper), upper - 1e-9 * span, np.inf)
            return np.clip(draws, lo, hi)
        if self.kind == "Explicit":
            pos = self.positions
            if pos.shape[0] != n_walkers:
                raise ValueError(
                    f"Explicit positions have {pos.shape[0]} walkers, "
                    f"expected {n_walkers}"
                )
            if pos.shape[1] != len(params):
                raise ValueError(
                    f"Explicit positions have {pos.shape[1]} parameters, "
                    f"expected {len(params)}"
                )
            return pos.copy()
        raise ValueError(f"Unknown WalkerInit kind {self.kind}")


class SamplerState:
    """Walker positions + log-probs + acceptance counts (checkpointable)."""

    def __init__(self, positions: np.ndarray, param_names: List[str]):
        self.positions = np.asarray(positions, dtype=np.float64)
        self.param_names = list(param_names)
        n_walkers = self.positions.shape[0]
        self.log_probs = np.full(n_walkers, -np.inf)
        self.n_accepted = np.zeros(n_walkers, dtype=np.int64)
        self.n_proposed = np.zeros(n_walkers, dtype=np.int64)
        self.iteration = 0

    def n_params(self) -> int:
        return self.positions.shape[1]

    def mean_acceptance_rate(self) -> float:
        total = self.n_proposed.sum()
        return float(self.n_accepted.sum() / total) if total else 0.0

    def save_checkpoint(self, path: str):
        # atomic: a crash mid-write must not destroy the previous
        # checkpoint (the exact failure checkpoints exist to survive)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:  # exact filename (np would append .npz)
            np.savez_compressed(
                f,
                positions=self.positions,
                log_probs=self.log_probs,
                n_accepted=self.n_accepted,
                n_proposed=self.n_proposed,
                iteration=self.iteration,
                param_names=np.asarray(self.param_names, dtype=object),
            )
        os.replace(tmp, path)

    @staticmethod
    def load_checkpoint(path: str) -> "SamplerState":
        real = path if os.path.exists(path) else path + ".npz"
        with np.load(real, allow_pickle=True) as data:
            state = SamplerState(
                data["positions"], [str(s) for s in data["param_names"]]
            )
            state.log_probs = data["log_probs"]
            state.n_accepted = data["n_accepted"]
            state.n_proposed = data["n_proposed"]
            state.iteration = int(data["iteration"])
        return state


class EnsembleSampler:
    def __init__(
        self,
        params: ParameterSet,
        runner: ModelRunner,
        likelihood: LikelihoodFn,
        target: Target,
        move=None,
    ):
        self.params = params
        self.runner = runner
        self.likelihood = likelihood
        self.target = target
        if move is not None and not isinstance(move, (StretchMove, DEMove)):
            raise TypeError(
                f"move must be a StretchMove or DEMove, got {type(move).__name__}"
            )
        self.move = move if move is not None else StretchMove()
        self.default_n_walkers = max(2 * len(params), 32)
        self._device_log_prob = None

    @property
    def stretch(self) -> StretchMove:
        """The stretch move when active (reference-API compat accessor)."""
        if not isinstance(self.move, StretchMove):
            raise AttributeError(
                "sampler is configured with a non-stretch move; use .move"
            )
        return self.move

    def with_stretch_param(self, a: float) -> "EnsembleSampler":
        self.move = StretchMove(a)
        return self

    def with_move(self, move) -> "EnsembleSampler":
        """Set the proposal move (:class:`StretchMove` or :class:`DEMove`)."""
        if not isinstance(move, (StretchMove, DEMove)):
            raise TypeError(
                f"move must be a StretchMove or DEMove, got {type(move).__name__}"
            )
        self.move = move
        return self

    # -- posterior -------------------------------------------------------------

    def log_posterior_batch(self, param_sets) -> np.ndarray:
        outputs = self.runner.run_batch(param_sets)
        out = np.empty(len(param_sets))
        for i, (theta, output) in enumerate(zip(param_sets, outputs)):
            try:
                log_prior = float(self.params.log_prior(np.asarray(theta)))
            except Exception:
                out[i] = -np.inf
                continue
            if not np.isfinite(log_prior):
                out[i] = -np.inf
                continue
            if isinstance(output, Exception):
                out[i] = -np.inf
                continue
            try:
                ll = self.likelihood.ln_likelihood(output, self.target)
            except Exception:
                out[i] = -np.inf
                continue
            out[i] = log_prior + ll
        return out

    def _build_device_log_prob(self):
        """Pure theta -> log posterior usable in jit/vmap/grad."""
        if self._device_log_prob is not None:
            return self._device_log_prob
        if not isinstance(self.runner, CompiledModelRunner):
            return None
        if not isinstance(self.likelihood, GaussianLikelihood):
            return None
        import jax.numpy as jnp

        compiled_target = self.target.compile(
            self.runner.model.time_axis, self.runner.model.collection
        )
        traj_fn = self.runner.trajectories_fn()
        likelihood = self.likelihood
        params = self.params

        def log_prob(theta):
            lp = params.log_prior(theta)
            trajectories = traj_fn(theta)
            ll = likelihood.ln_likelihood_traced(trajectories, compiled_target)
            total = lp + ll
            return jnp.where(jnp.isfinite(total), total, -jnp.inf)

        self._device_log_prob = log_prob
        return log_prob

    # -- public API --------------------------------------------------------------

    def run(
        self,
        n_iterations: int,
        init: WalkerInit,
        thin: int = 1,
        n_walkers: Optional[int] = None,
        progress_callback: Optional[Callable] = None,
        seed: Optional[int] = None,
        engine: Optional[str] = None,
        mesh=None,
    ) -> Chain:
        """Sample; ``engine`` in {None (auto), "device", "host"}.

        ``mesh`` (device engine only) shards the walker axis over a 1-D
        ``jax.sharding.Mesh`` so walker posterior evaluations run data-
        parallel across chips; the stretch-move complement draws become
        cross-device gathers inserted by GSPMD.
        """
        n_walkers = n_walkers or self.default_n_walkers
        rng = np.random.default_rng(seed)
        positions = init.initialize(n_walkers, self.params, rng)
        state = SamplerState(positions, self.params.param_names())
        chain = Chain(self.params.param_names(), thin)
        return self._run_from_state(
            state, chain, n_iterations, rng, progress_callback, engine, mesh=mesh
        )

    run_with_walkers = run
    run_with_progress = run

    def run_with_checkpoint(
        self,
        n_iterations: int,
        init: WalkerInit,
        thin: int,
        checkpoint_every: int,
        checkpoint_path: str,
        progress_callback=None,
        n_walkers: Optional[int] = None,
        seed: Optional[int] = None,
        engine: Optional[str] = None,
        mesh=None,
    ) -> Chain:
        n_walkers = n_walkers or self.default_n_walkers
        rng = np.random.default_rng(seed)
        positions = init.initialize(n_walkers, self.params, rng)
        state = SamplerState(positions, self.params.param_names())
        chain = Chain(self.params.param_names(), thin)
        return self._run_from_state(
            state,
            chain,
            n_iterations,
            rng,
            progress_callback,
            engine,
            checkpoint_every=checkpoint_every,
            checkpoint_path=checkpoint_path,
            mesh=mesh,
        )

    def resume_from_checkpoint(
        self,
        n_iterations: int,
        thin: int,
        checkpoint_every: int,
        checkpoint_path: str,
        progress_callback=None,
        seed: Optional[int] = None,
        engine: Optional[str] = None,
        mesh=None,
    ) -> Chain:
        state = SamplerState.load_checkpoint(checkpoint_path + ".state")
        chain = Chain.load(checkpoint_path + ".chain")
        rng = np.random.default_rng(seed)
        # n_iterations is the TOTAL target, not additional iterations
        # (sampler/ensemble.rs resume semantics)
        remaining = max(0, int(n_iterations) - int(state.iteration))
        return self._run_from_state(
            state,
            chain,
            remaining,
            rng,
            progress_callback,
            engine,
            checkpoint_every=checkpoint_every,
            checkpoint_path=checkpoint_path,
            mesh=mesh,
        )

    # -- engines ----------------------------------------------------------------

    def _run_from_state(
        self,
        state: SamplerState,
        chain: Chain,
        n_iterations: int,
        rng,
        progress_callback,
        engine,
        checkpoint_every: Optional[int] = None,
        checkpoint_path: Optional[str] = None,
        mesh=None,
    ) -> Chain:
        # Validate here so every entry point — run, run_with_checkpoint and
        # resume_from_checkpoint — rejects walker counts the half-split
        # engines cannot handle (an odd count would silently freeze the last
        # walker in the device engine's fixed-size half slices).
        n_walkers = state.positions.shape[0]
        if n_walkers < 2:
            raise ValueError("Must have at least 2 walkers")
        if n_walkers % 2 != 0:
            raise ValueError("Number of walkers must be even")

        device_log_prob = self._build_device_log_prob() if engine != "host" else None
        if engine == "device" and device_log_prob is None:
            raise ValueError(
                "device engine requires a CompiledModelRunner + GaussianLikelihood"
            )
        if device_log_prob is not None:
            return self._run_device(
                device_log_prob,
                state,
                chain,
                n_iterations,
                rng,
                progress_callback,
                checkpoint_every,
                checkpoint_path,
                mesh=mesh,
            )
        return self._run_host(
            state,
            chain,
            n_iterations,
            rng,
            progress_callback,
            checkpoint_every,
            checkpoint_path,
        )

    def _maybe_checkpoint(self, state, chain, iteration, every, path, base=0):
        """``iteration`` counts within the current run; ``base`` is the
        absolute iteration the run resumed from, so checkpoints written
        during a resumed run record total progress (otherwise a second
        resume would redo completed iterations and duplicate samples)."""
        if every and path and (iteration + 1) % every == 0:
            state.iteration = base + iteration + 1
            # chain first: a crash between the two writes must leave
            # state.iteration <= the iterations the saved chain covers
            # (the reverse order loses samples on resume)
            chain.save(path + ".chain")
            state.save_checkpoint(path + ".state")

    # .. host engine (reference-faithful loop) ...................................

    def _run_host(
        self, state, chain, n_iterations, rng, progress_callback,
        checkpoint_every=None, checkpoint_path=None,
    ):
        n_walkers = state.positions.shape[0]
        half = n_walkers // 2
        base_iteration = int(state.iteration)
        if not np.all(np.isfinite(state.log_probs)) and state.iteration == 0:
            state.log_probs = self.log_posterior_batch(list(state.positions))

        for iteration in range(n_iterations):
            self._update_group_host(state, range(0, half), range(half, n_walkers), rng)
            self._update_group_host(state, range(half, n_walkers), range(0, half), rng)
            chain.push(state.positions, state.log_probs)
            if progress_callback is not None:
                progress_callback(
                    ProgressInfo(
                        iteration,
                        n_iterations,
                        state.mean_acceptance_rate(),
                        float(np.mean(state.log_probs)),
                    )
                )
            self._maybe_checkpoint(
                state, chain, iteration, checkpoint_every, checkpoint_path,
                base=base_iteration,
            )
        return chain

    def _update_group_host(self, state, active, complement, rng):
        comp_positions = state.positions[list(complement)]
        n_comp = len(comp_positions)
        proposals, zs = [], []
        if isinstance(self.move, DEMove):
            gamma0 = self.move.resolve_gamma(state.n_params())
            for i in active:
                ia = rng.integers(n_comp)
                ib = (ia + 1 + rng.integers(n_comp - 1)) % n_comp
                gamma = 1.0 if rng.random() < self.move.gamma1_prob else gamma0
                step = gamma * (comp_positions[ia] - comp_positions[ib])
                noise = self.move.sigma * rng.standard_normal(state.n_params())
                proposals.append(state.positions[i] + step + noise)
                zs.append(None)  # symmetric proposal: no Jacobian term
        else:
            for i in active:
                z = self.stretch.sample_z(rng)
                comp = comp_positions[rng.integers(n_comp)]
                proposals.append(comp + z * (state.positions[i] - comp))
                zs.append(z)
        log_probs_new = self.log_posterior_batch(proposals)
        for i, proposal, z, lp_new in zip(active, proposals, zs, log_probs_new):
            if z is None:
                accept_prob = (
                    min(np.exp(min(lp_new - state.log_probs[i], 0.0)), 1.0)
                    if np.isfinite(lp_new)
                    else 0.0
                )
            else:
                accept_prob = self.stretch.acceptance_probability(
                    z, state.n_params(), state.log_probs[i], lp_new
                )
            state.n_proposed[i] += 1
            if rng.random() < accept_prob:
                state.positions[i] = proposal
                state.log_probs[i] = lp_new
                state.n_accepted[i] += 1

    # .. device engine (single lax.scan over iterations) .........................

    def _run_device(
        self, log_prob, state, chain, n_iterations, rng, progress_callback,
        checkpoint_every=None, checkpoint_path=None, mesh=None,
    ):
        import jax
        import jax.numpy as jnp
        import jax.random as jr

        dtype = self.runner.program.dtype
        n_walkers, n_params = state.positions.shape
        half = n_walkers // 2
        move = self.move
        is_de = isinstance(move, DEMove)
        if is_de:
            gamma0 = move.resolve_gamma(n_params)
            gamma1_prob = move.gamma1_prob
            de_sigma = move.sigma
        else:
            a = move.a

        # one jitted scan per (shape, move, mesh) configuration, cached
        # across run() calls — a fresh closure each call would retrace
        mesh_key = None
        if mesh is not None:
            mesh_key = (
                mesh.axis_names,
                tuple(d.id for d in mesh.devices.flat),
            )
        cache_key = (
            n_walkers, n_params, str(np.dtype(dtype)), move.signature(),
            mesh_key,
        )
        if not hasattr(self, "_scan_cache"):
            self._scan_cache = {}

        batched_log_prob = jax.vmap(log_prob)
        # The initial full-walker posterior evaluation runs outside the
        # scan; eager vmap dispatches the whole model program one
        # primitive at a time (measured ~1.4 s of tunnel latency at 1024
        # walkers vs ~30 ms jitted), so jit it and cache per engine config.
        if not hasattr(self, "_init_lp_cache"):
            self._init_lp_cache = {}
        if cache_key not in self._init_lp_cache:
            self._init_lp_cache[cache_key] = jax.jit(batched_log_prob)
        init_log_prob = self._init_lp_cache[cache_key]

        def half_step(carry, active_slice, comp_slice, key):
            positions, log_probs, n_accepted = carry
            active = jax.lax.dynamic_slice_in_dim(positions, active_slice, half, 0)
            comp = jax.lax.dynamic_slice_in_dim(positions, comp_slice, half, 0)
            lp_old = jax.lax.dynamic_slice_in_dim(log_probs, active_slice, half, 0)

            if is_de:
                kg, kia, kib, kn, ka = jr.split(key, 5)
                ia = jr.randint(kia, (half,), 0, half)
                # distinct second index: uniform over the other half-1
                ib = (ia + 1 + jr.randint(kib, (half,), 0, half - 1)) % half
                gamma = jnp.where(
                    jr.uniform(kg, (half,), dtype=active.dtype) < gamma1_prob,
                    jnp.asarray(1.0, active.dtype),
                    jnp.asarray(gamma0, active.dtype),
                )
                proposals = (
                    active
                    + gamma[:, None] * (comp[ia] - comp[ib])
                    + de_sigma * jr.normal(kn, active.shape, dtype=active.dtype)
                )
                lp_new = batched_log_prob(proposals)
                # symmetric proposal: plain Metropolis ratio
                log_ratio = lp_new - lp_old
            else:
                kz, kc, ka = jr.split(key, 3)
                u = jr.uniform(kz, (half,), dtype=active.dtype)
                z = ((a - 1.0) * u + 1.0) ** 2 / a
                comp_idx = jr.randint(kc, (half,), 0, half)
                chosen = comp[comp_idx]
                proposals = chosen + z[:, None] * (active - chosen)

                lp_new = batched_log_prob(proposals)
                log_ratio = (n_params - 1.0) * jnp.log(z) + (lp_new - lp_old)
            accept = (
                jnp.log(jr.uniform(ka, (half,), dtype=active.dtype)) < log_ratio
            ) & jnp.isfinite(lp_new)

            new_active = jnp.where(accept[:, None], proposals, active)
            new_lp = jnp.where(accept, lp_new, lp_old)
            positions = jax.lax.dynamic_update_slice_in_dim(
                positions, new_active, active_slice, 0
            )
            log_probs = jax.lax.dynamic_update_slice_in_dim(
                log_probs, new_lp, active_slice, 0
            )
            n_accepted = jax.lax.dynamic_update_slice_in_dim(
                n_accepted,
                jax.lax.dynamic_slice_in_dim(n_accepted, active_slice, half, 0)
                + accept.astype(n_accepted.dtype),
                active_slice,
                0,
            )
            return positions, log_probs, n_accepted

        def iteration_step(carry, key):
            k1, k2 = jr.split(key)
            carry = half_step(carry, 0, half, k1)
            carry = half_step(carry, half, 0, k2)
            positions, log_probs, _ = carry
            return carry, (positions, log_probs)

        def _scan(positions, log_probs, n_accepted, keys):
            return jax.lax.scan(
                iteration_step, (positions, log_probs, n_accepted), keys
            )

        if mesh is not None and n_walkers % (2 * mesh.devices.size) != 0:
            raise ValueError(
                f"mesh-sharded device engine needs n_walkers divisible by "
                f"2 x n_devices (= {2 * mesh.devices.size}), got {n_walkers}"
            )
        if cache_key in self._scan_cache:
            run_scan = self._scan_cache[cache_key]
        elif mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            axis = mesh.axis_names[0]
            walkers = NamedSharding(mesh, P(axis))
            walkers_2d = NamedSharding(mesh, P(axis, None))
            replicated = NamedSharding(mesh, P())
            run_scan = self._scan_cache[cache_key] = jax.jit(
                _scan,
                in_shardings=(walkers_2d, walkers, walkers, replicated),
            )
        else:
            run_scan = self._scan_cache[cache_key] = jax.jit(_scan)

        # Eager ops (asarray, PRNG key handling) must execute on the mesh's
        # backend, not the default one — when the mesh is a forced-CPU
        # fallback, the default (TPU) backend may be absent or broken.
        from rscm_tpu.utils.target import mesh_context

        def dev_ctx():
            return mesh_context(mesh)

        with dev_ctx():
            positions = jnp.asarray(state.positions, dtype=dtype)
            if state.iteration == 0 or not np.all(np.isfinite(state.log_probs)):
                log_probs = init_log_prob(positions)
            else:
                log_probs = jnp.asarray(state.log_probs, dtype=dtype)
            n_accepted = jnp.asarray(state.n_accepted)

            # Segments fire checkpoints/progress at the requested cadence;
            # a progress callback without checkpointing still gets ~20
            # updates over the run (per-iteration host callbacks are
            # impossible inside a device scan, but one callback after the
            # whole run would make the progress contract a no-op).
            if checkpoint_every:
                segment = checkpoint_every
            elif progress_callback is not None:
                segment = max(1, n_iterations // 20)
            else:
                segment = n_iterations
            seed = int(rng.integers(0, 2**63 - 1))
            key = jr.PRNGKey(seed)
        base_iteration = int(state.iteration)

        # Each segment runs as balanced scan chunks of <= 64 trips (same
        # treatment as the NUTS iteration scan): (1) the jitted scan's
        # executable is specialised on the trip count, so an uncapped
        # segment recompiles the whole program for every distinct
        # n_iterations — measured 4.9 s per recompile vs 0.7 s of actual
        # device time for a 200-iteration 1024-walker run; balanced chunks
        # make common sizes share one executable. (2) current libtpu
        # aborts compilation of scans holding inner while-loops at trip
        # counts > 64 ("Check failed: memory_space == ..." in
        # memory-space assignment), and capping trips dodges it.
        max_chunk = 64
        done = 0
        while done < n_iterations:
            seg_todo = min(segment, n_iterations - done)
            n_chunks = -(-seg_todo // max_chunk)
            chunk_len = -(-seg_todo // n_chunks)
            # Queue every chunk before materialising any ys: np.asarray
            # blocks on device completion, and syncing between chunks
            # serialises a host round trip into each dispatch (measured
            # ~0.3 s of pure tunnel latency over a 4-chunk segment).
            seg_done = 0
            seg_ys = []
            while seg_done < seg_todo:
                todo = min(chunk_len, seg_todo - seg_done)
                with dev_ctx():
                    key, sub = jr.split(key)
                    keys = jr.split(sub, todo)
                # tracing happens inside the first call: resolve engine
                # choices (and any eager constants) against the mesh's
                # platform
                with dev_ctx():
                    (positions, log_probs, n_accepted), (all_pos, all_lp) = (
                        run_scan(positions, log_probs, n_accepted, keys)
                    )
                seg_ys.append((all_pos, all_lp))
                seg_done += todo
            for all_pos, all_lp in seg_ys:
                chain.push_stacked(np.asarray(all_pos), np.asarray(all_lp))
            done += seg_todo
            state.positions = np.asarray(positions)
            state.log_probs = np.asarray(log_probs)
            state.n_accepted = np.asarray(n_accepted)
            state.n_proposed += seg_todo  # one proposal per walker per iteration
            if progress_callback is not None:
                progress_callback(
                    ProgressInfo(
                        done - 1,
                        n_iterations,
                        float(np.sum(state.n_accepted) / max(np.sum(state.n_proposed), 1)),
                        float(np.mean(state.log_probs)),
                    )
                )
            self._maybe_checkpoint(
                state, chain, done - 1, checkpoint_every, checkpoint_path,
                base=base_iteration,
            )
        return chain
