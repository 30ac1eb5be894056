"""
NUTS: gradient-based MCMC through the compiled model program.

A capability the reference could not have (its models are not
differentiable; `crates/rscm-calibrate` ships only the stretch-move
ensemble sampler and RandomSearch): because the whole model is one traced
XLA program, ``jax.value_and_grad`` of the log-posterior comes free, and a
No-U-Turn sampler explores the posterior in far fewer model evaluations
than random-walk ensemble moves.

Implementation notes (multinomial NUTS, Betancourt 2017 / Stan-style):

- **Uniform-schedule tree building.**  The classic recursive doubling
  does not trace, and the usual buffered fix (signed-position buffers
  updated inside per-chain masked while-loops) is hostile to TPUs: every
  trajectory write is a batched scatter at chain-dependent indices
  (measured 334 ms/iteration of pure bookkeeping at depth 6 x 64 chains —
  with a *quadratic* posterior).  Here the doubling schedule is unrolled
  statically: stage d integrates exactly 2^d leapfrog steps for ALL
  chains (chains whose tree already terminated ride along masked, and a
  ``lax.cond`` skips whole stages once every chain has stopped), and the
  trajectory is stored in **visitation order**, so every buffer write is
  a ``dynamic_update_slice`` at a chain-uniform index and every
  balanced-subtree U-turn check is a static reshape-sum (a subtree is
  contiguous in visitation order whatever its direction; the check is
  symmetric in the block ends, so position reversal is immaterial).
  Position-space tree edges and the total momentum are tracked
  incrementally per chain.  See ``_build_step``.
- **Forward-mode gradients by default** for small parameter vectors
  (``grad_mode``/:meth:`NUTSSampler._make_value_and_grad`): D batched
  JVPs ride the model's forward scan with no residual traffic.
- **Progressive multinomial sampling** within/across subtrees (biased to
  the new subtree, as in Stan), Gumbel-max over masked log weights.
- **Per-chain dual averaging** (Hoffman & Gelman 2014 defaults) adapts the
  step size during warmup; the diagonal mass matrix starts at the prior
  variance and is refined from a Welford window mid-warmup.
- Divergences (energy error > 1000) and non-finite gradients terminate
  the doubling; gradients are sanitised to zero outside the prior support
  and diverged integrators freeze, so a trajectory that grazes a bound
  rejects instead of poisoning positions with NaN.

The whole run — warmup and sampling, all chains — is one ``lax.scan``
compiled on device, like the stretch sampler's device engine.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

from .chain import Chain
from .likelihood import GaussianLikelihood, LikelihoodFn
from .model_runner import CompiledModelRunner
from .parameter_set import ParameterSet
from .sampler import EnsembleSampler
from .target import Target

__all__ = ["NUTSSampler"]

_DIVERGENCE_THRESHOLD = 1000.0


class NUTSSampler:
    """No-U-Turn sampling of the model posterior.

    Same construction surface as :class:`EnsembleSampler`, restricted to
    the compiled path (NUTS needs gradients, so the runner must be a
    :class:`CompiledModelRunner` and the likelihood traced).
    """

    def __init__(
        self,
        params: ParameterSet,
        runner: CompiledModelRunner,
        likelihood: LikelihoodFn,
        target: Target,
        max_tree_depth: int = 8,
        target_accept: float = 0.8,
        grad_mode: str = "auto",
        stage_skip: bool = True,
    ):
        if not isinstance(runner, CompiledModelRunner):
            raise TypeError(
                "NUTSSampler requires a CompiledModelRunner (gradients flow "
                "only through the compiled model program); use "
                "EnsembleSampler for host/black-box runners"
            )
        if not isinstance(likelihood, GaussianLikelihood):
            raise TypeError(
                "NUTSSampler requires a traced likelihood (GaussianLikelihood)"
            )
        self.params = params
        self.runner = runner
        self.likelihood = likelihood
        self.target = target
        self.max_tree_depth = int(max_tree_depth)
        self.target_accept = float(target_accept)
        if grad_mode not in ("auto", "fwd", "rev"):
            raise ValueError(
                f"grad_mode must be 'auto', 'fwd' or 'rev', got {grad_mode!r}"
            )
        self.grad_mode = grad_mode
        # stage_skip wraps each unrolled tree stage in a 0/1-trip
        # while_loop (device-side early exit — see _build_step).  That
        # adds one device-loop nesting level around the model program;
        # disable to run every stage unconditionally (masked) for models
        # whose own loop nesting is already deep.
        self.stage_skip = bool(stage_skip)
        # reuse the ensemble sampler's pure theta -> log-posterior builder
        self._log_prob = EnsembleSampler(
            params, runner, likelihood, target
        )._build_device_log_prob()
        if self._log_prob is None:
            raise TypeError("could not build a traced log-posterior")
        self.last_diagnostics: dict = {}

    # -- unconstrained reparameterisation ------------------------------------
    #
    # NUTS samples in an unconstrained space x (Stan-style): bounded priors
    # create hard -inf walls in theta-space where trajectories diverge and
    # dual averaging collapses the step size; logit/exp transforms remove
    # the walls entirely, with the log-Jacobian folded into the density.

    def _build_transforms(self):
        import jax
        import jax.numpy as jnp

        lower, upper = self.params.bounds()
        lower = np.asarray(lower, dtype=np.float64)
        upper = np.asarray(upper, dtype=np.float64)
        finite_lo = np.isfinite(lower)
        finite_hi = np.isfinite(upper)
        interval = finite_lo & finite_hi
        lo_safe = jnp.asarray(np.where(finite_lo, lower, 0.0))
        hi_safe = jnp.asarray(np.where(finite_hi, upper, 1.0))
        width_safe = jnp.asarray(np.where(interval, upper - lower, 1.0))
        interval = jnp.asarray(interval)
        finite_lo = jnp.asarray(finite_lo)
        finite_hi = jnp.asarray(finite_hi)

        def to_theta(x):
            """x (unconstrained) -> (theta, sum log|dtheta/dx|)."""
            s = jax.nn.sigmoid(x)
            theta = jnp.where(
                interval,
                lo_safe + width_safe * s,
                jnp.where(
                    finite_lo,
                    lo_safe + jnp.exp(x),
                    jnp.where(finite_hi, hi_safe - jnp.exp(x), x),
                ),
            )
            logj = jnp.where(
                interval,
                jnp.log(width_safe)
                + jax.nn.log_sigmoid(x)
                + jax.nn.log_sigmoid(-x),
                jnp.where(finite_lo | finite_hi, x, 0.0),
            )
            return theta, jnp.sum(logj)

        def to_x(theta):
            theta = jnp.asarray(theta)
            z = jnp.clip(
                (theta - lo_safe) / width_safe, 1e-12, 1.0 - 1e-12
            )
            pos_lo = jnp.maximum(theta - lo_safe, 1e-300)
            pos_hi = jnp.maximum(hi_safe - theta, 1e-300)
            return jnp.where(
                interval,
                jnp.log(z) - jnp.log1p(-z),
                jnp.where(
                    finite_lo,
                    jnp.log(pos_lo),
                    jnp.where(finite_hi, jnp.log(pos_hi), theta),
                ),
            )

        return to_theta, to_x

    # -- gradient engine -------------------------------------------------------

    def _make_value_and_grad(self, logp_fn, n_params: int):
        """theta -> (logp, grad), by the engine the posterior shape favours.

        **fwd** (default for these posteriors): the full gradient from D
        batched JVPs.  The model is a long ``lax.scan`` over time; reverse
        mode through it stashes every step's residuals to HBM on the
        forward pass and then runs a *second, backward* scan — for a
        handful of parameters that residual traffic dominates the leapfrog
        step.  Forward mode needs no residuals at all (the tangent rides
        along inside the same scan), and the D tangent directions batch
        into one program, so wall-clock is ~one forward pass regardless of
        D.  Measured on the 4-parameter flagship (64 chains, depth 6):
        ~12x faster per NUTS iteration than reverse mode.

        **rev**: classic ``jax.value_and_grad`` — the right engine once D
        grows past the point where D forward passes beat one backward pass
        (``auto`` switches at D > 32).
        """
        import jax
        import jax.numpy as jnp

        mode = self.grad_mode
        if mode == "auto":
            mode = "fwd" if n_params <= 32 else "rev"
        if mode == "rev":
            return jax.value_and_grad(logp_fn)

        basis = jnp.eye(n_params)

        def value_and_grad(q):
            vals, tangents = jax.vmap(
                lambda e: jax.jvp(logp_fn, (q,), (e,))
            )(basis)
            return vals[0], tangents

        return value_and_grad

    # -- one NUTS transition (pure, batched over chains) ----------------------
    #
    # TPU-native tree building: the classic per-chain doubling loop costs
    # hundreds of milliseconds per iteration on TPU regardless of the model
    # (measured 334 ms/iteration at depth 6 x 64 chains with a *quadratic*
    # posterior) because per-chain buffer positions turn every trajectory
    # write into a batched scatter and every U-turn check into dynamic
    # gathers, serialized inside nested masked while-loops.  This
    # implementation makes every index **chain-uniform and static**:
    #
    # - the doubling schedule is unrolled in Python (depth d = 0..max-1);
    #   each stage is wrapped in ``lax.cond`` so the whole stage is skipped
    #   once every chain's tree has terminated;
    # - trajectory states are stored in **visitation order** — stage d
    #   writes rows [2^d, 2^(d+1)) of a (chains, 2^max_depth, D) buffer at
    #   loop-uniform indices (``dynamic_update_slice``, never scatter);
    # - a subtree is contiguous in visitation order whatever its direction,
    #   so every balanced-block U-turn check is a static reshape-sum over
    #   the stage's slice (position order within a block is direction-
    #   reversed at most, and the check is symmetric in the block's ends);
    # - position-space edges (leftmost/rightmost state) and the tree's
    #   total momentum are tracked incrementally per chain instead of
    #   being re-gathered from position-indexed buffers.
    #
    # Chains that stop early ride along masked (their merges are gated by
    # ``ok``); chains that diverge freeze their integrator state so no
    # non-finite value can propagate into sampled rows.

    def _build_step(self, n_params, logp_fn, n_chains):
        import jax
        import jax.numpy as jnp
        import jax.random as jr

        value_and_grad = self._make_value_and_grad(logp_fn, n_params)
        batched_vag = jax.vmap(value_and_grad)
        max_depth = self.max_tree_depth
        n_rows = 1 << max_depth  # row 0 = start state; stage d -> [2^d, 2^(d+1))
        D = int(n_params)
        C = int(n_chains)

        def safe_grad(q):
            logp, grad = batched_vag(q)
            grad = jnp.where(jnp.isfinite(grad), grad, 0.0)
            return logp, grad

        # q0 (C,D), logp0 (C,), grad0 (C,D), eps (C,), inv_mass (C,D); one
        # PRNG key per transition (all chains share it; per-chain draws are
        # batched dimensions of each sample)
        def step(q0, logp0, grad0, eps, inv_mass, key):
            def kinetic(p):  # (C, D) -> (C,)
                return 0.5 * jnp.sum(p * p * inv_mass, axis=-1)

            key, k_mom = jr.split(key)
            p0 = jr.normal(k_mom, (C, D), dtype=q0.dtype) / jnp.sqrt(inv_mass)
            h0 = logp0 - kinetic(p0)  # (C,) log joint at the start

            qs = jnp.zeros((C, n_rows, D), q0.dtype).at[:, 0].set(q0)
            ps = jnp.zeros((C, n_rows, D), q0.dtype).at[:, 0].set(p0)
            grads = jnp.zeros((C, n_rows, D), q0.dtype).at[:, 0].set(grad0)
            logws = jnp.full((C, n_rows), -jnp.inf, q0.dtype).at[:, 0].set(0.0)

            carry = dict(
                qs=qs, ps=ps, grads=grads, logws=logws,
                # position-space edges of the merged tree (start = both)
                q_left=q0, p_left=p0, grad_left=grad0,
                q_right=q0, p_right=p0, grad_right=grad0,
                p_sum=p0,  # total momentum over all merged states
                prop_q=q0, prop_logp=logp0, prop_grad=grad0,
                logw_total=jnp.zeros(C, q0.dtype),
                stop=jnp.zeros(C, bool),
                diverged=jnp.zeros(C, bool),
                sum_accept=jnp.zeros(C, q0.dtype),
                n_leapfrog=jnp.zeros(C, jnp.int32),
            )

            def make_stage(depth, k_stage):
                base = 1 << depth  # static: first visitation row of stage
                length = base      # static: leapfrog steps in this stage
                k_dir, k_prop, k_leaf = jr.split(k_stage, 3)

                def stage(c):
                    active = ~c["stop"]
                    v = jnp.where(
                        jr.bernoulli(k_dir, shape=(C,)), 1.0, -1.0
                    ).astype(q0.dtype)
                    vc = v[:, None]

                    # integrate from the edge in direction v
                    q = jnp.where(vc > 0, c["q_right"], c["q_left"])
                    p = jnp.where(vc > 0, c["p_right"], c["p_left"])
                    grad = jnp.where(vc > 0, c["grad_right"], c["grad_left"])

                    def lf_body(i, s):
                        p_half = s["p"] + 0.5 * eps[:, None] * vc * s["grad"]
                        q_new = s["q"] + eps[:, None] * vc * p_half * inv_mass
                        logp_new, grad_new = safe_grad(q_new)
                        p_new = p_half + 0.5 * eps[:, None] * vc * grad_new
                        logw = logp_new - kinetic(p_new) - h0
                        bad_new = ~jnp.isfinite(logw) | (
                            logw < -_DIVERGENCE_THRESHOLD
                        )
                        bad = s["bad"] | bad_new
                        # freeze diverged integrators: no NaN may propagate
                        badc = bad[:, None]
                        q_new = jnp.where(badc, s["q"], q_new)
                        p_new = jnp.where(badc, s["p"], p_new)
                        grad_new = jnp.where(badc, s["grad"], grad_new)
                        logw = jnp.where(bad, -jnp.inf, logw)
                        row = base + i  # uniform across chains
                        use = active & ~bad
                        return dict(
                            q=q_new, p=p_new, grad=grad_new, bad=bad,
                            qs=jax.lax.dynamic_update_slice(
                                s["qs"], q_new[:, None, :], (0, row, 0)
                            ),
                            ps=jax.lax.dynamic_update_slice(
                                s["ps"], p_new[:, None, :], (0, row, 0)
                            ),
                            grads=jax.lax.dynamic_update_slice(
                                s["grads"], grad_new[:, None, :], (0, row, 0)
                            ),
                            logws=jax.lax.dynamic_update_slice(
                                s["logws"], logw[:, None], (0, row)
                            ),
                            sum_accept=s["sum_accept"]
                            + jnp.where(
                                use, jnp.minimum(1.0, jnp.exp(logw)), 0.0
                            ),
                            n=s["n"] + use.astype(jnp.int32),
                        )

                    lf = jax.lax.fori_loop(
                        0,
                        length,
                        lf_body,
                        dict(
                            q=q, p=p, grad=grad,
                            bad=jnp.zeros(C, bool),
                            qs=c["qs"], ps=c["ps"], grads=c["grads"],
                            logws=c["logws"],
                            sum_accept=c["sum_accept"], n=c["n_leapfrog"],
                        ),
                    )
                    diverged = lf["bad"]
                    qs, ps, grads, logws = (
                        lf["qs"], lf["ps"], lf["grads"], lf["logws"],
                    )

                    # stage slice (static): the new subtree in visitation
                    # order — contiguous whatever the direction
                    ps_sub = ps[:, base : base + length]
                    logws_sub = logws[:, base : base + length]

                    # balanced-block U-turns inside the subtree: blocks of
                    # size 2^m aligned to the subtree start; a reversed
                    # block is the same set and the check is end-symmetric
                    sub_turning = jnp.zeros(C, bool)
                    for m in range(1, depth + 1):
                        size = 1 << m
                        blocks = ps_sub.reshape(C, length // size, size, D)
                        rsum = jnp.sum(blocks, axis=2)  # (C, nb, D)
                        p_s = blocks[:, :, 0]
                        p_e = blocks[:, :, -1]
                        im = inv_mass[:, None, :]
                        u = (
                            (jnp.sum(p_s * rsum * im, axis=-1) < 0)
                            | (jnp.sum(p_e * rsum * im, axis=-1) < 0)
                        )
                        sub_turning = sub_turning | jnp.any(u, axis=-1)

                    # multinomial leaf draw within the subtree (Gumbel-max)
                    logw_sub = jax.scipy.special.logsumexp(logws_sub, axis=-1)
                    gumbel = -jnp.log(
                        -jnp.log(jr.uniform(k_leaf, (C, length)))
                    )
                    leaf = jnp.argmax(logws_sub + gumbel, axis=-1)  # (C,)
                    take_q = jnp.take_along_axis(
                        qs[:, base : base + length],
                        leaf[:, None, None],
                        axis=1,
                    )[:, 0]
                    take_grad = jnp.take_along_axis(
                        grads[:, base : base + length],
                        leaf[:, None, None],
                        axis=1,
                    )[:, 0]
                    take_p = jnp.take_along_axis(
                        ps[:, base : base + length], leaf[:, None, None], axis=1
                    )[:, 0]
                    leaf_logw = jnp.take_along_axis(
                        logws_sub, leaf[:, None], axis=1
                    )[:, 0]

                    # biased progressive sampling (Stan): favour the fresh
                    # subtree
                    p_new_tree = jnp.exp(
                        jnp.minimum(0.0, logw_sub - c["logw_total"])
                    )
                    ok = active & (~diverged) & (~sub_turning)
                    take = (
                        (jr.uniform(k_prop, (C,)) < p_new_tree) & ok
                    )

                    takec = take[:, None]
                    prop_q = jnp.where(takec, take_q, c["prop_q"])
                    prop_grad = jnp.where(takec, take_grad, c["prop_grad"])
                    prop_logp = jnp.where(
                        take, leaf_logw + h0 + kinetic(take_p), c["prop_logp"]
                    )
                    logw_total = jnp.where(
                        ok,
                        jnp.logaddexp(c["logw_total"], logw_sub),
                        c["logw_total"],
                    )

                    # merge edges + total momentum (only where the subtree
                    # was accepted into the tree)
                    okc = ok[:, None]
                    end_q, end_p, end_grad = lf["q"], lf["p"], lf["grad"]
                    fwd = vc > 0
                    q_right = jnp.where(okc & fwd, end_q, c["q_right"])
                    p_right = jnp.where(okc & fwd, end_p, c["p_right"])
                    grad_right = jnp.where(okc & fwd, end_grad, c["grad_right"])
                    q_left = jnp.where(okc & ~fwd, end_q, c["q_left"])
                    p_left = jnp.where(okc & ~fwd, end_p, c["p_left"])
                    grad_left = jnp.where(okc & ~fwd, end_grad, c["grad_left"])
                    p_sum = c["p_sum"] + jnp.where(
                        okc, jnp.sum(ps_sub, axis=1), 0.0
                    )

                    # full-tree U-turn across the merged span
                    full_turning = (
                        (jnp.sum(p_left * p_sum * inv_mass, axis=-1) < 0)
                        | (jnp.sum(p_right * p_sum * inv_mass, axis=-1) < 0)
                    )

                    stop = c["stop"] | diverged | sub_turning | full_turning
                    return dict(
                        qs=qs, ps=ps, grads=grads, logws=logws,
                        q_left=q_left, p_left=p_left, grad_left=grad_left,
                        q_right=q_right, p_right=p_right,
                        grad_right=grad_right,
                        p_sum=p_sum,
                        prop_q=prop_q, prop_logp=prop_logp,
                        prop_grad=prop_grad,
                        logw_total=logw_total,
                        stop=stop,
                        diverged=c["diverged"] | (diverged & active),
                        sum_accept=lf["sum_accept"],
                        n_leapfrog=lf["n"],
                    )

                return stage

            keys = jr.split(key, max_depth)
            for depth in range(max_depth):
                stage = make_stage(depth, keys[depth])
                if not self.stage_skip:
                    # unconditional: finished chains ride along masked
                    carry = stage(carry)
                    continue
                # Early exit without lax.cond: a cond predicate forces a
                # device->host sync to pick the branch (~25 ms RTT per
                # stage per iteration through the tunnel — profiled to
                # dwarf the actual device compute), while a while-loop
                # condition is evaluated ON device.  A 0/1-trip while_loop
                # is therefore the sync-free conditional: the stage (and
                # its 2^depth masked leapfrog steps) is skipped entirely
                # once every chain's tree has terminated.
                def once(s, stage=stage):
                    return (jnp.asarray(False), stage(s[1]))

                carry = jax.lax.while_loop(
                    lambda s: s[0] & jnp.any(~s[1]["stop"]),
                    once,
                    (jnp.asarray(True), carry),
                )[1]

            out = carry
            accept_stat = jnp.where(
                out["n_leapfrog"] > 0,
                out["sum_accept"] / jnp.maximum(out["n_leapfrog"], 1),
                0.0,
            )
            return (
                out["prop_q"], out["prop_logp"], out["prop_grad"],
                accept_stat, out["n_leapfrog"], out["diverged"],
            )

        return step

    # -- public API -----------------------------------------------------------

    def mass_from_covariance(self, theta, cov) -> np.ndarray:
        """Diagonal x-space inverse mass from a theta-space covariance.

        NUTS samples in the unconstrained space; a posterior covariance
        estimated in theta space (e.g.
        :meth:`PointEstimator.laplace_covariance
        <rscm_tpu.calibrate.point_estimator.PointEstimator.laplace_covariance>`
        at a MAP point) maps through the squared Jacobian of the
        bounded->unconstrained transform at ``theta``.  Pass the result
        as ``run(inv_mass=...)`` — starting warmup with posterior-scale
        mass instead of prior-scale makes the very first trajectories
        well-conditioned, which short warmups need (docs/calibration.md).
        """
        import jax
        import jax.numpy as jnp

        _, to_x = self._build_transforms()
        theta = np.asarray(theta, dtype=np.float64)
        cov = np.asarray(cov, dtype=np.float64)
        var_theta = np.diag(cov) if cov.ndim == 2 else cov
        jac = np.asarray(jax.jacfwd(to_x)(jnp.asarray(theta)))
        var_x = np.maximum(np.diag(jac) ** 2 * var_theta, 1e-12)
        return 1.0 / var_x

    def run(
        self,
        n_iterations: int,
        n_chains: int = 4,
        warmup: int = 200,
        thin: int = 1,
        seed: Optional[int] = None,
        init_positions: Optional[np.ndarray] = None,
        step_size: float = 0.1,
        mesh=None,
        dispatch_chunk: Optional[int] = None,
        inv_mass: Optional[np.ndarray] = None,
    ) -> Chain:
        """Sample ``n_iterations`` post-warmup draws per chain.

        Warmup adapts the step size per chain by dual averaging toward
        ``target_accept``; warmup draws are not pushed to the chain.
        Diagnostics (divergences, leapfrog/model-evaluation counts, final
        step sizes) land in :attr:`last_diagnostics`.

        ``mesh`` shards the chain axis over a 1-D ``jax.sharding.Mesh``:
        chains are independent, so each device runs its share with no
        cross-device communication (``n_chains`` must be divisible by the
        device count).

        ``dispatch_chunk`` caps the iteration count per device dispatch
        (default 64, the XLA-pipeliner-safe ceiling — see ``_finish_run``).
        The chain is bitwise-independent of the chunking: the carry, RNG
        streams and warmup schedule thread through at the Python level.
        Smaller chunks trade a little dispatch overhead for smaller device
        programs — the workaround for the tunneled-worker fault on the
        largest MAGICC NUTS programs (docs/performance.md "Known issue"):
        the fault tracks per-dispatch trip count (<= 16 trips executed
        clean at every bisected scale), so ``dispatch_chunk=8`` runs
        configurations whose single-program form crashes the worker.
        """
        import jax
        import jax.numpy as jnp
        import jax.random as jr

        rng = np.random.default_rng(seed)
        names = self.params.param_names()
        D = len(names)

        to_theta, to_x = self._build_transforms()

        if init_positions is None:
            init_positions = self.params.sample_random(n_chains, rng)
        init_positions = np.asarray(init_positions, dtype=np.float64)
        if init_positions.shape != (n_chains, D):
            raise ValueError(
                f"init_positions must be ({n_chains}, {D}), "
                f"got {init_positions.shape}"
            )
        # Eager ops must run on the mesh's backend when one is given — the
        # default backend may be broken/absent under a forced-CPU fallback.
        from rscm_tpu.utils.target import mesh_context

        def dev_ctx():
            return mesh_context(mesh)

        with dev_ctx():
            init_x = np.asarray(jax.vmap(to_x)(jnp.asarray(init_positions)))

        # sampling runs in the unconstrained space; density incl. Jacobian
        base_logp = self._log_prob

        def logp_x(x):
            theta, logj = to_theta(x)
            return base_logp(theta) + logj

        # initial diagonal mass matrix: caller-provided (x-space posterior
        # variances, e.g. from mass_from_covariance on a Laplace fit — the
        # production recipe, docs/calibration.md) or the prior scale in
        # x-space; refined mid-warmup from the chain's own samples
        # (Welford window)
        if inv_mass is not None:
            inv_mass = np.asarray(inv_mass, dtype=np.float64)
            if inv_mass.shape != (D,):
                raise ValueError(
                    f"inv_mass must have shape ({D},), got {inv_mass.shape}"
                )
            if not np.all(np.isfinite(inv_mass)) or np.any(inv_mass <= 0.0):
                raise ValueError("inv_mass entries must be finite and > 0")
            with dev_ctx():
                inv_mass0 = jnp.asarray(inv_mass)
        else:
            prior_draws = self.params.sample_random(256, rng)
            with dev_ctx():
                x_draws = np.asarray(jax.vmap(to_x)(jnp.asarray(prior_draws)))
                prior_mass = np.maximum(np.var(x_draws, axis=0), 1e-12)
                inv_mass0 = jnp.asarray(1.0 / prior_mass)

        total_iters = warmup + n_iterations
        # The jitted closures are cached across run() calls: re-tracing
        # the unrolled tree-building program costs tens of host seconds
        # per run (profiled: trace_to_jaxpr dominated repeat-run wall time
        # while the device was busy for milliseconds), and the executable
        # itself is identical whenever these knobs are.
        mesh_key = None
        if mesh is not None:
            mesh_key = (
                mesh.axis_names, tuple(d.id for d in mesh.devices.flat),
            )
        cache_key = (n_chains, D, warmup, float(step_size), mesh_key)
        if not hasattr(self, "_jit_cache"):
            self._jit_cache = {}
        if cache_key in self._jit_cache:
            init_carry, run_chunk, adapt_mass = self._jit_cache[cache_key]
            return self._finish_run(
                init_carry, run_chunk, adapt_mass, init_x, inv_mass0,
                total_iters, warmup, n_chains, thin, rng, dev_ctx,
                dispatch_chunk,
            )

        step = self._build_step(D, logp_x, n_chains)

        # dual averaging constants (Hoffman & Gelman 2014)
        gamma, t0, kappa = 0.05, 10.0, 0.75
        target = self.target_accept
        # Welford window for mass adaptation: [25%, 75%) of warmup, with
        # the mass switched (and dual averaging restarted) at 75%
        w_lo = int(warmup * 0.25)
        w_hi = int(warmup * 0.75)
        adapt_mass = (w_hi - w_lo) >= max(10, 2 * D)

        # batched over chains: carry leaves are (C, D) or (C,); one PRNG
        # key per iteration (the transition batches its per-chain draws)
        def chain_step(carry, it_key):
            it, key = it_key
            (q, logp, grad, log_eps, log_eps_bar, h_bar, mu, da_m,
             inv_mass, w_count, w_mean, w_m2, n_lf, n_div) = carry
            eps = jnp.exp(log_eps)
            q, logp, grad, accept_stat, lf, diverged = step(
                q, logp, grad, eps, inv_mass, key
            )

            # Welford accumulation of x-space samples inside the window
            if adapt_mass:
                collect = (it >= w_lo) & (it < w_hi)  # scalar
                cnt = w_count + collect  # (C,)
                delta = q - w_mean  # (C, D)
                w_mean = w_mean + jnp.where(
                    collect, delta / jnp.maximum(cnt, 1)[:, None], 0.0
                )
                w_m2 = w_m2 + jnp.where(collect, delta * (q - w_mean), 0.0)
                w_count = cnt

                # switch: mass <- regularised sample variance (Stan-style
                # shrinkage toward the prior mass), dual averaging restarts
                at_switch = it == w_hi
                n = jnp.maximum(w_count - 1, 1).astype(w_m2.dtype)[:, None]
                var = w_m2 / n
                shrink = n / (n + 5.0)
                var_reg = shrink * var + (1.0 - shrink) * (1.0 / inv_mass)
                new_inv_mass = 1.0 / jnp.maximum(var_reg, 1e-12)
                inv_mass = jnp.where(at_switch, new_inv_mass, inv_mass)
                mu = jnp.where(at_switch, jnp.log(10.0) + log_eps, mu)
                h_bar = jnp.where(at_switch, 0.0, h_bar)
                da_m = jnp.where(at_switch, 0, da_m)

            # dual averaging (active during warmup only)
            da_m = da_m + 1
            m = da_m.astype(log_eps.dtype)
            eta = 1.0 / (m + t0)
            h_new = (1.0 - eta) * h_bar + eta * (target - accept_stat)
            log_eps_da = mu - jnp.sqrt(m) / gamma * h_new
            w = m ** (-kappa)
            log_eps_bar_da = w * log_eps_da + (1.0 - w) * log_eps_bar

            in_warmup = it < warmup
            # the last warmup iteration hands over the *averaged* step size
            # so the first recorded draw never steps with the raw (still
            # oscillating) dual-averaging iterate
            log_eps = jnp.where(
                it == warmup - 1,
                log_eps_bar_da,
                jnp.where(in_warmup, log_eps_da, log_eps_bar),
            )
            log_eps_bar = jnp.where(in_warmup, log_eps_bar_da, log_eps_bar)
            h_bar = jnp.where(in_warmup, h_new, h_bar)
            n_div = n_div + jnp.where(in_warmup, 0, diverged.astype(jnp.int32))

            carry = (q, logp, grad, log_eps, log_eps_bar, h_bar, mu, da_m,
                     inv_mass, w_count, w_mean, w_m2, n_lf + lf, n_div)
            return carry, (q, logp)

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            if n_chains % int(mesh.devices.size) != 0:
                raise ValueError(
                    f"mesh-sharded NUTS needs n_chains divisible by the "
                    f"device count ({int(mesh.devices.size)}), got {n_chains}"
                )
            axis = mesh.axis_names[0]
            s_c = NamedSharding(mesh, P(axis))          # (chains,)
            s_cd = NamedSharding(mesh, P(axis, None))   # (chains, D)
            # carry layout (see init_carry): leaves are (C, D) or (C,)
            carry_shardings = (
                s_cd, s_c, s_cd, s_c, s_c, s_c, s_c, s_c,
                s_cd, s_c, s_cd, s_cd, s_c, s_c,
            )
            # pin the carry's sharding on both ends so it round-trips the
            # chunk loop without resharding (constants made inside
            # init_carry would otherwise come out replicated and fail
            # run_chunk's in_shardings check)
            init_jit_kwargs = dict(
                in_shardings=(s_cd, NamedSharding(mesh, P())),
                out_shardings=carry_shardings,
            )
            chunk_jit_kwargs = dict(
                in_shardings=(
                    carry_shardings,
                    NamedSharding(mesh, P()),       # iters
                    NamedSharding(mesh, P()),       # keys (one per iteration)
                ),
                out_shardings=(
                    carry_shardings,
                    NamedSharding(mesh, P(None, axis, None)),  # thetas
                    NamedSharding(mesh, P(None, axis)),        # logps
                ),
            )
        else:
            init_jit_kwargs = {}
            chunk_jit_kwargs = {}

        init_vag = self._make_value_and_grad(logp_x, D)

        @functools.partial(jax.jit, **init_jit_kwargs)
        def init_carry(x0, inv_mass0):
            logp0, grad0 = jax.vmap(init_vag)(x0)
            grad0 = jnp.where(jnp.isfinite(grad0), grad0, 0.0)
            return (
                x0, logp0, grad0,
                jnp.full((n_chains,), jnp.log(step_size)),
                jnp.full((n_chains,), jnp.log(step_size)),
                jnp.zeros(n_chains),
                jnp.full((n_chains,), jnp.log(10.0 * step_size)),
                jnp.zeros(n_chains, jnp.int32),
                jnp.broadcast_to(inv_mass0, (n_chains, D)),
                jnp.zeros(n_chains, jnp.int32),
                jnp.zeros((n_chains, D)),
                jnp.zeros((n_chains, D)),
                jnp.zeros(n_chains, jnp.int32),
                jnp.zeros(n_chains, jnp.int32),
            )

        @functools.partial(jax.jit, **chunk_jit_kwargs)
        def run_chunk(carry, iters, keys):
            carry, (xs, logps_x) = jax.lax.scan(
                chain_step, carry, (iters, keys)
            )
            # back to theta-space; recorded log probs exclude the Jacobian
            thetas, logjs = jax.vmap(jax.vmap(to_theta))(xs)
            return carry, thetas, logps_x - logjs

        self._jit_cache[cache_key] = (init_carry, run_chunk, adapt_mass)
        return self._finish_run(
            init_carry, run_chunk, adapt_mass, init_x, inv_mass0,
            total_iters, warmup, n_chains, thin, rng, dev_ctx,
            dispatch_chunk,
        )

    def _finish_run(self, init_carry, run_chunk, adapt_mass, init_x,
                    inv_mass0, total_iters, warmup, n_chains, thin, rng,
                    dev_ctx, dispatch_chunk=None):
        """Drive the (possibly cached) jitted closures for one run."""
        import jax.numpy as jnp
        import jax.random as jr

        # XLA's TPU pipeliner mis-assigns memory spaces when a scan whose
        # body holds the NUTS tree-building loops keeps its backend loop
        # form: trip counts > 64 abort compilation with
        # "Check failed: memory_space == existing_required_assignment->
        # memory_space" (current libtpu; trip counts <= 64 take the
        # unrolled/double-buffered path and compile fine).  Chunk the
        # iteration scan at <= 64 trips per executable and thread the
        # carry through at the Python level — the op sequence, RNG streams
        # and warmup schedule (absolute iteration indices) are identical,
        # and balancing the chunk lengths keeps it to one compile for the
        # common sizes.
        max_chunk = 64
        if dispatch_chunk is not None:
            # exact-int check: a float like 2.7 silently truncating to 2
            # would surprise users tuning this knob against the
            # worker-fault ladder in docs/performance.md
            if isinstance(dispatch_chunk, bool) or not (
                isinstance(dispatch_chunk, (int, np.integer))
                or (
                    isinstance(dispatch_chunk, float)
                    and dispatch_chunk == int(dispatch_chunk)
                )
            ):
                raise TypeError(
                    f"dispatch_chunk must be an integer, got "
                    f"{dispatch_chunk!r}"
                )
            if dispatch_chunk < 1:
                raise ValueError(
                    f"dispatch_chunk must be >= 1, got {dispatch_chunk}"
                )
            if dispatch_chunk > 64:
                import warnings

                warnings.warn(
                    f"dispatch_chunk={int(dispatch_chunk)} exceeds the "
                    "XLA-pipeliner-safe ceiling of 64 scan trips per "
                    "dispatch and is clamped to 64 "
                    "(see nuts.py:_finish_run)",
                    stacklevel=3,
                )
            max_chunk = min(max_chunk, int(dispatch_chunk))
        else:
            # TPU auto-fence: the tunneled v5e worker reproducibly dies
            # ("kernel fault", ~10 min outage) executing the largest MAGICC
            # NUTS programs at >= 16 trips per dispatch, while every
            # bisected configuration at <= 8 trips runs clean
            # (docs/performance.md "Known issue").  Chunking is
            # bitwise-invisible to the chain (the carry, RNG streams and
            # warmup schedule thread through at the Python level,
            # tests/test_nuts.py::test_dispatch_chunk_is_bitwise_identical)
            # and chunk dispatches pipeline without host syncs, so the
            # safe trip count is the right TPU default — no user should
            # hit a 10-minute worker outage because they ran the model
            # they actually care about.  Pass dispatch_chunk explicitly
            # to override.
            from rscm_tpu.utils.target import target_platform

            with dev_ctx():
                if target_platform() == "tpu":
                    max_chunk = 8
        n_chunks = -(-total_iters // max_chunk)
        chunk_len = -(-total_iters // n_chunks)

        with dev_ctx():
            keys = jr.split(jr.PRNGKey(rng.integers(2**31)), total_iters)
            init_x_dev = jnp.asarray(init_x)
        # tracing happens inside this first call: resolve engine choices
        # against the mesh's platform, not the default backend
        with dev_ctx():
            carry = init_carry(init_x_dev, inv_mass0)
            q_parts, lp_parts = [], []
            for start in range(0, total_iters, chunk_len):
                end = min(start + chunk_len, total_iters)
                carry, th, lp = run_chunk(
                    carry, jnp.arange(start, end), keys[start:end]
                )
                q_parts.append(th)
                lp_parts.append(lp)

        qs = np.concatenate([np.asarray(p) for p in q_parts])[warmup:]
        logps = np.concatenate([np.asarray(p) for p in lp_parts])[warmup:]
        self.last_diagnostics = {
            "n_model_evals": int(np.sum(np.asarray(carry[12]))),
            "n_divergences": int(np.sum(np.asarray(carry[13]))),
            "step_sizes": np.exp(np.asarray(carry[3])).tolist(),
            "inv_mass": np.asarray(carry[8]).tolist(),
            "mass_adapted": bool(adapt_mass),
            "warmup": warmup,
            "n_chains": n_chains,
        }
        chain = Chain(self.params.param_names(), thin)
        chain.push_stacked(qs, logps)
        return chain
