"""
NUTS: gradient-based MCMC through the compiled model program.

A capability the reference could not have (its models are not
differentiable; `crates/rscm-calibrate` ships only the stretch-move
ensemble sampler and RandomSearch): because the whole model is one traced
XLA program, ``jax.value_and_grad`` of the log-posterior comes free, and a
No-U-Turn sampler explores the posterior in far fewer model evaluations
than random-walk ensemble moves.

Implementation notes (multinomial NUTS, Betancourt 2017 / Stan-style):

- **Buffered tree building.**  The classic recursive doubling does not
  trace; the usual fix is checkpointed O(log N) subtree bookkeeping.  Here
  the posteriors are low-dimensional (parameter vectors, not networks), so
  the whole trajectory is stored in a fixed ``(2^(max_depth+1), D)``
  buffer indexed by signed leapfrog position — U-turn checks over every
  balanced subtree become masked cumulative-sum arithmetic over the
  buffer, and the doubling loop is a plain ``lax.while_loop``.
- **Progressive multinomial sampling** within/across subtrees (biased to
  the new subtree, as in Stan), Gumbel-max over masked log weights.
- **Per-chain dual averaging** (Hoffman & Gelman 2014 defaults) adapts the
  step size during warmup; the diagonal mass matrix is fixed to the prior
  variance (posteriors here are a handful of physical parameters).
- Divergences (energy error > 1000) and non-finite gradients terminate
  the doubling; gradients are sanitised to zero outside the prior support
  so a trajectory that grazes a bound rejects instead of poisoning
  positions with NaN.

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

    # -- one NUTS transition (pure, per chain) -------------------------------

    def _build_step(self, n_params, logp_fn):
        import jax
        import jax.numpy as jnp
        import jax.random as jr

        value_and_grad = jax.value_and_grad(logp_fn)
        max_depth = self.max_tree_depth
        n_leaves = 1 << max_depth
        buf_size = 2 * n_leaves  # signed positions -n_leaves..n_leaves-1
        origin = n_leaves
        D = int(n_params)

        def safe_grad(q):
            logp, grad = value_and_grad(q)
            grad = jnp.where(jnp.isfinite(grad), grad, 0.0)
            return logp, grad

        # positions in the buffer: signed leapfrog index + origin;
        # inv_mass is traced (adapted during warmup)
        def step(q0, logp0, grad0, eps, inv_mass, key):
            def kinetic(p):
                return 0.5 * jnp.sum(p * p * inv_mass)

            key, k_mom = jr.split(key)
            p0 = jr.normal(k_mom, (D,)) / jnp.sqrt(inv_mass)
            h0 = logp0 - kinetic(p0)  # log joint at the start

            qs = jnp.zeros((buf_size, D)).at[origin].set(q0)
            ps = jnp.zeros((buf_size, D)).at[origin].set(p0)
            grads = jnp.zeros((buf_size, D)).at[origin].set(grad0)
            logws = jnp.full((buf_size,), -jnp.inf).at[origin].set(0.0)

            init = dict(
                qs=qs, ps=ps, grads=grads, logws=logws,
                left=jnp.asarray(0), right=jnp.asarray(0),
                prop_q=q0, prop_logp=logp0,
                logw_total=jnp.asarray(0.0),
                depth=jnp.asarray(0),
                stop=jnp.asarray(False),
                diverged=jnp.asarray(False),
                sum_accept=jnp.asarray(0.0),
                n_leapfrog=jnp.asarray(0),
                key=key,
            )

            def cond(c):
                return (~c["stop"]) & (c["depth"] < max_depth)

            def body(c):
                key, k_dir, k_prop, k_leaf = jr.split(c["key"], 4)
                v = jnp.where(jr.bernoulli(k_dir), 1, -1)
                length = 1 << c["depth"]  # leaves in the new subtree

                edge = jnp.where(v > 0, c["right"], c["left"])

                # -- build the new subtree: `length` leapfrog steps --------
                def lf_cond(s):
                    return (s["i"] < length) & (~s["bad"])

                def lf_body(s):
                    pos = edge + v * (s["i"] + 1)
                    idx = pos + origin
                    p_half = s["p"] + 0.5 * eps * v * s["grad"]
                    q_new = s["q"] + eps * v * p_half * inv_mass
                    logp_new, grad_new = safe_grad(q_new)
                    p_new = p_half + 0.5 * eps * v * grad_new
                    logw = logp_new - kinetic(p_new) - h0
                    bad = ~jnp.isfinite(logw) | (logw < -_DIVERGENCE_THRESHOLD)
                    logw = jnp.where(bad, -jnp.inf, logw)
                    return dict(
                        i=s["i"] + 1,
                        q=q_new, p=p_new, grad=grad_new,
                        qs=s["qs"].at[idx].set(q_new),
                        ps=s["ps"].at[idx].set(p_new),
                        grads=s["grads"].at[idx].set(grad_new),
                        logws=s["logws"].at[idx].set(logw),
                        bad=bad,
                        sum_accept=s["sum_accept"]
                        + jnp.minimum(1.0, jnp.exp(logw)),
                        n=s["n"] + 1,
                    )

                e_idx = edge + origin
                lf0 = dict(
                    i=jnp.asarray(0),
                    q=c["qs"][e_idx], p=c["ps"][e_idx], grad=c["grads"][e_idx],
                    qs=c["qs"], ps=c["ps"], grads=c["grads"], logws=c["logws"],
                    bad=jnp.asarray(False),
                    sum_accept=c["sum_accept"], n=c["n_leapfrog"],
                )
                lf = jax.lax.while_loop(lf_cond, lf_body, lf0)
                diverged = lf["bad"]

                new_left = jnp.where(v > 0, c["left"], c["left"] - length)
                new_right = jnp.where(v > 0, c["right"] + length, c["right"])
                # subtree span (signed, inclusive)
                sub_lo = jnp.where(v > 0, c["right"] + 1, c["left"] - length)
                sub_hi = jnp.where(v > 0, c["right"] + length, c["left"] - 1)

                qs, ps, grads, logws = lf["qs"], lf["ps"], lf["grads"], lf["logws"]

                # -- U-turn checks over every balanced block ----------------
                # cumulative momentum over the buffer (static shape)
                positions = jnp.arange(buf_size) - origin
                csum = jnp.cumsum(ps, axis=0)  # (buf, D)

                def block_turning(span_lo, span_hi):
                    """Any balanced sub-block of [span_lo, span_hi] U-turns.

                    Checks blocks of size 2^m aligned to span_lo for
                    m = 1..max_depth, masked to those inside the span.
                    (The trajectory inside the span is contiguous, so sums
                    are cumsum differences.)
                    """
                    turning = jnp.asarray(False)
                    for m in range(1, max_depth + 1):
                        size = 1 << m
                        starts = span_lo + jnp.arange(n_leaves // size + 1) * size
                        ends = starts + size - 1
                        valid = ends <= span_hi
                        s_idx = jnp.clip(starts + origin, 0, buf_size - 1)
                        e_idx = jnp.clip(ends + origin, 0, buf_size - 1)
                        rsum = csum[e_idx] - jnp.where(
                            ((s_idx - 1) >= 0)[:, None],
                            csum[jnp.maximum(s_idx - 1, 0)],
                            0.0,
                        )
                        p_s = ps[s_idx]
                        p_e = ps[e_idx]
                        u = (
                            (jnp.sum(p_s * rsum * inv_mass, axis=1) < 0)
                            | (jnp.sum(p_e * rsum * inv_mass, axis=1) < 0)
                        )
                        turning = turning | jnp.any(u & valid)
                    return turning

                sub_turning = block_turning(sub_lo, sub_hi)

                # -- merge: progressive (biased) multinomial ----------------
                in_sub = (positions >= sub_lo) & (positions <= sub_hi)
                sub_logws = jnp.where(in_sub, logws, -jnp.inf)
                logw_sub = jax.scipy.special.logsumexp(sub_logws)

                # sample a leaf within the subtree ~ exp(logw) (Gumbel-max)
                gumbel = -jnp.log(-jnp.log(jr.uniform(k_leaf, (buf_size,))))
                leaf = jnp.argmax(sub_logws + gumbel)
                # biased progressive: favour the fresh subtree (Stan)
                p_new_tree = jnp.exp(jnp.minimum(0.0, logw_sub - c["logw_total"]))
                take = jr.uniform(k_prop) < p_new_tree
                ok = (~diverged) & (~sub_turning)
                take = take & ok

                prop_q = jnp.where(take, qs[leaf], c["prop_q"])
                prop_logp = jnp.where(
                    take, logws[leaf] + h0 + kinetic(ps[leaf]), c["prop_logp"]
                )
                logw_total = jnp.where(
                    ok, jnp.logaddexp(c["logw_total"], logw_sub), c["logw_total"]
                )

                # full-tree U-turn (left edge vs right edge)
                l_idx = new_left + origin
                r_idx = new_right + origin
                rsum_all = csum[r_idx] - jnp.where(
                    (l_idx - 1) >= 0, csum[jnp.maximum(l_idx - 1, 0)], 0.0
                )
                full_turning = (
                    (jnp.sum(ps[l_idx] * rsum_all * inv_mass) < 0)
                    | (jnp.sum(ps[r_idx] * rsum_all * inv_mass) < 0)
                )

                stop = diverged | sub_turning | full_turning
                return dict(
                    qs=qs, ps=ps, grads=grads, logws=logws,
                    left=jnp.where(ok, new_left, c["left"]),
                    right=jnp.where(ok, new_right, c["right"]),
                    prop_q=prop_q, prop_logp=prop_logp,
                    logw_total=logw_total,
                    depth=c["depth"] + 1,
                    stop=stop,
                    diverged=c["diverged"] | diverged,
                    sum_accept=lf["sum_accept"],
                    n_leapfrog=lf["n"],
                    key=key,
                )

            out = jax.lax.while_loop(cond, body, init)
            _, grad_out = safe_grad(out["prop_q"])
            accept_stat = jnp.where(
                out["n_leapfrog"] > 0,
                out["sum_accept"] / out["n_leapfrog"],
                0.0,
            )
            return (
                out["prop_q"], out["prop_logp"], grad_out,
                accept_stat, out["n_leapfrog"], out["diverged"],
            )

        return step

    # -- public API -----------------------------------------------------------

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

        # initial diagonal mass matrix from the prior scale (in x-space);
        # refined mid-warmup from the chain's own samples (Welford window)
        prior_draws = self.params.sample_random(256, rng)
        with dev_ctx():
            x_draws = np.asarray(jax.vmap(to_x)(jnp.asarray(prior_draws)))
            prior_mass = np.maximum(np.var(x_draws, axis=0), 1e-12)
            inv_mass0 = jnp.asarray(1.0 / prior_mass)

        step = self._build_step(D, logp_x)

        # dual averaging constants (Hoffman & Gelman 2014)
        gamma, t0, kappa = 0.05, 10.0, 0.75
        target = self.target_accept
        total_iters = warmup + n_iterations
        # Welford window for mass adaptation: [25%, 75%) of warmup, with
        # the mass switched (and dual averaging restarted) at 75%
        w_lo = int(warmup * 0.25)
        w_hi = int(warmup * 0.75)
        adapt_mass = (w_hi - w_lo) >= max(10, 2 * D)

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
                collect = (it >= w_lo) & (it < w_hi)
                cnt = w_count + collect
                delta = q - w_mean
                w_mean = w_mean + jnp.where(
                    collect, delta / jnp.maximum(cnt, 1), 0.0
                )
                w_m2 = w_m2 + jnp.where(collect, delta * (q - w_mean), 0.0)
                w_count = cnt

                # switch: mass <- regularised sample variance (Stan-style
                # shrinkage toward the prior mass), dual averaging restarts
                at_switch = it == w_hi
                n = jnp.maximum(w_count - 1, 1).astype(w_m2.dtype)
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

        vmapped = jax.vmap(chain_step, in_axes=(0, (None, 0)))

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
                in_shardings=(s_cd,), out_shardings=carry_shardings
            )
            chunk_jit_kwargs = dict(
                in_shardings=(
                    carry_shardings,
                    NamedSharding(mesh, P()),              # iters
                    NamedSharding(mesh, P(None, axis, None)),  # keys
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

        @functools.partial(jax.jit, **init_jit_kwargs)
        def init_carry(x0):
            logp0, grad0 = jax.vmap(jax.value_and_grad(logp_x))(x0)
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
            carry, (xs, logps_x) = jax.lax.scan(vmapped, carry, (iters, keys))
            # back to theta-space; recorded log probs exclude the Jacobian
            thetas, logjs = jax.vmap(jax.vmap(to_theta))(xs)
            return carry, thetas, logps_x - logjs

        # XLA's TPU pipeliner mis-assigns memory spaces when a scan whose
        # body holds the NUTS tree-doubling while-loops keeps its backend
        # loop form: trip counts > 64 abort compilation with
        # "Check failed: memory_space == existing_required_assignment->
        # memory_space" (current libtpu; trip counts <= 64 take the
        # unrolled/double-buffered path and compile fine).  Chunk the
        # iteration scan at <= 64 trips per executable and thread the
        # carry through at the Python level — the op sequence, RNG streams
        # and warmup schedule (absolute iteration indices) are identical,
        # and balancing the chunk lengths keeps it to one compile for the
        # common sizes.
        max_chunk = 64
        n_chunks = -(-total_iters // max_chunk)
        chunk_len = -(-total_iters // n_chunks)

        with dev_ctx():
            keys = jr.split(
                jr.PRNGKey(rng.integers(2**31)), total_iters * n_chains
            )
            keys = keys.reshape(total_iters, n_chains, 2)
            init_x_dev = jnp.asarray(init_x)
        # tracing happens inside this first call: resolve engine choices
        # against the mesh's platform, not the default backend
        with dev_ctx():
            carry = init_carry(init_x_dev)
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
        chain = Chain(names, thin)
        chain.push_stacked(qs, logps)
        return chain
