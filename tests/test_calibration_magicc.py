"""
Calibration of the FULL MAGICC coupled model (synthetic truth).

This is the capability the whole calibrate subsystem exists for (the
reference built rscm-calibrate to drive arbitrary model factories —
``crates/rscm-calibrate/src/model_runner.rs:116-265``): here the complete
ten-component MAGICC graph runs as one compiled program inside the
posterior, with eight physical parameters spanning climate response,
terrestrial + ocean carbon, CH4 chemistry and aerosol forcing as traced
leaves.  Gradients flow through every component at once — which the
reference could never offer — and these tests pin that end to end:

- the traced log-posterior peaks at the synthetic truth and its gradient
  is finite and non-trivial in all eight directions;
- gradient-based MAP estimation recovers the truth;
- the stretch-move ensemble posterior concentrates around the truth
  (slow-marked: full posterior recovery needs hundreds of iterations);
- NUTS transitions through the full graph produce finite, moving chains.

bench.py's ``magicc_mcmc_*`` / ``magicc_nuts_*`` entries measure the same
construction at production scale (1024 walkers / 64 chains) on the TPU.
"""

import numpy as np
import pytest

from rscm_tpu.magicc.calibration import MAGICC_PARAM_SPECS, magicc_calibration

jax = pytest.importorskip("jax")


@pytest.fixture(scope="module")
def calib():
    # 101-year window keeps the CPU suite tractable; the bench runs the
    # full 251-year production shape on the TPU.
    return magicc_calibration(years=np.arange(1850.0, 1951.0))


@pytest.fixture(scope="module")
def log_prob(calib):
    from rscm_tpu.calibrate import EnsembleSampler

    sampler = EnsembleSampler(
        calib.params, calib.runner, calib.likelihood, calib.target
    )
    return sampler._build_device_log_prob()


class TestSetup:
    def test_eight_parameters_span_the_subsystems(self, calib):
        assert len(calib.param_names) == 8
        components = {
            MAGICC_PARAM_SPECS[n][0].split(".")[0] for n in calib.param_names
        }
        # climate, terrestrial carbon, ocean carbon, chemistry, aerosol
        assert components == {
            "ClimateUDEB",
            "TerrestrialCarbon",
            "OceanCarbon",
            "CH4Chemistry",
            "AerosolIndirect",
        }

    def test_truth_trajectories_finite(self, calib):
        for name, traj in calib.truth_trajectories.items():
            assert np.all(np.isfinite(np.asarray(traj)[1:])), name

    def test_target_uses_global_mean_for_fourbox_temperature(self, calib):
        compiled = calib.target.compile(
            calib.runner.model.time_axis, calib.runner.model.collection
        )
        spec = compiled.per_variable["Surface Temperature"]
        weights = spec["grid_weights"]
        assert weights is not None and weights.shape == (4,)
        np.testing.assert_allclose(weights.sum(), 1.0, rtol=1e-12)
        # scalar variables stay scalar
        assert (
            compiled.per_variable["Atmospheric Concentration|CO2"][
                "grid_weights"
            ]
            is None
        )

    def test_host_run_matches_traced_likelihood(self, calib):
        """ModelRunner protocol path agrees with the traced posterior."""
        output = calib.runner.run(calib.theta_true)
        host_ll = calib.likelihood.ln_likelihood(output, calib.target)
        compiled = calib.target.compile(
            calib.runner.model.time_axis, calib.runner.model.collection
        )
        traj = jax.jit(calib.runner.trajectories_fn())(
            calib.theta_true.astype(calib.runner.program.dtype)
        )
        traced_ll = float(
            calib.likelihood.ln_likelihood_traced(traj, compiled)
        )
        np.testing.assert_allclose(host_ll, traced_ll, rtol=1e-9)


class TestPosteriorShape:
    def test_log_prob_finite_and_peaked_at_truth(self, calib, log_prob):
        import jax.numpy as jnp

        lp_fn = jax.jit(log_prob)
        lp_true = float(lp_fn(jnp.asarray(calib.theta_true)))
        assert np.isfinite(lp_true)
        # every single-parameter perturbation must lower the posterior
        lower, upper = calib.params.bounds()
        for j in range(len(calib.theta_true)):
            theta = calib.theta_true.copy()
            span = upper[j] - lower[j]
            theta[j] = np.clip(
                theta[j] + 0.25 * span, lower[j] + 1e-6, upper[j] - 1e-6
            )
            lp = float(lp_fn(jnp.asarray(theta)))
            assert lp < lp_true, (
                f"perturbing {calib.param_names[j]} did not lower the "
                f"posterior ({lp} >= {lp_true})"
            )

    def test_gradient_flows_through_every_parameter(self, calib, log_prob):
        """d log-posterior / d theta_j is finite and nonzero for all eight —
        i.e. autodiff reaches through UDEB, both carbon cycles, CH4
        chemistry and the aerosol forcing inside one program."""
        import jax.numpy as jnp

        grad = jax.jit(jax.grad(log_prob))(
            jnp.asarray(calib.theta_true, dtype=np.float64)
        )
        grad = np.asarray(grad)
        assert np.all(np.isfinite(grad))
        assert np.all(np.abs(grad) > 0.0), (
            f"zero gradient component: {dict(zip(calib.param_names, grad))}"
        )

    @pytest.mark.slow  # one reverse-mode pass through full MAGICC (~35 s)
    def test_forward_and_reverse_gradients_agree(self, calib, log_prob):
        from rscm_tpu.calibrate import NUTSSampler

        import jax.numpy as jnp

        nuts = NUTSSampler(
            calib.params,
            calib.runner,
            calib.likelihood,
            calib.target,
            grad_mode="fwd",
        )
        vag = nuts._make_value_and_grad(log_prob, len(calib.param_names))
        theta = jnp.asarray(calib.theta_true, dtype=np.float64)
        v_fwd, g_fwd = jax.jit(vag)(theta)
        v_rev, g_rev = jax.jit(jax.value_and_grad(log_prob))(theta)
        np.testing.assert_allclose(float(v_fwd), float(v_rev), rtol=1e-12)
        # JVP and VJP propagate tangents/cotangents through the ocean
        # component's bfloat16 flux-history casts (the production memory
        # mode this fixture uses) in different rounding orders, so
        # agreement here is bounded by bf16 resolution, not f64 (measured
        # 2.8e-3 max rel; a clean f64 model agrees to 1e-15 —
        # tests/test_nuts.py).  Direction must agree essentially exactly.
        g_fwd, g_rev = np.asarray(g_fwd), np.asarray(g_rev)
        scale = np.max(np.abs(g_rev))
        np.testing.assert_allclose(g_fwd, g_rev, rtol=2e-2, atol=1e-6 * scale)
        cos = np.dot(g_fwd, g_rev) / (
            np.linalg.norm(g_fwd) * np.linalg.norm(g_rev)
        )
        assert cos > 0.999999, f"gradient direction diverged: cos={cos}"


class TestRecovery:
    def test_map_recovers_truth_three_params(self):
        """Gradient MAP through the whole MAGICC graph lands on the truth.

        Three parameters spanning climate (ecs), chemistry (tau_oh) and
        the terrestrial carbon cycle (beta), on an 81-year window — the
        CPU-affordable cut of the full problem (the 8-parameter version
        is the slow-marked test below; the degeneracy discussion lives on
        ``rscm_tpu.magicc.calibration._OBSERVABLES``).
        """
        from rscm_tpu.calibrate import AdamOptimizer, PointEstimator

        calib = magicc_calibration(
            years=np.arange(1850.0, 1931.0),
            param_names=["ecs", "tau_oh", "beta"],
            obs_interval=8,
        )
        estimator = PointEstimator(
            calib.params, calib.runner, calib.likelihood, calib.target
        )
        rng = np.random.default_rng(7)
        lower, upper = map(np.asarray, calib.params.bounds())
        x0 = lower + rng.random(len(lower)) * (upper - lower)
        estimate = estimator.optimize(
            AdamOptimizer(learning_rate=0.08, n_steps=90), x0=list(x0)
        )
        theta_map = np.asarray(estimate.best_params)

        # fit quality: at least as good as the truth's own posterior
        # (observation noise means the MAP can beat the truth slightly)
        lp_truth = estimator.evaluate(calib.theta_true)
        assert estimate.best_log_posterior > lp_truth - 10.0

        err = np.abs(theta_map - calib.theta_true) / (upper - lower)
        for name, tol in [("ecs", 0.06), ("tau_oh", 0.05), ("beta", 0.10)]:
            j = calib.param_names.index(name)
            assert err[j] < tol, (
                f"{name}: MAP {theta_map[j]:.4g} vs truth "
                f"{calib.theta_true[j]:.4g} (rel-span err {err[j]:.3f})"
            )

    @pytest.mark.slow
    def test_map_recovers_truth_eight_params(self, calib):
        """Full 8-parameter gradient MAP: with Ocean Heat Content in the
        targets the ECS/kappa ridge is broken and every major parameter
        lands near the truth."""
        from rscm_tpu.calibrate import AdamOptimizer, PointEstimator

        estimator = PointEstimator(
            calib.params, calib.runner, calib.likelihood, calib.target
        )
        rng = np.random.default_rng(7)
        lower, upper = map(np.asarray, calib.params.bounds())
        x0 = lower + rng.random(len(lower)) * (upper - lower)
        estimate = estimator.optimize(
            AdamOptimizer(learning_rate=0.03, n_steps=400), x0=list(x0)
        )
        theta_map = np.asarray(estimate.best_params)

        lp_truth = estimator.evaluate(calib.theta_true)
        assert estimate.best_log_posterior > lp_truth - 10.0

        err = np.abs(theta_map - calib.theta_true) / (upper - lower)
        for name, tol in [
            ("ecs", 0.08),
            ("kappa", 0.15),
            ("tau_oh", 0.05),
            ("beta", 0.12),
            ("cloud_albedo", 0.12),
        ]:
            j = calib.param_names.index(name)
            assert err[j] < tol, (
                f"{name}: MAP {theta_map[j]:.4g} vs truth "
                f"{calib.theta_true[j]:.4g} (rel-span err {err[j]:.3f})"
            )

    @pytest.mark.slow  # compiles the NUTS tree program over full MAGICC
    def test_nuts_transitions_through_full_graph(self, calib):
        from rscm_tpu.calibrate import NUTSSampler

        nuts = NUTSSampler(
            calib.params,
            calib.runner,
            calib.likelihood,
            calib.target,
            max_tree_depth=3,
        )
        chain = nuts.run(
            n_iterations=4,
            n_chains=4,
            warmup=4,
            seed=3,
            init_positions=np.tile(calib.theta_true, (4, 1))
            * (1.0 + 0.01 * np.arange(4)[:, None]),
        )
        samples = chain.flat_samples()
        assert samples.shape == (16, 8)
        assert np.all(np.isfinite(samples))
        assert nuts.last_diagnostics["n_model_evals"] > 0
        # chains moved off their initial positions
        assert np.std(samples, axis=0).max() > 0.0

    @pytest.mark.slow
    def test_mcmc_posterior_recovers_truth(self, calib):
        """Stretch-engine posterior concentrates around the synthetic truth."""
        from rscm_tpu.calibrate import EnsembleSampler, WalkerInit

        sampler = EnsembleSampler(
            calib.params, calib.runner, calib.likelihood, calib.target
        )
        chain = sampler.run(
            n_iterations=600,
            init=WalkerInit.ball(list(calib.theta_true), 0.05),
            thin=1,
            n_walkers=64,
            seed=11,
            engine="device",
        )
        samples = chain.flat_samples(discard=300)
        lower, upper = map(np.asarray, calib.params.bounds())
        lo_q = np.quantile(samples, 0.005, axis=0)
        hi_q = np.quantile(samples, 0.995, axis=0)
        for j, name in enumerate(calib.param_names):
            assert lo_q[j] - 1e-9 <= calib.theta_true[j] <= hi_q[j] + 1e-9, (
                f"{name}: truth {calib.theta_true[j]} outside posterior "
                f"99% interval [{lo_q[j]}, {hi_q[j]}]"
            )
        # posterior contracts relative to the prior for the identified ones
        prior_std = (upper - lower) / np.sqrt(12.0)
        post_std = samples.std(axis=0)
        for name in ("ecs", "tau_oh", "beta"):
            j = calib.param_names.index(name)
            assert post_std[j] < 0.5 * prior_std[j], (
                f"{name}: posterior std {post_std[j]:.4g} did not contract "
                f"vs prior {prior_std[j]:.4g}"
            )
