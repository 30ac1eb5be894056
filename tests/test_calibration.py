"""Calibration tests: priors, LHS, likelihood, samplers (host + device),
gradient point estimation, chain diagnostics, checkpoint/resume.

Behaviours mirror ``tests/test_calibration_simple.py`` /
``test_calibration_integration.py`` and the rscm-calibrate unit tests.
"""

import numpy as np
import pytest

from rscm_tpu.calibrate import (
    AdamOptimizer,
    Bound,
    Chain,
    CompiledModelRunner,
    DefaultModelRunner,
    EnsembleSampler,
    GaussianLikelihood,
    LogNormal,
    ModelOutput,
    Normal,
    ParameterSet,
    PointEstimator,
    RandomSearch,
    SamplerState,
    Target,
    Uniform,
    VariableOutput,
    WalkerInit,
)
from rscm_tpu.components import TwoLayer
from rscm_tpu.core import ModelBuilder, TimeAxis, Timeseries


class TestDistributions:
    def test_uniform(self):
        d = Uniform(2.0, 4.0)
        rng = np.random.default_rng(0)
        samples = d.sample_n(1000, rng)
        assert samples.min() >= 2.0 and samples.max() <= 4.0
        assert d.ln_pdf(3.0) == pytest.approx(-np.log(2.0))
        assert d.ln_pdf(5.0) == -np.inf
        assert d.bounds() == (2.0, 4.0)
        with pytest.raises(ValueError):
            Uniform(4.0, 2.0)

    def test_normal(self):
        d = Normal(1.0, 0.5)
        assert d.ln_pdf(1.0) == pytest.approx(
            -np.log(0.5) - 0.5 * np.log(2 * np.pi)
        )
        rng = np.random.default_rng(0)
        samples = d.sample_n(20000, rng)
        assert samples.mean() == pytest.approx(1.0, abs=0.02)
        assert samples.std() == pytest.approx(0.5, abs=0.02)
        with pytest.raises(ValueError):
            Normal(0.0, -1.0)

    def test_lognormal(self):
        d = LogNormal.from_mean_std(2.0, 0.5)
        rng = np.random.default_rng(0)
        samples = d.sample_n(50000, rng)
        assert samples.mean() == pytest.approx(2.0, rel=0.02)
        assert d.ln_pdf(-1.0) == -np.inf

    def test_bound(self):
        d = Bound(Normal(0.0, 10.0), -1.0, 1.0)
        rng = np.random.default_rng(0)
        samples = d.sample_n(500, rng)
        assert samples.min() >= -1.0 and samples.max() <= 1.0
        assert d.ln_pdf(2.0) == -np.inf
        assert np.isfinite(d.ln_pdf(0.5))

    def test_serialisation_roundtrip(self):
        from rscm_tpu.calibrate import Distribution

        for d in [Uniform(0, 1), Normal(1, 2), LogNormal(0.1, 0.4),
                  Bound(Normal(0, 1), -2, 2)]:
            d2 = Distribution.from_dict(d.to_dict())
            assert type(d2) is type(d)


class TestParameterSet:
    def _make(self):
        ps = ParameterSet()
        ps.add("a", Uniform(0.0, 1.0))
        ps.add("b", Normal(5.0, 1.0))
        return ps

    def test_basic(self):
        ps = self._make()
        assert ps.param_names() == ["a", "b"]
        assert len(ps) == 2

    def test_sample_random(self):
        ps = self._make()
        samples = ps.sample_random(100, np.random.default_rng(0))
        assert samples.shape == (100, 2)
        assert np.all((samples[:, 0] >= 0) & (samples[:, 0] <= 1))

    def test_sample_lhs_stratification(self):
        ps = self._make()
        samples = ps.sample_lhs(10, np.random.default_rng(0))
        # Uniform LHS: exactly one sample per decile
        counts, _ = np.histogram(samples[:, 0], bins=10, range=(0, 1))
        assert np.all(counts == 1)

    def test_log_prior(self):
        ps = self._make()
        lp = ps.log_prior(np.array([0.5, 5.0]))
        expected = -np.log(1.0) + (-np.log(1.0) - 0.5 * np.log(2 * np.pi))
        assert lp == pytest.approx(expected)
        assert ps.log_prior(np.array([2.0, 5.0])) == -np.inf
        # batched
        batch = ps.log_prior(np.array([[0.5, 5.0], [2.0, 5.0]]))
        assert np.isfinite(batch[0]) and batch[1] == -np.inf

    def test_bounds(self):
        lower, upper = self._make().bounds()
        assert lower == [0.0, -np.inf]
        assert upper == [1.0, np.inf]


class TestLikelihood:
    def test_gaussian(self):
        target = Target()
        target.add_variable("T").add(2000.0, 1.0, 0.5)
        output = ModelOutput()
        vo = VariableOutput("T")
        vo.add(2000.0, 1.5)
        output.add_variable(vo)
        ll = GaussianLikelihood().ln_likelihood(output, target)
        assert ll == pytest.approx(-0.5 * (0.5 / 0.5) ** 2)

    def test_normalized(self):
        target = Target()
        target.add_variable("T").add(2000.0, 1.0, 0.5)
        output = ModelOutput()
        vo = VariableOutput("T")
        vo.add(2000.0, 1.0)
        output.add_variable(vo)
        ll = GaussianLikelihood.with_normalization().ln_likelihood(output, target)
        assert ll == pytest.approx(-0.5 * np.log(2 * np.pi) - np.log(0.5))

    def test_missing_time_raises(self):
        target = Target()
        target.add_variable("T").add(2000.0, 1.0, 0.5)
        output = ModelOutput()
        output.add_variable(VariableOutput("T"))
        with pytest.raises(ValueError, match="missing time"):
            GaussianLikelihood().ln_likelihood(output, target)


# --------------------------------------------------------------------------
# End-to-end calibration of the two-layer model to synthetic observations
# --------------------------------------------------------------------------

YEARS = np.arange(2000.0, 2051.0)
TRUE_LAMBDA = 1.2


def _build_two_layer(lambda0=TRUE_LAMBDA):
    return (
        ModelBuilder()
        .with_time_axis(TimeAxis.from_values(YEARS))
        .with_component(
            TwoLayer(
                lambda0=lambda0, a=0.0, efficacy=1.0, eta=0.7,
                heat_capacity_surface=8.0, heat_capacity_deep=100.0,
            )
        )
        .with_exogenous_variable(
            "Effective Radiative Forcing",
            Timeseries.from_values(np.full(len(YEARS), 3.7), YEARS),
        )
        .with_initial_values(
            {"Surface Temperature": 0.0, "Deep Ocean Temperature": 0.0}
        )
        .build()
    )


def _make_target(noise_seed=1):
    truth = _build_two_layer(TRUE_LAMBDA)
    truth.run()
    temps = truth.collection.get_data("Surface Temperature").values()[:, 0]
    rng = np.random.default_rng(noise_seed)
    target = Target()
    vt = target.add_variable("Surface Temperature")
    for i in range(10, len(YEARS), 5):
        vt.add(float(YEARS[i]), float(temps[i] + rng.normal(0, 0.02)), 0.05)
    return target


@pytest.fixture(scope="module")
def compiled_runner():
    model = _build_two_layer()
    return CompiledModelRunner(
        model,
        param_map={"lambda0": "TwoLayer.lambda0"},
        output_variables=["Surface Temperature"],
    )


class TestCompiledRunner:
    def test_run_matches_direct(self, compiled_runner):
        output = compiled_runner.run([1.2])
        direct = _build_two_layer(1.2)
        direct.run()
        temps = direct.collection.get_data("Surface Temperature").values()[:, 0]
        assert output.get_variable("Surface Temperature").get(2030.0) == pytest.approx(
            temps[30], rel=1e-10
        )

    def test_host_and_device_posteriors_agree(self, compiled_runner):
        params = ParameterSet().add("lambda0", Uniform(0.5, 2.5))
        target = _make_target()
        sampler = EnsembleSampler(
            params, compiled_runner, GaussianLikelihood(), target
        )
        thetas = [[0.9], [1.2], [1.8]]
        host = sampler.log_posterior_batch(thetas)

        import jax

        device_fn = jax.vmap(sampler._build_device_log_prob())
        device = np.asarray(device_fn(np.asarray(thetas)))
        np.testing.assert_allclose(host, device, rtol=1e-8)


class TestWalkerInit:
    def test_ball_scalar_radius(self):
        from rscm_tpu.calibrate import ParameterSet, Uniform, WalkerInit

        params = ParameterSet().add("a", Uniform(0.0, 10.0)).add(
            "b", Uniform(-1.0, 1.0)
        )
        rng = np.random.default_rng(0)
        pos = WalkerInit.ball([5.0, 0.0], 0.1).initialize(64, params, rng)
        assert pos.shape == (64, 2)
        assert np.all(np.abs(pos - [5.0, 0.0]) <= 0.05 + 1e-12)

    def test_ball_per_dimension_radius(self):
        """Array radius: each dimension gets its own box half-width (the
        form MAP-ball initialisation uses — parameters rarely share a
        scale)."""
        from rscm_tpu.calibrate import ParameterSet, Uniform, WalkerInit

        params = ParameterSet().add("a", Uniform(0.0, 10.0)).add(
            "b", Uniform(-1.0, 1.0)
        )
        rng = np.random.default_rng(0)
        pos = WalkerInit.ball([5.0, 0.0], [2.0, 0.01]).initialize(
            256, params, rng
        )
        assert np.all(np.abs(pos[:, 0] - 5.0) <= 1.0 + 1e-12)
        assert np.all(np.abs(pos[:, 1]) <= 0.005 + 1e-12)
        # each dimension actually fills its own scale
        assert np.ptp(pos[:, 0]) > 1.5
        assert np.ptp(pos[:, 1]) > 0.007

    def test_ball_radius_length_mismatch_raises(self):
        from rscm_tpu.calibrate import ParameterSet, Uniform, WalkerInit

        params = ParameterSet().add("a", Uniform(0.0, 10.0)).add(
            "b", Uniform(-1.0, 1.0)
        )
        rng = np.random.default_rng(0)
        with pytest.raises(ValueError, match="radius length"):
            WalkerInit.ball([5.0, 0.0], [1.0, 2.0, 3.0]).initialize(
                8, params, rng
            )


class TestEnsembleSampler:
    def test_device_sampler_recovers_parameter(self, compiled_runner):
        params = ParameterSet().add("lambda0", Uniform(0.5, 2.5))
        target = _make_target()
        sampler = EnsembleSampler(
            params, compiled_runner, GaussianLikelihood(), target
        )
        chain = sampler.run(
            n_iterations=400, init=WalkerInit.from_prior(), thin=1, seed=7,
            engine="device",
        )
        assert len(chain) == 400
        flat = chain.flat_samples(discard=200)
        posterior_mean = flat[:, 0].mean()
        assert posterior_mean == pytest.approx(TRUE_LAMBDA, abs=0.1)
        # split-chain R-hat over 200 kept iterations of an autocorrelated
        # stretch sampler sits slightly above 1; 1.2 flags real failures
        r_hat = chain.r_hat(discard=200)
        assert r_hat["lambda0"] < 1.2
        assert flat[:, 0].std() < 0.05  # tight, well-mixed posterior

    def test_device_sampler_de_move_recovers_parameter(self, compiled_runner):
        """DE-move device engine samples the same posterior as stretch."""
        from rscm_tpu.calibrate import DEMove

        params = ParameterSet().add("lambda0", Uniform(0.5, 2.5))
        target = _make_target()
        sampler = EnsembleSampler(
            params, compiled_runner, GaussianLikelihood(), target,
            move=DEMove(),
        )
        chain = sampler.run(
            n_iterations=400, init=WalkerInit.from_prior(), thin=1, seed=7,
            engine="device",
        )
        flat = chain.flat_samples(discard=200)
        assert flat[:, 0].mean() == pytest.approx(TRUE_LAMBDA, abs=0.1)
        assert chain.r_hat(discard=200)["lambda0"] < 1.2
        assert flat[:, 0].std() < 0.05

    def test_host_sampler_de_move_recovers_parameter(self, compiled_runner):
        from rscm_tpu.calibrate import DEMove

        params = ParameterSet().add("lambda0", Uniform(0.5, 2.5))
        target = _make_target()
        sampler = EnsembleSampler(
            params, compiled_runner, GaussianLikelihood(), target,
        ).with_move(DEMove())
        chain = sampler.run(
            n_iterations=150, init=WalkerInit.from_prior(), thin=1, seed=3,
            engine="host",
        )
        flat = chain.flat_samples(discard=75)
        assert flat[:, 0].mean() == pytest.approx(TRUE_LAMBDA, abs=0.1)

    def test_de_move_validation(self):
        from rscm_tpu.calibrate import DEMove

        with pytest.raises(ValueError):
            DEMove(gamma1_prob=1.5)
        with pytest.raises(ValueError):
            DEMove(sigma=-1.0)
        assert DEMove(gamma=0.7).resolve_gamma(8) == 0.7
        assert DEMove().resolve_gamma(8) == pytest.approx(2.38 / np.sqrt(16.0))
        with pytest.raises(TypeError):
            EnsembleSampler(
                ParameterSet().add("x", Uniform(0, 1)), None,
                GaussianLikelihood(), Target(), move="de",
            )

    def test_gaussian_walker_init_clips_into_support(self):
        params = (
            ParameterSet()
            .add("a", Uniform(0.0, 1.0))
            .add("b", Uniform(-2.0, 2.0))
        )
        cov = np.array([[4.0, 0.5], [0.5, 4.0]])  # much wider than support
        init = WalkerInit.gaussian([0.5, 0.0], cov)
        rng = np.random.default_rng(0)
        pos = init.initialize(64, params, rng)
        assert pos.shape == (64, 2)
        assert pos[:, 0].min() >= 0.0 and pos[:, 0].max() <= 1.0
        assert pos[:, 1].min() >= -2.0 and pos[:, 1].max() <= 2.0
        with pytest.raises(ValueError):
            WalkerInit.gaussian([0.5], cov)

    def test_device_sampler_on_mesh_matches_single_device(self, compiled_runner):
        """Mesh-sharding the walker axis must not change the sampled chain:
        the same seed produces the same positions (the complement draws are
        pure array indexing, turned into cross-device gathers by GSPMD)."""
        import jax

        from rscm_tpu.parallel import make_mesh

        if len(jax.devices()) < 2:
            pytest.skip("needs multiple (virtual) devices")
        params = ParameterSet().add("lambda0", Uniform(0.5, 2.5))
        target = _make_target()
        n_walkers = 4 * len(jax.devices())

        def run(mesh):
            sampler = EnsembleSampler(
                params, compiled_runner, GaussianLikelihood(), target
            )
            return sampler.run(
                n_iterations=20, init=WalkerInit.from_prior(), thin=1,
                n_walkers=n_walkers, seed=21, engine="device", mesh=mesh,
            )

        plain = run(None).flat_samples(discard=0)
        sharded = run(make_mesh()).flat_samples(discard=0)
        assert sharded.shape == (20 * n_walkers, 1)
        assert np.all(np.isfinite(sharded))
        np.testing.assert_allclose(plain, sharded, rtol=1e-6)

    def test_device_sampler_mesh_rejects_indivisible_walkers(
        self, compiled_runner
    ):
        import jax

        from rscm_tpu.parallel import make_mesh

        if len(jax.devices()) < 2:
            pytest.skip("needs multiple (virtual) devices")
        params = ParameterSet().add("lambda0", Uniform(0.5, 2.5))
        sampler = EnsembleSampler(
            params, compiled_runner, GaussianLikelihood(), _make_target()
        )
        bad = 2 * len(jax.devices()) + 2  # even, but half not shardable
        with pytest.raises(ValueError, match="divisible"):
            sampler.run(
                n_iterations=2, init=WalkerInit.from_prior(), thin=1,
                n_walkers=bad, seed=1, engine="device", mesh=make_mesh(),
            )

    def test_host_sampler_with_default_runner(self):
        # host path: user factory building a fresh model per theta
        def factory(theta):
            return _build_two_layer(lambda0=float(theta[0]))

        runner = DefaultModelRunner(
            ["lambda0"], ["Surface Temperature"], factory
        )
        params = ParameterSet().add("lambda0", Uniform(0.8, 1.8))
        target = _make_target()
        sampler = EnsembleSampler(params, runner, GaussianLikelihood(), target)
        chain = sampler.run(
            n_iterations=4, init=WalkerInit.ball([1.2], 0.1), thin=1,
            n_walkers=4, seed=3, engine="host",
        )
        assert len(chain) == 4
        assert chain.flat_samples().shape == (16, 1)

    def test_checkpoint_resume(self, compiled_runner, tmp_path):
        params = ParameterSet().add("lambda0", Uniform(0.5, 2.5))
        target = _make_target()
        sampler = EnsembleSampler(
            params, compiled_runner, GaussianLikelihood(), target
        )
        path = str(tmp_path / "ckpt")
        chain1 = sampler.run_with_checkpoint(
            n_iterations=10, init=WalkerInit.from_prior(), thin=1,
            checkpoint_every=5, checkpoint_path=path, seed=11,
        )
        assert len(chain1) == 10
        chain2 = sampler.resume_from_checkpoint(
            n_iterations=15, thin=1, checkpoint_every=5, checkpoint_path=path,
            seed=12,
        )  # n_iterations is the TOTAL target (reference semantics)
        assert len(chain2) == 15  # resumed chain includes prior samples

        # checkpoints written during a resumed run must record ABSOLUTE
        # progress: a second resume to an already-reached total is a no-op
        # (the within-run counter used to be saved, so this re-ran 10
        # iterations and returned a 25-sample chain of duplicated draws)
        from rscm_tpu.calibrate.sampler import SamplerState

        assert SamplerState.load_checkpoint(path + ".state").iteration == 15
        chain3 = sampler.resume_from_checkpoint(
            n_iterations=15, thin=1, checkpoint_every=5, checkpoint_path=path,
            seed=13,
        )
        assert len(chain3) == 15

    def test_odd_walkers_rejected_on_every_entry_point(
        self, compiled_runner, tmp_path
    ):
        """The half-split engines can't handle odd walker counts; run,
        run_with_checkpoint AND resume_from_checkpoint must all reject them
        (an odd count would silently freeze the last walker on the device
        engine's fixed-size half slices)."""
        params = ParameterSet().add("lambda0", Uniform(0.5, 2.5))
        target = _make_target()
        sampler = EnsembleSampler(
            params, compiled_runner, GaussianLikelihood(), target
        )
        with pytest.raises(ValueError, match="even"):
            sampler.run(
                n_iterations=2, init=WalkerInit.from_prior(), thin=1,
                n_walkers=5, seed=1,
            )
        path = str(tmp_path / "ckpt_odd")
        with pytest.raises(ValueError, match="even"):
            sampler.run_with_checkpoint(
                n_iterations=2, init=WalkerInit.from_prior(), thin=1,
                checkpoint_every=1, checkpoint_path=path, n_walkers=7, seed=1,
            )
        # a checkpoint doctored to an odd walker count must be rejected too
        good = str(tmp_path / "ckpt_good")
        sampler.run_with_checkpoint(
            n_iterations=2, init=WalkerInit.from_prior(), thin=1,
            checkpoint_every=1, checkpoint_path=good, n_walkers=4, seed=2,
        )
        state = SamplerState.load_checkpoint(good + ".state")
        state.positions = state.positions[:3]
        state.log_probs = state.log_probs[:3]
        state.n_accepted = state.n_accepted[:3]
        state.n_proposed = state.n_proposed[:3]
        state.save_checkpoint(good + ".state")
        with pytest.raises(ValueError, match="even"):
            sampler.resume_from_checkpoint(
                n_iterations=4, thin=1, checkpoint_every=1,
                checkpoint_path=good, seed=3,
            )
        with pytest.raises(ValueError, match="at least 2"):
            sampler.run(
                n_iterations=2, init=WalkerInit.from_prior(), thin=1,
                n_walkers=1, seed=1,
            )

    def test_progress_callback(self, compiled_runner):
        params = ParameterSet().add("lambda0", Uniform(0.5, 2.5))
        target = _make_target()
        sampler = EnsembleSampler(
            params, compiled_runner, GaussianLikelihood(), target
        )
        infos = []
        sampler.run(
            n_iterations=6, init=WalkerInit.from_prior(), thin=1, seed=5,
            progress_callback=infos.append,
        )
        assert infos and infos[-1].total == 6
        assert 0.0 <= infos[-1].acceptance_rate <= 1.0


class TestPointEstimation:
    def test_random_search(self, compiled_runner):
        params = ParameterSet().add("lambda0", Uniform(0.5, 2.5))
        estimator = PointEstimator(
            params, compiled_runner, GaussianLikelihood(), _make_target()
        )
        result = estimator.optimize(RandomSearch(seed=0), n_samples=40)
        assert result.best_params[0] == pytest.approx(TRUE_LAMBDA, abs=0.2)
        assert result.n_evaluations == 40

    def test_gradient_descent_beats_random_search(self, compiled_runner):
        params = ParameterSet().add("lambda0", Uniform(0.5, 2.5))
        estimator = PointEstimator(
            params, compiled_runner, GaussianLikelihood(), _make_target()
        )
        result = estimator.optimize(AdamOptimizer(learning_rate=0.05, n_steps=80))
        assert result.best_params[0] == pytest.approx(TRUE_LAMBDA, abs=0.05)

    def test_adam_dispatch_chunk_is_bitwise_identical(self, compiled_runner):
        """The worker-fault fence (chunked step scan, nuts.py ladder)
        threads the Adam carry through at the Python level — the iterate
        sequence must be bit-for-bit the unchunked one."""
        params = ParameterSet().add("lambda0", Uniform(0.5, 2.5))
        estimator = PointEstimator(
            params, compiled_runner, GaussianLikelihood(), _make_target()
        )
        full = estimator.optimize(
            AdamOptimizer(learning_rate=0.05, n_steps=20), x0=[1.0]
        )
        chunked = estimator.optimize(
            AdamOptimizer(learning_rate=0.05, n_steps=20, dispatch_chunk=3),
            x0=[1.0],
        )
        assert full.best_params == chunked.best_params
        assert full.best_log_posterior == chunked.best_log_posterior

    def test_adam_dispatch_chunk_validation(self, compiled_runner):
        with pytest.raises(TypeError):
            AdamOptimizer(dispatch_chunk=2.7)
        with pytest.raises(ValueError):
            AdamOptimizer(dispatch_chunk=0)
        assert AdamOptimizer(dispatch_chunk=4.0).dispatch_chunk == 4


class TestChain:
    def _fake_chain(self, n_iter=50, n_walkers=8, seed=0):
        rng = np.random.default_rng(seed)
        chain = Chain(["x", "y"], thin=1)
        for _ in range(n_iter):
            chain.push(rng.normal(0, 1, (n_walkers, 2)), rng.normal(-5, 1, n_walkers))
        return chain

    def test_thinning(self):
        rng = np.random.default_rng(0)
        chain = Chain(["x"], thin=3)
        for _ in range(10):
            chain.push(rng.normal(0, 1, (4, 1)), rng.normal(size=4))
        assert len(chain) == 3  # iterations 3, 6, 9
        assert chain.total_iterations == 10

    def test_flat_samples(self):
        chain = self._fake_chain(10, 4)
        assert chain.flat_samples(0).shape == (40, 2)
        assert chain.flat_samples(4).shape == (24, 2)
        assert chain.flat_log_probs(4).shape == (24,)

    def test_diagnostics_on_stationary_chain(self):
        chain = self._fake_chain(100, 8)
        r_hat = chain.r_hat(discard=10)
        assert r_hat["x"] == pytest.approx(1.0, abs=0.1)
        ess = chain.ess(discard=10)
        assert ess["x"] > 100
        tau = chain.autocorr_time(discard=10)
        assert tau["x"] < 5.0
        assert chain.is_converged(10, threshold=1.1)

    def test_save_load_merge(self, tmp_path):
        chain = self._fake_chain(10, 4)
        path = str(tmp_path / "chain.npz")
        chain.save(path)
        loaded = Chain.load(path)
        assert len(loaded) == 10
        np.testing.assert_allclose(loaded.flat_samples(), chain.flat_samples())
        merged = chain.merge(loaded)
        assert len(merged) == 20
