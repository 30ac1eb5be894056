"""Calibration stress tests (mirror of tests/test_calibration_stress.py:
checkpoint-resume continuity, chain memory/thinning, long-run stability)."""

import numpy as np
import pytest

from rscm_tpu.calibrate import (
    Chain,
    CompiledModelRunner,
    EnsembleSampler,
    GaussianLikelihood,
    ParameterSet,
    SamplerState,
    Target,
    Uniform,
    WalkerInit,
)
from rscm_tpu.components import TwoLayer
from rscm_tpu.core import ModelBuilder, TimeAxis, Timeseries

YEARS = np.arange(2000.0, 2031.0)


def _build(lambda0=1.2):
    return (
        ModelBuilder()
        .with_time_axis(TimeAxis.from_values(YEARS))
        .with_component(
            TwoLayer(lambda0=lambda0, a=0.0, efficacy=1.0, eta=0.7,
                     heat_capacity_surface=8.0, heat_capacity_deep=100.0)
        )
        .with_exogenous_variable(
            "Effective Radiative Forcing",
            Timeseries.from_values(np.full(len(YEARS), 3.7), YEARS),
        )
        .with_initial_values({"Surface Temperature": 0.0, "Deep Ocean Temperature": 0.0})
        .build()
    )


@pytest.fixture(scope="module")
def sampler():
    model = _build()
    runner = CompiledModelRunner(
        model, {"lambda0": "TwoLayer.lambda0"}, ["Surface Temperature"]
    )
    truth = _build(1.2)
    truth.run()
    temps = truth.collection.get_data("Surface Temperature").values()[:, 0]
    target = Target()
    vt = target.add_variable("Surface Temperature")
    for i in range(5, len(YEARS), 5):
        vt.add(float(YEARS[i]), float(temps[i]), 0.05)
    params = ParameterSet().add("lambda0", Uniform(0.5, 2.5))
    return EnsembleSampler(params, runner, GaussianLikelihood(), target)


@pytest.mark.slow
class TestCheckpointResume:
    def test_resume_continues_chain(self, sampler, tmp_path):
        path = str(tmp_path / "run")
        chain1 = sampler.run_with_checkpoint(
            n_iterations=30, init=WalkerInit.from_prior(), thin=1,
            checkpoint_every=10, checkpoint_path=path, seed=1,
        )
        state = SamplerState.load_checkpoint(path + ".state")
        assert state.iteration == 30
        assert np.all(np.isfinite(state.log_probs))

        chain2 = sampler.resume_from_checkpoint(
            n_iterations=50, thin=1, checkpoint_every=10, checkpoint_path=path,
            seed=2,
        )  # n_iterations is the TOTAL target (reference semantics)
        assert len(chain2) == 50
        # resumed samples continue from checkpointed positions: the first
        # resumed iteration's walkers stay inside the prior support
        flat = chain2.flat_samples(discard=30)
        assert np.all((flat >= 0.5) & (flat <= 2.5))

    def test_checkpoint_files_loadable_midway(self, sampler, tmp_path):
        path = str(tmp_path / "mid")
        sampler.run_with_checkpoint(
            n_iterations=25, init=WalkerInit.from_prior(), thin=1,
            checkpoint_every=10, checkpoint_path=path, seed=3,
        )
        chain = Chain.load(path + ".chain")
        # last checkpoint fired at iteration 20
        assert len(chain) >= 20


@pytest.mark.slow
class TestChainMemory:
    def test_thinning_bounds_memory(self, sampler):
        chain = sampler.run(
            n_iterations=200, init=WalkerInit.from_prior(), thin=10, seed=4,
        )
        assert len(chain) == 20
        assert chain.total_iterations == 200

    def test_chain_size_cap(self):
        from rscm_tpu.calibrate.chain import MAX_CHAIN_BYTES

        chain = Chain(["x"], thin=1)
        # fake a chain just over the cap without allocating it all:
        # 1 GiB / (walkers * params * 8 bytes) iterations
        n_walkers = 4096
        one = np.zeros((n_walkers, 1))
        n_needed = MAX_CHAIN_BYTES // (one.nbytes * 2) + 2
        chain.samples = [one] * int(n_needed)
        chain.log_probs = [np.zeros(n_walkers)] * int(n_needed)
        with pytest.raises(ValueError, match="1 GiB cap"):
            chain.save("/tmp/should_not_exist.npz")


@pytest.mark.slow
def test_long_run_stays_in_support(sampler):
    chain = sampler.run(
        n_iterations=300, init=WalkerInit.ball([1.0], 0.2), thin=1, seed=5,
    )
    flat = chain.flat_samples(discard=50)
    assert np.all(np.isfinite(flat))
    assert np.all((flat >= 0.5) & (flat <= 2.5))
    assert chain.ess(discard=50)["lambda0"] > 50
