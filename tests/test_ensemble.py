"""Ensemble (vmap + mesh) execution tests."""

import numpy as np
import pytest

from rscm_tpu.components import TwoLayer
from rscm_tpu.core import ModelBuilder, TimeAxis, Timeseries
from rscm_tpu.parallel import EnsembleRunner, make_mesh

TWO_LAYER_PARAMS = dict(
    lambda0=1.0,
    a=0.0,
    efficacy=1.0,
    eta=0.7,
    heat_capacity_surface=8.0,
    heat_capacity_deep=100.0,
)


def build_model(years, erf):
    return (
        ModelBuilder()
        .with_time_axis(TimeAxis.from_values(years))
        .with_component(TwoLayer(**TWO_LAYER_PARAMS))
        .with_exogenous_variable(
            "Effective Radiative Forcing", Timeseries.from_values(erf, years)
        )
        .with_initial_values({"Surface Temperature": 0.0, "Deep Ocean Temperature": 0.0})
        .build()
    )


class TestEnsembleRunner:
    def test_vmapped_matches_individual_runs(self):
        years = np.arange(2000.0, 2030.0)
        erf = np.full(len(years), 3.7)
        model = build_model(years, erf)
        runner = EnsembleRunner(model)

        lambdas = np.array([0.8, 1.0, 1.3, 1.9])
        params = runner.batched_params({"TwoLayer.lambda0": lambdas})
        out = runner.run(params=params, out_vars=["Surface Temperature"])
        batched = np.asarray(out["Surface Temperature"])  # (B, n, 1)
        assert batched.shape == (4, len(years), 1)

        for i, lam in enumerate(lambdas):
            single = build_model(years, erf)
            single.graph.nodes[single.exec_order[1]].lambda0 = float(lam)
            single.run(compiled=True)
            expected = single.collection.get_data("Surface Temperature").values()
            np.testing.assert_allclose(batched[i], expected, rtol=1e-12, atol=1e-12)

    def test_batched_exogenous_scenarios(self):
        years = np.arange(2000.0, 2020.0)
        model = build_model(years, np.zeros(len(years)))
        runner = EnsembleRunner(model)

        scenarios = np.stack(
            [np.full((len(years), 1), 2.0), np.full((len(years), 1), 4.0)]
        )
        params = runner.batched_params(
            {"TwoLayer.lambda0": np.array([1.0, 1.0])}
        )
        out = runner.run(
            params=params,
            exo={"Effective Radiative Forcing": scenarios},
            out_vars=["Surface Temperature"],
        )
        temps = np.asarray(out["Surface Temperature"])
        # double forcing -> double response (a=0 linear model)
        np.testing.assert_allclose(temps[1, -1], 2.0 * temps[0, -1], rtol=1e-10)

    def test_mesh_sharded_matches_unsharded(self):
        import jax

        if len(jax.devices()) < 2:
            pytest.skip("needs multiple (virtual) devices")
        years = np.arange(2000.0, 2015.0)
        erf = np.full(len(years), 3.7)
        model = build_model(years, erf)
        runner = EnsembleRunner(model)

        batch = 16
        lambdas = np.linspace(0.7, 2.0, batch)
        params = runner.batched_params({"TwoLayer.lambda0": lambdas})

        plain = runner.run(params=params, out_vars=["Surface Temperature"])
        mesh = make_mesh()
        sharded_runner = EnsembleRunner(model)
        sharded = sharded_runner.run(
            params=params, mesh=mesh, out_vars=["Surface Temperature"]
        )
        np.testing.assert_allclose(
            np.asarray(plain["Surface Temperature"]),
            np.asarray(sharded["Surface Temperature"]),
            rtol=1e-12,
        )

    def test_mesh_uneven_batch_matches_unsharded(self):
        """A batch that does not divide the device count pads internally and
        slices the padding off, so results match the unsharded run exactly."""
        import jax

        if len(jax.devices()) < 2:
            pytest.skip("needs multiple (virtual) devices")
        years = np.arange(2000.0, 2015.0)
        erf = np.full(len(years), 3.7)
        model = build_model(years, erf)

        batch = len(jax.devices()) + 3  # deliberately not divisible
        lambdas = np.linspace(0.7, 2.0, batch)

        runner = EnsembleRunner(model)
        params = runner.batched_params({"TwoLayer.lambda0": lambdas})
        plain = runner.run(params=params, out_vars=["Surface Temperature"])

        sharded_runner = EnsembleRunner(model)
        sharded = sharded_runner.run(
            params=params, mesh=make_mesh(), out_vars=["Surface Temperature"]
        )
        result = np.asarray(sharded["Surface Temperature"])
        assert result.shape == (batch, len(years), 1)
        np.testing.assert_allclose(
            np.asarray(plain["Surface Temperature"]), result, rtol=1e-12
        )

    def test_mesh_batched_exogenous(self):
        """Batched-exogenous scenarios shard over the mesh like parameters."""
        import jax

        if len(jax.devices()) < 2:
            pytest.skip("needs multiple (virtual) devices")
        years = np.arange(2000.0, 2012.0)
        model = build_model(years, np.zeros(len(years)))

        n_scenarios = len(jax.devices())
        scenarios = np.stack(
            [np.full((len(years), 1), f) for f in np.linspace(1.0, 4.0, n_scenarios)]
        )
        runner = EnsembleRunner(model)
        params = runner.batched_params(
            {"TwoLayer.lambda0": np.ones(n_scenarios)}
        )
        out = runner.run(
            params=params,
            exo={"Effective Radiative Forcing": scenarios},
            mesh=make_mesh(),
            out_vars=["Surface Temperature"],
        )
        temps = np.asarray(out["Surface Temperature"])
        assert temps.shape == (n_scenarios, len(years), 1)
        # linear model: response ordering follows forcing ordering
        finals = temps[:, -1, 0]
        assert np.all(np.diff(finals) > 0)


def test_batched_params_rejects_unknown_names():
    years = np.arange(2000.0, 2005.0)
    model = build_model(years, np.zeros(len(years)))
    runner = EnsembleRunner(model)
    with pytest.raises(KeyError, match="unknown parameter.*TwoLayer.nope"):
        runner.batched_params({"TwoLayer.nope": np.ones(3)})
