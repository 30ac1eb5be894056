"""End-to-end model tests: builder + runtime, host vs compiled parity.

Mirrors behaviours of ``crates/rscm-core/src/model/tests/basic.rs``,
``crates/rscm-two-layer`` tests and ``tests/test_two_layer.py``.
"""

import numpy as np
import pytest

from rscm_tpu.components import CO2ERF, CarbonCycle, TwoLayer, TwoLayerBuilder
from rscm_tpu.core import (
    Component,
    Input,
    ModelBuilder,
    Output,
    Parameter,
    State,
    TimeAxis,
    Timeseries,
)
from rscm_tpu.core.errors import MissingInitialValueError

TWO_LAYER_PARAMS = dict(
    lambda0=1.0,
    a=0.0,
    efficacy=1.0,
    eta=0.7,
    heat_capacity_surface=8.0,
    heat_capacity_deep=100.0,
)


def build_two_layer_model(erf_values, years, compiled_params=None):
    ta = TimeAxis.from_values(years)
    erf = Timeseries.from_values(erf_values, years)
    return (
        ModelBuilder()
        .with_time_axis(ta)
        .with_component(TwoLayer(**(compiled_params or TWO_LAYER_PARAMS)))
        .with_exogenous_variable("Effective Radiative Forcing", erf)
        .with_initial_values(
            {"Surface Temperature": 0.0, "Deep Ocean Temperature": 0.0}
        )
        .build()
    )


class TestTwoLayerComponent:
    def test_positive_erf_causes_warming(self):
        years = np.arange(2000.0, 2003.0)
        model = build_two_layer_model(np.full(3, 4.0), years)
        model.step()
        ts = model.collection.get_data("Surface Temperature")
        t1 = ts.at_scalar(1)
        assert 0.0 < t1 < 4.0

    def test_zero_erf_no_warming(self):
        years = np.arange(2000.0, 2003.0)
        model = build_two_layer_model(np.zeros(3), years)
        model.run(compiled=False)
        ts = model.collection.get_data("Surface Temperature")
        assert abs(ts.at_scalar(2)) < 1e-10

    def test_negative_erf_causes_cooling(self):
        years = np.arange(2000.0, 2003.0)
        model = build_two_layer_model(np.full(3, -2.0), years)
        model.step()
        assert model.collection.get_data("Surface Temperature").at_scalar(1) < 0.0

    def test_linear_response_in_erf(self):
        years = np.arange(2000.0, 2002.0)
        small = build_two_layer_model(np.full(2, 2.0), years)
        large = build_two_layer_model(np.full(2, 4.0), years)
        small.step()
        large.step()
        t_small = small.collection.get_data("Surface Temperature").at_scalar(1)
        t_large = large.collection.get_data("Surface Temperature").at_scalar(1)
        assert abs(t_large / t_small - 2.0) < 0.1


class TestModelRuntime:
    def test_run_completes_and_latest_tracks(self):
        years = np.arange(2000.0, 2010.0)
        model = build_two_layer_model(np.full(10, 3.7), years)
        assert model.current_time() == 2000.0
        assert not model.finished()
        model.run(compiled=False)
        assert model.finished()
        ts = model.collection.get_data("Surface Temperature")
        assert ts.latest == 9
        values = ts.values()[:, 0]
        assert not np.any(np.isnan(values))
        # warming monotone under constant positive forcing
        assert np.all(np.diff(values) > 0)

    def test_outputs_written_at_n_plus_1(self):
        years = np.arange(2000.0, 2005.0)
        model = build_two_layer_model(np.full(5, 3.7), years)
        model.step()
        ts = model.collection.get_data("Surface Temperature")
        assert ts.at_scalar(0) == 0.0  # initial value
        assert ts.at_scalar(1) > 0.0  # step 0 output at index 1
        assert np.isnan(ts.at_scalar(2))

    def test_missing_initial_value_raises(self):
        years = np.arange(2000.0, 2003.0)
        builder = (
            ModelBuilder()
            .with_time_axis(TimeAxis.from_values(years))
            .with_component(TwoLayer(**TWO_LAYER_PARAMS))
            .with_exogenous_variable(
                "Effective Radiative Forcing",
                Timeseries.from_values(np.zeros(3), years),
            )
        )
        with pytest.raises(MissingInitialValueError, match="Surface Temperature"):
            builder.build()

    def test_compiled_matches_host_exactly(self):
        years = np.arange(2000.0, 2050.0)
        erf = np.linspace(0.0, 5.0, len(years))
        host = build_two_layer_model(erf, years)
        comp = build_two_layer_model(erf, years)
        host.run(compiled=False)
        comp.run(compiled=True)
        for name in ["Surface Temperature", "Deep Ocean Temperature"]:
            a = host.collection.get_data(name).values()
            b = comp.collection.get_data(name).values()
            np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12)

    def test_step_then_compiled_run_continues(self):
        years = np.arange(2000.0, 2020.0)
        erf = np.full(len(years), 3.7)
        reference = build_two_layer_model(erf, years)
        reference.run(compiled=False)

        mixed = build_two_layer_model(erf, years)
        mixed.step()
        mixed.step()
        mixed.run(compiled=True)
        np.testing.assert_allclose(
            reference.collection.get_data("Surface Temperature").values(),
            mixed.collection.get_data("Surface Temperature").values(),
            rtol=1e-12,
        )

    def test_compiled_continuation_preserves_eager_history_bitwise(self):
        """run(compiled=True) after eager float64 stepping must not
        round-trip the already-committed rows through the float32 program
        dtype — only rows the scan actually wrote are written back."""
        years = np.arange(2000.0, 2020.0)
        erf = np.linspace(0.1, 3.7, len(years))
        model = build_two_layer_model(erf, years)
        for _ in range(5):
            model.step()
        committed = {
            name: np.array(model.collection.get_data(name)._values[:6])
            for name in ["Surface Temperature", "Deep Ocean Temperature"]
        }
        model.run(compiled=True)
        for name, before in committed.items():
            after = np.asarray(model.collection.get_data(name)._values[:6])
            np.testing.assert_array_equal(before, after, err_msg=name)

    def test_uniform_dt_detected_on_monthly_axis(self):
        """_uniform_dt must classify a uniform sub-annual axis from the
        float64 axis source; the float32 program cast of 1/12 steps used
        to fail the rtol=1e-12 check and silently disable every
        scan-layout hook."""
        from rscm_tpu.core.model.program import ModelProgram

        years = np.arange(0.0, 10.0, 1.0 / 12.0)
        erf = np.linspace(0.0, 3.0, len(years))
        model = build_two_layer_model(erf, years)
        # force the float32 program dtype (tests run x64 by default) —
        # the misclassification came from diffing the f32-cast axis
        program = ModelProgram(model, dtype=np.float32)
        assert program.time_values.dtype == np.float32
        assert program._uniform_dt is not None
        assert program._uniform_dt == pytest.approx(1.0 / 12.0, rel=1e-9)

    def test_streaming_from_final_index_does_not_crash(self):
        """gather_endo_window at the last time index used to read one row
        past the end; the n_run <= 0 short-circuit must be reachable."""
        from rscm_tpu.core.model.program import ModelProgram

        years = np.arange(2000.0, 2010.0)
        erf = np.full(len(years), 3.7)
        model = build_two_layer_model(erf, years)
        model.run(compiled=False)
        program = ModelProgram(model)
        start = model.time_index
        assert start == len(years) - 1
        bufs = program.gather_endo_window(start)  # must not IndexError
        trajs, _ = program.run_window_fn(
            bufs,
            program.gather_exo(),
            program.gather_params(),
            program.gather_internals(),
            out_vars=("Surface Temperature",),
            start_idx=start,
        )
        np.testing.assert_allclose(
            np.asarray(trajs["Surface Temperature"]),
            np.asarray(
                model.collection.get_data("Surface Temperature")._values
            ).astype(np.float32),
            rtol=1e-6,
        )


class TestCoupledModel:
    """Two-layer + carbon cycle + CO2 ERF closed loop (coupled_models.rs)."""

    def _build(self, years, emissions):
        from rscm_tpu.core import VariableSchema

        schema = VariableSchema()
        schema.add_variable("Emissions|CO2|Anthropogenic", "GtC / yr")
        schema.add_variable("Surface Temperature", "K")
        schema.add_variable("Deep Ocean Temperature", "K")
        schema.add_variable("Atmospheric Concentration|CO2", "ppm")
        schema.add_variable("Cumulative Emissions|CO2", "Gt C")
        schema.add_variable("Cumulative Land Uptake", "Gt C")
        schema.add_variable("Effective Radiative Forcing|CO2", "W/m^2")
        # Close the loop: total ERF aggregates the per-forcer contributions
        schema.add_aggregate(
            "Effective Radiative Forcing",
            "W/m^2",
            "Sum",
            ["Effective Radiative Forcing|CO2"],
        )

        ta = TimeAxis.from_values(years)
        return (
            ModelBuilder()
            .with_time_axis(ta)
            .with_schema(schema)
            .with_component(
                CarbonCycle(tau=20.0, conc_pi=280.0, alpha_temperature=0.03)
            )
            .with_component(CO2ERF(erf_2xco2=3.7, conc_pi=280.0))
            .with_component(TwoLayer(**TWO_LAYER_PARAMS))
            .with_exogenous_variable(
                "Emissions|CO2|Anthropogenic", Timeseries.from_values(emissions, years)
            )
            .with_initial_values(
                {
                    "Surface Temperature": 0.0,
                    "Deep Ocean Temperature": 0.0,
                    "Atmospheric Concentration|CO2": 280.0,
                    "Cumulative Emissions|CO2": 0.0,
                    "Cumulative Land Uptake": 0.0,
                }
            )
            .build()
        )

    def test_coupled_run(self):
        years = np.arange(2000.0, 2050.0)
        emissions = np.full(len(years), 10.0)
        model = self._build(years, emissions)
        model.run(compiled=False)

        conc = model.collection.get_data("Atmospheric Concentration|CO2").values()[:, 0]
        temp = model.collection.get_data("Surface Temperature").values()[:, 0]
        assert conc[-1] > 280.0
        assert temp[-1] > 0.0
        assert np.all(np.diff(conc) > 0)

    def test_carbon_mass_conservation(self):
        """Atmosphere + cumulative uptake == cumulative emissions (GtC)."""
        years = np.arange(2000.0, 2030.0)
        emissions = np.full(len(years), 10.0)
        model = self._build(years, emissions)
        model.run(compiled=False)
        conc = model.collection.get_data("Atmospheric Concentration|CO2").values()[:, 0]
        uptake = model.collection.get_data("Cumulative Land Uptake").values()[:, 0]
        cum_e = model.collection.get_data("Cumulative Emissions|CO2").values()[:, 0]
        atmos_gtc = (conc - 280.0) * 2.13
        np.testing.assert_allclose(atmos_gtc + uptake, cum_e, rtol=1e-9, atol=1e-9)

    def test_coupled_compiled_matches_host(self):
        # XLA's float64 exp/log differ from libm by ~2 ulps; the carbon-
        # temperature feedback loop amplifies that through the (conc - pi)
        # cancellation, so compiled-vs-host agreement is ~1e-8 over a
        # century — an order tighter than the reference's own regression
        # tolerance (rtol 1e-5, tests/regression/test_ghg_forcing.py:54).
        years = np.arange(2000.0, 2100.0)
        emissions = np.linspace(2.0, 20.0, len(years))
        host = self._build(years, emissions)
        comp = self._build(years, emissions)
        host.run(compiled=False)
        comp.run(compiled=True)
        for name in [
            "Surface Temperature",
            "Atmospheric Concentration|CO2",
            "Effective Radiative Forcing|CO2",
            "Cumulative Land Uptake",
        ]:
            np.testing.assert_allclose(
                host.collection.get_data(name).values(),
                comp.collection.get_data(name).values(),
                rtol=1e-6,
                atol=1e-9,
                err_msg=name,
            )

    def test_execution_order_resolves_dependencies(self):
        years = np.arange(2000.0, 2003.0)
        model = self._build(years, np.full(3, 10.0))
        info = model.debug_info("plain")
        # CarbonCycle must run before CO2ERF which must run before TwoLayer
        assert info.index("CarbonCycle") < info.index("CO2ERF") < info.index("TwoLayer")


class TestBuilderAPI:
    def test_builder_pattern(self):
        builder = TwoLayerBuilder.from_parameters(TWO_LAYER_PARAMS)
        component = builder.build()
        assert isinstance(component, TwoLayer)
        assert component.lambda0 == 1.0

    def test_definitions(self):
        component = TwoLayer(**TWO_LAYER_PARAMS)
        names = [d.name for d in component.definitions()]
        assert "Effective Radiative Forcing" in names
        assert "Surface Temperature" in names
        assert component.input_names() == [
            "Effective Radiative Forcing",
            "Surface Temperature",
            "Deep Ocean Temperature",
        ]
        assert component.output_names() == [
            "Surface Temperature",
            "Deep Ocean Temperature",
        ]

    def test_checkpoint_roundtrip(self):
        years = np.arange(2000.0, 2010.0)
        model = build_two_layer_model(np.full(10, 3.7), years)
        model.step()
        model.step()
        snapshot = model.to_dict()

        model2 = build_two_layer_model(np.full(10, 3.7), years)
        model2.restore(snapshot)
        assert model2.time_index == 2
        model.run(compiled=False)
        model2.run(compiled=False)
        np.testing.assert_allclose(
            model.collection.get_data("Surface Temperature").values(),
            model2.collection.get_data("Surface Temperature").values(),
        )


class TestUnsetParameterWarning:
    def test_build_warns_on_unset_required_parameters(self):
        import warnings

        years = np.arange(2000.0, 2005.0)
        erf = Timeseries.from_values(np.zeros(len(years)), years)
        builder = (
            ModelBuilder()
            .with_time_axis(TimeAxis.from_values(years))
            .with_component(TwoLayer())  # all six parameters unset
            .with_exogenous_variable("Effective Radiative Forcing", erf)
            .with_initial_values(
                {"Surface Temperature": 0.0, "Deep Ocean Temperature": 0.0}
            )
        )
        with pytest.warns(UserWarning, match=r"TwoLayer.*unset parameters.*lambda0"):
            builder.build()

    def test_build_does_not_warn_when_parameters_set(self):
        import warnings

        years = np.arange(2000.0, 2005.0)
        erf = Timeseries.from_values(np.zeros(len(years)), years)
        builder = (
            ModelBuilder()
            .with_time_axis(TimeAxis.from_values(years))
            .with_component(TwoLayer(**TWO_LAYER_PARAMS))
            .with_exogenous_variable("Effective Radiative Forcing", erf)
            .with_initial_values(
                {"Surface Temperature": 0.0, "Deep Ocean Temperature": 0.0}
            )
        )
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            builder.build()
