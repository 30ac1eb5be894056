"""The `rscm` compatibility package: reference-API usage patterns.

These tests exercise the exact idioms from the reference's own Python test
suite (tests/test_model.py, test_two_layer.py, test_typed_python_component.py,
test_calibration_simple.py) against the compat surface.
"""

import numpy as np
import pytest


class TestCoreSurface:
    def test_reference_imports(self):
        from rscm.core import (  # noqa: F401
            FourBoxGrid, FourBoxRegion, FourBoxSlice, GridType,
            InterpolationStrategy, Model, ModelBuilder, PythonComponent,
            RequirementDefinition, RequirementType, TimeAxis, Timeseries,
            TimeseriesCollection, Unit, VariableSchema, VariableType,
        )

    def test_timeseries_reference_constructor(self):
        from rscm.core import InterpolationStrategy, TimeAxis, Timeseries

        ta = TimeAxis.from_values(np.arange(2000.0, 2010.0))
        ts = Timeseries(
            np.arange(10.0), ta, "GtC / yr", InterpolationStrategy.Linear
        )
        assert len(ts) == 10
        assert ts.values().shape == (10,)  # flat, like the reference
        assert ts.at_time(2004.5) == pytest.approx(4.5)
        assert ts.latest_value() == 9.0

    def test_unit(self):
        from rscm.core import Unit

        assert Unit("W/m^2") == Unit("W m^-2")
        assert Unit("GtC/yr").conversion_factor(Unit("MtCO2/yr")) == pytest.approx(
            1000 * 44 / 12
        )

    def test_two_layer_via_builders(self):
        from rscm.core import ModelBuilder, TimeAxis, Timeseries
        from rscm.two_layer import TwoLayerBuilder

        years = np.arange(2000.0, 2020.0)
        component = TwoLayerBuilder.from_parameters(
            {
                "lambda0": 1.0, "a": 0.0, "efficacy": 1.0, "eta": 0.7,
                "heat_capacity_surface": 8.0, "heat_capacity_deep": 100.0,
            }
        ).build()
        model = (
            ModelBuilder()
            .with_time_axis(TimeAxis.from_values(years))
            .with_rust_component(component)
            .with_exogenous_variable(
                "Effective Radiative Forcing",
                Timeseries(np.full(20, 3.7), TimeAxis.from_values(years), "W/m^2"),
            )
            .with_initial_values(
                {"Surface Temperature": 0.0, "Deep Ocean Temperature": 0.0}
            )
            .build()
        )
        model.run()
        assert model.finished()
        result = model.timeseries().get_timeseries_by_name("Surface Temperature")
        assert result.latest_value() > 0.5

    def test_model_toml_roundtrip(self):
        from rscm.core import Model, ModelBuilder, TimeAxis, Timeseries
        from rscm.example_components import TestComponentBuilder

        years = np.arange(2020.0, 2025.0)
        model = (
            ModelBuilder()
            .with_time_axis(TimeAxis.from_values(years))
            .with_rust_component(
                TestComponentBuilder.from_parameters({"conversion_factor": 2.0}).build()
            )
            .with_exogenous_variable(
                "Emissions|CO2",
                Timeseries(np.arange(5.0), TimeAxis.from_values(years), "GtCO2"),
            )
            .build()
        )
        model.step()
        restored = Model.from_toml(model.to_toml())
        restored.run()
        model.run()
        np.testing.assert_allclose(
            model.timeseries().get_timeseries_by_name("Concentrations|CO2").values(),
            restored.timeseries().get_timeseries_by_name("Concentrations|CO2").values(),
        )


class TestTypedComponent:
    def test_typed_python_component(self):
        from rscm.component import Component, Input, Output
        from rscm.core import ModelBuilder, PythonComponent, TimeAxis, Timeseries

        class Scaler(Component, register=False):
            emissions = Input("Emissions|CO2", unit="GtCO2")
            concentration = Output("Concentrations|CO2", unit="ppm")

            def __init__(self, factor):
                super().__init__()
                self.factor = factor

            def solve(self, t_current, t_next, inputs):
                return self.Outputs(
                    concentration=inputs.emissions.at_start() * self.factor
                )

        years = np.arange(2020.0, 2025.0)
        model = (
            ModelBuilder()
            .with_time_axis(TimeAxis.from_values(years))
            .with_py_component(PythonComponent.build(Scaler(3.0)))
            .with_exogenous_variable(
                "Emissions|CO2",
                Timeseries(np.arange(1.0, 6.0), TimeAxis.from_values(years), "GtCO2"),
            )
            .build()
        )
        model.run()
        conc = model.timeseries().get_timeseries_by_name("Concentrations|CO2")
        assert conc.at(1) == pytest.approx(3.0)


class TestMagiccSurface:
    def test_builders_exist(self):
        import rscm.magicc as magicc

        for name in magicc.__all__:
            assert hasattr(magicc, name)

    def test_climate_udeb_builder(self):
        from rscm.magicc import ClimateUDEBBuilder

        climate = ClimateUDEBBuilder.from_parameters(
            {"ecs": 3.0, "forcing_2xco2": 3.71}
        ).build()
        assert climate.ecs == 3.0


class TestCalibrateSurface:
    def test_point_estimation_reference_style(self):
        from rscm.calibrate import (
            GaussianLikelihood, Optimizer, ParameterSet, PointEstimator,
            Target, Uniform,
        )
        from rscm.calibrate import DefaultModelRunner
        from rscm.core import ModelBuilder, TimeAxis, Timeseries
        from rscm.two_layer import TwoLayerBuilder

        years = np.arange(2000.0, 2015.0)

        def factory(theta):
            component = TwoLayerBuilder.from_parameters(
                {
                    "lambda0": float(theta[0]), "a": 0.0, "efficacy": 1.0,
                    "eta": 0.7, "heat_capacity_surface": 8.0,
                    "heat_capacity_deep": 100.0,
                }
            ).build()
            return (
                ModelBuilder()
                .with_time_axis(TimeAxis.from_values(years))
                .with_rust_component(component)
                .with_exogenous_variable(
                    "Effective Radiative Forcing",
                    Timeseries(np.full(15, 3.7), TimeAxis.from_values(years), "W/m^2"),
                )
                .with_initial_values(
                    {"Surface Temperature": 0.0, "Deep Ocean Temperature": 0.0}
                )
                .build()
            )

        runner = DefaultModelRunner(["lambda0"], ["Surface Temperature"], factory)
        target = Target()
        truth = factory([1.2])
        truth.run()
        temps = truth.timeseries().get_timeseries_by_name("Surface Temperature")
        vt = target.add_variable("Surface Temperature")
        vt.add(2010.0, float(temps.at(10)), 0.05)

        params = ParameterSet()
        params.add("lambda0", Uniform(0.8, 1.8))
        estimator = PointEstimator(params, runner, GaussianLikelihood(), target)
        result = estimator.optimize(Optimizer.RandomSearch, 25)
        assert result.best_params[0] == pytest.approx(1.2, abs=0.25)
        assert result.n_evaluations == 25


class TestConfigSurface:
    def test_config_imports_and_magicc_legacy(self):
        from rscm.config import load_config_layers  # noqa: F401
        from rscm.config.models.magicc import from_legacy_dict

        config = from_legacy_dict({"core_climatesensitivity": 2.5})
        assert (
            config["components"]["climate"]["parameters"]["climate_sensitivity"] == 2.5
        )


REFERENCE_PUBLIC_API = {
    "rscm.calibrate": [
        "HAS_PANDAS", "Bound", "Chain", "EnsembleSampler", "GaussianLikelihood",
        "LogNormal", "ModelRunner", "Normal", "Observation", "OptimizationResult",
        "Optimizer", "ParameterSet", "PointEstimator", "ProgressInfo", "Target",
        "Uniform", "VariableTarget", "WalkerInit", "chain_to_dataframe",
        "progress", "target_from_dataframe",
    ],
    "rscm.components": [
        "CO2ERFBuilder", "CarbonCycleBuilder", "FourBoxOceanHeatUptakeBuilder",
    ],
    "rscm.config": [
        "ComponentNotFoundError", "ComponentRegistry", "ConfigError",
        "IncompatibleSchemaError", "InputSpec", "ModelConfig",
        "ParameterMetadata", "TimeConfig", "ValidationError", "build_model",
        "build_two_layer_model", "check_schema_version", "component_registry",
        "deep_merge", "export_parameter_json", "generate_parameter_docs",
        "get_parameter_metadata", "load_config", "load_config_layers",
        "parameter", "register_component", "validate_parameters",
    ],
    "rscm.config.models": ["TwoLayerConfig", "TwoLayerParameters"],
    "rscm.config.models.magicc": [
        "LEGACY_MAPPING", "MAGICC_PARAMETERS", "AggregationConfig",
        "ClimateConfig", "ForcingConfig", "MAGICCConfig", "ParameterInfo",
        "ParameterStatus", "from_legacy_dict", "get_coverage_report",
        "get_coverage_stats", "to_legacy_dict",
    ],
    "rscm.core": [
        "FourBoxGrid", "FourBoxRegion", "FourBoxSlice", "FourBoxTimeseriesWindow",
        "GridType", "HemisphericGrid", "HemisphericRegion", "HemisphericSlice",
        "HemisphericTimeseriesWindow", "InterpolationStrategy", "Model",
        "ModelBuilder", "PythonComponent", "RequirementDefinition",
        "RequirementType", "ScalarGrid", "ScalarRegion", "StateValue",
        "TimeAxis", "Timeseries", "TimeseriesCollection", "TimeseriesWindow",
        "Unit", "VariableSchema", "VariableType",
    ],
    "rscm.magicc": [
        "AerosolDirectBuilder", "AerosolIndirectBuilder", "CH4ChemistryBuilder",
        "CO2BudgetBuilder", "ClimateUDEBBuilder", "HalocarbonChemistryBuilder",
        "N2OChemistryBuilder", "OceanCarbonBuilder", "OzoneForcingBuilder",
        "TerrestrialCarbonBuilder",
    ],
    "rscm.two_layer": ["TwoLayerBuilder"],
}


@pytest.mark.parametrize("module_name", sorted(REFERENCE_PUBLIC_API))
def test_reference_public_api_present(module_name):
    """Every public name the reference exports resolves on the compat
    package (the reference's per-module __all__ lists, python/rscm/)."""
    import importlib

    module = importlib.import_module(module_name)
    missing = [
        name for name in REFERENCE_PUBLIC_API[module_name]
        if not hasattr(module, name)
    ]
    assert not missing, f"{module_name} missing reference names: {missing}"


def test_import_rscm_enables_x64():
    """`import rscm` promises the reference's float64 precision."""
    import jax

    import rscm  # noqa: F401

    assert jax.config.jax_enable_x64 is True
