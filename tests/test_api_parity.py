"""API-parity features: PythonComponent wrapper, example components,
TOML model serialisation, linear-algebra utils, pandas helpers.
"""

import numpy as np
import pytest

from rscm_tpu.core import (
    Component,
    Input,
    ModelBuilder,
    Output,
    RequirementDefinition,
    RequirementType,
    State,
    TimeAxis,
    Timeseries,
)
from rscm_tpu.core.example_components import TestComponent, TestComponentBuilder
from rscm_tpu.core.python_component import PythonComponent


class TestPythonComponentTyped:
    def test_typed_component_via_wrapper(self):
        class Doubler(Component, register=False):
            emissions = Input("Emissions|CO2", unit="GtCO2")
            concentration = Output("Concentrations|CO2", unit="ppm")

            def __init__(self, factor):
                super().__init__()
                self.factor = factor

            def solve(self, t_current, t_next, inputs):
                return self.Outputs(concentration=inputs.emissions.at_start() * self.factor)

        years = np.arange(2000.0, 2005.0)
        model = (
            ModelBuilder()
            .with_time_axis(TimeAxis.from_values(years))
            .with_py_component(PythonComponent.build(Doubler(2.0)))
            .with_exogenous_variable(
                "Emissions|CO2",
                Timeseries.from_values(np.array([1.0, 2.0, 3.0, 4.0, 5.0]), years),
            )
            .build()
        )
        model.run()  # must fall back to host path automatically
        conc = model.collection.get_data("Concentrations|CO2")
        # output at index N+1 from emissions at index N
        assert conc.at_scalar(1) == 2.0
        assert conc.at_scalar(4) == 8.0

    def test_typed_at_end_is_none_during_solve(self):
        """The reference's window copies stop at index N (at_end -> None)."""
        seen = {}

        class Probe(Component, register=False):
            x = Input("X", unit="1")
            y = Output("Y", unit="1")

            def solve(self, t_current, t_next, inputs):
                seen["at_end"] = inputs.x.at_end()
                return self.Outputs(y=inputs.x.at_start())

        years = np.arange(2000.0, 2004.0)
        model = (
            ModelBuilder()
            .with_time_axis(TimeAxis.from_values(years))
            .with_py_component(PythonComponent.build(Probe()))
            .with_exogenous_variable(
                "X", Timeseries.from_values(np.arange(4.0), years)
            )
            .build()
        )
        model.step()
        assert seen["at_end"] is None


class TestPythonComponentLegacy:
    def test_legacy_dict_component(self):
        class LegacyComponent:
            def definitions(self):
                return [
                    RequirementDefinition("In", "1", RequirementType.Input),
                    RequirementDefinition("Out", "1", RequirementType.Output),
                ]

            def solve(self, t_current, t_next, input_state):
                assert isinstance(input_state, dict)
                return {"Out": input_state["In"] * 10.0}

        years = np.arange(2000.0, 2004.0)
        model = (
            ModelBuilder()
            .with_time_axis(TimeAxis.from_values(years))
            .with_py_component(PythonComponent.build(LegacyComponent()))
            .with_exogenous_variable(
                "In", Timeseries.from_values(np.array([1.0, 2.0, 3.0, 4.0]), years)
            )
            .build()
        )
        model.run()
        out = model.collection.get_data("Out")
        # legacy path reads the *latest* valid value
        assert out.at_scalar(1) == pytest.approx(40.0)  # latest of In = index 3


class TestExampleComponent:
    def test_test_component(self):
        component = TestComponentBuilder.from_parameters(
            {"conversion_factor": 2.0}
        ).build()
        assert isinstance(component, TestComponent)
        years = np.arange(2020.0, 2023.0)
        model = (
            ModelBuilder()
            .with_time_axis(TimeAxis.from_values(years))
            .with_component(component)
            .with_exogenous_variable(
                "Emissions|CO2",
                Timeseries.from_values(np.array([1.1, 1.3, 1.5]), years),
            )
            .build()
        )
        model.step()
        assert model.collection.get_data("Concentrations|CO2").at_scalar(
            1
        ) == pytest.approx(2.2)


class TestModelTomlRoundtrip:
    def test_to_from_toml(self):
        from rscm_tpu.components import TwoLayer
        from rscm_tpu.core.model import Model

        years = np.arange(2000.0, 2010.0)
        model = (
            ModelBuilder()
            .with_time_axis(TimeAxis.from_values(years))
            .with_component(
                TwoLayer(
                    lambda0=1.0, a=0.0, efficacy=1.0, eta=0.7,
                    heat_capacity_surface=8.0, heat_capacity_deep=100.0,
                )
            )
            .with_exogenous_variable(
                "Effective Radiative Forcing",
                Timeseries.from_values(np.full(10, 3.7), years),
            )
            .with_initial_values(
                {"Surface Temperature": 0.0, "Deep Ocean Temperature": 0.0}
            )
            .build()
        )
        model.step()
        model.step()

        toml_str = model.to_toml()
        restored = Model.from_toml(toml_str)
        assert restored.time_index == 2
        # both continue to identical results
        model.run(compiled=False)
        restored.run(compiled=False)
        np.testing.assert_allclose(
            model.collection.get_data("Surface Temperature").values(),
            restored.collection.get_data("Surface Temperature").values(),
        )


class TestLinearAlgebra:
    def test_thomas_solve(self):
        from rscm_tpu.utils import thomas_solve

        n = 50
        rng = np.random.default_rng(0)
        a = rng.random(n) * 0.4
        c = rng.random(n) * 0.4
        b = 1.0 + a + c  # diagonally dominant
        d = rng.random(n)
        x = thomas_solve(a, b, c, d)

        full = np.diag(b) + np.diag(a[1:], -1) + np.diag(c[:-1], 1)
        expected = np.linalg.solve(full, d)
        np.testing.assert_allclose(x, expected, rtol=1e-12)

    def test_thomas_solve_traced_matches_host(self):
        import jax.numpy as jnp

        from rscm_tpu.utils import thomas_solve

        n = 50
        rng = np.random.default_rng(1)
        a = rng.random(n) * 0.4
        c = rng.random(n) * 0.4
        b = 1.0 + a + c
        d = rng.random(n)
        host = thomas_solve(a, b, c, d)
        traced = thomas_solve(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c), jnp.asarray(d))
        np.testing.assert_allclose(np.asarray(traced), host, rtol=1e-12)

    def test_invert_4x4(self):
        from rscm_tpu.utils import invert_4x4

        rng = np.random.default_rng(0)
        m = rng.random((4, 4)) + np.eye(4) * 2
        inv = invert_4x4(m)
        np.testing.assert_allclose(m @ inv, np.eye(4), atol=1e-12)
        assert invert_4x4(np.zeros((4, 4))) is None


class TestPandasHelpers:
    def test_chain_to_dataframe(self):
        from rscm_tpu.calibrate import Chain

        rng = np.random.default_rng(0)
        chain = Chain(["x", "y"], thin=1)
        for _ in range(5):
            chain.push(rng.normal(size=(4, 2)), rng.normal(size=4))
        df = chain.to_dataframe(discard=1)
        assert list(df.columns) == ["x", "y", "log_prob"]
        assert df.index.names == ["walker", "iteration"]
        assert len(df) == 4 * 4

    def test_target_from_dataframe(self):
        import pandas as pd

        from rscm_tpu.calibrate import Target

        df = pd.DataFrame(
            {
                "variable": ["T", "T", "C"],
                "time": [2000.0, 2001.0, 2000.0],
                "value": [1.0, 1.1, 280.0],
                "uncertainty": [0.1, 0.1, 5.0],
            }
        )
        target = Target.from_dataframe(df)
        assert set(target.variable_names()) == {"T", "C"}
        assert target.get_variable("T").observations[1].value == 1.1
