"""Checkpoint/restore of models with rich component internal state
(OceanCarbon flux history, ClimateUDEB ocean columns)."""

import numpy as np

from rscm_tpu.core import (
    GridType,
    Model,
    ModelBuilder,
    TimeAxis,
    Timeseries,
    VariableSchema,
)
from rscm_tpu.core.spatial import ScalarGrid
from rscm_tpu.magicc import ClimateUDEB, OceanCarbon


def _build_ocean_carbon(years):
    return (
        ModelBuilder()
        .with_time_axis(TimeAxis.from_values(years))
        .with_component(OceanCarbon())
        .with_exogenous_variable(
            "Atmospheric Concentration|CO2",
            Timeseries.from_values(np.linspace(300.0, 400.0, len(years)), years),
        )
        .with_exogenous_variable(
            "Sea Surface Temperature",
            Timeseries.from_values(np.zeros(len(years)), years),
        )
        .with_initial_values(
            {"Ocean Surface pCO2": 278.0, "Cumulative Ocean Uptake": 0.0}
        )
        .build()
    )


def test_ocean_carbon_flux_history_roundtrip():
    years = np.arange(2000.0, 2020.0)
    model = _build_ocean_carbon(years)
    for _ in range(8):
        model.step()

    snapshot = model.to_full_dict()
    restored = Model.from_full_dict(snapshot)

    # flux history (ring buffer) must round-trip exactly
    node = model.exec_order[1]
    np.testing.assert_allclose(
        restored.component_states[node]["flux_history"],
        model.component_states[node]["flux_history"],
    )

    model.run(compiled=False)
    restored.run(compiled=False)
    np.testing.assert_allclose(
        model.collection.get_data("Cumulative Ocean Uptake").values(),
        restored.collection.get_data("Cumulative Ocean Uptake").values(),
    )


def test_udeb_state_roundtrip_toml():
    years = np.arange(1850.0, 1880.0)
    erf = np.where(years >= 1851.0, 3.71, 0.0)
    schema = VariableSchema()
    schema.add_variable("Effective Radiative Forcing", "W/m^2")
    schema.add_variable("Surface Temperature", "K", GridType.FourBox)
    schema.add_variable("Heat Uptake", "W/m^2")
    schema.add_variable("Ocean Heat Content", "J/m^2")
    schema.add_variable("Sea Surface Temperature", "K")
    ta = TimeAxis.from_values(years)

    def build():
        return (
            ModelBuilder()
            .with_time_axis(ta)
            .with_schema(schema)
            .with_component(ClimateUDEB())
            .with_exogenous_variable(
                "Effective Radiative Forcing",
                Timeseries(erf[:, None], ta, ScalarGrid(), "W/m^2"),
            )
            .with_initial_values({"Surface Temperature": 0.0})
            .build()
        )

    model = build()
    for _ in range(10):
        model.step()

    toml_str = model.to_toml()
    restored = Model.from_toml(toml_str)
    assert restored.time_index == 10

    # ocean column temperatures carried through the checkpoint
    node = model.exec_order[1]
    np.testing.assert_allclose(
        np.asarray(restored.component_states[node]["ocean_temps"]),
        np.asarray(model.component_states[node]["ocean_temps"]),
        rtol=1e-12,
    )

    model.run(compiled=False)
    restored.run(compiled=False)
    np.testing.assert_allclose(
        model.collection.get_data("Surface Temperature").values(),
        restored.collection.get_data("Surface Temperature").values(),
        rtol=1e-10,
    )
