"""Checkpoint/restore of models with rich component internal state
(OceanCarbon flux history, ClimateUDEB ocean columns)."""

import json

import numpy as np
import pytest

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


def _build_ocean_carbon(years, **ocean_kwargs):
    return (
        ModelBuilder()
        .with_time_axis(TimeAxis.from_values(years))
        .with_component(OceanCarbon(**ocean_kwargs))
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


def test_ring_checkpoint_migrates_into_expsum_engine():
    """A checkpoint saved under the ring engine restores into an exp-sum
    component via OceanCarbon.migrate_internal_state — exactly (the fold
    identity S_k = sum_p f_p q_k^p is what the engine maintains)."""
    years = np.arange(2000.0, 2040.0)
    ring_model = _build_ocean_carbon(years, engine="ring")
    for _ in range(8):  # 96 months of history > the 36-month young window
        ring_model.step()
    snapshot = json.loads(ring_model.checkpoint())

    expsum_model = _build_ocean_carbon(years, engine="expsum")
    expsum_model.restore(snapshot)
    node = expsum_model.exec_order[1]
    state = expsum_model.component_states[node]
    assert set(state) == {"flux_history", "tail_accum"}
    # young window = newest 36 ring slots, verbatim
    ring_node = ring_model.exec_order[1]
    np.testing.assert_allclose(
        state["flux_history"],
        ring_model.component_states[ring_node]["flux_history"][:36],
    )
    assert np.any(state["tail_accum"] != 0.0)  # the old months folded in

    ring_model.run(compiled=False)
    expsum_model.run(compiled=False)
    np.testing.assert_allclose(
        expsum_model.collection.get_data("Cumulative Ocean Uptake").values(),
        ring_model.collection.get_data("Cumulative Ocean Uptake").values(),
        rtol=1e-7,  # tail-fit error class (~1e-9) with margin
    )


def test_expsum_checkpoint_into_ring_engine_raises():
    years = np.arange(2000.0, 2020.0)
    model = _build_ocean_carbon(years, engine="expsum")
    for _ in range(4):
        model.step()
    snapshot = json.loads(model.checkpoint())

    target = _build_ocean_carbon(years, engine="ring")
    with pytest.raises(ValueError, match="cannot migrate a checkpoint"):
        target.restore(snapshot)


def test_schema_mismatch_without_migration_hook_raises():
    """A component without migrate_internal_state must fail loudly (not
    silently half-restore) when the saved state's shape changed."""
    years = np.arange(2000.0, 2020.0)
    model = _build_ocean_carbon(years, engine="ring")
    for _ in range(4):
        model.step()
    snapshot = json.loads(model.checkpoint())
    node = str(model.exec_order[1])
    # corrupt: wrong history length AND drop the migration hook
    snapshot["component_states"][node] = {
        "flux_history": [0.0] * 7,
        "unknown_extra": 1.0,
    }
    target = _build_ocean_carbon(years, engine="ring")
    target.graph.nodes[target.exec_order[1]].migrate_internal_state = None
    with pytest.raises(ValueError, match="does not match its current schema"):
        target.restore(snapshot)


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
