"""GHG-forcing regression vs Fortran MAGICC7 golden data.

Scenarios (mirroring the reference suite):
  01 concentration-driven, IPCCTAR method
  02 OLBL method with rapid adjustments
  03 emissions-driven full carbon cycle (xfail upstream: documented
     simplifications diverge from MAGICC7)
  04 ECS sweep 1.5-4.5 K (ERF -> ClimateUDEB temperature)
  05 CO2-only forcing mode
"""

import numpy as np
import numpy.testing as npt
import pytest

from rscm_tpu.core import (
    GridType,
    ModelBuilder,
    TimeAxis,
    Timeseries,
    VariableSchema,
)
from rscm_tpu.magicc import ClimateUDEB, GhgForcing

from .helpers import (
    assert_allclose_phased,
    assert_allclose_recorded,
    fourbox_global_mean,
    get_variable_values,
    load_regression_data,
)

SUITE = "ghg_forcing"
DEFAULT_RTOL = 1e-5  # analytical forcing: near-exact match expected
DEFAULT_ATOL = 1e-6


def load_data(name):
    return load_regression_data(SUITE, name)


def _time_axis(years):
    return TimeAxis.from_bounds(
        np.concatenate([years, [years[-1] + 1.0]]).astype(np.float64)
    )


def build_ghg_forcing_model(years, co2_conc, ch4_conc, n2o_conc, config):
    rf_method = config.get("core_co2ch4n2o_rfmethod", "IPCCTAR")
    if rf_method == "IPCCTAR":
        method, adj = "Ipcctar", (1.0, 1.0, 1.0)
    elif rf_method == "OLBL":
        method, adj = "Olbl", (1.05, 0.86, 1.0)
    else:
        raise ValueError(f"Unsupported forcing method: {rf_method}")

    component = GhgForcing(
        method=method,
        delq2xco2=config.get("core_delq2xco2", 3.71),
        # MAGICC7 anchors pre-industrial at the first-year concentrations
        co2_pi=float(co2_conc[0]),
        ch4_pi=float(ch4_conc[0]),
        n2o_pi=float(n2o_conc[0]),
        adjust_co2=config.get("core_rfrapidadjust_co2", adj[0]),
        adjust_ch4=config.get("core_rfrapidadjust_ch4", adj[1]),
        adjust_n2o=config.get("core_rfrapidadjust_n2o", adj[2]),
    )

    from rscm_tpu.core.spatial import ScalarGrid

    time_axis = _time_axis(years)
    builder = ModelBuilder().with_time_axis(time_axis).with_component(component)
    for name, values, unit in [
        ("Atmospheric Concentration|CO2", co2_conc, "ppm"),
        ("Atmospheric Concentration|CH4", ch4_conc, "ppb"),
        ("Atmospheric Concentration|N2O", n2o_conc, "ppb"),
    ]:
        ts = Timeseries(values.astype(np.float64)[:, None], time_axis, ScalarGrid(), unit)
        builder = builder.with_exogenous_variable(name, ts)
    return builder.build()


def build_erf_to_temperature_model(years, erf, config):
    climate = ClimateUDEB(
        ecs=config.get("core_climatesensitivity", 3.0),
        rf_2xco2=config.get("core_delq2xco2", 3.71),
    )
    time_axis = _time_axis(years)

    schema = VariableSchema()
    schema.add_variable("Effective Radiative Forcing", "W/m^2")
    schema.add_variable("Surface Temperature", "K", GridType.FourBox)
    schema.add_variable("Heat Uptake", "W/m^2")
    schema.add_variable("Ocean Heat Content", "J/m^2")
    schema.add_variable("Sea Surface Temperature", "K")

    from rscm_tpu.core.spatial import ScalarGrid

    return (
        ModelBuilder()
        .with_time_axis(time_axis)
        .with_schema(schema)
        .with_component(climate)
        .with_exogenous_variable(
            "Effective Radiative Forcing",
            Timeseries(erf.astype(np.float64)[:, None], time_axis, ScalarGrid(),
                       "W/m^2"),
        )
        .with_initial_values({"Surface Temperature": 0.0})
        .build()
    )


def _forcing_outputs(model):
    """ERF outputs aligned with expected[:-1] (solve writes at N+1)."""
    results = model.timeseries()
    return {
        gas: results.get_timeseries_by_name(
            f"Effective Radiative Forcing|{gas}"
        ).values()[1:]
        for gas in ("CO2", "CH4", "N2O")
    }


def _run_forcing_scenario(name, expected_method):
    df, config = load_data(name)
    assert config.get("core_co2ch4n2o_rfmethod") == expected_method

    years, co2_conc = get_variable_values(df, "Atmospheric Concentrations|CO2")
    _, ch4_conc = get_variable_values(df, "Atmospheric Concentrations|CH4")
    _, n2o_conc = get_variable_values(df, "Atmospheric Concentrations|N2O")

    model = build_ghg_forcing_model(years, co2_conc, ch4_conc, n2o_conc, config)
    model.run()
    actual = _forcing_outputs(model)

    for gas in ("CO2", "CH4", "N2O"):
        _, expected = get_variable_values(df, f"Effective Radiative Forcing|{gas}")
        assert_allclose_recorded(
            actual[gas], expected[:-1],
            rtol=DEFAULT_RTOL, atol=DEFAULT_ATOL,
            suite=SUITE, name=name, variable=f"ERF|{gas}",
        )


def test_01_concentration_driven():
    _run_forcing_scenario("01_concentration_driven", "IPCCTAR")


def test_02_ghg_forcing_olbl():
    _run_forcing_scenario("02_ghg_forcing_olbl", "OLBL")


@pytest.mark.xfail(
    reason="Diverges from MAGICC7 due to documented simplifications "
    "(reference issues #108, #109, #110); measured divergence is recorded "
    "in the parity CSV and ratcheted by tests/regression/test_emissions_driven.py"
)
def test_03_emissions_driven():
    """Full emissions -> concentrations -> forcing -> temperature pathway
    vs the MAGICC7 SSP245 golden run, at the reference's 5% tolerance
    (mirror of /root/reference/tests/regression/test_ghg_forcing.py:623-726).

    All four variables are recorded into the parity CSV before any
    assertion fires, so the report always carries the measured divergence
    even while the test is xfail.
    """
    from .test_emissions_driven import _extract_emissions, build_emissions_driven_model

    df, config = load_data("03_emissions_driven")
    years, expected_co2 = get_variable_values(df, "Atmospheric Concentrations|CO2")
    _, expected_ch4 = get_variable_values(df, "Atmospheric Concentrations|CH4")
    _, expected_n2o = get_variable_values(df, "Atmospheric Concentrations|N2O")
    _, expected_temp = get_variable_values(df, "Surface Temperature")

    emissions = _extract_emissions(df, years)
    initial_conditions = {
        "Atmospheric Concentration|CO2": float(expected_co2[0]),
        "Atmospheric Concentration|CH4": float(expected_ch4[0]),
        "Atmospheric Concentration|N2O": float(expected_n2o[0]),
        "Surface Temperature": 0.0,
        "Ocean Surface pCO2": float(expected_co2[0]),
        "Cumulative Ocean Uptake": 0.0,
        "Carbon Pool|Plant": 884.86,
        "Carbon Pool|Detritus": 92.77,
        "Carbon Pool|Soil": 1681.53,
        "Carbon Pool|Humus": 836.0,
    }
    model = build_emissions_driven_model(years, emissions, initial_conditions, config)
    model.run()
    results = model.timeseries()

    emissions_rtol = 5e-2
    comparisons = [
        ("Conc|CO2", "Atmospheric Concentration|CO2", expected_co2),
        ("Conc|CH4", "Atmospheric Concentration|CH4", expected_ch4),
        ("Conc|N2O", "Atmospheric Concentration|N2O", expected_n2o),
        ("Temperature", "Sea Surface Temperature", expected_temp),
    ]
    failures = []
    for label, var_name, expected in comparisons:
        actual = results.get_timeseries_by_name(var_name).values()[1:]
        try:
            assert_allclose_recorded(
                actual, expected[:-1],
                rtol=emissions_rtol, atol=DEFAULT_ATOL,
                suite=SUITE, name="03_emissions", variable=label,
            )
        except AssertionError as exc:
            failures.append(f"{label}: {exc}")
    if failures:
        raise AssertionError(
            "emissions-driven divergence beyond 5% (documented upstream "
            "simplifications):\n" + "\n\n".join(failures)
        )


@pytest.mark.parametrize("ecs", [1.5, 2.0, 3.0, 4.0, 4.5])
def test_04_ecs_sweep(ecs):
    df, config = load_data(f"04_ecs_sweep_{ecs}")
    assert config.get("core_climatesensitivity") == ecs

    # feed reference ERF|CO2 straight into the climate component
    years, erf_co2 = get_variable_values(df, "Effective Radiative Forcing|CO2")
    _, expected_temp = get_variable_values(df, "Surface Temperature")

    model = build_erf_to_temperature_model(years, erf_co2, config)
    model.run()

    temp_4box = model.timeseries().get_fourbox_timeseries_by_name(
        "Surface Temperature"
    )
    assert temp_4box is not None
    actual_temp = fourbox_global_mean(temp_4box.values())

    assert_allclose_phased(
        actual_temp, expected_temp,
        shock_rtol=5e-2, converge_rtol=3e-2, final_rtol=3e-2, atol=DEFAULT_ATOL,
        suite=SUITE, name=f"04_ecs_sweep_{ecs}", variable="Surface Temperature",
    )


def test_05_co2_only_forcing():
    df, config = load_data("05_co2_only_forcing")
    assert config.get("rf_total_runmodus") == "CO2"

    years, expected_total_erf = get_variable_values(df, "Effective Radiative Forcing")
    _, expected_erf_co2 = get_variable_values(df, "Effective Radiative Forcing|CO2")
    _, expected_temp = get_variable_values(df, "Surface Temperature")
    npt.assert_allclose(expected_total_erf, expected_erf_co2, rtol=1e-6)

    model = build_erf_to_temperature_model(years, expected_total_erf, config)
    model.run()

    temp_4box = model.timeseries().get_fourbox_timeseries_by_name(
        "Surface Temperature"
    )
    actual_temp = fourbox_global_mean(temp_4box.values())

    assert_allclose_phased(
        actual_temp, expected_temp,
        shock_rtol=5e-2, converge_rtol=3e-2, final_rtol=3e-2, atol=DEFAULT_ATOL,
        suite=SUITE, name="05_co2_only", variable="Surface Temperature",
    )
