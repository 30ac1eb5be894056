"""Ocean (ClimateUDEB) physics regression vs Fortran MAGICC7 golden data.

Twelve scenarios progressively enabling ocean physics features, all under
ABRUPT-2XCO2 step forcing unless noted (10/12 use 1pctCO2 ramps).
"""

import numpy as np

from rscm_tpu.core import (
    GridType,
    ModelBuilder,
    TimeAxis,
    Timeseries,
    VariableSchema,
)
from rscm_tpu.core.spatial import ScalarGrid
from rscm_tpu.magicc import ClimateUDEB

from .helpers import (
    assert_allclose_phased,
    assert_allclose_recorded,
    fourbox_global_mean,
    get_variable_values,
    load_regression_data,
)

SUITE = "ocean_udeb"
DEFAULT_ATOL = 1e-6
DEFAULT_RTOL = 3e-2


def load_data(name):
    return load_regression_data(SUITE, name)


def params_from_config(config):
    """Map MAGICC .CFG keys onto ClimateUDEB parameters."""
    return {
        "ecs": config.get("core_climatesensitivity", 3.0),
        "rf_2xco2": config.get("core_delq2xco2", 3.71),
        "w_initial": config.get("core_initial_upwelling_rate", 3.5),
        "w_variable_fraction": config.get("core_upwelling_variable_part", 0.7),
        "depth_dependent_area": float(config.get("core_ocn_depthdependent", 1)),
        "kappa_dkdt": config.get("core_verticaldiff_top_dkdt", -0.191),
        "land_heat_capacity_enabled": bool(config.get("core_landheatcapacity_apply", 1)),
        "land_hc_eff_thickness": config.get("core_landhc_effthickness", 300.0),
        "k_lg": config.get("core_heatxchange_landground", 0.1),
        "k_ns": config.get("core_heatxchange_northsouth", 0.31),
        "feedback_cumt_sensitivity": config.get("core_feedback_cumtsensitivity", 0.08),
        "feedback_q_sensitivity": config.get("core_feedback_qsensitivity", 7.84e-9),
        "efficacy_apply": config.get("rf_efficacy_apply", 0),
        "prescribed_efficacy_co2": config.get("rf_efficacy_co2", 1.0),
    }


def build_ocean_model(config, years, erf, params=None):
    climate = ClimateUDEB(**(params or params_from_config(config)))

    time_axis = TimeAxis.from_bounds(
        np.concatenate([years, [years[-1] + 1.0]]).astype(np.float64)
    )

    schema = VariableSchema()
    schema.add_variable("Effective Radiative Forcing", "W/m^2")
    schema.add_variable("Surface Temperature", "K", GridType.FourBox)
    schema.add_variable("Heat Uptake", "W/m^2")
    schema.add_variable("Ocean Heat Content", "J/m^2")
    schema.add_variable("Sea Surface Temperature", "K")

    return (
        ModelBuilder()
        .with_time_axis(time_axis)
        .with_schema(schema)
        .with_component(climate)
        .with_exogenous_variable(
            "Effective Radiative Forcing",
            Timeseries(erf.astype(np.float64)[:, None], time_axis, ScalarGrid(), "W/m^2"),
        )
        .with_initial_values({"Surface Temperature": 0.0})
        .build()
    )


def step_forcing(years, rf_2xco2, step_year=1851.0):
    return np.where(years >= step_year, rf_2xco2, 0.0)


def ramp_forcing_1pct(years, rf_2xco2, start_year):
    dt = years - start_year
    co2_ratio = np.where(dt > 0, 1.01**dt, 1.0)
    return rf_2xco2 * np.log(co2_ratio) / np.log(2.0)


def _actual_global_temp(model):
    temp_4box = model.timeseries().get_fourbox_timeseries_by_name(
        "Surface Temperature"
    )
    assert temp_4box is not None
    return fourbox_global_mean(temp_4box.values())


def run_step_scenario(
    name, *, shock_rtol=DEFAULT_RTOL, converge_rtol=2e-2, final_rtol=2e-2,
    skip=5, shock_end=25, converge_start=55,
):
    df, config = load_data(name)
    years, expected_temp = get_variable_values(df, "Surface Temperature")
    erf = step_forcing(years, config.get("core_delq2xco2", 3.71))

    model = build_ocean_model(config, years, erf)
    model.run()

    assert_allclose_phased(
        _actual_global_temp(model), expected_temp,
        skip=skip, shock_end=shock_end, converge_start=converge_start,
        shock_rtol=shock_rtol, converge_rtol=converge_rtol, final_rtol=final_rtol,
        atol=DEFAULT_ATOL, name=name, suite=SUITE, variable="Surface Temperature",
    )


def test_ocean_01_diffusion_only():
    run_step_scenario("01_diffusion_only", shock_rtol=1.5e-2, converge_rtol=1.5e-2,
                      final_rtol=1.5e-2)


def test_ocean_02_constant_upwelling():
    run_step_scenario("02_constant_upwelling", shock_rtol=1.5e-2,
                      converge_rtol=1.5e-2, final_rtol=1.5e-2)


def test_ocean_03_depth_dependent_area():
    run_step_scenario("03_depth_dependent_area", final_rtol=1e-2)


def test_ocean_04_variable_upwelling():
    run_step_scenario("04_variable_upwelling")


def test_ocean_05_temp_dependent_diffusivity():
    run_step_scenario("05_temp_dependent_diffusivity", converge_rtol=1.5e-2,
                      final_rtol=1.5e-2)


def test_ocean_06_ground_heat():
    run_step_scenario("06_ground_heat", shock_rtol=5e-2, skip=15, final_rtol=1.5e-2)


def test_ocean_07_interhemispheric_exchange():
    run_step_scenario("07_interhemispheric_exchange", shock_rtol=1.5e-2,
                      converge_rtol=1.5e-2, final_rtol=1.5e-2)


def test_ocean_08_sst_to_sat():
    """Short 10-year run with default parameters (single tolerance)."""
    df, config = load_data("08_sst_to_sat")
    years, expected_temp = get_variable_values(df, "Surface Temperature")
    erf = step_forcing(years, config.get("core_delq2xco2", 3.71))

    model = build_ocean_model(
        config, years, erf,
        params={
            "ecs": config.get("core_climatesensitivity", 3.0),
            "rf_2xco2": config.get("core_delq2xco2", 3.71),
        },
    )
    model.run()
    assert_allclose_recorded(
        _actual_global_temp(model), expected_temp, rtol=0.1, atol=DEFAULT_ATOL,
        suite=SUITE, name="08_sst_to_sat", variable="Surface Temperature",
    )


def test_ocean_09_time_varying_ecs():
    run_step_scenario("09_time_varying_ecs", final_rtol=1e-2)


def test_ocean_10_full_default():
    """1pctCO2 ramp with full MAGICC7 defaults."""
    df, config = load_data("10_full_default")
    years, expected_temp = get_variable_values(df, "Surface Temperature")
    erf = ramp_forcing_1pct(
        years, config.get("core_delq2xco2", 3.71), config.get("startyear", 1850)
    )
    model = build_ocean_model(
        config, years, erf,
        params={
            "ecs": config.get("core_climatesensitivity", 3.0),
            "rf_2xco2": config.get("core_delq2xco2", 3.71),
        },
    )
    model.run()
    assert_allclose_recorded(
        _actual_global_temp(model), expected_temp, rtol=0.1, atol=DEFAULT_ATOL,
        suite=SUITE, name="10_full_default", variable="Surface Temperature",
    )


def test_ocean_11_efficacy_ar6():
    run_step_scenario("11_efficacy_ar6", final_rtol=1e-2)


def test_ocean_12_efficacy_ar6_1pctco2():
    """1pctCO2 ramp with AR6 internal efficacy (efficacy_apply=2)."""
    df, config = load_data("12_efficacy_ar6_1pctco2")
    years, expected_temp = get_variable_values(df, "Surface Temperature")
    erf = ramp_forcing_1pct(
        years, config.get("core_delq2xco2", 3.71), config.get("startyear", 1850)
    )
    model = build_ocean_model(
        config, years, erf,
        params={
            "ecs": config.get("core_climatesensitivity", 3.0),
            "rf_2xco2": config.get("core_delq2xco2", 3.71),
            "efficacy_apply": config.get("rf_efficacy_apply", 2),
        },
    )
    model.run()
    assert_allclose_recorded(
        _actual_global_temp(model), expected_temp, rtol=0.1, atol=DEFAULT_ATOL,
        suite=SUITE, name="12_efficacy_ar6_1pctco2", variable="Surface Temperature",
    )
