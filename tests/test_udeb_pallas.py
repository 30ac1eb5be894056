"""Pallas month-engine vs XLA month-engine: whole-model differential tests.

The kernel (rscm_tpu/ops/udeb_month.py) re-implements the monthly UDEB
update with batch-on-lanes layout; these tests drive complete models
through both engines (interpret mode on CPU) and require agreement at
float64 near machine precision — the arithmetic is the same, only the
axis layout differs.
"""

import numpy as np
import pytest

# Interpret-mode Pallas on CPU is minutes of wall per case; the kernel's
# correctness on real hardware is additionally gated by bench.py's
# on-device golden checks every round, so the CPU differential suite
# runs in the slow lane.
pytestmark = pytest.mark.slow

from rscm_tpu.core import GridType, ModelBuilder, TimeAxis, Timeseries, VariableSchema
from rscm_tpu.core.spatial import ScalarGrid
from rscm_tpu.magicc import ClimateUDEB

OUT_VARS = [
    "Surface Temperature", "Heat Uptake", "Ocean Heat Content",
    "Sea Surface Temperature",
]


def build_model(years, erf, **params):
    schema = VariableSchema()
    schema.add_variable("Effective Radiative Forcing", "W/m^2")
    schema.add_variable("Surface Temperature", "K", GridType.FourBox)
    schema.add_variable("Heat Uptake", "W/m^2")
    schema.add_variable("Ocean Heat Content", "J/m^2")
    schema.add_variable("Sea Surface Temperature", "K")
    ta = TimeAxis.from_values(years)
    return (
        ModelBuilder()
        .with_time_axis(ta)
        .with_schema(schema)
        .with_component(ClimateUDEB(**params))
        .with_exogenous_variable(
            "Effective Radiative Forcing",
            Timeseries(np.asarray(erf)[:, None], ta, ScalarGrid(), "W/m^2"),
        )
        .with_initial_values({"Surface Temperature": 0.0})
        .build()
    )


@pytest.mark.parametrize(
    "params",
    [
        {},  # defaults: time-varying ECS, land heat, variable upwelling
        {"efficacy_apply": 2},
        {"land_heat_capacity_enabled": False},
        {"w_variable_fraction": 0.0, "feedback_cumt_sensitivity": 0.0,
         "feedback_q_sensitivity": 0.0},
    ],
)
def test_pallas_engine_matches_xla(params):
    years = np.arange(1850.0, 1930.0)
    erf = np.where(years >= 1851.0, 3.71, 0.0)

    xla = build_model(years, erf, **params)
    xla.run(compiled=True)
    pallas = build_model(years, erf, month_engine="pallas", **params)
    pallas.run(compiled=True)

    for name in OUT_VARS:
        a = np.asarray(xla.collection.get_data(name).values())
        b = np.asarray(pallas.collection.get_data(name).values())
        np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-9, err_msg=name)


def test_pallas_engine_in_ensemble():
    """The custom_vmap route: a batched ensemble through the kernel must
    match per-member XLA runs."""
    from rscm_tpu.parallel import EnsembleRunner

    years = np.arange(1850.0, 1900.0)
    erf = np.where(years >= 1851.0, 3.71, 0.0)

    batch = 5
    rng = np.random.default_rng(2)
    ecs = rng.uniform(2.0, 5.0, batch)

    runner = EnsembleRunner(build_model(years, erf, month_engine="pallas"))
    params = runner.batched_params({"ClimateUDEB.ecs": ecs})
    out = runner.run(params=params, out_vars=["Sea Surface Temperature"])
    batched = np.asarray(out["Sea Surface Temperature"])
    assert batched.shape == (batch, len(years), 1)

    for i in range(batch):
        single = build_model(years, erf, ecs=float(ecs[i]))
        single.run(compiled=True)
        expected = np.asarray(
            single.collection.get_data("Sea Surface Temperature").values()
        )
        np.testing.assert_allclose(batched[i], expected, rtol=1e-8, atol=1e-9)


def test_pallas_engine_on_golden_scenario_config():
    """On the golden MAGICC7 full-default scenario configuration, the
    kernel engine must match the XLA engine at machine precision — the
    XLA engine's agreement with the Fortran golden data (the regression
    suite) then carries over transitively."""
    from regression.helpers import get_variable_values, load_regression_data
    from regression.test_ocean_udeb import (
        _actual_global_temp,
        build_ocean_model,
        params_from_config,
        step_forcing,
    )

    df, config = load_regression_data("ocean_udeb", "10_full_default")
    years, _ = get_variable_values(df, "Surface Temperature")
    erf = step_forcing(years, config.get("core_delq2xco2", 3.71))

    xla = build_ocean_model(config, years, erf)
    xla.run()
    params = dict(params_from_config(config), month_engine="pallas")
    pallas = build_ocean_model(config, years, erf, params=params)
    pallas.run()

    np.testing.assert_allclose(
        _actual_global_temp(pallas), _actual_global_temp(xla),
        rtol=1e-12, atol=1e-12,
    )


@pytest.mark.slow
def test_gradient_through_pallas_engine():
    """The kernel itself has no AD rule (and custom_vmap none either), so
    derivatives route through the scan-based jnp reference via a
    custom_jvp wrapped OUTSIDE the custom_vmap — the end-to-end gradient
    must match finite differences."""
    import jax

    from rscm_tpu.calibrate import CompiledModelRunner

    years = np.arange(1850.0, 1858.0)
    erf = np.where(years >= 1851.0, 3.71, 0.0)
    model = build_model(years, erf, month_engine="pallas")
    runner = CompiledModelRunner(
        model, param_map={"ecs": "ClimateUDEB.ecs"},
        output_variables=["Sea Surface Temperature"],
    )
    fn = runner.trajectories_fn()
    target = jax.jit(lambda th: fn(th)["Sea Surface Temperature"][-1, 0])
    g = float(jax.jit(jax.grad(target))(np.array([3.0]))[0])
    eps = 1e-5
    fd = (float(target(np.array([3.0 + eps])))
          - float(target(np.array([3.0 - eps])))) / (2 * eps)
    assert g == pytest.approx(fd, rel=1e-5)
