"""Traced (fused-scan) ClimateUDEB vs host-path parity."""

import numpy as np
import pytest

from rscm_tpu.core import GridType, ModelBuilder, TimeAxis, Timeseries, VariableSchema
from rscm_tpu.core.spatial import ScalarGrid
from rscm_tpu.magicc import ClimateUDEB


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
        {},  # full defaults incl. time-varying ECS -> in-graph LAMCALC
        {"efficacy_apply": 2},
        {"w_variable_fraction": 0.0, "feedback_cumt_sensitivity": 0.0,
         "feedback_q_sensitivity": 0.0},
        {"land_heat_capacity_enabled": False},
    ],
)
def test_traced_matches_host(params):
    years = np.arange(1850.0, 1940.0)
    erf = np.where(years >= 1851.0, 3.71, 0.0)

    host = build_model(years, erf, **params)
    host.run(compiled=False)
    comp = build_model(years, erf, **params)
    comp.run(compiled=True)

    for name in ["Heat Uptake", "Ocean Heat Content", "Sea Surface Temperature"]:
        np.testing.assert_allclose(
            host.collection.get_data(name).values(),
            comp.collection.get_data(name).values(),
            rtol=1e-10, atol=1e-10, err_msg=name,
        )
    np.testing.assert_allclose(
        host.collection.get_data("Surface Temperature").values(),
        comp.collection.get_data("Surface Temperature").values(),
        rtol=1e-10, atol=1e-12,
    )


def test_assoc_tridiag_matches_sequential():
    """The log-depth associative-scan tridiagonal solver must agree with
    the sequential Thomas sweep through a full 90-year UDEB run (f64:
    sub-1e-9 drift even with the nonlinear feedbacks compounding)."""
    years = np.arange(1850.0, 1940.0)
    erf = np.where(years >= 1851.0, 3.71, 0.0)

    seq = build_model(years, erf)
    seq.run(compiled=True)
    assoc = build_model(years, erf, tridiag_solver="assoc")
    assoc.run(compiled=True)

    for name in ["Sea Surface Temperature", "Heat Uptake", "Ocean Heat Content"]:
        np.testing.assert_allclose(
            np.asarray(seq.collection.get_data(name).values()),
            np.asarray(assoc.collection.get_data(name).values()),
            rtol=1e-8, atol=1e-8, err_msg=name,
        )


def test_auto_engine_follows_mesh_not_default_backend(monkeypatch):
    """month_engine='auto' (and every mesh-targeted code path) must
    resolve against the mesh's platform, never jax.default_backend() —
    which may be a different platform, or a hung TPU tunnel whose mere
    initialization blocks (the round-2 MULTICHIP failure mode)."""
    import jax

    from rscm_tpu.parallel import EnsembleRunner, make_mesh

    years = np.arange(1850.0, 1880.0)
    erf = np.where(years >= 1851.0, 3.71, 0.0)
    model = build_model(years, erf, month_engine="auto")
    mesh = make_mesh(2, devices=jax.devices("cpu")[:2])

    def boom():
        raise AssertionError(
            "jax.default_backend() consulted during a mesh-targeted run"
        )

    monkeypatch.setattr(jax, "default_backend", boom)
    runner = EnsembleRunner(model)
    params = runner.batched_params({"ClimateUDEB.ecs": np.array([2.0, 4.0])}, mesh=mesh)
    out = runner.run(params=params, mesh=mesh, out_vars=["Sea Surface Temperature"])
    assert np.all(np.isfinite(np.asarray(out["Sea Surface Temperature"])[:, 1:]))


def test_execution_target_resolution():
    from rscm_tpu.utils.target import execution_target, target_platform

    with execution_target("tpu"):
        assert target_platform() == "tpu"
        with execution_target("cpu"):
            assert target_platform() == "cpu"
        assert target_platform() == "tpu"
    # outside any block: falls back to the default backend (cpu in tests)
    assert target_platform() == "cpu"


def test_udeb_ensemble_vmaps():
    """A UDEB parameter ensemble runs as one vmapped program."""
    from rscm_tpu.parallel import EnsembleRunner

    years = np.arange(1850.0, 1900.0)
    erf = np.where(years >= 1851.0, 3.71, 0.0)
    model = build_model(years, erf)
    runner = EnsembleRunner(model)

    ecs_values = np.array([2.0, 3.0, 4.5])
    params = runner.batched_params({"ClimateUDEB.ecs": ecs_values})
    out = runner.run(params=params, out_vars=["Sea Surface Temperature"])
    ssts = np.asarray(out["Sea Surface Temperature"])[:, -1, 0]
    # higher ECS -> more warming, all finite
    assert np.all(np.isfinite(ssts))
    assert ssts[0] < ssts[1] < ssts[2]


@pytest.mark.slow  # reverse-mode through 2x50 ocean layers: ~2 min on CPU
def test_gradient_through_udeb():
    """Reverse-mode AD must flow through the traced UDEB (NUTS/sensitivity
    depend on it).  The LAMCALC early-exit while_loop is not reverse-
    differentiable, so lamcalc routes derivatives through an equivalent
    fixed-count fori path via custom_jvp — the gradient must match finite
    differences."""
    import jax

    from rscm_tpu.calibrate import CompiledModelRunner

    years = np.arange(1850.0, 1860.0)
    erf = np.where(years >= 1851.0, 3.71, 0.0)
    model = build_model(years, erf, month_engine="xla")
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
    assert g == pytest.approx(fd, rel=1e-6)
