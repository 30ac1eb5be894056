"""
Physics-invariant tests, mirroring the reference's invariant suites
(``crates/rscm-magicc/tests/conservation.rs``, ``ecs_diagnostics.rs``):
conservation laws, λ-ECS consistency, heat-uptake/OHC identity, RLO
convergence, and pool positivity under extreme forcing.
"""

import numpy as np
import pytest

from rscm_tpu.core import (
    GridType,
    ModelBuilder,
    TimeAxis,
    Timeseries,
    VariableSchema,
)
from rscm_tpu.core.spatial import ScalarGrid
from rscm_tpu.magicc import ClimateUDEB
from rscm_tpu.magicc.carbon.terrestrial import TerrestrialCarbon
from rscm_tpu.parallel import EnsembleRunner

# UDEB with state feedbacks disabled: constant circulation and constant
# effective ECS, the configuration the reference's ECS diagnostics sweep.
DIAG_PARAMS = dict(
    w_variable_fraction=0.0,
    feedback_cumt_sensitivity=0.0,
    feedback_q_sensitivity=0.0,
)


def build_udeb_model(years, erf_values, **params):
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
            Timeseries(np.asarray(erf_values)[:, None], ta, ScalarGrid(), "W/m^2"),
        )
        .with_initial_values({"Surface Temperature": 0.0})
        .build()
    )


class TestEcsDiagnostics:
    """λ-ECS consistency: constant 2xCO2 forcing must equilibrate toward
    the prescribed ECS (mirror of ``ecs_diagnostics.rs`` sweeps)."""

    def test_equilibrium_warming_tracks_ecs(self):
        years = np.arange(1850.0, 2451.0)  # 600 yr toward equilibrium
        rf_2xco2 = 3.71
        erf = np.where(years >= 1851.0, rf_2xco2, 0.0)
        model = build_udeb_model(years, erf, **DIAG_PARAMS)
        runner = EnsembleRunner(model)

        ecs_values = np.array([2.0, 3.0, 4.5])
        params = runner.batched_params({"ClimateUDEB.ecs": ecs_values})
        out = runner.run(params=params, out_vars=["Surface Temperature"])
        # global-mean four-box temperature at the end of the run
        fourbox = np.asarray(out["Surface Temperature"])[:, -1, :]
        weights = np.asarray(ClimateUDEB(**DIAG_PARAMS).global_box_fractions())
        t_global = fourbox @ weights

        fraction = t_global / ecs_values
        # equilibration fraction after 600 yr: large, below 1, and nearly
        # ECS-independent for fixed ocean parameters
        assert np.all(fraction > 0.75), fraction
        assert np.all(fraction < 1.02), fraction
        # warming strictly ordered by ECS
        assert t_global[0] < t_global[1] < t_global[2]

    def test_rlo_convergence(self):
        """Land/ocean warming ratio approaches the prescribed RLO."""
        years = np.arange(1850.0, 2451.0)
        erf = np.where(years >= 1851.0, 3.71, 0.0)
        model = build_udeb_model(years, erf, **DIAG_PARAMS)
        model.run()

        fourbox = model.timeseries().get_data("Surface Temperature").values()[-1]
        t_ocean = 0.5 * (fourbox[0] + fourbox[2])  # NO, SO
        t_land = 0.5 * (fourbox[1] + fourbox[3])   # NL, SL
        rlo = ClimateUDEB(**DIAG_PARAMS).rlo
        assert abs(t_land / t_ocean - rlo) / rlo < 0.15, (t_land, t_ocean, rlo)


class TestHeatUptakeIdentity:
    """dOHC/dt must track the heat-uptake flux (energy bookkeeping)."""

    def test_ohc_derivative_matches_uptake(self):
        seconds_per_year = 31557600.0
        years = np.arange(1850.0, 2100.0)
        erf = np.linspace(0.0, 6.0, len(years))
        model = build_udeb_model(years, erf, **DIAG_PARAMS)
        model.run()

        ohc = model.timeseries().get_data("Ocean Heat Content").values()[:, 0]
        uptake = model.timeseries().get_data("Heat Uptake").values()[:, 0]

        # year-over-year OHC change in W/m^2 (per ocean column) vs the
        # global TOA imbalance; proportional throughout the ramp (the
        # constant offset absorbs land/area bookkeeping differences)
        dohc = np.diff(ohc[1:]) / seconds_per_year
        flux = uptake[2:]
        mask = flux > 0.1
        ratio = dohc[mask[: len(dohc)]] / flux[: len(dohc)][mask[: len(dohc)]]
        assert np.all(np.isfinite(ratio))
        # the ratio is a stable constant (column vs global-area accounting),
        # not drifting — energy is neither created nor destroyed over time
        assert ratio.std() / ratio.mean() < 0.2, (ratio.mean(), ratio.std())


class TestPoolPositivity:
    """Terrestrial pools stay non-negative under extreme land-use flux
    (mirror of ``conservation.rs`` non-negativity checks)."""

    @pytest.mark.parametrize("landuse", [50.0, 500.0])
    def test_pools_nonnegative(self, landuse):
        years = np.arange(2000.0, 2101.0)
        ta = TimeAxis.from_values(years)

        def exo(value, unit):
            return Timeseries(
                np.full((len(years), 1), value), ta, ScalarGrid(), unit
            )

        model = (
            ModelBuilder()
            .with_time_axis(ta)
            .with_component(TerrestrialCarbon())
            .with_exogenous_variable("Atmospheric Concentration|CO2", exo(400.0, "ppm"))
            .with_exogenous_variable("Surface Temperature", exo(2.0, "K"))
            .with_exogenous_variable(
                "Emissions|CO2|Land Use", exo(landuse, "GtC/yr")
            )
            .with_initial_values(
                {
                    "Carbon Pool|Plant": 884.86,
                    "Carbon Pool|Detritus": 92.77,
                    "Carbon Pool|Soil": 1681.53,
                    "Carbon Pool|Humus": 836.0,
                }
            )
            .build()
        )
        model.run()
        for pool in ["Plant", "Detritus", "Soil", "Humus"]:
            values = model.timeseries().get_data(f"Carbon Pool|{pool}").values()
            assert np.all(values >= 0.0), f"{pool} went negative at landuse={landuse}"
