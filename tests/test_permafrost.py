"""Permafrost carbon feedback (beyond-reference, module_12).

Test cases mirror the reference's module spec
(``/root/reference/docs/modules/module_12_permafrost.md`` §10): no-warming
inertness, single-band thaw mechanics, carbon conservation, CO2/CH4
partitioning, complete thaw, refreeze — plus engine integration (compiled
vs host parity, the coupled MAGICC graph, ensemble vmap).
"""

import numpy as np
import pytest

from rscm_tpu.magicc import Permafrost


def run_years(pf, temps, dt=1.0):
    """Drive the host path year by year; returns final (state, outputs)."""
    st = pf.create_initial_state()
    out = None
    for t in np.atleast_1d(temps):
        st, out = pf.solve_permafrost(st, float(t), dt)
    return st, out


class TestSpecCases:
    def test_no_warming_is_inert(self):
        """Spec §10.1: zero anomaly -> no thaw, no emissions, full pool."""
        pf = Permafrost()
        st, out = run_years(pf, np.zeros(20))
        assert out["co2"] == pytest.approx(0.0, abs=1e-12)
        assert out["ch4_mt"] == pytest.approx(0.0, abs=1e-12)
        assert out["total_pool"] == pytest.approx(800.0, abs=1e-9)
        assert out["thawed_fraction"] == pytest.approx(0.0, abs=1e-12)
        np.testing.assert_allclose(st["ms_frozen_area"], 1.0)

    def test_single_band_thaw_rate(self):
        """Spec §10.2: T=1 K, amplification 1.7, threshold 1 K ->
        summer max 0.7 K -> mineral-soil thaw 7 %/yr (compounding)."""
        pf = Permafrost(n_bands=1)
        st, out = run_years(pf, np.ones(10))
        assert st["ms_frozen_area"][0] == pytest.approx(0.93**10, abs=1e-12)
        assert st["peat_frozen_area"][0] == pytest.approx(0.965**10, abs=1e-12)
        assert out["co2"] > 0.0
        assert out["ch4_mt"] > 0.0

    def test_conservation_identity(self):
        """Spec §10.3: remaining pool + cumulative emissions == initial
        pool — exactly (the Fortran's MAX(0,..) leak is deliberately
        fixed here, module docstring)."""
        pf = Permafrost()
        st = pf.create_initial_state()
        for k in range(100):
            st, out = pf.solve_permafrost(st, 0.03 * k, 1.0)
        total = out["total_pool"] + st["cumulative_emissions"]
        assert total == pytest.approx(800.0, abs=1e-8)
        assert st["cumulative_emissions"] > 1.0  # something actually thawed

    def test_ch4_co2_partitioning(self):
        """Spec §10.4: peat (80 % anaerobic default) emits relatively more
        CH4 than mineral soil (5 % anaerobic)."""
        ms_only = Permafrost(minsoil_southern_fraction=1.0,
                             minsoil_northern_fraction=1.0)
        peat_only = Permafrost(minsoil_southern_fraction=0.0,
                               minsoil_northern_fraction=0.0)
        _, out_ms = run_years(ms_only, np.full(30, 2.0))
        _, out_peat = run_years(peat_only, np.full(30, 2.0))
        ratio_ms = out_ms["ch4_mt"] / out_ms["co2"]
        ratio_peat = out_peat["ch4_mt"] / out_peat["co2"]
        assert ratio_peat > 3.0 * ratio_ms

    def test_complete_thaw_is_stable(self):
        """Spec §10.7: extreme sustained warming thaws everything without
        NaN; emissions approach the total pool."""
        pf = Permafrost(n_bands=10)
        st = pf.create_initial_state()
        for _ in range(400):
            st, out = pf.solve_permafrost(st, 10.0, 1.0)
        assert np.all(np.isfinite(st["ms_frozen_area"]))
        assert out["thawed_fraction"] == pytest.approx(1.0, abs=1e-6)
        assert st["cumulative_emissions"] > 0.9 * 800.0
        assert out["total_pool"] + st["cumulative_emissions"] == pytest.approx(
            800.0, abs=1e-7
        )

    def test_refreeze(self):
        """Spec §10.8: cooling after warming refreezes area and returns
        carbon to the frozen pool, still conserving total carbon."""
        pf = Permafrost(n_bands=4)
        st = pf.create_initial_state()
        for _ in range(20):
            st, out = pf.solve_permafrost(st, 3.0, 1.0)
        hot = out["thawed_fraction"]
        frozen_pool_hot = float(np.sum(st["ms_frozen_pool"]))
        for _ in range(20):
            st, out = pf.solve_permafrost(st, -1.0, 1.0)
        assert out["thawed_fraction"] < hot
        assert float(np.sum(st["ms_frozen_pool"])) > frozen_pool_hot
        assert out["total_pool"] + st["cumulative_emissions"] == pytest.approx(
            800.0, abs=1e-8
        )

    def test_zonal_distribution_orders_thaw(self):
        """Spec §10.5: southern (low-threshold) bands thaw first; a
        north-heavy pool distribution therefore emits less for the same
        warming."""
        pf_n = Permafrost(n_bands=10, zonal_pool_distribution=-1.0)
        pf_s = Permafrost(n_bands=10, zonal_pool_distribution=1.0)
        st_n, _ = run_years(pf_n, np.full(30, 2.0))
        st_s, _ = run_years(pf_s, np.full(30, 2.0))
        assert st_s["cumulative_emissions"] > st_n["cumulative_emissions"]

    def test_band_fractions_normalised(self):
        for d in (-1.0, -0.5, 0.0, 0.5, 1.0):
            f = Permafrost(zonal_pool_distribution=d)._band_fractions()
            assert f.sum() == pytest.approx(1.0, abs=1e-12)
            assert np.all(f >= 0.0)


def _build_permafrost_model(years, temps):
    """Minimal graph: exogenous temperature driving Permafrost."""
    from rscm_tpu.core import (
        ModelBuilder,
        TimeAxis,
        Timeseries,
        VariableSchema,
    )
    from rscm_tpu.core.spatial import ScalarGrid

    schema = VariableSchema()
    schema.add_variable("Surface Temperature", "K")
    schema.add_variable("Emissions|CO2|Permafrost", "GtC/yr")
    schema.add_variable("Emissions|CH4|Permafrost", "Mt CH4/yr")
    schema.add_variable("Permafrost|Thawed Area Fraction", "1")
    schema.add_variable("Permafrost|Total Pool", "GtC")
    ta = TimeAxis.from_values(years)
    return (
        ModelBuilder()
        .with_time_axis(ta)
        .with_schema(schema)
        .with_component(Permafrost(n_bands=8))
        .with_exogenous_variable(
            "Surface Temperature",
            Timeseries(np.asarray(temps)[:, None], ta, ScalarGrid(), "K"),
        )
        .build()
    )


class TestEngineIntegration:
    def test_compiled_matches_host(self):
        years = np.arange(2000.0, 2051.0)
        temps = np.linspace(0.0, 4.0, len(years))
        host = _build_permafrost_model(years, temps)
        host.run(compiled=False)
        comp = _build_permafrost_model(years, temps)
        comp.run()
        for var in (
            "Emissions|CO2|Permafrost",
            "Emissions|CH4|Permafrost",
            "Permafrost|Total Pool",
        ):
            h = np.asarray(
                host.timeseries().get_timeseries_by_name(var).values()
            ).ravel()
            c = np.asarray(
                comp.timeseries().get_timeseries_by_name(var).values()
            ).ravel()
            np.testing.assert_allclose(c[1:], h[1:], rtol=1e-9, atol=1e-12)
        co2 = np.asarray(
            comp.timeseries()
            .get_timeseries_by_name("Emissions|CO2|Permafrost")
            .values()
        ).ravel()
        assert np.nanmax(co2) > 0.1

    def test_coupled_magicc_graph(self):
        """include_permafrost wires emissions into the CO2 budget and CH4
        chemistry; warming with permafrost must raise CO2 above the
        permafrost-free run."""
        from rscm_tpu.magicc.coupled import build_magicc_model, idealised_emissions

        years = np.arange(1850.0, 1981.0)
        # the default idealised scenario is aerosol-dominated (net cooling)
        # over this short window — strip the aerosol forcers so the run
        # actually warms and the permafrost threshold is crossed
        emissions = idealised_emissions(years)
        for name in ("Emissions|SOx", "Emissions|BC", "Emissions|OC"):
            values, unit = emissions[name]
            emissions[name] = (np.zeros_like(values), unit)
        base = build_magicc_model(years=years, emissions=emissions)
        base.run(compiled=False)
        perma = build_magicc_model(
            years=years,
            emissions=emissions,
            include_permafrost=True,
            # fast-thaw params so 130 years show a clear signal
            permafrost_params={
                "n_bands": 8,
                "arctic_amplification": 3.0,
                "melting_temp_min": 0.2,
                "melting_temp_max": 2.0,
            },
        )
        perma.run(compiled=False)

        def series(m, name):
            return np.asarray(
                m.timeseries().get_timeseries_by_name(name).values()
            ).ravel()

        co2_base = series(base, "Atmospheric Concentration|CO2")
        co2_perma = series(perma, "Atmospheric Concentration|CO2")
        pf_emis = series(perma, "Emissions|CO2|Permafrost")
        assert np.nanmax(pf_emis) > 0.0
        assert co2_perma[-1] > co2_base[-1]
        ch4_base = series(base, "Atmospheric Concentration|CH4")
        ch4_perma = series(perma, "Atmospheric Concentration|CH4")
        assert ch4_perma[-1] > ch4_base[-1]

    def test_ensemble_vmap(self):
        """The permafrost internal state vmaps over ensemble members."""
        from rscm_tpu.parallel import EnsembleRunner

        years = np.arange(2000.0, 2041.0)
        temps = np.linspace(0.0, 3.0, len(years))
        model = _build_permafrost_model(years, temps)
        runner = EnsembleRunner(model)
        params = runner.batched_params(
            {"Permafrost.arctic_amplification": np.linspace(1.2, 2.5, 16)}
        )
        out = runner.run(params=params, out_vars=["Emissions|CO2|Permafrost"])
        emis = np.asarray(out["Emissions|CO2|Permafrost"])
        assert emis.shape[0] == 16
        final = np.nan_to_num(emis[:, -1]).ravel()
        # stronger amplification -> strictly more release
        assert final[-1] > final[0] > 0.0
