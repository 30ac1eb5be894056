"""Sea level rise (beyond-reference, module_14).

Behavioural tests against the reference's module spec
(``/root/reference/docs/modules/module_14_sea_level_rise.md``): start-year
gating, reservoir bounds, both AIS SID methods, land-water depletion —
plus engine integration (compiled vs host parity, coupled MAGICC graph,
ensemble vmap).
"""

import numpy as np
import pytest

from rscm_tpu.magicc import SeaLevelRise


def drive(slr, years, temps, ohcs, dt=1.0):
    st = slr.create_initial_state()
    outs = []
    for k, yr in enumerate(np.atleast_1d(years)):
        st, out = slr.solve_slr(st, float(temps[k]), float(ohcs[k]), float(yr), k, dt)
        outs.append({k2: float(v) for k2, v in out.items()})
    return st, outs


def warming_scenario(years, t_max=4.0, ohc_max=2e10, ramp_from=1900.0):
    years = np.asarray(years)
    f = np.maximum(0.0, (years - ramp_from) / max(years[-1] - ramp_from, 1.0))
    return t_max * f, ohc_max * f


class TestSpecBehaviour:
    def test_zero_forcing_is_inert(self):
        years = np.arange(1850.0, 2001.0)
        _, outs = drive(SeaLevelRise(max_history_steps=200), years,
                        np.zeros_like(years), np.zeros_like(years))
        final = outs[-1]
        # at T=0 the glacier temp factor is |T - equi_temp|^e = 0 (the
        # clamped equilibrium temperature of an empty contribution is 0),
        # so glaciers are inert too; the Rahmstorf semi-empirical rate is
        # the only nonzero term (zeroratetemp -0.5 K)
        for key in ("expansion", "glaciers", "gis_smb", "gis_sid",
                    "ais_smb", "ais_sid", "landwater"):
            assert final[key] == pytest.approx(0.0, abs=1e-9), key
        # constant 0.3353 * 0.5 mm/yr from the 2000 switch year
        assert final["semiempirical"] == pytest.approx(0.3353 * 0.5, rel=1e-9)

    def test_warming_raises_all_contributors(self):
        years = np.arange(1850.0, 2101.0)
        temps, ohcs = warming_scenario(years)
        _, outs = drive(SeaLevelRise(max_history_steps=len(years) + 1),
                        years, temps, ohcs)
        final = outs[-1]
        assert final["expansion"] > 100.0
        assert final["glaciers"] > 50.0
        assert final["gis_smb"] > 1.0
        assert final["gis_sid"] > 10.0
        assert final["ais_sid"] > 10.0
        assert final["total"] == pytest.approx(
            sum(final[k] for k in ("expansion", "glaciers", "gis_smb",
                                   "gis_sid", "ais_smb", "ais_sid",
                                   "landwater")),
            rel=1e-12,
        )
        # monotone rise once warming is established
        totals = [o["total"] for o in outs[100:]]
        assert all(b >= a - 1e-9 for a, b in zip(totals, totals[1:]))

    def test_start_year_gating(self):
        """GIS SID starts 2000, AIS SMB 1980, GIS SMB 1965 (§5 defaults)."""
        years = np.arange(1850.0, 2101.0)
        temps, ohcs = warming_scenario(years, ramp_from=1850.0)
        _, outs = drive(SeaLevelRise(max_history_steps=len(years) + 1),
                        years, temps, ohcs)
        by_year = dict(zip(years, outs))
        assert by_year[1999.0]["gis_sid"] == pytest.approx(0.0, abs=1e-12)
        assert by_year[2010.0]["gis_sid"] > 0.0
        assert by_year[1979.0]["ais_smb"] == pytest.approx(0.0, abs=1e-12)
        assert by_year[1964.0]["gis_smb"] == pytest.approx(0.0, abs=1e-12)

    def test_gis_sid_reservoir_bounded(self):
        """Discharge cannot exceed the LOW/HIGH reservoirs (§3.4)."""
        years = np.arange(2000.0, 2501.0)
        temps = np.full_like(years, 10.0)
        slr = SeaLevelRise(max_history_steps=len(years) + 1)
        st, outs = drive(slr, years, temps, np.zeros_like(years))
        assert st["gis_vol_low"] >= 0.0
        assert st["gis_vol_high"] >= 0.0
        # scaled interp of fully depleted reservoirs
        cap = (0.5 * (53.63 - 35.98) + 35.98) * 5.0
        assert outs[-1]["gis_sid"] <= cap + 1e-6

    def test_deconto_fast_rate_threshold(self):
        """Above the threshold temperature the DeConto method adds the
        ice-cliff fast rate (§3.6)."""
        years = np.arange(1950.0, 2101.0)
        below = np.full_like(years, 0.9)   # < 1.023 K threshold
        above = np.full_like(years, 1.2)   # > threshold
        mk = lambda: SeaLevelRise(ais_sid_parameterisation="deconto")  # noqa: E731
        _, outs_b = drive(mk(), years, below, np.zeros_like(years))
        _, outs_a = drive(mk(), years, above, np.zeros_like(years))
        rate_b = outs_b[-1]["ais_sid"] - outs_b[-51]["ais_sid"]
        rate_a = outs_a[-1]["ais_sid"] - outs_a[-51]["ais_sid"]
        # fast rate is 13.83 mm/yr on top of the smooth discharge
        assert rate_a - rate_b > 0.5 * 13.83 * 50

    def test_levermann_delays(self):
        """Regions with longer time delays contribute later (§5.8): with
        only 25 years past the start year, only Amundsen (0) and Ross
        (20) are active, so the response is smaller than the same
        warming 40 years in."""
        slr = SeaLevelRise(max_history_steps=100)
        years_short = np.arange(1850.0, 1876.0)
        years_long = np.arange(1850.0, 1916.0)
        t_s = np.full_like(years_short, 2.0); t_s[0] = 0.0
        t_l = np.full_like(years_long, 2.0); t_l[0] = 0.0
        _, outs_s = drive(SeaLevelRise(max_history_steps=100), years_short,
                          t_s, np.zeros_like(years_short))
        _, outs_l = drive(slr, years_long, t_l, np.zeros_like(years_long))
        assert 0.0 < outs_s[-1]["ais_sid"] < outs_l[-1]["ais_sid"]

    def test_landwater_depletion(self):
        years = np.arange(1900.0, 2301.0)
        series = np.full(len(years), 0.4)  # mm/yr prescribed
        slr = SeaLevelRise(
            max_history_steps=len(years) + 1,
            landwater_enabled=True,
            landwater_mm_per_year=series,
            landwater_maxvolume_mm=100.0,
        )
        _, outs = drive(slr, years, np.zeros_like(years), np.zeros_like(years))
        lw = [o["landwater"] for o in outs]
        # linear until the 2100 switch year, depletion-damped after
        assert lw[199] == pytest.approx(0.4 * 199, rel=1e-9)
        assert lw[-1] < 100.0 + 1e-6

    def test_levermann_subannual_axis_one_slot_per_step(self):
        """On a uniform non-annual axis the IRF history must give every
        step its own slot (year-based indexing collided two half-year
        steps into one slot, silently overwriting anomalies) and the
        kernels must be evaluated at the true age step*dt."""
        from rscm_tpu.core import TimeAxis

        years = np.arange(2000.0, 2031.0, 0.5)
        slr = SeaLevelRise(
            max_history_steps=len(years) + 1, ais_sid_startyear=2000.0
        )
        slr.validate_time_axis(TimeAxis.from_values(years))
        assert slr.axis_dt() == 0.5
        temps = np.linspace(0.0, 3.0, len(years))
        st, outs = drive(slr, years, temps, np.zeros_like(years), dt=0.5)
        hist = np.asarray(st["t_hist"])
        # anomalies ramp monotonically -> every step past the start wrote
        # a distinct slot (with year-based indexing half would collide)
        written = hist[hist != 0.0]
        assert len(written) >= len(years) - 2
        assert outs[-1]["ais_sid"] > 0.0

        # physical convergence: the half-year discretisation of the same
        # scenario stays in the annual solution's neighbourhood
        years_a = np.arange(2000.0, 2031.0)
        slr_a = SeaLevelRise(
            max_history_steps=len(years_a) + 1, ais_sid_startyear=2000.0
        )
        temps_a = np.linspace(0.0, 3.0, len(years_a))
        _, outs_a = drive(slr_a, years_a, temps_a, np.zeros_like(years_a))
        assert outs[-1]["ais_sid"] == pytest.approx(
            outs_a[-1]["ais_sid"], rel=0.35
        )

    def test_nonuniform_axis_raises_at_build(self):
        years = np.concatenate([np.arange(2000.0, 2010.0),
                                np.arange(2010.0, 2030.0, 2.0)])
        temps = np.zeros(len(years))
        with pytest.raises(ValueError, match="uniform time axis"):
            _build_slr_model(years, temps, temps)

    def test_semiempirical_rate(self):
        """Rahmstorf rate: T constant 1 K above a 0 K base period with
        zeroratetemp -0.5 -> rate = 0.3353 * 1.5 mm/yr after 2000."""
        years = np.arange(1950.0, 2101.0)
        temps = np.where(years >= 2000.0, 1.0, 0.0)
        _, outs = drive(SeaLevelRise(max_history_steps=200), years,
                        temps, np.zeros_like(years))
        expected = 0.3353 * 1.5 * 101  # 2000..2100 inclusive
        assert outs[-1]["semiempirical"] == pytest.approx(expected, rel=1e-9)


def _build_slr_model(years, temps, ohcs, **slr_kwargs):
    from rscm_tpu.core import ModelBuilder, TimeAxis, Timeseries, VariableSchema
    from rscm_tpu.core.spatial import ScalarGrid
    from rscm_tpu.magicc.coupled import _SLR_VARS

    schema = VariableSchema()
    schema.add_variable("Surface Temperature", "K")
    schema.add_variable("Ocean Heat Content", "J/m^2")
    for name, unit in _SLR_VARS:
        schema.add_variable(name, unit)
    ta = TimeAxis.from_values(years)
    builder = (
        ModelBuilder()
        .with_time_axis(ta)
        .with_schema(schema)
        .with_component(
            SeaLevelRise(max_history_steps=len(years) + 1, **slr_kwargs)
        )
        .with_exogenous_variable(
            "Surface Temperature",
            Timeseries(np.asarray(temps)[:, None], ta, ScalarGrid(), "K"),
        )
        .with_exogenous_variable(
            "Ocean Heat Content",
            Timeseries(np.asarray(ohcs)[:, None], ta, ScalarGrid(), "J/m^2"),
        )
    )
    return builder.build()


class TestEngineIntegration:
    @pytest.mark.parametrize("method", ["levermann", "deconto"])
    def test_compiled_matches_host(self, method):
        years = np.arange(1950.0, 2051.0)
        temps, ohcs = warming_scenario(years, ramp_from=1950.0)
        host = _build_slr_model(years, temps, ohcs,
                                ais_sid_parameterisation=method)
        host.run(compiled=False)
        comp = _build_slr_model(years, temps, ohcs,
                                ais_sid_parameterisation=method)
        comp.run()
        for var in ("Sea Level Rise", "Sea Level Rise|Antarctica|SID",
                    "Sea Level Rise|Glaciers", "Sea Level Rise|Semi-Empirical"):
            h = np.asarray(
                host.timeseries().get_timeseries_by_name(var).values()
            ).ravel()
            c = np.asarray(
                comp.timeseries().get_timeseries_by_name(var).values()
            ).ravel()
            np.testing.assert_allclose(c[1:], h[1:], rtol=1e-9, atol=1e-9,
                                       err_msg=var)
        total = np.asarray(
            comp.timeseries().get_timeseries_by_name("Sea Level Rise").values()
        ).ravel()
        assert np.nanmax(total) > 10.0

    def test_coupled_magicc_graph(self):
        from rscm_tpu.magicc.coupled import build_magicc_model, idealised_emissions

        years = np.arange(1850.0, 1981.0)
        emissions = idealised_emissions(years)
        for name in ("Emissions|SOx", "Emissions|BC", "Emissions|OC"):
            values, unit = emissions[name]
            emissions[name] = (np.zeros_like(values), unit)
        model = build_magicc_model(years=years, emissions=emissions,
                                   include_slr=True)
        model.run(compiled=False)
        total = np.asarray(
            model.timeseries().get_timeseries_by_name("Sea Level Rise").values()
        ).ravel()
        expansion = np.asarray(
            model.timeseries()
            .get_timeseries_by_name("Sea Level Rise|Thermal Expansion")
            .values()
        ).ravel()
        assert np.isfinite(total[1:]).all()
        assert total[-1] > expansion[-1] * 0.5 > 0.0

    def test_ensemble_vmap(self):
        from rscm_tpu.parallel import EnsembleRunner

        years = np.arange(1950.0, 2051.0)
        temps, ohcs = warming_scenario(years, ramp_from=1950.0)
        model = _build_slr_model(years, temps, ohcs)
        runner = EnsembleRunner(model)
        params = runner.batched_params(
            {"SeaLevelRise.ais_sid_basalmelt": np.linspace(7.0, 16.0, 12)}
        )
        out = runner.run(params=params, out_vars=["Sea Level Rise"])
        slr = np.asarray(out["Sea Level Rise"])
        assert slr.shape[0] == 12
        final = np.nan_to_num(slr[:, -1]).ravel()
        assert final[-1] > final[0] > 0.0
