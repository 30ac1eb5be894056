"""MAGICC component unit tests — physics invariants mirroring the
reference's inline tests in ``crates/rscm-magicc/src/``."""

import numpy as np
import pytest

from rscm_tpu.magicc import (
    AerosolDirect,
    AerosolIndirect,
    CH4Chemistry,
    ClimateUDEB,
    ClimateUDEBBuilder,
    CO2Budget,
    ForcingMethod,
    GhgForcing,
    HalocarbonChemistry,
    N2OChemistry,
    OceanCarbon,
    OzoneForcing,
    TerrestrialCarbon,
)


class TestGhgForcing:
    def _ipcctar(self):
        return GhgForcing(method=ForcingMethod.Ipcctar, adjust_co2=1.0,
                          adjust_ch4=1.0, adjust_n2o=1.0)

    def _olbl(self):
        return GhgForcing(method=ForcingMethod.Olbl, adjust_co2=1.0,
                          adjust_ch4=1.0, adjust_n2o=1.0)

    def test_ipcctar_co2(self):
        c = self._ipcctar()
        assert abs(c.calculate_co2_forcing(278.0, 270.0)) < 1e-10
        assert c.calculate_co2_forcing(556.0, 270.0) == pytest.approx(3.71, abs=0.01)
        # logarithmic: 4x = 2 * 2x
        f2x = c.calculate_co2_forcing(556.0, 270.0)
        f4x = c.calculate_co2_forcing(1112.0, 270.0)
        assert f4x == pytest.approx(2 * f2x, abs=0.01)

    def test_ipcctar_ch4_n2o(self):
        c = self._ipcctar()
        assert abs(c.calculate_ch4_forcing(722.0, 270.0)) < 1e-10
        assert c.calculate_ch4_forcing(1900.0, 270.0) > 0.0
        assert abs(c.calculate_n2o_forcing(278.0, 722.0, 270.0)) < 1e-10
        assert c.calculate_n2o_forcing(278.0, 722.0, 330.0) > 0.0

    def test_olbl_zero_at_pi(self):
        c = self._olbl()
        assert abs(c.calculate_co2_forcing(278.0, 270.0)) < 1e-10
        assert abs(c.calculate_ch4_forcing(722.0, 270.0)) < 1e-10
        assert abs(c.calculate_n2o_forcing(278.0, 722.0, 270.0)) < 1e-10

    def test_olbl_modern_values(self):
        """OLBL at ~2019 concentrations gives AR6-like forcing magnitudes."""
        c = self._olbl()
        f_co2 = c.calculate_co2_forcing(410.0, 332.0)
        f_ch4 = c.calculate_ch4_forcing(1866.0, 332.0)
        f_n2o = c.calculate_n2o_forcing(410.0, 1866.0, 332.0)
        assert 1.8 < f_co2 < 2.6
        assert 0.4 < f_ch4 < 0.8
        assert 0.1 < f_n2o < 0.35

    def test_adjust_scaling(self):
        default = GhgForcing()  # OLBL with adjust 1.05/0.86/1.0
        raw = self._olbl()
        co2_adj, _, _ = default.calculate_forcings(400.0, 1800.0, 320.0)
        co2_raw, _, _ = raw.calculate_forcings(400.0, 1800.0, 320.0)
        assert co2_adj == pytest.approx(1.05 * co2_raw)


class TestCH4Chemistry:
    def test_steady_state_near_pi(self):
        c = CH4Chemistry()
        # burden/lifetime balance: emissions that hold concentration constant
        pi = c.ch4_pi
        new_conc, lifetime = c.solve_concentration(pi, pi, 0.0, 0.0, 0.0, 0.0, 0.0)
        assert 5.0 < lifetime < 12.0
        # with natural emissions only, drift should be small relative to pi
        assert abs(new_conc - pi) / pi < 0.1

    def test_higher_emissions_give_higher_concentration(self):
        c = CH4Chemistry()
        low, _ = c.solve_concentration(1800.0, 1800.0, 100.0, 0.0, 0, 0, 0)
        high, _ = c.solve_concentration(1800.0, 1800.0, 500.0, 0.0, 0, 0, 0)
        assert high > low

    def test_self_feedback_lengthens_lifetime(self):
        c = CH4Chemistry()
        _, tau_pi = c.solve_concentration(722.0, 722.0, 0.0, 0.0, 0, 0, 0)
        _, tau_high = c.solve_concentration(2000.0, 2000.0, 300.0, 0.0, 0, 0, 0)
        assert tau_high > tau_pi  # negative self-feedback exponent, ratio > 1

    def test_temperature_feedback_shortens_lifetime(self):
        c = CH4Chemistry()
        _, tau_cold = c.solve_concentration(1800.0, 1800.0, 300.0, 0.0, 0, 0, 0)
        _, tau_warm = c.solve_concentration(1800.0, 1800.0, 300.0, 2.0, 0, 0, 0)
        assert tau_warm < tau_cold


class TestN2OChemistry:
    def test_steady_state_at_pi(self):
        c = N2OChemistry()
        new_conc, lifetime = c.solve_concentration(270.0, 270.0, 270.0, 0.0, 1.0)
        assert lifetime == pytest.approx(c.tau_n2o, rel=0.01)
        assert abs(new_conc - 270.0) / 270.0 < 0.05

    def test_lifetime_decreases_with_concentration(self):
        c = N2OChemistry()
        b_ref = c.n2o_pi * c.ppb_to_tg
        tau_hi = c.calculate_effective_lifetime(330.0 * c.ppb_to_tg, b_ref)
        assert tau_hi < c.tau_n2o

    def test_emissions_increase_concentration(self):
        c = N2OChemistry()
        low, _ = c.solve_concentration(320.0, 320.0, 320.0, 0.0, 1.0)
        high, _ = c.solve_concentration(320.0, 320.0, 320.0, 10.0, 1.0)
        assert high > low


class TestHalocarbons:
    def test_exponential_decay_no_emissions(self):
        c = HalocarbonChemistry()
        cf4 = c.get_species("CF4")
        new = c.decay_species(cf4, 100.0, 0.0, 1.0)
        assert new == pytest.approx(100.0 * np.exp(-1.0 / 50000.0))

    def test_short_lived_species_decays_fast(self):
        c = HalocarbonChemistry()
        ch3br = c.get_species("CH3Br")  # lifetime 0.8 yr
        new = c.decay_species(ch3br, 10.0, 0.0, 1.0)
        assert new < 10.0 * 0.4

    def test_forcing_zero_at_pi(self):
        c = HalocarbonChemistry()
        cfc11 = c.get_species("CFC-11")
        assert c.species_forcing(cfc11, cfc11.concentration_pi) == 0.0
        assert c.species_forcing(cfc11, cfc11.concentration_pi + 1000.0) == pytest.approx(
            1000.0 * 0.295 / 1000.0
        )

    def test_species_counts(self):
        c = HalocarbonChemistry()
        assert sum(1 for s in c.species if s.group == "fgas") == 23
        assert sum(1 for s in c.species if s.group == "montreal") == 18

    def test_eesc_counts_halogens(self):
        c = HalocarbonChemistry()
        tables = c._tables()
        conc = tables["conc_pi"].copy()
        # Add CFC-11 (3 Cl, release 0.47 == normalisation -> 1.0 factor)
        idx = [s.name for s in c.species].index("CFC-11")
        conc[idx] += 100.0
        baseline = float(c.eesc_vector(tables["conc_pi"], tables).sum())
        raised = float(c.eesc_vector(conc, tables).sum())
        assert raised - baseline == pytest.approx(100.0 * 3.0)


class TestOzone:
    def test_strat_forcing(self):
        c = OzoneForcing()
        assert c.calculate_strat_forcing(c.eesc_reference) == 0.0
        assert c.calculate_strat_forcing(c.eesc_reference - 500.0) == 0.0
        f1 = c.calculate_strat_forcing(c.eesc_reference + 200.0)
        f2 = c.calculate_strat_forcing(c.eesc_reference + 400.0)
        assert f1 < 0.0 and f2 < f1
        assert f2 / f1 == pytest.approx(2.0**1.7, abs=0.01)

    def test_trop_forcing_components(self):
        c = OzoneForcing()
        assert c.calculate_trop_forcing(c.ch4_pi, 0, 0, 0) == pytest.approx(0.0)
        assert c.calculate_trop_forcing(1800.0, 40.0, 800.0, 200.0) > 0.0

    def test_temp_feedback(self):
        c = OzoneForcing()
        assert c.calculate_temp_feedback(1.0) == pytest.approx(-0.037)


class TestAerosols:
    def test_direct_species_signs(self):
        c = AerosolDirect()
        species = c.calculate_species_forcing(c.sox_pi + 50.0, c.bc_pi, c.oc_pi, c.nox_pi)
        assert species["sox"] < 0.0
        species = c.calculate_species_forcing(c.sox_pi, c.bc_pi + 5.0, c.oc_pi, c.nox_pi)
        assert species["bc"] > 0.0

    def test_direct_regional_distribution_sums_to_global(self):
        c = AerosolDirect()
        regional = c.calculate_forcing(60.0, 8.0, 30.0, 40.0)
        total = c.calculate_global_forcing(60.0, 8.0, 30.0, 40.0)
        # regional values weight-average (0.25 each) to... NO: they sum via
        # pattern fractions; the four regional entries are total * pattern_i
        # where sum(pattern_i) == 1, so the unweighted SUM equals the global.
        assert float(np.sum(regional.as_array())) == pytest.approx(total)

    def test_direct_zero_at_pi(self):
        c = AerosolDirect()
        regional = c.calculate_forcing(c.sox_pi, c.bc_pi, c.oc_pi, c.nox_pi)
        np.testing.assert_allclose(regional.as_array(), 0.0, atol=1e-12)

    def test_indirect(self):
        c = AerosolIndirect()
        assert c.calculate_forcing(c.sox_pi, c.oc_pi) == 0.0
        assert c.calculate_forcing(c.sox_pi + 50.0, c.oc_pi + 20.0) < 0.0
        # below PI -> clamped to zero
        assert c.calculate_forcing(0.0, 0.0) == 0.0


class TestTerrestrialCarbon:
    def test_steady_state_at_pi(self):
        c = TerrestrialCarbon()
        pools = (c.plant_pool_pi, c.detritus_pool_pi, c.soil_pool_pi, c.humus_pool_pi)
        new_pools, net_flux = c.solve_pools(c.co2_pi, 0.0, 0.0, pools, 1.0)
        for old, new in zip(pools, new_pools):
            assert abs(new - old) / old < 0.05
        assert abs(net_flux) < 1.0

    def test_fertilization(self):
        c = TerrestrialCarbon()
        assert c.fertilization_factor(c.co2_pi) == pytest.approx(1.0)
        assert c.fertilization_factor(2 * c.co2_pi) == pytest.approx(
            1.0 + c.beta * np.log(2.0), abs=0.01
        )

    def test_co2_increase_drives_uptake(self):
        c = TerrestrialCarbon()
        pools = (c.plant_pool_pi, c.detritus_pool_pi, c.soil_pool_pi, c.humus_pool_pi)
        _, flux_pi = c.solve_pools(c.co2_pi, 0.0, 0.0, pools, 1.0)
        _, flux_high = c.solve_pools(1.5 * c.co2_pi, 0.0, 0.0, pools, 1.0)
        assert flux_high > flux_pi  # fertilization drives net uptake

    def test_warming_drives_respiration(self):
        c = TerrestrialCarbon()
        pools = (c.plant_pool_pi, c.detritus_pool_pi, c.soil_pool_pi, c.humus_pool_pi)
        _, flux_0 = c.solve_pools(c.co2_pi, 0.0, 0.0, pools, 1.0)
        _, flux_warm = c.solve_pools(c.co2_pi, 3.0, 0.0, pools, 1.0)
        assert flux_warm < flux_0


class TestOceanCarbon:
    def test_flux_law(self):
        c = OceanCarbon()
        assert c.calculate_flux(c.pco2_pi, c.pco2_pi) == 0.0
        assert c.calculate_flux(c.pco2_pi + 100.0, c.pco2_pi) > 0.0
        f50 = c.calculate_flux(c.pco2_pi + 50.0, c.pco2_pi)
        f100 = c.calculate_flux(c.pco2_pi + 100.0, c.pco2_pi)
        assert f100 / f50 == pytest.approx(2.0)

    def test_delta_dic_convolution(self):
        c = OceanCarbon()
        empty = np.zeros(c.max_history_months)
        assert c.calculate_delta_dic(empty) == 0.0
        one_year = empty.copy()
        one_year[:12] = 1.0
        five_years = empty.copy()
        five_years[:60] = 1.0
        assert 0.0 < c.calculate_delta_dic(one_year) < c.calculate_delta_dic(five_years)

    def test_irf_decreases(self):
        c = OceanCarbon()
        assert c.irf(0.0) > c.irf(1.0) > c.irf(10.0) > c.irf(100.0)
        assert c.irf(0.0) == pytest.approx(1.0, abs=0.1)

    def test_uptake_under_elevated_co2(self):
        c = OceanCarbon()
        state = c.create_initial_state()
        flux_history, pco2, cumulative, flux = c.solve_ocean(
            state["flux_history"], 400.0, 0.0, c.pco2_pi, 0.0, 1.0
        )
        assert flux > 0.0
        assert cumulative > 0.0
        assert pco2 > c.pco2_pi  # ocean pCO2 rises as DIC accumulates

    def test_presets(self):
        for model in ("3D-GFDL", "2D-BERN", "HILDA"):
            c = OceanCarbon.from_parameters({"model": model})
            assert c.irf(5.0) > 0.0


class TestOceanCarbonExpsum:
    """Exp-sum tail engine: O(152) scan carry replacing the O(window)
    ring buffer (see OceanCarbon.engine)."""

    def test_fit_error_all_presets(self):
        for model in ("3D-GFDL", "2D-BERN", "HILDA"):
            c = OceanCarbon.from_parameters(
                {"model": model, "engine": "expsum"}
            )
            assert c._expsum_tables()["fit_rel_error"] < 1e-8, model

    def test_auto_selection(self):
        from rscm_tpu.magicc.carbon.ocean import EXPSUM_AUTO_MIN_MONTHS

        assert OceanCarbon(max_history_months=EXPSUM_AUTO_MIN_MONTHS).resolved_engine() == "expsum"
        assert OceanCarbon(max_history_months=EXPSUM_AUTO_MIN_MONTHS - 12).resolved_engine() == "ring"
        assert OceanCarbon(engine="ring").resolved_engine() == "ring"
        with pytest.raises(ValueError, match="engine"):
            OceanCarbon(engine="bogus").resolved_engine()

    def test_initial_state_shapes(self):
        from rscm_tpu.magicc.carbon.ocean import EXPSUM_TAIL_K

        c = OceanCarbon(engine="expsum")
        state = c.create_initial_state()
        assert state["flux_history"].shape == (c.expsum_young_months(),)
        assert state["tail_accum"].shape == (EXPSUM_TAIL_K,)
        assert OceanCarbon(engine="ring").create_initial_state()[
            "flux_history"
        ].shape == (6000,)

    def test_young_window_covers_kernel_switch(self):
        # the young window must reach past the early/late IRF switch —
        # the piecewise kink cannot be fitted by a smooth exp-sum tail
        for model, expected in (("3D-GFDL", 36), ("HILDA", 48), ("2D-BERN", 144)):
            c = OceanCarbon.from_parameters({"model": model})
            assert c.expsum_young_months() == expected, model
            assert c.expsum_young_months() >= c.irf_switch_time * 12

    def test_matches_ring_over_two_centuries(self):
        """Host f64, 200 years of ramped CO2/SST: the compressed tail is
        indistinguishable from the exact ring convolution (fit error
        ~1e-9 × tail share of delta-DIC ⇒ ~1e-11 on outputs)."""

        def run(engine):
            c = OceanCarbon(engine=engine, max_history_months=6000)
            state = c.create_initial_state()
            pco2, cum = c.pco2_pi, 0.0
            fluxes = []
            for i in range(200):
                co2, sst = 280.0 + 1.5 * i, 0.01 * i
                if engine == "expsum":
                    fh, tail, pco2, cum, flux = c._solve_ocean_expsum(
                        state["flux_history"], state["tail_accum"],
                        co2, sst, pco2, cum, 1.0,
                    )
                    state = {"flux_history": fh, "tail_accum": tail}
                else:
                    fh, pco2, cum, flux = c.solve_ocean(
                        state["flux_history"], co2, sst, pco2, cum, 1.0
                    )
                    state = {"flux_history": fh}
                fluxes.append(flux)
            return np.asarray(fluxes), pco2, cum

        f_ring, p_ring, c_ring = run("ring")
        f_exp, p_exp, c_exp = run("expsum")
        np.testing.assert_allclose(f_exp, f_ring, rtol=1e-9)
        assert p_exp == pytest.approx(p_ring, rel=1e-10)
        assert c_exp == pytest.approx(c_ring, rel=1e-10)


class TestCO2Budget:
    def test_mass_conservation(self):
        c = CO2Budget()
        co2_next, net, af = c.solve_budget(10.0, 0.0, 2.0, 2.0, 400.0, 1.0)
        assert net == pytest.approx(6.0)
        assert co2_next - 400.0 == pytest.approx(6.0 / c.gtc_per_ppm)
        assert af == pytest.approx(0.6)

    def test_zero_emissions_airborne_fraction(self):
        c = CO2Budget()
        _, _, af = c.solve_budget(0.0, 0.0, 1.0, 1.0, 400.0, 1.0)
        assert af == 0.0


class TestClimateUDEB:
    def test_lamcalc_convergence_and_lambda(self):
        c = ClimateUDEB()
        assert c.lambda_global() == pytest.approx(1.237, abs=0.01)
        assert c.lambda_ocean > 0.0
        assert np.isfinite(c.lambda_land)

    def test_initial_state(self):
        c = ClimateUDEB()
        state = c.create_initial_state()
        assert state["ocean_temps"].shape == (2, 50)
        np.testing.assert_allclose(state["ocean_temps"], 0.0)
        profile = state["initial_ocean_profile"][0]
        assert np.all(np.diff(profile) < 0)  # decreasing with depth
        assert profile[0] > state["initial_ocean_profile"][1][0]  # NH warmer

    def test_positive_forcing_warms(self):
        c = ClimateUDEB()
        state = c.create_initial_state()
        new_temp = c.step_hemisphere(
            state, 0, 3.71, 1.0 / 12.0, c.lambda_ocean, c.lambda_land, 0.0, 0.0,
            c.temp_adjust_alpha,
        )
        assert new_temp > 0.0

    def test_sst_to_air_amplification(self):
        c = ClimateUDEB()
        assert abs(c.sst_to_air_temperature(0.0)) < 1e-10
        t1 = c.sst_to_air_temperature(1.0)
        t5 = c.sst_to_air_temperature(5.0)
        assert t1 > 1.0
        assert t5 / 5.0 < t1 / 1.0  # amplification decreases

    def test_upwelling_slowdown(self):
        c = ClimateUDEB()
        state = c.create_initial_state()
        w0 = state["upwelling_rates"][0]
        c.update_upwelling(state, 4.0)
        assert state["upwelling_rates"][0] < w0
        c.update_upwelling(state, 10.0)
        w_min = c.w_initial * (1.0 - c.w_variable_fraction)
        assert state["upwelling_rates"][0] == pytest.approx(w_min)

    def test_builder_accepts_magicc_aliases(self):
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            c = ClimateUDEBBuilder.from_parameters(
                {"ecs": 2.5, "forcing_2xco2": 3.71}
            ).build()
        assert c.ecs == 2.5
        assert c.rf_2xco2 == 3.71


class TestUDEBEndToEnd:
    def test_erf_step_response(self):
        """Constant 3.71 W/m^2 forcing -> warming approaching but below ECS."""
        from rscm_tpu.core import GridType, ModelBuilder, TimeAxis, Timeseries, VariableSchema

        years = np.arange(1850.0, 1950.0)
        erf = np.full(len(years), 3.71)

        schema = VariableSchema()
        schema.add_variable("Effective Radiative Forcing", "W/m^2")
        schema.add_variable("Surface Temperature", "K", GridType.FourBox)
        schema.add_variable("Heat Uptake", "W/m^2")
        schema.add_variable("Ocean Heat Content", "J/m^2")
        schema.add_variable("Sea Surface Temperature", "K")

        model = (
            ModelBuilder()
            .with_time_axis(TimeAxis.from_values(years))
            .with_schema(schema)
            .with_component(ClimateUDEB())
            .with_exogenous_variable(
                "Effective Radiative Forcing", Timeseries.from_values(erf, years)
            )
            .with_initial_values({"Surface Temperature": 0.0})
            .build()
        )
        model.run()  # falls back to eager host path (UDEB not traceable)

        temps = model.collection.get_data("Surface Temperature").values()
        global_mean = temps @ np.asarray(model._grid_obj(GridType.FourBox).weights)
        # warming monotone-ish, between 1.5K (transient) and ECS-ish ceiling
        assert global_mean[-1] > 1.5
        assert global_mean[-1] < 4.5
        assert global_mean[10] < global_mean[50] < global_mean[-1]

        ohc = model.collection.get_data("Ocean Heat Content").values()[:, 0]
        assert ohc[-1] > ohc[10] > 0.0


class TestHalocarbonTableValues:
    """Spot-check the species table against published assessment values
    (WMO Ozone Assessment 2022 lifetimes, IPCC AR6 Table 7.SM.7 radiative
    efficiencies) — independent of the reference implementation."""

    def _species(self, name):
        from rscm_tpu.magicc.chemistry.halocarbon import HALOCARBON_SPECIES

        table = {s.name: s for s in HALOCARBON_SPECIES}
        assert name in table, f"{name} missing from species table"
        return table[name]

    @pytest.mark.parametrize(
        "name,lifetime,radeff",
        [
            # name, lifetime (yr), radiative efficiency (W/m^2/ppb)
            ("CFC-11", 52.0, 0.295),     # WMO 2022: 52 yr; AR6: 0.291
            ("CFC-12", 102.0, 0.364),    # WMO 2022: 102 yr; AR6: 0.358
            ("HFC-134a", 14.0, 0.16),    # AR6: 14 yr, 0.167
            ("CFC-115", 540.0, 0.20),    # WMO 2022: 540 yr
        ],
    )
    def test_published_values(self, name, lifetime, radeff):
        s = self._species(name)
        assert s.lifetime == pytest.approx(lifetime, rel=0.05)
        assert s.radiative_efficiency == pytest.approx(radeff, rel=0.10)

    def test_halogen_loadings(self):
        """Chlorine/bromine atom counts follow the molecular formulae."""
        assert self._species("CFC-11").n_cl == 3   # CCl3F
        assert self._species("CFC-12").n_cl == 2   # CCl2F2
        assert self._species("HFC-134a").n_cl == 0 # no halogen for EESC

    def test_molecular_weights(self):
        assert self._species("CFC-11").molecular_weight == pytest.approx(137.4, rel=0.01)
        assert self._species("HFC-134a").molecular_weight == pytest.approx(102.0, rel=0.01)


class TestOceanCircularLayout:
    """The traced path keeps the flux history in a circular layout (no
    per-year shift); the host-visible contract stays newest-first via the
    pack/unpack hooks.  Both trajectories and the final state must match
    the eager newest-first path — including after buffer wraparound."""

    def _build(self, years, max_history_months=6000):
        from rscm_tpu.core import ModelBuilder, TimeAxis, Timeseries, VariableSchema

        schema = VariableSchema()
        schema.add_variable("Atmospheric Concentration|CO2", "ppm")
        schema.add_variable("Sea Surface Temperature", "K")
        schema.add_variable("Ocean Surface pCO2", "ppm")
        schema.add_variable("Cumulative Ocean Uptake", "GtC")
        schema.add_variable("Carbon Flux|Ocean", "GtC/yr")
        return (
            ModelBuilder()
            .with_time_axis(TimeAxis.from_values(years))
            .with_schema(schema)
            .with_component(OceanCarbon(max_history_months=max_history_months))
            .with_exogenous_variable(
                "Atmospheric Concentration|CO2",
                Timeseries.from_values(
                    280.0 + 1.5 * np.arange(len(years)), years
                ),
            )
            .with_exogenous_variable(
                "Sea Surface Temperature",
                Timeseries.from_values(0.01 * np.arange(len(years)), years),
            )
            .with_initial_values(
                {"Ocean Surface pCO2": 278.0, "Cumulative Ocean Uptake": 0.0}
            )
            .build()
        )

    def test_eager_steps_then_compiled_resume(self):
        """Entering the scan mid-run (start_idx > 0) is the only case
        where the pack rotation c0 = start_idx * 12 is nonzero: step a few
        years eagerly (building a real newest-first history), then finish
        compiled, and compare against a fully-eager run."""
        years = np.arange(2000.0, 2030.0)
        mixed = self._build(years, 120)
        for _ in range(7):
            mixed.step()
        mixed.run(compiled=True)

        host = self._build(years, 120)
        host.run(compiled=False)

        for name in ("Ocean Surface pCO2", "Cumulative Ocean Uptake"):
            np.testing.assert_allclose(
                mixed.collection.get_data(name).values(),
                host.collection.get_data(name).values(),
                rtol=1e-10, atol=1e-12, err_msg=name,
            )
        node = mixed.exec_order[1]
        np.testing.assert_allclose(
            mixed.component_states[node]["flux_history"],
            host.component_states[node]["flux_history"],
            rtol=1e-10, atol=1e-12,
        )

    @pytest.mark.parametrize("max_history,n_years", [(6000, 40), (36, 20)])
    def test_compiled_matches_host_including_state(self, max_history, n_years):
        # max_history=36 months over 20 years forces several wraparounds
        years = np.arange(2000.0, 2000.0 + n_years)
        comp = self._build(years, max_history)
        comp.run(compiled=True)
        host = self._build(years, max_history)
        host.run(compiled=False)

        for name in ("Ocean Surface pCO2", "Cumulative Ocean Uptake",
                     "Carbon Flux|Ocean"):
            np.testing.assert_allclose(
                comp.collection.get_data(name).values(),
                host.collection.get_data(name).values(),
                rtol=1e-10, atol=1e-12, err_msg=name,
            )

        # the final host-visible flux history must be newest-first again
        node = comp.exec_order[1]
        np.testing.assert_allclose(
            comp.component_states[node]["flux_history"],
            host.component_states[node]["flux_history"],
            rtol=1e-10, atol=1e-12,
        )


class TestMagicc7ChemistryExtensions:
    """MAGICC7-mode CH4/N2O: NITROUS/METHANE iteration layout, budget
    closure, wetland feedback, prescribed-concentration switch."""

    def test_ch4_magicc7_scheme_differs_from_reference(self):
        from rscm_tpu.magicc.chemistry.ch4 import CH4Chemistry

        ref = CH4Chemistry()
        m7 = CH4Chemistry(scheme="magicc7")
        a, _ = ref.solve_concentration(1800.0, 1820.0, 300.0, 0.5, 10, 500, 100)
        b, _ = m7.solve_concentration(1800.0, 1820.0, 300.0, 0.5, 10, 500, 100)
        # magicc7 layout bases the update on the current concentration
        assert a != b
        assert abs(a - b) < 50.0  # same physics, different discretisation

    def test_ch4_wetland_feedback_raises_concentration(self):
        from rscm_tpu.magicc.chemistry.ch4 import CH4Chemistry

        base = CH4Chemistry(scheme="magicc7")
        wet = CH4Chemistry(scheme="magicc7", wetland_slope=22.4)
        a, _ = base.solve_concentration(1800.0, 1800.0, 300.0, 2.0, 0, 0, 0)
        b, _ = wet.solve_concentration(1800.0, 1800.0, 300.0, 2.0, 0, 0, 0)
        assert b > a
        # zero slope must contribute exactly nothing (incl. no NaN leak);
        # temp feedback disabled so the wetland term is the only path a
        # NaN temperature could reach the concentration through
        c, _ = CH4Chemistry(
            scheme="magicc7", wetland_slope=0.0, include_temp_feedback=False
        ).solve_concentration(1800.0, 1800.0, 300.0, np.nan, 0, 0, 0)
        assert np.isfinite(c)

    def test_ch4_budget_closure_balances_pi(self):
        from rscm_tpu.magicc.chemistry.ch4 import (
            CH4Chemistry,
            natural_emissions_budget,
        )

        # constant concentration + zero anthro => e_nat = B*(1/tau_oh+1/tau_other)
        conc = np.full(20, 722.0)
        c = CH4Chemistry()
        tau_other = c.tau_other()
        e_nat = natural_emissions_budget(
            conc, np.zeros(20), c.tau_oh, tau_other, c.ppb_to_tg
        )
        expected = 722.0 * c.ppb_to_tg * (1 / c.tau_oh + 1 / tau_other)
        assert e_nat == pytest.approx(expected, rel=1e-12)

    def test_n2o_budget_closure_balances_pi(self):
        from rscm_tpu.magicc.chemistry.n2o import (
            N2OChemistry,
            n2o_natural_emissions_budget,
        )

        conc = np.full(20, 270.0)
        c = N2OChemistry()
        e_nat = n2o_natural_emissions_budget(
            conc, np.zeros(20), c.tau_n2o, c.ppb_to_tg
        )
        assert e_nat == pytest.approx(270.0 * c.ppb_to_tg / c.tau_n2o, rel=1e-12)

    def _prescribed_model(self, years, prescribed, until):
        from rscm_tpu.core import ModelBuilder, TimeAxis, Timeseries
        from rscm_tpu.magicc.chemistry.ch4 import CH4Chemistry

        n = len(years)
        comp = CH4Chemistry(
            scheme="magicc7",
            prescribed_concentrations=prescribed,
            prescribed_until=until,
        )
        builder = (
            ModelBuilder()
            .with_time_axis(TimeAxis.from_values(years))
            .with_component(comp)
            .with_initial_values(
                {"Atmospheric Concentration|CH4": float(prescribed[0])}
            )
        )
        for name, values in [
            ("Emissions|CH4", np.full(n, 300.0)),
            ("Surface Temperature", np.full(n, 0.5)),
            ("Emissions|NOx", np.zeros(n)),
            ("Emissions|CO", np.zeros(n)),
            ("Emissions|NMVOC", np.zeros(n)),
        ]:
            builder = builder.with_exogenous_variable(
                name, Timeseries.from_values(values, years)
            )
        return builder.build()

    def test_prescribed_switch_host_and_compiled(self):
        """Prescribed values verbatim until the switch year, Prather after;
        host and fused-scan paths agree."""
        years = np.arange(2000.0, 2010.0)
        prescribed = np.linspace(1700.0, 1790.0, len(years))
        until = 2004.0

        host = self._prescribed_model(years, prescribed, until)
        host.run(compiled=False)
        h = np.asarray(
            host.timeseries()
            .get_timeseries_by_name("Atmospheric Concentration|CH4")
            .values()
        ).reshape(len(years))

        comp = self._prescribed_model(years, prescribed, until)
        comp.run(compiled=True)
        c = np.asarray(
            comp.timeseries()
            .get_timeseries_by_name("Atmospheric Concentration|CH4")
            .values()
        ).reshape(len(years))

        # indices 1..4 cover years 2001..2004 (<= until): verbatim
        np.testing.assert_allclose(h[1:5], prescribed[1:5], rtol=0, atol=0)
        # after the switch the Prather update must take over (diverges)
        assert abs(h[6] - prescribed[6]) > 1.0
        np.testing.assert_allclose(c, h, rtol=1e-6)


def test_ocean_bf16_history_close_to_f32():
    """history_dtype='bfloat16' (half-traffic production mode) stays
    within ~1e-3 of the float32 history on a coupled run: the convolution
    accumulates in f32 and the ~N-term sum averages the storage rounding
    down (see OceanCarbon.history_dtype)."""
    import jax

    from rscm_tpu.magicc.coupled import build_magicc_model

    years = np.arange(1900.0, 1981.0)

    def run(history_dtype):
        model = build_magicc_model(
            years=years, ocean_params={"history_dtype": history_dtype}
        )
        model.run(compiled=True)
        ts = model.timeseries()
        return (
            np.asarray(ts.get_timeseries_by_name("Atmospheric Concentration|CO2").values()),
            np.asarray(ts.get_timeseries_by_name("Carbon Flux|Ocean").values()),
        )

    co2_32, flux_32 = run("float32")
    co2_16, flux_16 = run("bfloat16")
    co2_drift = np.max(np.abs(co2_16 - co2_32)) / np.max(np.abs(co2_32))
    flux_drift = np.max(np.abs(flux_16[1:] - flux_32[1:])) / np.max(
        np.abs(flux_32[1:])
    )
    assert co2_drift < 1e-3, f"bf16 history CO2 drift {co2_drift:.2e}"
    assert flux_drift < 5e-3, f"bf16 history flux drift {flux_drift:.2e}"


class TestChemistrySchemeAutoSelection:
    """build_magicc_model auto-selects the accurate MAGICC7-mode CH4/N2O
    schemes whenever concentration records are supplied (VERDICT r3 #6:
    'beats should be the default, or auto-selected when the budget-closure
    inputs exist')."""

    def _components_by_name(self, model):
        return {
            getattr(c, "component_name", type(c).__name__): c
            for node in model.exec_order
            for c in [model.graph.nodes[node]]
        }

    def test_pathways_select_magicc7_scheme(self):
        from rscm_tpu.magicc.coupled import build_magicc_model

        years = np.arange(1850.0, 1881.0)
        ch4 = np.linspace(790.0, 900.0, len(years))
        n2o = np.linspace(275.0, 281.0, len(years))
        model = build_magicc_model(
            years=years, chemistry_pathways={"ch4": ch4, "n2o": n2o}
        )
        comps = self._components_by_name(model)
        assert comps["CH4Chemistry"].scheme == "magicc7"
        assert comps["N2OChemistry"].scheme == "magicc7"
        # prescribed until the MAGICC7 switch year; initial values follow
        # the observed records
        assert comps["CH4Chemistry"].prescribed_until is not None
        conc0 = model.collection.get_data(
            "Atmospheric Concentration|CH4"
        ).values()[0, 0]
        assert conc0 == pytest.approx(ch4[0])

    def test_no_pathways_keeps_reference_scheme(self):
        from rscm_tpu.magicc.coupled import build_magicc_model

        model = build_magicc_model(years=np.arange(1850.0, 1860.0))
        comps = self._components_by_name(model)
        assert comps["CH4Chemistry"].scheme == "reference"
        assert comps["N2OChemistry"].scheme == "reference"

    def test_pathways_compose_with_permafrost(self):
        from rscm_tpu.magicc.coupled import build_magicc_model

        years = np.arange(1850.0, 1881.0)
        ch4 = np.linspace(790.0, 900.0, len(years))
        n2o = np.linspace(275.0, 281.0, len(years))
        model = build_magicc_model(
            years=years,
            include_permafrost=True,
            chemistry_pathways={"ch4": ch4, "n2o": n2o},
        )
        comps = self._components_by_name(model)
        ch4_comp = comps["CH4ChemistryWithPermafrost"]
        assert ch4_comp.scheme == "magicc7"
        model.run()
        vals = model.collection.get_data(
            "Atmospheric Concentration|CH4"
        ).values()
        assert np.all(np.isfinite(vals[1:]))
