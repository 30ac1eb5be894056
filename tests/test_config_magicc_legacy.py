"""MAGICC legacy .CFG mapping tests (mirror tests/test_config_magicc_legacy.py)."""

import logging

import pytest

from rscm_tpu.config.models.magicc import (
    LEGACY_MAPPING,
    MAGICC_PARAMETERS,
    MAGICCConfig,
    ParameterStatus,
    from_legacy_dict,
    get_coverage_report,
    get_coverage_stats,
    to_legacy_dict,
)


class TestLegacyImport:
    def test_supported_parameters_map(self):
        config = from_legacy_dict(
            {
                "CORE_CLIMATESENSITIVITY": 2.5,
                "CORE_DELQ2XCO2": 3.71,
                "STARTYEAR": 1750,
                "ENDYEAR": 2100,
            }
        )
        assert config["components"]["climate"]["parameters"]["climate_sensitivity"] == 2.5
        assert config["components"]["climate"]["parameters"]["forcing_2xco2"] == 3.71
        assert config["time"]["start"] == 1750
        assert config["time"]["end"] == 2100

    def test_ghg_forcing_parameters_supported(self):
        # The rebuild implements the forcing method + rapid adjustments
        config = from_legacy_dict(
            {
                "core_co2ch4n2o_rfmethod": "OLBL",
                "core_rfrapidadjust_co2": 1.05,
            }
        )
        ghg = config["components"]["ghg_forcing"]["parameters"]
        assert ghg["method"] == "OLBL"
        assert ghg["adjust_co2"] == 1.05

    def test_not_needed_silent(self, caplog):
        with caplog.at_level(logging.INFO):
            config = from_legacy_dict({"file_co2_conc": "SSP245_CO2_CONC.IN"})
        assert config == {}
        assert "file_co2_conc" not in caplog.text

    def test_not_implemented_logged(self, caplog):
        with caplog.at_level(logging.INFO):
            from_legacy_dict({"core_amv_apply": 1})
        assert "not implemented" in caplog.text

    def test_unknown_warns(self, caplog):
        with caplog.at_level(logging.WARNING):
            from_legacy_dict({"totally_bogus_param": 1})
        assert "Unknown legacy parameter" in caplog.text

    def test_case_insensitive(self):
        config = from_legacy_dict({"Core_ClimateSensitivity": 4.5})
        assert (
            config["components"]["climate"]["parameters"]["climate_sensitivity"] == 4.5
        )


class TestLegacyExport:
    def test_roundtrip(self):
        legacy_in = {
            "core_climatesensitivity": 3.0,
            "core_delq2xco2": 3.71,
            "startyear": 1750,
            "endyear": 2100,
            "core_initial_upwelling_rate": 3.5,
        }
        config = from_legacy_dict(legacy_in)
        legacy_out = to_legacy_dict(config)
        for key, value in legacy_in.items():
            assert legacy_out[key] == value

    def test_export_skips_missing(self):
        legacy = to_legacy_dict({"time": {"start": 1850}})
        assert legacy == {"startyear": 1850}


class TestCoverage:
    def test_stats(self):
        stats = get_coverage_stats()
        assert stats["total"] == len(MAGICC_PARAMETERS)
        assert stats["SUPPORTED"] >= 20
        assert stats["total"] == sum(
            stats[s.name] for s in ParameterStatus
        )

    def test_report(self):
        report = get_coverage_report()
        assert "# MAGICC Parameter Support Report" in report
        assert "core_climatesensitivity" in report
        assert "SUPPORTED" in report

    def test_supported_have_paths(self):
        for param in MAGICC_PARAMETERS.values():
            if param.status == ParameterStatus.SUPPORTED:
                assert param.rscm_path, param.name
        assert all(path for path in LEGACY_MAPPING.values())


class TestMAGICCConfig:
    def test_defaults(self):
        config = MAGICCConfig(name="test")
        assert config.model_type == "magicc"
        assert config.climate.climate_sensitivity == 3.0
        assert config.forcing.solar_scale == 1.0
        assert config.aggregation.run_modus == "ALL"
