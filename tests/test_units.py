"""Unit-system tests — behaviours mirror ``crates/rscm-core/src/units/`` tests."""

import pytest

from rscm_tpu.core.units import (
    UNIT_REGISTRY,
    ConversionError,
    Dimension,
    ParsedUnit,
    ParseError,
    Unit,
    conversion_factor,
    units_equal,
)
from rscm_tpu.core.units.registry import C_TO_CO2_RATIO


class TestRegistry:
    def test_base_units(self):
        assert UNIT_REGISTRY.lookup("kg").dimension == Dimension.MASS
        assert UNIT_REGISTRY.lookup("kg").to_si_factor == 1.0
        assert UNIT_REGISTRY.lookup("m").dimension == Dimension.LENGTH

    def test_prefixed(self):
        km = UNIT_REGISTRY.lookup("km")
        assert km.dimension == Dimension.LENGTH
        assert km.to_si_factor == pytest.approx(1e3)
        gw = UNIT_REGISTRY.lookup("GW")
        assert gw.dimension == Dimension.POWER
        assert gw.to_si_factor == pytest.approx(1e9)

    def test_carbon_units(self):
        assert UNIT_REGISTRY.lookup("GtC").to_si_factor == pytest.approx(1e12)
        assert UNIT_REGISTRY.lookup("GtCO2").to_si_factor == pytest.approx(
            1e12 * C_TO_CO2_RATIO
        )
        assert UNIT_REGISTRY.lookup("PgC").to_si_factor == pytest.approx(1e12)

    def test_aliases(self):
        assert UNIT_REGISTRY.lookup("year").name == "yr"
        assert UNIT_REGISTRY.lookup("celsius").name == "degC"
        assert UNIT_REGISTRY.lookup("dimensionless").name == "1"

    def test_unknown(self):
        assert UNIT_REGISTRY.lookup("xyzzy") is None


class TestParser:
    def test_simple(self):
        assert ParsedUnit.parse("W").components() == {"W": 1}

    def test_exponent_forms(self):
        for text in ["m^2", "m**2", "m2", "m ^ 2"]:
            assert ParsedUnit.parse(text).components() == {"m": 2}, text

    def test_division_forms(self):
        for text in ["W/m^2", "W m^-2", "W per m ^ 2", "W / m ^ 2"]:
            assert ParsedUnit.parse(text).components() == {"W": 1, "m": -2}, text

    def test_multiplication_forms(self):
        for text in ["kg m", "kg*m", "kg · m"]:
            assert ParsedUnit.parse(text).components() == {"kg": 1, "m": 1}, text

    def test_parentheses(self):
        assert ParsedUnit.parse("W/(m^2 K)").components() == {"W": 1, "m": -2, "K": -1}

    def test_dimensionless(self):
        assert ParsedUnit.parse("1").has_no_components()
        assert ParsedUnit.parse("dimensionless").has_no_components()

    def test_normalized(self):
        assert ParsedUnit.parse("W/m^2").normalized() == "W / m^2"
        assert Unit("W yr / m^2").normalized() == "W yr / m^2"

    def test_compound_unit_with_trailing_digits(self):
        # CO2 contains a digit but is a registered unit symbol
        assert ParsedUnit.parse("GtCO2/yr").components() == {"GtCO2": 1, "yr": -1}

    def test_empty_errors(self):
        with pytest.raises(ParseError):
            ParsedUnit.parse("")

    def test_mixed(self):
        assert ParsedUnit.parse("Gt C / yr").components() == {"Gt": 1, "C": 1, "yr": -1}


class TestUnit:
    def test_equality(self):
        assert Unit("W/m^2") == Unit("W / m ^ 2")
        assert Unit("W/m^2") == Unit("W m^-2")
        assert Unit("W/m^2") != Unit("W/m")

    def test_compatibility(self):
        assert Unit("GtC/yr").is_compatible(Unit("MtCO2/yr"))
        assert not Unit("GtC/yr").is_compatible(Unit("W/m^2"))

    def test_conversion_gtc_mtco2(self):
        factor = Unit("GtC/yr").conversion_factor(Unit("MtCO2/yr"))
        # 1 GtC = 1000 MtC = 1000 * 44/12 MtCO2
        assert factor == pytest.approx(1000.0 * 44.0 / 12.0)

    def test_conversion_identity(self):
        assert Unit("W/m^2").conversion_factor(Unit("W / m^2")) == pytest.approx(1.0)

    def test_gt_c_spaced_is_mass_squared(self):
        # Reference quirk preserved: "Gt C" parses as Gt * C (two mass
        # units multiplied -> M^2) and is therefore NOT compatible with
        # "GtC" (single registered symbol, M). Components use these strings
        # consistently so no conversion is ever required between them.
        with pytest.raises(ConversionError):
            conversion_factor("Gt C", "GtC")

    def test_incompatible_raises(self):
        with pytest.raises(ConversionError, match="incompatible dimensions"):
            Unit("GtC").conversion_factor(Unit("W"))

    def test_convert_value(self):
        assert Unit("kg").convert(1.0, Unit("g")) == pytest.approx(1000.0)

    def test_ppm_family(self):
        assert Unit("ppm").conversion_factor(Unit("ppb")) == pytest.approx(1000.0)
        assert Unit("ppm").is_dimensionless()

    def test_time_units(self):
        assert Unit("yr").conversion_factor(Unit("day")) == pytest.approx(365.25)

    def test_units_equal_helper(self):
        assert units_equal("W/m^2", "W m^-2")
