"""
Tutorial 8 — Physical units.

Counterpart of the reference's ``docs/notebooks/units_tutorial.py``:
the unit grammar, dimensional analysis, conversion factors, and the
carbon-mass special case (C vs CO2).

Run:  python docs/tutorials/08_units.py
"""

# Allow running from a source checkout (unnecessary once pip-installed):
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

from rscm_tpu.core.units import Unit

# ----------------------------------------------------------------------------
# 1. Parsing.  `/` or `per` divides; adjacency, `*` or `·` multiplies;
#    exponents via `^`, `**`, or a trailing digit.
# ----------------------------------------------------------------------------
for text in ["W/m^2", "W per m2", "GtC / yr", "ppm", "W yr/m^2/K"]:
    u = Unit.parse(text)
    print(f"{text:12s} -> dimension {u.dimension()}")

assert Unit.parse("W/m^2") == Unit.parse("W per m2")

# ----------------------------------------------------------------------------
# 2. Conversion factors between compatible units.
# ----------------------------------------------------------------------------
factor = Unit.parse("MtC / yr").conversion_factor(Unit.parse("GtC / yr"))
print("MtC/yr -> GtC/yr:", factor)
assert abs(factor - 1e-3) < 1e-18

# Carbon mass vs CO2 mass: 44/12 molar-mass ratio.
factor = Unit.parse("GtC").conversion_factor(Unit.parse("GtCO2"))
print("GtC -> GtCO2:", factor)
assert abs(factor - 44.0 / 12.0) < 1e-12

# ----------------------------------------------------------------------------
# 3. Incompatible dimensions refuse to convert.
# ----------------------------------------------------------------------------
try:
    Unit.parse("W/m^2").conversion_factor(Unit.parse("K"))
    raise AssertionError("expected failure")
except Exception as e:
    print("W/m^2 -> K rejected:", type(e).__name__)

# ----------------------------------------------------------------------------
# 4. Quirk inherited from the reference grammar: a space inside a compound
#    symbol means *multiplication*.  "Gt C" is gigatonnes × carbon
#    (dimension M^2), not gigatonnes-of-carbon; write "GtC" for the latter.
# ----------------------------------------------------------------------------
spaced = Unit.parse("Gt C")
compact = Unit.parse("GtC")
print("'Gt C' dimension:", spaced.dimension(), "| 'GtC' dimension:", compact.dimension())
assert spaced.dimension() != compact.dimension()
print("OK")
