"""
Tutorial 12 — Beyond MAGICC7: permafrost carbon and sea level rise.

MAGICC7 documents two experimental modules it ships disabled and the
reference implementation never ported: the permafrost carbon feedback
(module_12) and sea level rise (module_14).  This framework implements
both from the documented equation sets — `Permafrost` releases CO2 and
CH4 from thawing zonal bands into the carbon budget and CH4 chemistry,
and `SeaLevelRise` diagnoses all seven SLR contributors from the climate
state.  Both are opt-in flags on ``build_magicc_model`` and compile into
the same fused scan as the rest of the graph.

Run:  python docs/tutorials/12_beyond_magicc7.py
(First compile of the extended graph takes ~1-2 min on CPU.)
"""

# Allow running from a source checkout (unnecessary once pip-installed):
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import numpy as np

from rscm_tpu.magicc.coupled import build_magicc_model, idealised_emissions

# ----------------------------------------------------------------------------
# 1. A warming scenario.  The default idealised scenario is aerosol-heavy
#    (net cooling through the 20th century); strip the aerosol forcers so
#    the permafrost thaw threshold is actually crossed within the window.
# ----------------------------------------------------------------------------
years = np.arange(1850.0, 2101.0)
emissions = idealised_emissions(years)
for name in ("Emissions|SOx", "Emissions|BC", "Emissions|OC"):
    values, unit = emissions[name]
    emissions[name] = (np.zeros_like(values), unit)

# ----------------------------------------------------------------------------
# 2. Build twice: the plain ten-component graph, and the extended graph
#    with both beyond-reference modules switched on.  The permafrost
#    component is inserted ahead of the budget/chemistry closures so its
#    CO2/CH4 release feeds them same-step (exactly where MAGICC7 adds
#    DAT_CO2PF_EMIS / DAT_CH4PF_EMIS); SeaLevelRise runs after the
#    climate component, like MAGICC7's end-of-step sealevel_calc.
# ----------------------------------------------------------------------------
base = build_magicc_model(years=years, emissions=emissions)
extended = build_magicc_model(
    years=years,
    emissions=emissions,
    include_permafrost=True,
    permafrost_params={"arctic_amplification": 2.0},
    include_slr=True,
)

base.run()       # compiled lax.scan
extended.run()


def series(model, name):
    ts = model.timeseries().get_timeseries_by_name(name)
    return np.asarray(ts.values()).ravel()


# ----------------------------------------------------------------------------
# 3. The permafrost feedback raises atmospheric CO2 and CH4 above the
#    permafrost-free run, and carbon is conserved exactly: remaining pool
#    + cumulative emissions == the initial 800 GtC (the Fortran's
#    MAX(0,..) clipping leak is deliberately fixed — module_12 doc §9.9).
# ----------------------------------------------------------------------------
co2_base = series(base, "Atmospheric Concentration|CO2")
co2_ext = series(extended, "Atmospheric Concentration|CO2")
pf_co2 = series(extended, "Emissions|CO2|Permafrost")
pf_ch4 = series(extended, "Emissions|CH4|Permafrost")
thawed = series(extended, "Permafrost|Thawed Area Fraction")

print("=== permafrost carbon feedback ===")
print(f"2100 CO2 without permafrost : {co2_base[-1]:8.1f} ppm")
print(f"2100 CO2 with permafrost    : {co2_ext[-1]:8.1f} ppm")
print(f"peak permafrost CO2 release : {np.nanmax(pf_co2):8.2f} GtC/yr")
print(f"peak permafrost CH4 release : {np.nanmax(pf_ch4):8.1f} Mt CH4/yr")
print(f"thawed area fraction by 2100: {thawed[-1]:8.3f}")
assert co2_ext[-1] > co2_base[-1]

# ----------------------------------------------------------------------------
# 4. Sea level rise: total plus the per-contributor breakdown.  Thermal
#    expansion tracks ocean heat content; Antarctic discharge uses the
#    Levermann regional impulse-response convolution by default (switch
#    with slr_params={"ais_sid_parameterisation": "deconto"}).
# ----------------------------------------------------------------------------
print("\n=== sea level rise by 2100 (mm) ===")
for name in (
    "Sea Level Rise",
    "Sea Level Rise|Thermal Expansion",
    "Sea Level Rise|Glaciers",
    "Sea Level Rise|Greenland|SMB",
    "Sea Level Rise|Greenland|SID",
    "Sea Level Rise|Antarctica|SMB",
    "Sea Level Rise|Antarctica|SID",
    "Sea Level Rise|Land Water",
    "Sea Level Rise|Semi-Empirical",
):
    print(f"{name:38s} {series(extended, name)[-1]:8.1f}")

# ----------------------------------------------------------------------------
# 5. Everything above still vmaps: sweep the Arctic amplification over an
#    ensemble exactly like any other parameter.  Build a FRESH model for
#    the runner — a runner snapshots component internal states from the
#    model's current position, so handing it the already-run `extended`
#    would start every member from 2100's thawed pools and warm ocean
#    (the runner warns if you do).
# ----------------------------------------------------------------------------
from rscm_tpu.parallel import EnsembleRunner  # noqa: E402

fresh = build_magicc_model(
    years=years,
    emissions=emissions,
    include_permafrost=True,
    permafrost_params={"arctic_amplification": 2.0},
    include_slr=True,
)
runner = EnsembleRunner(fresh)
params = runner.batched_params(
    {"Permafrost.arctic_amplification": np.linspace(1.2, 3.0, 8)}
)
out = runner.run(params=params, out_vars=["Sea Level Rise"])
finals = np.asarray(out["Sea Level Rise"])[:, -1].ravel()
print("\n=== 8-member amplification sweep: 2100 total SLR (mm) ===")
print(np.array2string(finals, precision=1))
