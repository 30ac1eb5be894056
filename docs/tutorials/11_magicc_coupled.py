"""
Tutorial 11 — The full MAGICC-style coupled model.

The capstone model family: ten components — CH4/N2O chemistry, GHG,
ozone and aerosol forcing, the 2×50-layer upwelling-diffusion climate
(ClimateUDEB), terrestrial + ocean carbon, and the CO2 budget closure —
wired into one emissions-driven graph, compiled into a single fused XLA
program, and swept as an ECS ensemble.

Run:  python docs/tutorials/11_magicc_coupled.py
(First compile of the full graph takes ~1 min on CPU, longer on a
tunnelled TPU.)
"""

# Allow running from a source checkout (unnecessary once pip-installed):
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import numpy as np

from rscm_tpu.core import (
    GridType,
    ModelBuilder,
    TimeAxis,
    Timeseries,
    VariableSchema,
)
from rscm_tpu.core.spatial import ScalarGrid
from rscm_tpu.magicc import (
    AerosolDirect,
    AerosolIndirect,
    CH4Chemistry,
    ClimateUDEB,
    CO2Budget,
    GhgForcing,
    N2OChemistry,
    OceanCarbon,
    OzoneForcing,
    TerrestrialCarbon,
)

# ----------------------------------------------------------------------------
# 1. An idealised emissions scenario, 1850-2100: fossil CO2 ramps up and
#    peaks mid-century; short-lived forcer emissions scale with it.
# ----------------------------------------------------------------------------
years = np.arange(1850.0, 2101.0)
n = len(years)
t = (years - years[0]) / (years[-1] - years[0])
fossil = 10.0 * np.exp(-0.5 * ((t - 0.75) / 0.25) ** 2) * t * 2.0   # GtC/yr
scale = fossil / max(fossil.max(), 1e-9)

EMISSIONS = {
    "Emissions|CO2|Fossil": (fossil, "GtC/yr"),
    "Emissions|CO2|Land Use": (1.0 * (1.0 - t), "GtC/yr"),
    "Emissions|CH4": (100.0 + 250.0 * scale, "Mt CH4/yr"),
    "Emissions|N2O": (5.0 + 5.0 * scale, "Mt N/yr"),
    "Emissions|NOx": (10.0 + 30.0 * scale, "Mt N/yr"),
    "Emissions|CO": (200.0 + 600.0 * scale, "Mt CO/yr"),
    "Emissions|NMVOC": (60.0 + 120.0 * scale, "Mt NMVOC/yr"),
    "Emissions|SOx": (2.0 + 100.0 * scale, "Mt S/yr"),
    "Emissions|BC": (1.0 + 6.0 * scale, "Mt BC/yr"),
    "Emissions|OC": (5.0 + 25.0 * scale, "Mt OC/yr"),
    "EESC": (np.zeros(n), "ppt"),
}

INITIAL = {
    "Atmospheric Concentration|CO2": 284.0,
    "Atmospheric Concentration|CH4": 790.0,
    "Atmospheric Concentration|N2O": 275.0,
    "Surface Temperature": 0.0,
    "Ocean Surface pCO2": 284.0,
    "Cumulative Ocean Uptake": 0.0,
    "Carbon Pool|Plant": 884.86,
    "Carbon Pool|Detritus": 92.77,
    "Carbon Pool|Soil": 1681.53,
    "Carbon Pool|Humus": 836.0,
}


# ----------------------------------------------------------------------------
# 2. The schema declares every variable once and closes the forcing loop:
#    total ERF is the Sum aggregate over the eight forcing contributions.
# ----------------------------------------------------------------------------
def build_schema():
    schema = VariableSchema()
    scalar_vars = [
        ("Atmospheric Concentration|CO2", "ppm"),
        ("Atmospheric Concentration|CH4", "ppb"),
        ("Atmospheric Concentration|N2O", "ppb"),
        ("Heat Uptake", "W/m^2"),
        ("Ocean Heat Content", "J/m^2"),
        ("Sea Surface Temperature", "K"),
        ("Carbon Flux|Terrestrial", "GtC/yr"),
        ("Carbon Flux|Ocean", "GtC/yr"),
        ("Carbon Pool|Plant", "GtC"),
        ("Carbon Pool|Detritus", "GtC"),
        ("Carbon Pool|Soil", "GtC"),
        ("Carbon Pool|Humus", "GtC"),
        ("Ocean Surface pCO2", "ppm"),
        ("Cumulative Ocean Uptake", "GtC"),
        ("Emissions|CO2|Net", "GtC/yr"),
        ("Airborne Fraction|CO2", "1"),
        ("Lifetime|CH4", "yr"),
        ("Lifetime|N2O", "yr"),
    ]
    forcers = [
        "Effective Radiative Forcing|CO2",
        "Effective Radiative Forcing|CH4",
        "Effective Radiative Forcing|N2O",
        "Effective Radiative Forcing|O3|Stratospheric",
        "Effective Radiative Forcing|O3|Tropospheric",
        "Effective Radiative Forcing|O3|Temperature Feedback",
        "Effective Radiative Forcing|Aerosol|Direct",
        "Effective Radiative Forcing|Aerosol|Indirect",
    ]
    for name, (_, unit) in EMISSIONS.items():
        schema.add_variable(name, unit)
    for name, unit in scalar_vars:
        schema.add_variable(name, unit)
    for name in forcers:
        schema.add_variable(name, "W/m^2")
    schema.add_variable("Surface Temperature", "K", GridType.FourBox)
    schema.add_aggregate("Effective Radiative Forcing", "W/m^2", "Sum", forcers)
    return schema


def build_model(ecs=3.0):
    time_axis = TimeAxis.from_values(years)
    builder = (
        ModelBuilder()
        .with_time_axis(time_axis)
        .with_schema(build_schema())
        .with_component(CH4Chemistry(ch4_pi=INITIAL["Atmospheric Concentration|CH4"]))
        .with_component(N2OChemistry(n2o_pi=INITIAL["Atmospheric Concentration|N2O"]))
        .with_component(
            GhgForcing(
                method="Ipcctar",
                co2_pi=INITIAL["Atmospheric Concentration|CO2"],
                ch4_pi=INITIAL["Atmospheric Concentration|CH4"],
                n2o_pi=INITIAL["Atmospheric Concentration|N2O"],
                adjust_co2=1.0, adjust_ch4=1.0, adjust_n2o=1.0,
            )
        )
        .with_component(OzoneForcing())
        .with_component(AerosolDirect())
        .with_component(AerosolIndirect())
        .with_component(ClimateUDEB(ecs=ecs))
        .with_component(TerrestrialCarbon())
        .with_component(OceanCarbon())
        .with_component(CO2Budget())
    )
    for name, (values, unit) in EMISSIONS.items():
        builder = builder.with_exogenous_variable(
            name, Timeseries(np.asarray(values)[:, None], time_axis, ScalarGrid(), unit)
        )
    return builder.with_initial_values(INITIAL).build()


# ----------------------------------------------------------------------------
# 3. Run the whole ten-component graph as one compiled program.
# ----------------------------------------------------------------------------
model = build_model()
model.run()

ts = model.timeseries()
co2 = ts.get_data("Atmospheric Concentration|CO2").values()[:, 0]
erf = ts.get_data("Effective Radiative Forcing").values()[:, 0]
sst = ts.get_data("Sea Surface Temperature").values()[:, 0]
airborne = ts.get_data("Airborne Fraction|CO2").values()[:, 0]

print(f"2100: CO2 = {co2[-1]:.0f} ppm, total ERF = {erf[-1]:.2f} W/m^2, "
      f"SST anomaly = {sst[-1]:.2f} K, airborne fraction = {airborne[-1]:.2f}")
assert 400.0 < co2[-1] < 900.0
assert np.isfinite(erf[-1]) and erf[-1] > 1.0
assert 0.5 < sst[-1] < 6.0

# ----------------------------------------------------------------------------
# 4. ECS ensemble over the full graph: the whole ten-component model is one
#    program with ECS as a traced leaf, so the sweep is a vmap.
# ----------------------------------------------------------------------------
from rscm_tpu.parallel import EnsembleRunner

runner = EnsembleRunner(build_model())
ecs_values = np.array([2.0, 3.0, 4.5])
params = runner.batched_params({"ClimateUDEB.ecs": ecs_values})
out = runner.run(params=params, out_vars=["Sea Surface Temperature"])
sst_2100 = np.asarray(out["Sea Surface Temperature"])[:, -1, 0]
for e, s in zip(ecs_values, sst_2100):
    print(f"  ECS {e:.1f} K -> 2100 SST anomaly {s:.2f} K")
assert sst_2100[0] < sst_2100[1] < sst_2100[2]
print("OK")
