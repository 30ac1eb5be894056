"""
Tutorial 1 — Coupled models.

Counterpart of the reference's ``docs/notebooks/coupled_model.py``
tutorial, written for the TPU-native API: build a closed-loop
emissions → concentration → forcing → temperature model from three
components, run it on both execution paths, and read the results.

Run:  python docs/tutorials/01_coupled_model.py
"""

# Allow running from a source checkout (unnecessary once pip-installed):
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import numpy as np

from rscm_tpu.components import CO2ERF, CarbonCycle, TwoLayer
from rscm_tpu.core import ModelBuilder, TimeAxis, Timeseries, VariableSchema

# ----------------------------------------------------------------------------
# 1. A time axis: 1750-2100 annual steps.  Values are bin *starts*; the axis
#    carries len+1 bounds.
# ----------------------------------------------------------------------------
years = np.arange(1750.0, 2101.0)
time_axis = TimeAxis.from_values(years)

# ----------------------------------------------------------------------------
# 2. An emissions scenario as an exogenous timeseries (linear ramp).
# ----------------------------------------------------------------------------
emissions = Timeseries.from_values(np.linspace(0.0, 12.0, len(years)), years)

# ----------------------------------------------------------------------------
# 3. A variable schema declaring units and closing the forcing loop:
#    total "Effective Radiative Forcing" is the Sum aggregate of the
#    per-forcer contributions (here just CO2).
# ----------------------------------------------------------------------------
schema = VariableSchema()
schema.add_variable("Emissions|CO2|Anthropogenic", "GtC / yr")
schema.add_variable("Surface Temperature", "K")
schema.add_variable("Deep Ocean Temperature", "K")
schema.add_variable("Atmospheric Concentration|CO2", "ppm")
schema.add_variable("Cumulative Emissions|CO2", "Gt C")
schema.add_variable("Cumulative Land Uptake", "Gt C")
schema.add_variable("Effective Radiative Forcing|CO2", "W/m^2")
schema.add_aggregate(
    "Effective Radiative Forcing", "W/m^2", "Sum",
    ["Effective Radiative Forcing|CO2"],
)


# ----------------------------------------------------------------------------
# 4. Assemble.  Insertion order matters for variable-source classification:
#    a requirement is UpstreamOutput if an earlier component provides it,
#    Exogenous otherwise (see the state-serialisation tutorial for the
#    consequences).  Every State variable needs an initial value.
#    Models are single-shot, so wrap assembly in a function to build one per
#    run.
# ----------------------------------------------------------------------------
def build_model():
    return (
        ModelBuilder()
        .with_time_axis(time_axis)
        .with_schema(schema)
        .with_component(CarbonCycle(tau=30.0, conc_pi=278.0, alpha_temperature=0.03))
        .with_component(CO2ERF(erf_2xco2=3.93, conc_pi=278.0))
        .with_component(
            TwoLayer(
                lambda0=1.1, a=0.0, efficacy=1.3, eta=0.8,
                heat_capacity_surface=8.0, heat_capacity_deep=110.0,
            )
        )
        .with_exogenous_variable("Emissions|CO2|Anthropogenic", emissions)
        .with_initial_values(
            {
                "Surface Temperature": 0.0,
                "Deep Ocean Temperature": 0.0,
                "Atmospheric Concentration|CO2": 278.0,
                "Cumulative Emissions|CO2": 0.0,
                "Cumulative Land Uptake": 0.0,
            }
        )
        .build()
    )


# ----------------------------------------------------------------------------
# 5. Run.  `run()` compiles the whole model into one fused lax.scan program
#    (the TPU path); `run(compiled=False)` steps eagerly in float64 on the
#    host with reference-exact semantics.  Both produce the same physics.
# ----------------------------------------------------------------------------
model = build_model()
model.run()  # compiled

host_model = build_model()
host_model.run(compiled=False)

# ----------------------------------------------------------------------------
# 6. Read results.  Outputs land at index N+1; index 0 holds initial values.
# ----------------------------------------------------------------------------
temp = model.timeseries().get_data("Surface Temperature").values()[:, 0]
conc = model.timeseries().get_data("Atmospheric Concentration|CO2").values()[:, 0]
temp_host = host_model.timeseries().get_data("Surface Temperature").values()[:, 0]

print(f"2100 warming: {temp[-1]:.3f} K at {conc[-1]:.1f} ppm CO2")
assert temp[0] == 0.0 and conc[0] == 278.0  # initial values at index 0
assert temp[-1] > 1.0  # a forced ramp must warm

# The host path is always float64; the compiled path uses the device's
# precision — float64 when JAX x64 mode is on (agreement ~1e-10; the test
# suite pins this), float32 on a TPU by default (agreement ~1e-3 over 350
# integrated years).  Pick the tolerance to match.
import jax

rtol = 1e-6 if jax.config.jax_enable_x64 else 5e-3
np.testing.assert_allclose(temp, temp_host, rtol=rtol, atol=rtol)
print("compiled and host paths agree; max |diff| =",
      float(np.nanmax(np.abs(temp - temp_host))), f"(rtol {rtol})")
