"""
Tutorial 5 — Debugging and inspection.

Counterpart of the reference's ``docs/notebooks/debugging_inspection.py``:
``debug_info`` (execution order, variable sources, windows), Graphviz
export, NaN diagnosis, and compiled-program cost analysis.

Run:  python docs/tutorials/05_debugging_inspection.py
"""

# Allow running from a source checkout (unnecessary once pip-installed):
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import numpy as np

from rscm_tpu.components import CO2ERF, CarbonCycle, TwoLayer
from rscm_tpu.core import ModelBuilder, TimeAxis, Timeseries, VariableSchema


def build_model():
    years = np.arange(2000.0, 2030.0)
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
    return (
        ModelBuilder()
        .with_time_axis(TimeAxis.from_values(years))
        .with_schema(schema)
        .with_component(CarbonCycle(tau=30.0, conc_pi=278.0, alpha_temperature=0.03))
        .with_component(CO2ERF(erf_2xco2=3.93, conc_pi=278.0))
        .with_component(
            TwoLayer(
                lambda0=1.1, a=0.0, efficacy=1.3, eta=0.8,
                heat_capacity_surface=8.0, heat_capacity_deep=110.0,
            )
        )
        .with_exogenous_variable(
            "Emissions|CO2|Anthropogenic",
            Timeseries.from_values(np.full(30, 10.0), np.arange(2000.0, 2030.0)),
        )
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


model = build_model()

# ----------------------------------------------------------------------------
# 1. debug_info: execution order, each component's reads (with their
#    classified source — Exogenous / UpstreamOutput / OwnState) and writes.
#    Formats: "rich" (ANSI colours), "plain", "json".
# ----------------------------------------------------------------------------
plain = model.debug_info(format="plain")
print(plain[:600])
assert "CarbonCycle" in plain and "TwoLayer" in plain

import json

info = json.loads(model.debug_info(format="json"))
assert "execution_order" in info

# ----------------------------------------------------------------------------
# 2. Graphviz export of the component graph — paste into any dot renderer.
# ----------------------------------------------------------------------------
dot = model.as_dot()
assert dot.startswith("digraph")
print("\nas_dot:", dot.splitlines()[0], f"... ({len(dot.splitlines())} lines)")

# ----------------------------------------------------------------------------
# 3. NaN diagnosis: step the host path and report the first step/variable
#    where a NaN appears (none in a healthy model).
# ----------------------------------------------------------------------------
from rscm_tpu.utils.profiling import diagnose_nans

reports = diagnose_nans(build_model())
print("NaN reports (healthy model):", reports)
assert reports == []

# A broken model: forcing the two-layer with NaN forcing from step 5 on.
years = np.arange(2000.0, 2015.0)
erf_values = np.linspace(0.0, 2.0, len(years))
erf_values[5:] = np.nan
broken = (
    ModelBuilder()
    .with_time_axis(TimeAxis.from_values(years))
    .with_component(
        TwoLayer(
            lambda0=1.1, a=0.0, efficacy=1.3, eta=0.8,
            heat_capacity_surface=8.0, heat_capacity_deep=110.0,
        )
    )
    .with_exogenous_variable(
        "Effective Radiative Forcing", Timeseries.from_values(erf_values, years)
    )
    .with_initial_values({"Surface Temperature": 0.0, "Deep Ocean Temperature": 0.0})
    .build()
)
reports = diagnose_nans(broken)
print("NaN reports (broken model):", reports[:2], "...")
assert reports, "expected NaNs to be reported"

# ----------------------------------------------------------------------------
# 4. Cost analysis of the compiled program (FLOPs / bytes estimated by XLA).
# ----------------------------------------------------------------------------
from rscm_tpu.utils.profiling import cost_analysis

cost = cost_analysis(build_model())
if cost is not None:
    interesting = {k: v for k, v in cost.items() if k in ("flops", "bytes accessed")}
    print("XLA cost analysis:", interesting)
print("OK")
