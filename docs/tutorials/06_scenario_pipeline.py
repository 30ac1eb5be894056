"""
Tutorial 6 — Scenario pipelines and ensembles.

Counterpart of the reference's ``docs/notebooks/scenario_pipeline.py``,
extended with the TPU-native ensemble machinery: run one model over many
scenarios *and* many parameter sets in a single compiled program —
`vmap` over the batch axis replaces the reference's rayon thread pool.

Run:  python docs/tutorials/06_scenario_pipeline.py
"""

# Allow running from a source checkout (unnecessary once pip-installed):
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import numpy as np

from rscm_tpu.components import CO2ERF, CarbonCycle, TwoLayer
from rscm_tpu.core import ModelBuilder, TimeAxis, Timeseries, VariableSchema
from rscm_tpu.parallel import EnsembleRunner

years = np.arange(2015.0, 2101.0)
n_years = len(years)

# ----------------------------------------------------------------------------
# 1. Three emissions scenarios (SSP-flavoured shapes).
# ----------------------------------------------------------------------------
t = np.linspace(0.0, 1.0, n_years)
scenarios = {
    "low":    10.0 * np.clip(1.0 - 1.6 * t, 0.0, None),       # rapid decline
    "medium": 10.0 * (1.0 - 0.6 * t),                          # slow decline
    "high":   10.0 * (1.0 + 0.8 * t),                          # growth
}


def build_model(emissions):
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
            "Emissions|CO2|Anthropogenic", Timeseries.from_values(emissions, years)
        )
        .with_initial_values(
            {
                "Surface Temperature": 1.2,   # 2015 warming level
                "Deep Ocean Temperature": 0.6,
                "Atmospheric Concentration|CO2": 400.0,
                "Cumulative Emissions|CO2": 600.0,
                "Cumulative Land Uptake": 180.0,
            }
        )
        .build()
    )


# ----------------------------------------------------------------------------
# 2. Scenario sweep, one compiled program: EnsembleRunner accepts *batched
#    exogenous* arrays — member i runs scenario i.  The model compiles once;
#    the batch axis is vmapped.
# ----------------------------------------------------------------------------
model = build_model(scenarios["medium"])
runner = EnsembleRunner(model)

names = list(scenarios)
batched_emissions = np.stack([scenarios[n][:, None] for n in names])  # (B, T, 1)
params = runner.batched_params(
    {"TwoLayer.lambda0": np.full(len(names), 1.1)}  # any (B,) array sets B
)
out = runner.run(
    params=params,
    exo={"Emissions|CO2|Anthropogenic": batched_emissions},
    out_vars=["Surface Temperature"],
)
temps_2100 = np.asarray(out["Surface Temperature"])[:, -1, 0]
for name, t2100 in zip(names, temps_2100):
    print(f"scenario {name:7s}: {t2100:5.2f} K in 2100")
assert temps_2100[0] < temps_2100[1] < temps_2100[2]

# ----------------------------------------------------------------------------
# 3. Scenario × parameter grid: cross three scenarios with 100 climate
#    sensitivities = 300 members, still one program.
# ----------------------------------------------------------------------------
rng = np.random.default_rng(0)
n_params = 100
lambdas = rng.uniform(0.7, 1.8, n_params)

B = len(names) * n_params
grid_emissions = np.repeat(batched_emissions, n_params, axis=0)          # (B, T, 1)
grid_lambdas = np.tile(lambdas, len(names))                              # (B,)
params = runner.batched_params({"TwoLayer.lambda0": grid_lambdas})
out = runner.run(
    params=params,
    exo={"Emissions|CO2|Anthropogenic": grid_emissions},
    out_vars=["Surface Temperature"],
)
grid_2100 = np.asarray(out["Surface Temperature"])[:, -1, 0].reshape(len(names), n_params)
for name, row in zip(names, grid_2100):
    print(f"scenario {name:7s}: 2100 warming 5-95% = "
          f"{np.percentile(row, 5):.2f}-{np.percentile(row, 95):.2f} K")
assert np.all(np.isfinite(grid_2100))
print("OK")
