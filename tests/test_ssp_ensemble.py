"""Combined parameter x scenario ensembles (BASELINE config #4 shape:
N-member parameter ensemble over multiple SSP emission scenarios)."""

import numpy as np

from tests.test_model import TWO_LAYER_PARAMS
from rscm_tpu.components import CO2ERF, CarbonCycle, TwoLayer
from rscm_tpu.core import ModelBuilder, TimeAxis, Timeseries, VariableSchema
from rscm_tpu.parallel import EnsembleRunner


def build_coupled(years, emissions):
    schema = VariableSchema()
    for name, unit in [
        ("Emissions|CO2|Anthropogenic", "GtC / yr"),
        ("Surface Temperature", "K"),
        ("Deep Ocean Temperature", "K"),
        ("Atmospheric Concentration|CO2", "ppm"),
        ("Cumulative Emissions|CO2", "Gt C"),
        ("Cumulative Land Uptake", "Gt C"),
        ("Effective Radiative Forcing|CO2", "W/m^2"),
    ]:
        schema.add_variable(name, unit)
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
        .with_component(TwoLayer(**TWO_LAYER_PARAMS))
        .with_exogenous_variable(
            "Emissions|CO2|Anthropogenic", Timeseries.from_values(emissions, years)
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


def make_ssp_like_scenarios(years, n_scenarios=8):
    """Stylised SSP family: emission pathways from strong mitigation to
    high-growth, (S, n_years, 1)."""
    ramp = np.linspace(0.0, 1.0, len(years))
    peaks = np.linspace(2.0, 30.0, n_scenarios)
    declines = np.linspace(0.9, 0.0, n_scenarios)
    scenarios = []
    for peak, decline in zip(peaks, declines):
        path = peak * np.sin(np.pi * np.clip(ramp / (1.0 - 0.4 * decline), 0, 1))
        scenarios.append(np.maximum(path, 0.0)[:, None])
    return np.stack(scenarios)


def test_parameter_by_scenario_ensemble():
    years = np.arange(2000.0, 2101.0)
    n_members, n_scenarios = 25, 8
    scenarios = make_ssp_like_scenarios(years, n_scenarios)

    model = build_coupled(years, np.zeros(len(years)))
    runner = EnsembleRunner(model)

    rng = np.random.default_rng(0)
    member_params = {
        "TwoLayer.lambda0": rng.uniform(0.8, 1.8, n_members),
        "CarbonCycle.tau": rng.uniform(15.0, 60.0, n_members),
    }

    # full cross product: tile members over scenarios
    batch = n_members * n_scenarios
    params = runner.batched_params(
        {k: np.tile(v, n_scenarios) for k, v in member_params.items()}
    )
    exo = {
        "Emissions|CO2|Anthropogenic": np.repeat(scenarios, n_members, axis=0)
    }
    out = runner.run(
        params=params, exo=exo,
        out_vars=["Surface Temperature", "Atmospheric Concentration|CO2"],
    )
    temps = np.asarray(out["Surface Temperature"]).reshape(
        n_scenarios, n_members, len(years)
    )
    conc = np.asarray(out["Atmospheric Concentration|CO2"]).reshape(
        n_scenarios, n_members, len(years)
    )

    assert np.all(np.isfinite(temps[:, :, 1:]))
    # scenario ordering: higher emissions -> more warming, for every member
    end_temp_by_scenario = temps[:, :, -1]
    assert np.all(end_temp_by_scenario[-1] > end_temp_by_scenario[0])
    # concentrations stay above pre-industrial
    assert np.all(conc[:, :, 1:] >= 277.9)

    # spot-check one (scenario, member) against a single-model run
    s, m = 5, 7
    single = build_coupled(years, scenarios[s, :, 0])
    node_params = {
        "TwoLayer.lambda0": member_params["TwoLayer.lambda0"][m],
        "CarbonCycle.tau": member_params["CarbonCycle.tau"][m],
    }
    for node in single.exec_order:
        comp = single.graph.nodes[node]
        key = f"{getattr(comp, 'component_name', '')}.{'lambda0'}"
        if type(comp).__name__ == "TwoLayer":
            comp.lambda0 = float(node_params["TwoLayer.lambda0"])
        if type(comp).__name__ == "CarbonCycle":
            comp.tau = float(node_params["CarbonCycle.tau"])
    single.run(compiled=True)
    expected = single.collection.get_data("Surface Temperature").values()[:, 0]
    np.testing.assert_allclose(
        temps[s, m], expected, rtol=1e-10, atol=1e-12
    )
