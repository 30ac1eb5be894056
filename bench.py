"""
Benchmark: ensemble member-years/sec on the flagship coupled model.

Driver contract: prints ONE JSON line
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}``.

Configuration (BASELINE.md): two-layer + carbon-cycle + CO2 ERF coupled
graph, 1750–2300 annual steps (550 member-years per member), 10k-member
parameter ensemble vmapped into one XLA program on a single TPU chip.

``vs_baseline`` is measured against the driver's north-star target of a
100k-member ensemble in < 1 s  ⇒  5.5e7 member-years/sec.  The reference
itself publishes no benchmark numbers (BASELINE.json "published": {}).
"""

import json
import os
import time

import numpy as np

# Persistent XLA compilation cache: compiles through the remote-TPU tunnel
# are slow (minutes); the cache makes repeat bench runs start in seconds.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def build_model(n_years=551):
    from rscm_tpu.components import CO2ERF, CarbonCycle, TwoLayer
    from rscm_tpu.core import ModelBuilder, TimeAxis, Timeseries, VariableSchema

    years = np.arange(1750.0, 1750.0 + n_years)
    # SSP-like emissions ramp: slow growth, peak, decline
    emissions = np.concatenate(
        [
            np.linspace(0.0, 2.0, 100),
            np.linspace(2.0, 12.0, 165),
            np.linspace(12.0, 4.0, 86),
            np.full(max(0, n_years - 351), 4.0),
        ]
    )[:n_years]

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
                "Surface Temperature": 0.0,
                "Deep Ocean Temperature": 0.0,
                "Atmospheric Concentration|CO2": 278.0,
                "Cumulative Emissions|CO2": 0.0,
                "Cumulative Land Uptake": 0.0,
            }
        )
        .build()
    )


def main():
    import jax

    from rscm_tpu.parallel import EnsembleRunner

    n_members = 10_000
    model = build_model()
    n_years = len(model.time_axis)
    member_years = n_members * (n_years - 1)

    runner = EnsembleRunner(model)
    rng = np.random.default_rng(42)
    params = runner.batched_params(
        {
            "TwoLayer.lambda0": rng.uniform(0.8, 1.8, n_members),
            "TwoLayer.eta": rng.uniform(0.5, 1.2, n_members),
            "CarbonCycle.tau": rng.uniform(15.0, 60.0, n_members),
            "CO2ERF.erf_2xco2": rng.uniform(3.0, 4.5, n_members),
        }
    )

    # warm-up (trace + compile, excluded from measurement)
    out = runner.run(params=params, out_vars=["Surface Temperature"])
    jax.block_until_ready(out)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = runner.run(params=params, out_vars=["Surface Temperature"])
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    best = min(times)

    # secondary scale point: 100k members through a fresh runner (one
    # executable per process — see axon second-executable caveat)
    big_n = 100_000
    big_runner = EnsembleRunner(build_model())
    big_params = big_runner.batched_params(
        {"TwoLayer.lambda0": rng.uniform(0.8, 1.8, big_n)}
    )
    big_out = big_runner.run(params=big_params, out_vars=["Surface Temperature"])
    jax.block_until_ready(big_out)
    big_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        big_out = big_runner.run(params=big_params, out_vars=["Surface Temperature"])
        jax.block_until_ready(big_out)
        big_times.append(time.perf_counter() - t0)
    big_best = min(big_times)

    value = member_years / best
    north_star = 100_000 * 550 / 1.0  # 100k members, 1750-2300, <1s
    result = {
        "metric": "ensemble_member_years_per_sec_10k_members",
        "value": value,
        "unit": "member-years/s",
        "vs_baseline": value / north_star,
        "extra": {
            "wall_s_10k_members_551yr": best,
            "n_members": n_members,
            "n_years": n_years,
            "device": str(jax.devices()[0]),
            "dtype": str(np.dtype(runner.program.dtype)),
            "final_temp_sample_K": float(
                np.asarray(out["Surface Temperature"])[0, -1, 0]
            ),
            "wall_s_100k_members_551yr": big_best,
            "member_years_per_sec_100k": big_n * (n_years - 1) / big_best,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
