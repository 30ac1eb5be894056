"""
Secondary benchmark: ClimateUDEB (50-layer upwelling-diffusion energy
balance, MAGICC7's ocean core) parameter ensemble on one TPU chip.

Not the driver's headline bench (that's ``bench.py`` at the repo root);
this measures the heaviest single component in the framework — monthly
sub-stepped tridiagonal ocean solve with in-graph LAMCALC — vmapped over
an ensemble.  Prints one JSON line.

Optimisation history (151-year scenario):

- round 1: ``lax.linalg.tridiagonal_solve`` per hemisphere per month; any
  run with >= ~10k members faulted the TPU in the batched LU kernel that
  ``jnp.linalg.inv`` used inside the in-graph LAMCALC loop.
- round 2: (i) both hemispheres merged into one batched Thomas sweep
  (``thomas_solve_batched``), (ii) the LAMCALC matrix inversion replaced
  with the closed-form cofactor expansion (``invert_4x4_traced``), which
  also removed the >= 10k fault.  (Early round-2 throughput claims made
  with ``jax.block_until_ready`` were dispatch-time artifacts — on the
  tunneled TPU platform it returns before execution completes; timing now
  materializes a scalar output element, which cannot complete early.)

Usage:  python benchmarks/bench_udeb.py [n_members] [n_years]
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_model(n_years):
    from rscm_tpu.core import (
        GridType,
        ModelBuilder,
        TimeAxis,
        Timeseries,
        VariableSchema,
    )
    from rscm_tpu.core.spatial import ScalarGrid
    from rscm_tpu.magicc import ClimateUDEB

    years = np.arange(1850.0, 1850.0 + n_years)
    # CO2-like ramp to ~4 W/m^2
    erf = 4.0 * (1.0 - np.exp(-(years - years[0]) / 120.0))

    schema = VariableSchema()
    schema.add_variable("Effective Radiative Forcing", "W/m^2")
    schema.add_variable("Surface Temperature", "K", GridType.FourBox)
    schema.add_variable("Heat Uptake", "W/m^2")
    schema.add_variable("Ocean Heat Content", "J/m^2")
    schema.add_variable("Sea Surface Temperature", "K")
    ta = TimeAxis.from_values(years)
    return (
        ModelBuilder()
        .with_time_axis(ta)
        .with_schema(schema)
        .with_component(ClimateUDEB())
        .with_exogenous_variable(
            "Effective Radiative Forcing",
            Timeseries(erf[:, None], ta, ScalarGrid(), "W/m^2"),
        )
        .with_initial_values({"Surface Temperature": 0.0})
        .build()
    )


def main():
    import jax

    from rscm_tpu.parallel import EnsembleRunner

    n_members = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    n_years = int(sys.argv[2]) if len(sys.argv) > 2 else 151

    model = build_model(n_years)
    member_years = n_members * (n_years - 1)

    runner = EnsembleRunner(model)
    rng = np.random.default_rng(7)
    params = runner.batched_params(
        {
            "ClimateUDEB.ecs": rng.uniform(1.5, 6.0, n_members),
            "ClimateUDEB.kappa": rng.uniform(0.4, 1.5, n_members),
            "ClimateUDEB.w_initial": rng.uniform(2.0, 5.0, n_members),
        }
    )

    def sync(out):
        # forces real completion (block_until_ready returns early on axon)
        np.asarray(out["Sea Surface Temperature"][0, 0, 0])

    t_compile0 = time.perf_counter()
    out = runner.run(params=params, out_vars=["Sea Surface Temperature"])
    sync(out)
    compile_s = time.perf_counter() - t_compile0

    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        out = runner.run(params=params, out_vars=["Sea Surface Temperature"])
        sync(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    best = times[len(times) // 2]

    ssts = np.asarray(out["Sea Surface Temperature"])[:, -1, 0]
    result = {
        "metric": "udeb_ensemble_member_years_per_sec",
        "value": member_years / best,
        "unit": "member-years/s",
        "vs_baseline": None,
        "extra": {
            "wall_s": best,
            "first_call_s_incl_compile": compile_s,
            "n_members": n_members,
            "n_years": n_years,
            "device": str(jax.devices()[0]),
            "dtype": str(np.dtype(runner.program.dtype)),
            "sst_finite": bool(np.all(np.isfinite(ssts))),
            "sst_range_K": [float(ssts.min()), float(ssts.max())],
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
