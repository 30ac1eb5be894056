"""
Benchmark: ensemble member-years/sec across the BASELINE.md configurations.

Driver contract: prints ONE JSON line
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}``.

Configs measured (BASELINE.md "Benchmark configs" row):

1. headline — two-layer + carbon-cycle + CO2 ERF coupled graph, 1750-2300
   annual steps, 10k-member parameter ensemble vmapped into one XLA
   program on a single TPU chip (plus the 100k scale point);
2. the ten-component MAGICC coupled graph (chemistry, forcing, climate
   UDEB, carbon cycle, budget) at 10k and 100k members, streaming scan
   mode (``extra.magicc_*``);
3. the MAGICC single-run 1750-2300 wall-clock (``extra.magicc_single_*``);
4. a 10k-member x 8-SSP batched-exogenous cross-product ensemble
   (``extra.ssp_*``);
5. the on-device MCMC engine: whole stretch-move loop as one
   ``lax.scan`` on chip (``extra.mcmc_*``).

Timing: every config is measured over >= 20 steady-state repetitions
after a warm-up call (compile excluded); the reported number uses the
median so round-over-round comparisons are stable against dispatch
jitter.  Parameters are device-resident (``batched_params`` device_puts
once); a steady-state call ships no host data.

Synchronization: on the tunneled TPU platform ``jax.block_until_ready``
returns before device execution completes (measured: 0.6 ms "wall" for a
program whose true completion takes 763 ms), so every timed repetition
instead materializes one scalar element of each output on the host —
producing any element requires the whole XLA program to have run.  The
reported wall times therefore include one device->host round trip
(``extra.sync_rtt_floor_s`` records that floor for transparency).

``vs_baseline`` is measured against the driver's north-star target of a
100k-member ensemble in < 1 s  =>  5.5e7 member-years/sec.  The reference
itself publishes no benchmark numbers (BASELINE.json "published": {}).
"""

import json
import os
import sys
import time

import numpy as np

# Persistent XLA compilation cache: compiles through the remote-TPU tunnel
# are slow (minutes); the cache makes repeat bench runs start in seconds.
# This jax build ignores the JAX_COMPILATION_CACHE_DIR env var, so the
# config must be applied through jax.config (done lazily in _enable_cache
# because importing jax at module import would break the --smoke CPU path's
# platform selection ordering).


def _enable_cache():
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(__file__), ".jax_cache_tpu"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # never let cache plumbing kill a bench run

N_REPS = 20

# TPU v5e (v5 lite) peak HBM bandwidth — the roofline ceiling for these
# bandwidth-bound scan programs (the MXU peak is irrelevant: the physics
# is elementwise/VPU work on small state rows).
V5E_HBM_BYTES_PER_S = 8.19e11


def _roofline(extra, name, runner, params, out_vars, wall_s, exo=None):
    """XLA cost-model attribution for the exact compiled ensemble program:
    flops, bytes accessed, and the achieved HBM-bandwidth fraction at the
    measured wall time.  Lower+compile round-trips the persistent cache,
    so this costs no second real compile."""
    try:
        analysis = runner.cost_analysis(params, exo=exo, out_vars=out_vars)
        if not analysis:
            extra[f"{name}_roofline_error"] = "no cost analysis available"
            return
        flops = float(analysis.get("flops", 0.0))
        byts = float(analysis.get("bytes accessed", 0.0))
        extra[f"{name}_flops"] = flops
        extra[f"{name}_bytes_accessed"] = byts
        extra[f"{name}_achieved_gflop_per_s"] = flops / wall_s / 1e9
        extra[f"{name}_achieved_hbm_gb_per_s"] = byts / wall_s / 1e9
        extra[f"{name}_hbm_roofline_frac"] = byts / wall_s / V5E_HBM_BYTES_PER_S
    except Exception as exc:  # attribution must never kill the bench
        extra[f"{name}_roofline_error"] = repr(exc)[:200]


def _sync(out):
    """Force completion: materialize one scalar of every output array.

    ``jax.block_until_ready`` returns early on the tunneled TPU platform;
    pulling any single element to the host cannot complete before the
    producing XLA program has actually run.
    """
    import jax

    for leaf in jax.tree.leaves(out):
        np.asarray(leaf[(0,) * getattr(leaf, "ndim", 0)])


def _timed(fn, reps=N_REPS):
    """Median/best wall-clock of ``fn()`` over ``reps`` steady-state calls."""
    out = fn()  # warm-up: trace + compile + first execute
    _sync(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        _sync(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2], times[0], out


def build_flagship(n_years=551):
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


def bench_flagship(extra):
    from rscm_tpu.parallel import EnsembleRunner

    results = {}
    for n_members in (10_000, 100_000):
        model = build_flagship()
        n_years = len(model.time_axis)
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
        med, best, out = _timed(
            lambda: runner.run(params=params, out_vars=["Surface Temperature"])
        )
        results[n_members] = (med, best, out, n_years)
        extra[f"wall_s_{n_members // 1000}k_members_{n_years}yr"] = med
        extra[f"member_years_per_sec_{n_members // 1000}k"] = (
            n_members * (n_years - 1) / med
        )
        if n_members == 100_000:
            _roofline(extra, "flagship_100k", runner, params,
                      ["Surface Temperature"], med)
    extra["final_temp_sample_K"] = float(
        np.asarray(results[10_000][2]["Surface Temperature"])[0, -1, 0]
    )
    med, _, _, n_years = results[10_000]
    return 10_000 * (n_years - 1) / med


def bench_magicc(extra):
    """Ten-component MAGICC coupled graph at ensemble scale + single run."""
    from rscm_tpu.magicc.coupled import build_magicc_model
    from rscm_tpu.parallel import EnsembleRunner

    # production throughput mode: the exp-sum tail engine (O(152) scan
    # carry instead of the O(window) ring; ring-parity ~1e-9, pinned by
    # TestOceanCarbonExpsum).  history_dtype only matters if a config
    # forces the ring engine back on; recorded for provenance.
    ocean_params = {"history_dtype": "bfloat16"}
    # provenance: record the convolution engine the ensemble models resolve
    # to — engine choice depends only on the component's own parameters, so
    # one component with the coupled builder's run-length window sizing
    # (coupled.py) answers for the whole graph
    from rscm_tpu.magicc import OceanCarbon

    extra["magicc_ocean_engine"] = OceanCarbon(
        **{"max_history_months": 12 * 252, **ocean_params}
    ).resolved_engine()
    extra["magicc_ocean_history_dtype"] = "bfloat16"
    for n_members in (10_000, 100_000):
        model = build_magicc_model(ocean_params=ocean_params)
        n_years = len(model.time_axis)
        runner = EnsembleRunner(model)
        rng = np.random.default_rng(3)
        params = runner.batched_params(
            {
                "ClimateUDEB.ecs": rng.uniform(1.8, 5.5, n_members),
                "ClimateUDEB.kappa": rng.uniform(0.4, 1.5, n_members),
                "TerrestrialCarbon.beta": rng.uniform(0.3, 0.9, n_members),
            }
        )
        med, best, out = _timed(
            lambda: runner.run(
                params=params,
                out_vars=["Surface Temperature", "Atmospheric Concentration|CO2"],
            )
        )
        temps = np.asarray(out["Surface Temperature"])
        assert np.all(np.isfinite(temps)), "MAGICC ensemble produced non-finite output"
        extra[f"magicc_{n_members // 1000}k_wall_s"] = med
        extra[f"magicc_{n_members // 1000}k_member_years_per_sec"] = (
            n_members * (n_years - 1) / med
        )

    # single-run wall-clock, 1750-2300 (the "MAGICC-legacy regression
    # scenario" shape: full ten-component graph over 550 annual steps)
    years = np.arange(1750.0, 2301.0)
    model = build_magicc_model(years=years)
    runner = EnsembleRunner(model)
    params = runner.batched_params({"ClimateUDEB.ecs": np.array([3.0])})
    med, best, _ = _timed(
        lambda: runner.run(params=params, out_vars=["Surface Temperature"])
    )
    extra["magicc_single_550yr_wall_s"] = med

    # the BASELINE MAGICC-legacy shape at full ensemble scale: 100k
    # members x 550 years (the 251-yr ensemble above never measured this
    # point directly)
    model = build_magicc_model(years=years, ocean_params=ocean_params)
    n_years = len(model.time_axis)
    runner = EnsembleRunner(model)
    rng = np.random.default_rng(3)
    n_members = 100_000
    params = runner.batched_params(
        {
            "ClimateUDEB.ecs": rng.uniform(1.8, 5.5, n_members),
            "ClimateUDEB.kappa": rng.uniform(0.4, 1.5, n_members),
        }
    )
    # first-call latency incl. trace+compile: the first thing a user hits
    # (persistent-cache hits make this small on repeat runs — recorded
    # either way so compile-time regressions are visible round to round)
    t0 = time.perf_counter()
    out = runner.run(params=params, out_vars=["Surface Temperature"])
    _sync(out)
    extra["magicc_100k_compile_s"] = time.perf_counter() - t0
    med, best, out = _timed(
        lambda: runner.run(params=params, out_vars=["Surface Temperature"])
    )
    assert np.all(np.isfinite(np.asarray(out["Surface Temperature"])))
    extra["magicc_100k_550yr_wall_s"] = med
    extra["magicc_100k_550yr_member_years_per_sec"] = (
        n_members * (n_years - 1) / med
    )
    _roofline(extra, "magicc_100k_550yr", runner, params,
              ["Surface Temperature"], med)

    # the full-options graph: ten components + the two beyond-reference
    # modules (permafrost carbon feedback + sea level rise) in one fused
    # scan at 10k members — evidence the extended graph runs on-device
    try:
        model = build_magicc_model(
            ocean_params=ocean_params,
            include_permafrost=True,
            include_slr=True,
        )
        n_years = len(model.time_axis)
        runner = EnsembleRunner(model)
        rng = np.random.default_rng(3)
        n_members = 10_000
        params = runner.batched_params(
            {
                "ClimateUDEB.ecs": rng.uniform(1.8, 5.5, n_members),
                "Permafrost.arctic_amplification": rng.uniform(1.5, 2.5, n_members),
            }
        )
        med, best, out = _timed(
            lambda: runner.run(
                params=params, out_vars=["Surface Temperature", "Sea Level Rise"]
            )
        )
        slr = np.asarray(out["Sea Level Rise"])
        # index 0 is the NaN initial-value slot (SLR declares no initial
        # values); everything computed must be finite
        assert np.all(np.isfinite(slr[:, 1:])), "permafrost+SLR graph non-finite"
        extra["magicc_permafrost_slr_10k_wall_s"] = med
        extra["magicc_permafrost_slr_10k_member_years_per_sec"] = (
            n_members * (n_years - 1) / med
        )

        # the same extended graph at the headline 100k scale: HBM behaviour
        # of the permafrost band state + SLR IRF history at full ensemble
        n_members = 100_000
        params = runner.batched_params(
            {
                "ClimateUDEB.ecs": rng.uniform(1.8, 5.5, n_members),
                "Permafrost.arctic_amplification": rng.uniform(1.5, 2.5, n_members),
            }
        )
        med, best, out = _timed(
            lambda: runner.run(
                params=params, out_vars=["Surface Temperature", "Sea Level Rise"]
            )
        )
        extra["magicc_permafrost_slr_100k_wall_s"] = med
        extra["magicc_permafrost_slr_100k_member_years_per_sec"] = (
            n_members * (n_years - 1) / med
        )
        _roofline(extra, "magicc_permafrost_slr_100k", runner, params,
                  ["Surface Temperature", "Sea Level Rise"], med)
    except Exception as exc:
        extra["magicc_permafrost_slr_error"] = repr(exc)[:200]

    # engine comparison: on TPU the default month_engine="auto" resolves
    # to the Pallas kernel (rscm_tpu/ops/udeb_month.py) — the numbers
    # above use it; this extra records the plain-XLA inner-scan engine so
    # the kernel's contribution stays visible round over round
    try:
        model = build_magicc_model(
            udeb_params={"month_engine": "xla"}, ocean_params=ocean_params
        )
        runner = EnsembleRunner(model)
        rng = np.random.default_rng(3)
        n_members = 100_000
        params = runner.batched_params(
            {
                "ClimateUDEB.ecs": rng.uniform(1.8, 5.5, n_members),
                "ClimateUDEB.kappa": rng.uniform(0.4, 1.5, n_members),
            }
        )
        med, best, out = _timed(
            lambda: runner.run(params=params, out_vars=["Surface Temperature"])
        )
        n_years = len(model.time_axis)
        extra["magicc_100k_xla_engine_wall_s"] = med
        extra["magicc_100k_xla_engine_member_years_per_sec"] = (
            n_members * (n_years - 1) / med
        )
    except Exception as exc:  # keep the headline bench alive regardless
        extra["magicc_100k_xla_engine_error"] = repr(exc)[:200]


def bench_ssp_cross(extra):
    """10k members x 8 SSP-like scenarios, batched-exogenous cross product."""
    from rscm_tpu.parallel import EnsembleRunner

    n_members, n_scenarios = 10_000, 8
    model = build_flagship()
    n_years = len(model.time_axis)
    years = np.arange(1750.0, 1750.0 + n_years)

    ramp = np.linspace(0.0, 1.0, n_years)
    peaks = np.linspace(2.0, 30.0, n_scenarios)
    declines = np.linspace(0.9, 0.0, n_scenarios)
    scenarios = np.stack(
        [
            np.maximum(
                peak * np.sin(np.pi * np.clip(ramp / (1.0 - 0.4 * dec), 0, 1)), 0.0
            )[:, None]
            for peak, dec in zip(peaks, declines)
        ]
    )  # (S, n_years, 1)

    runner = EnsembleRunner(model)
    rng = np.random.default_rng(5)
    batch = n_members * n_scenarios
    params = runner.batched_params(
        {
            "TwoLayer.lambda0": np.tile(rng.uniform(0.8, 1.8, n_members), n_scenarios),
            "CarbonCycle.tau": np.tile(rng.uniform(15.0, 60.0, n_members), n_scenarios),
        }
    )
    import jax

    exo = {
        "Emissions|CO2|Anthropogenic": jax.device_put(
            np.repeat(scenarios, n_members, axis=0).astype(runner.program.dtype)
        )
    }
    med, best, out = _timed(
        lambda: runner.run(params=params, exo=exo, out_vars=["Surface Temperature"])
    )
    extra["ssp_10k_x8_wall_s"] = med
    extra["ssp_10k_x8_member_years_per_sec"] = batch * (n_years - 1) / med


def _device_alive(timeout_s: float = 90.0) -> bool:
    """Probe the device with a trivial dispatch under a watchdog.

    A section fault that kills the tunneled TPU worker leaves every later
    dispatch hanging on a dead tunnel; nothing client-side can time out a
    hung call, so the probe runs in a daemon thread and the watchdog is
    the join timeout.  Used after a section failure to decide whether the
    remaining sections can run at all.
    """
    import threading

    ok = []

    def probe():
        try:
            import jax
            import jax.numpy as jnp

            np.asarray(jax.jit(lambda x: x + 1.0)(jnp.zeros(8))[0])
            ok.append(True)
        except Exception:
            pass

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return bool(ok)


def bench_tpu_golden(extra):
    """On-device correctness: golden scenarios executed on the TPU in f32.

    Every other number in this file asserts only finiteness; this ties the
    TPU to correctness (a TPU-specific numeric fault — different fusion,
    the real Pallas kernel vs interpret mode — would otherwise ship inside
    a green BENCH artifact).  Two checks per scenario:

    - drift vs the eager float64 host executor (the dtype-drift oracle,
      same bounds class as docs/dtype_drift.md, with 4x headroom for
      TPU-vs-CPU fusion differences);
    - parity vs the Fortran MAGICC7 golden CSV at the regression suite's
      own physics tolerances.

    Any violation raises -> bench exits nonzero.
    """
    sys.path.insert(0, str(os.path.join(os.path.dirname(__file__), "tests")))
    from regression.helpers import (
        fourbox_global_mean,
        get_variable_values,
        load_regression_data,
    )
    from regression.test_ocean_udeb import build_ocean_model, ramp_forcing_1pct
    from regression.test_ghg_forcing import build_ghg_forcing_model

    # -- ocean_udeb scenario 10 (full default physics incl. Pallas months)
    # drive it exactly like tests/regression/test_ocean_udeb.py::
    # test_ocean_10_full_default: a 1%/yr CO2 ramp with the scenario's
    # own ECS / 2xCO2 forcing (a step forcing here would be a different
    # experiment than the golden CSV records)
    df, config = load_regression_data("ocean_udeb", "10_full_default")
    years, expected_temp = get_variable_values(df, "Surface Temperature")
    erf = ramp_forcing_1pct(
        years, config.get("core_delq2xco2", 3.71), config.get("startyear", 1850)
    )
    params = {
        "ecs": config.get("core_climatesensitivity", 3.0),
        "rf_2xco2": config.get("core_delq2xco2", 3.71),
    }

    host = build_ocean_model(config, years, erf, params=params)
    host.run(compiled=False)  # float64 numpy oracle
    device = build_ocean_model(config, years, erf, params=params)
    device.run(compiled=True)  # float32 XLA + Pallas on the TPU

    def global_temp(model):
        vals = model.timeseries().get_fourbox_timeseries_by_name(
            "Surface Temperature"
        ).values()
        return fourbox_global_mean(vals)

    t_host = global_temp(host)
    t_dev = global_temp(device)
    drift = float(np.max(np.abs(t_dev - t_host)) / np.max(np.abs(t_host)))
    extra["tpu_golden_drift_ocean10_temperature"] = drift
    assert drift < 2e-4, (  # 4x the documented 5e-5 CPU-f32 bound
        f"TPU f32 drift vs f64 host on ocean_udeb/10: {drift:.2e}"
    )
    # physics parity vs MAGICC7 (converged-phase check at the regression
    # suite's tolerance class; indexing matches run_step_scenario)
    rel = np.abs(t_dev[55:] - expected_temp[55:]) / np.maximum(
        np.abs(expected_temp[55:]), 1e-3
    )
    extra["tpu_golden_ocean10_max_rel_vs_magicc7"] = float(rel.max())
    assert rel.max() < 5e-2, (
        f"TPU run diverges from MAGICC7 golden: {rel.max():.3e}"
    )

    # -- ghg_forcing scenario 01 (analytical forcing, tight tolerance)
    df, config = load_regression_data("ghg_forcing", "01_concentration_driven")
    years, expected_co2_erf = get_variable_values(
        df, "Effective Radiative Forcing|CO2"
    )
    _, co2 = get_variable_values(df, "Atmospheric Concentrations|CO2")
    _, ch4 = get_variable_values(df, "Atmospheric Concentrations|CH4")
    _, n2o = get_variable_values(df, "Atmospheric Concentrations|N2O")

    host = build_ghg_forcing_model(years, co2, ch4, n2o, config)
    host.run(compiled=False)
    device = build_ghg_forcing_model(years, co2, ch4, n2o, config)
    device.run(compiled=True)

    def co2_erf(model):
        return np.asarray(
            model.timeseries()
            .get_timeseries_by_name("Effective Radiative Forcing|CO2")
            .values()
        ).ravel()

    # index 0 is the (NaN-filled) initial-value slot — outputs land at
    # N+1, same slicing the golden comparison below uses
    e_host, e_dev = co2_erf(host)[1:], co2_erf(device)[1:]
    drift = float(np.max(np.abs(e_dev - e_host)) / np.max(np.abs(e_host)))
    extra["tpu_golden_drift_ghg01_co2_erf"] = drift
    assert drift < 2e-5, (  # 4x the documented 5e-6 CPU-f32 bound
        f"TPU f32 drift vs f64 host on ghg_forcing/01: {drift:.2e}"
    )
    # scale-relative vs golden (per-point rtol explodes on the near-zero
    # 1750s forcing without saying whether the answer moved); f64 parity
    # is ~3e-6 here (parity_report.csv), f32 drift adds ~2e-7
    rel = float(
        np.max(np.abs(e_dev - expected_co2_erf[:-1]))
        / np.max(np.abs(expected_co2_erf))
    )
    extra["tpu_golden_ghg01_max_rel_vs_magicc7"] = rel
    assert rel < 1e-4, f"TPU forcing diverges from MAGICC7 golden: {rel:.3e}"


def bench_calibration_at_scale(extra):
    """At-scale on-device calibration: 1024-walker stretch MCMC on a
    4-parameter flagship model, and 64-chain NUTS — model-evals/s for a
    realistic calibration, not the 32-walker toy point."""
    from rscm_tpu.calibrate import (
        CompiledModelRunner,
        EnsembleSampler,
        GaussianLikelihood,
        NUTSSampler,
        ParameterSet,
        Target,
        Uniform,
        WalkerInit,
    )

    model = build_flagship(n_years=151)
    truth = np.linspace(0.5, 2.0, 151)
    target = Target()
    vt = target.add_variable("Surface Temperature")
    for i in range(10, 151, 10):
        vt.add(1750.0 + i, float(truth[i]), 0.1)

    runner = CompiledModelRunner(
        model,
        param_map={
            "lambda0": "TwoLayer.lambda0",
            "eta": "TwoLayer.eta",
            "tau": "CarbonCycle.tau",
            "erf_2xco2": "CO2ERF.erf_2xco2",
        },
        output_variables=["Surface Temperature"],
    )
    params = (
        ParameterSet()
        .add("lambda0", Uniform(0.5, 2.5))
        .add("eta", Uniform(0.3, 1.5))
        .add("tau", Uniform(10.0, 80.0))
        .add("erf_2xco2", Uniform(3.0, 4.5))
    )
    sampler = EnsembleSampler(params, runner, GaussianLikelihood(), target)

    n_iterations, n_walkers = 200, 1024
    sampler.run(  # warm-up: trace + compile at the exact steady-state shapes
        n_iterations=n_iterations, init=WalkerInit.from_prior(), thin=1,
        n_walkers=n_walkers, seed=7, engine="device",
    )
    t0 = time.perf_counter()
    chain = sampler.run(
        n_iterations=n_iterations, init=WalkerInit.from_prior(), thin=1,
        n_walkers=n_walkers, seed=8, engine="device",
    )
    steady = time.perf_counter() - t0
    assert chain.flat_samples(discard=0).shape[0] == n_iterations * n_walkers
    extra["mcmc_1024walkers_wall_s_200it"] = steady
    extra["mcmc_1024walkers_model_evals_per_sec"] = (
        n_iterations * n_walkers / steady
    )

    # gradient-based NUTS, 64 chains on-device (beyond the reference,
    # which has no gradient sampler at all).  The warm-up must use the
    # SAME iteration counts as the timed run: the chunked scan executable
    # is specialised on its trip count, so a (2, 2) warm-up leaves the
    # (40, 40) shape to compile inside the timed region (the entire
    # "NUTS is 200x slower" signal of BENCH_r03 was mostly that hidden
    # compile + tunnel dispatch, not device compute).
    # Dedicated runner with the time scan unrolled 4x: at 64 chains the
    # model scan is latency-bound (~9 us/step of iteration overhead vs
    # sub-us physics), and NUTS pays that per leapfrog.  Measured on the
    # chip: 6.9k -> 15.2k model-evals/s (the big-ensemble sections keep
    # unroll=1, where it measured slower).
    nuts_runner = CompiledModelRunner(
        model,
        param_map={
            "lambda0": "TwoLayer.lambda0",
            "eta": "TwoLayer.eta",
            "tau": "CarbonCycle.tau",
            "erf_2xco2": "CO2ERF.erf_2xco2",
        },
        output_variables=["Surface Temperature"],
        scan_unroll=4,
    )
    nuts = NUTSSampler(
        params, nuts_runner, GaussianLikelihood(), target, max_tree_depth=6
    )
    t0 = time.perf_counter()
    nuts.run(n_iterations=40, n_chains=64, warmup=40, seed=0)  # warm-up
    extra["nuts_64chains_first_s_incl_compile"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    nuts.run(n_iterations=40, n_chains=64, warmup=40, seed=1)
    steady = time.perf_counter() - t0
    evals = int(nuts.last_diagnostics["n_model_evals"])
    extra["nuts_64chains_wall_s"] = steady
    extra["nuts_64chains_model_evals_per_sec"] = evals / steady


def bench_magicc_calibration(extra):
    """At-scale on-device calibration of the FULL ten-component MAGICC
    model (the purpose of the whole calibrate subsystem): 1024-walker
    stretch MCMC and 64-chain NUTS over eight physical parameters
    spanning climate response, terrestrial+ocean carbon, CH4 chemistry
    and aerosol forcing, against synthetic-truth observations of
    global-mean temperature, CO2, CH4 and ocean heat content."""
    from rscm_tpu.calibrate import EnsembleSampler, NUTSSampler, WalkerInit
    from rscm_tpu.magicc.calibration import magicc_calibration

    calib = magicc_calibration()  # 1850-2100, eight parameters
    sampler = EnsembleSampler(
        calib.params, calib.runner, calib.likelihood, calib.target
    )

    # 256 iterations = 4 chunks of exactly 64 scan trips: one executable,
    # shared by the warm-up, the steady measurement and the convergence
    # segments below.
    n_iterations, n_walkers = 256, 1024
    t0 = time.perf_counter()
    sampler.run(
        n_iterations=n_iterations, init=WalkerInit.from_prior(), thin=1,
        n_walkers=n_walkers, seed=7, engine="device",
    )
    extra["magicc_mcmc_first_s_incl_compile"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    chain = sampler.run(
        n_iterations=n_iterations, init=WalkerInit.from_prior(), thin=1,
        n_walkers=n_walkers, seed=8, engine="device",
    )
    steady = time.perf_counter() - t0
    assert chain.flat_samples(discard=0).shape == (
        n_iterations * n_walkers, 8,
    )
    extra["magicc_mcmc_1024walkers_wall_s_256it"] = steady
    extra["magicc_mcmc_model_evals_per_sec"] = n_iterations * n_walkers / steady

    # wall to convergence (R-hat < 1.05 on every parameter), the
    # production calibration recipe (docs/calibration.md): gradient MAP
    # (Adam, worker-fault-fenced) -> Laplace covariance -> ensemble from
    # N(MAP, H^-1) -> DE-move segments.  The stretch move provably stalls
    # on this posterior (R-hat ~1.8 at 2048 iterations from ANY init —
    # its 1-d line proposals mix diffusively along the flat gas-exchange
    # direction); the DE move proposes with the walker cloud's own
    # covariance.  All keys are recorded honestly: rhat_target_reached
    # says whether R-hat < 1.05 actually happened within the segment cap,
    # and final_rhat is the achieved value either way.
    from rscm_tpu.calibrate import AdamOptimizer, DEMove, PointEstimator
    from rscm_tpu.calibrate.chain import Chain
    from rscm_tpu.calibrate.sampler import SamplerState

    estimator = PointEstimator(
        calib.params, calib.runner, calib.likelihood, calib.target
    )
    lower, upper = map(np.asarray, calib.params.bounds())
    t0 = time.perf_counter()
    est = estimator.optimize(
        AdamOptimizer(learning_rate=0.03, n_steps=400),
        x0=list(0.5 * (lower + upper)),
    )
    extra["magicc_mcmc_map_wall_s"] = time.perf_counter() - t0
    theta_map = np.asarray(est.best_params)
    t0 = time.perf_counter()
    cov = estimator.laplace_covariance(theta_map)
    extra["magicc_mcmc_laplace_wall_s"] = time.perf_counter() - t0

    de_sampler = EnsembleSampler(
        calib.params, calib.runner, calib.likelihood, calib.target,
        move=DEMove(),
    )
    rng = np.random.default_rng(21)
    state = SamplerState(
        WalkerInit.gaussian(theta_map, cov).initialize(
            n_walkers, calib.params, rng
        ),
        calib.params.param_names(),
    )
    conv_chain = Chain(calib.params.param_names(), 1)
    t0 = time.perf_counter()
    total = 0
    r_hat = float("inf")
    # measured decay on this posterior (docs/calibration.md): R-hat 1.21
    # at 4k iterations, 1.11 at 10k, ~×0.9 on the excess per 1024 — the
    # cap is sized so an ordinary run actually reaches 1.05 (~15-20 min
    # of device time), not a budget guard that guarantees failure
    for _ in range(20):
        de_sampler._run_from_state(
            state, conv_chain, 1024, rng, None, "device"
        )
        total += 1024
        r_hat = max(conv_chain.r_hat(discard=total // 2).values())
        if r_hat < 1.05:
            break
    extra["magicc_mcmc_wall_to_rhat_s"] = time.perf_counter() - t0
    extra["magicc_mcmc_iterations_run"] = total
    extra["magicc_mcmc_final_rhat"] = float(r_hat)
    extra["magicc_mcmc_rhat_target_reached"] = bool(r_hat < 1.05)
    extra["magicc_mcmc_acceptance"] = float(state.mean_acceptance_rate())
    if r_hat < 1.05:
        # converged posterior must actually contain the synthetic truth
        samples = conv_chain.flat_samples(discard=total // 2)
        lo_q = np.quantile(samples, 0.005, axis=0)
        hi_q = np.quantile(samples, 0.995, axis=0)
        extra["magicc_mcmc_truth_in_99ci"] = bool(
            np.all((lo_q <= calib.theta_true) & (calib.theta_true <= hi_q))
        )

    # gradient-based NUTS over the same eight parameters, at the
    # PRODUCTION 151-year axis (1850-2001) — the shape that used to crash
    # the tunneled TPU worker ("kernel fault" at >= 16 iterations per
    # dispatch).  The crash fence is NUTSSampler's TPU-default
    # dispatch_chunk=8 (bitwise-invisible chunking, tested by
    # tests/test_nuts.py::test_dispatch_chunk_is_bitwise_identical);
    # running here unpinned is the round-5 evidence the fence holds at
    # the scale users actually run (ladder in docs/performance.md).
    # month_engine="xla" keeps the gradient path off the forward-only
    # Pallas kernel.
    try:
        nuts_years = 151
        calib_nuts = magicc_calibration(
            years=np.arange(1850.0, 1850.0 + nuts_years),
            model_kwargs={"udeb_params": {"month_engine": "xla"}},
        )
        nuts = NUTSSampler(
            calib_nuts.params, calib_nuts.runner, calib_nuts.likelihood,
            calib_nuts.target, max_tree_depth=5,
        )
        extra["magicc_nuts_years"] = nuts_years
        t0 = time.perf_counter()
        nuts.run(n_iterations=24, n_chains=64, warmup=24, seed=0)
        extra["magicc_nuts_first_s_incl_compile"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        chain = nuts.run(n_iterations=24, n_chains=64, warmup=24, seed=1)
        steady = time.perf_counter() - t0
        evals = int(nuts.last_diagnostics["n_model_evals"])
        extra["magicc_nuts_64chains_wall_s"] = steady
        extra["magicc_nuts_model_evals_per_sec"] = evals / steady
        extra["magicc_nuts_divergences"] = int(
            nuts.last_diagnostics["n_divergences"]
        )
        r_hat = chain.r_hat(discard=0)
        extra["magicc_nuts_final_rhat"] = float(max(r_hat.values()))
    except Exception as exc:  # never take the whole bench down
        extra["magicc_nuts_error"] = repr(exc)[:200]


def bench_mcmc(extra):
    """On-device stretch-move MCMC: whole loop as one lax.scan on chip."""
    from rscm_tpu.calibrate import (
        CompiledModelRunner,
        EnsembleSampler,
        GaussianLikelihood,
        ParameterSet,
        Target,
        Uniform,
        WalkerInit,
    )

    model = build_flagship(n_years=151)
    truth = np.linspace(0.5, 2.0, 151) * 1.0  # synthetic observations
    target = Target()
    vt = target.add_variable("Surface Temperature")
    for i in range(10, 151, 10):
        vt.add(1750.0 + i, float(truth[i]), 0.1)

    runner = CompiledModelRunner(
        model,
        param_map={"lambda0": "TwoLayer.lambda0", "tau": "CarbonCycle.tau"},
        output_variables=["Surface Temperature"],
    )
    params = ParameterSet().add("lambda0", Uniform(0.5, 2.5)).add(
        "tau", Uniform(10.0, 80.0)
    )
    sampler = EnsembleSampler(params, runner, GaussianLikelihood(), target)

    n_iterations, n_walkers = 500, 32
    t0 = time.perf_counter()
    sampler.run(
        n_iterations=n_iterations,
        init=WalkerInit.from_prior(),
        thin=1,
        seed=7,
        engine="device",
    )
    first = time.perf_counter() - t0
    t0 = time.perf_counter()
    chain = sampler.run(
        n_iterations=n_iterations,
        init=WalkerInit.from_prior(),
        thin=1,
        seed=8,
        engine="device",
    )
    steady = time.perf_counter() - t0
    assert chain is not None
    extra["mcmc_device_first_s_incl_compile"] = first
    extra["mcmc_device_steady_s_500it_32walkers"] = steady
    extra["mcmc_device_iterations_per_sec"] = n_iterations / steady
    extra["mcmc_device_model_evals_per_sec"] = n_iterations * n_walkers / steady


def smoke():
    """CI contract check off-TPU: tiny flagship ensemble, one JSON line."""
    import jax

    if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
        # CI runs the smoke on CPU via JAX_PLATFORMS=cpu, but the axon
        # sitecustomize pins jax_platforms to the TPU backend in jax.config
        # (overriding the env var) — and initializing that backend hangs
        # whenever the TPU tunnel is down.  Honor the explicit CPU request
        # before any backend exists.
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    from rscm_tpu.parallel import EnsembleRunner

    model = build_flagship(n_years=24)
    runner = EnsembleRunner(model)
    params = runner.batched_params({"TwoLayer.lambda0": np.linspace(0.8, 1.8, 16)})
    t0 = time.perf_counter()
    out = runner.run(params=params, out_vars=["Surface Temperature"])
    temps = np.asarray(out["Surface Temperature"])
    assert temps.shape == (16, 24, 1) and np.all(np.isfinite(temps))
    wall = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "metric": "smoke_member_years_per_sec",
                "value": 16 * 23 / wall,
                "unit": "member-years/s",
                "vs_baseline": 0.0,
                "extra": {"smoke": True, "wall_s_incl_compile": wall},
            }
        )
    )


def main():
    import jax

    _enable_cache()
    extra = {
        "device": str(jax.devices()[0]),
        "n_reps": N_REPS,
        "timing": (
            "median of steady-state reps (warm-up/compile excluded); each "
            "rep synced by materializing one scalar output element"
        ),
    }

    # device->host round-trip floor of the sync method: time to pull one
    # scalar from an already-computed device array (included in every
    # reported wall time above; subtract for pure device-compute numbers)
    import jax.numpy as jnp

    probe = jax.jit(lambda x: x + 1.0)(jnp.zeros(8))
    np.asarray(probe[0])
    rtts = []
    for _ in range(N_REPS):
        t0 = time.perf_counter()
        np.asarray(probe[0])
        rtts.append(time.perf_counter() - t0)
    extra["sync_rtt_floor_s"] = sorted(rtts)[len(rtts) // 2]

    value = bench_flagship(extra)
    extra["dtype"] = "float32"
    bench_tpu_golden(extra)  # correctness gate: raises -> rc != 0

    # The remaining sections are throughput attribution, not gates.  The
    # tunneled TPU worker is known to fault on rare large programs (see
    # docs/performance.md "Known issue"); a transient fault in one section
    # must not zero the whole round's bench, so each section records its
    # failure under ``extra["<section>_error"]`` and the run carries on.
    # After a failure the device is probed with a watchdog: if the worker
    # is down, the remaining sections are recorded as skipped instead of
    # hanging forever on a dead tunnel.
    sections = [
        bench_magicc,
        bench_ssp_cross,
        bench_mcmc,
        bench_calibration_at_scale,
        bench_magicc_calibration,
    ]
    for i, section in enumerate(sections):
        t0 = time.perf_counter()
        try:
            section(extra)
            status = "ok"
        except Exception as exc:
            extra[f"{section.__name__}_error"] = repr(exc)[:300]
            status = f"ERROR {type(exc).__name__}"
            if not _device_alive():
                remaining = [s.__name__ for s in sections[i + 1 :]]
                for name in remaining:
                    extra[f"{name}_error"] = "skipped: worker down"
                print(
                    f"[bench] device probe failed after {section.__name__}; "
                    f"skipping {remaining}",
                    file=sys.stderr,
                )
                break
        finally:
            # progress to stderr (stdout carries only the final JSON line);
            # section wall includes host-side tracing, which dominates on a
            # single-CPU driver box even when the XLA compile cache is warm
            print(
                f"[bench] {section.__name__}: {status} "
                f"({time.perf_counter() - t0:.1f}s)",
                file=sys.stderr,
            )

    north_star = 100_000 * 550 / 1.0  # 100k members, 1750-2300, <1s
    emit_results(value, value / north_star, extra)


#: keys lifted into the final stdout line's ``extra`` — the driver keeps
#: only the last 2000 chars of stdout, so this list is the round's always-
#: auditable summary; everything else lives in the committed BENCH_full.json
SUMMARY_KEYS = (
    "device",
    "member_years_per_sec_10k",
    "member_years_per_sec_100k",
    "wall_s_100k_members_551yr",
    "magicc_10k_member_years_per_sec",
    "magicc_100k_member_years_per_sec",
    "magicc_single_550yr_wall_s",
    "magicc_100k_550yr_wall_s",
    "magicc_100k_550yr_member_years_per_sec",
    "magicc_100k_550yr_hbm_roofline_frac",
    "magicc_100k_compile_s",
    "magicc_permafrost_slr_10k_member_years_per_sec",
    "magicc_permafrost_slr_100k_member_years_per_sec",
    "ssp_10k_x8_member_years_per_sec",
    "mcmc_device_iterations_per_sec",
    "mcmc_1024walkers_model_evals_per_sec",
    "nuts_64chains_model_evals_per_sec",
    "magicc_mcmc_model_evals_per_sec",
    "magicc_mcmc_rhat_target_reached",
    "magicc_mcmc_final_rhat",
    "magicc_mcmc_wall_to_rhat_s",
    "magicc_mcmc_iterations_run",
    "magicc_mcmc_map_wall_s",
    "magicc_mcmc_truth_in_99ci",
    "magicc_nuts_years",
    "magicc_nuts_model_evals_per_sec",
    "magicc_nuts_64chains_wall_s",
    "magicc_nuts_final_rhat",
    "magicc_nuts_divergences",
    "tpu_golden_drift_ocean10_temperature",
    "tpu_golden_ghg01_max_rel_vs_magicc7",
)


def _compact(v):
    """Round floats to 6 significant digits to keep the final line short."""
    if isinstance(v, float):
        return float(f"{v:.6g}")
    return v


def emit_results(value, vs_baseline, extra):
    """Write the full record to BENCH_full.json; print a compact final line.

    The driver records only the tail of stdout and parses the last line as
    JSON, so the stdout line carries a curated summary (always < 2000
    chars) and points at the committed full artifact.  Sections that
    faulted are surfaced in ``sections_with_errors`` so a failure can
    never silently vanish from the round record.
    """
    full = {
        "metric": "ensemble_member_years_per_sec_10k_members",
        "value": value,
        "unit": "member-years/s",
        "vs_baseline": vs_baseline,
        "extra": extra,
    }
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_full.json")
    try:
        with open(full_path, "w") as f:
            json.dump(full, f, indent=1, sort_keys=True)
            f.write("\n")
    except Exception as exc:  # emission must never kill the bench
        extra["bench_full_write_error"] = repr(exc)[:200]

    summary = {k: _compact(extra[k]) for k in SUMMARY_KEYS if k in extra}
    summary["sections_with_errors"] = sorted(
        k[: -len("_error")] for k in extra if k.endswith("_error")
    )
    line = json.dumps(
        {
            "metric": full["metric"],
            "value": _compact(value),
            "unit": full["unit"],
            "vs_baseline": _compact(vs_baseline),
            "extra": summary,
            "full_results": "BENCH_full.json",
        }
    )
    if len(line) > 1900:  # hard guarantee: the driver tail must hold it
        line = json.dumps(
            {
                "metric": full["metric"],
                "value": _compact(value),
                "unit": full["unit"],
                "vs_baseline": _compact(vs_baseline),
                "extra": {
                    "sections_with_errors": summary["sections_with_errors"]
                },
                "full_results": "BENCH_full.json",
            }
        )
    print(line)


if __name__ == "__main__":
    if "--smoke" in sys.argv:
        smoke()
    else:
        main()
