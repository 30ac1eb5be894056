"""
f32-vs-f64 drift quantification on the compiled path.

All golden-parity evidence runs in float64 (x64 CPU); the TPU benchmark
path runs float32.  These tests run the *same traced program* in both
dtypes over the regression scenarios and bound the divergence, proving
the documented "fast path" (BASELINE.md: bitwise-close x64 vs documented
f32 path) stays within the regression tolerances.

Metric: per-variable ``max_t |f32 - f64| / max_t |f64|`` — divergence
normalised by the trajectory's scale.  (Plain rtol explodes on early
near-zero values and says nothing about whether the *answer* moved.)

Measured values (CPU, 2026-08; see docs/dtype_drift.md for the table):
forcing components ~1e-7..1e-6, ClimateUDEB ~1e-6..8e-6 (the LAMCALC /
monthly-scan iteration is the accumulation risk), the full ten-component
emissions-driven pathway ~1e-7..4e-5.  Asserted bounds carry ~10x
headroom; every bound is far below the tolerances the regression suites
assert against MAGICC7 (1.5e-2..5e-2 for the coupled/UDEB phases).

The dtype-pinning these tests guard: under x64 mode a single strong
float64 constant (numpy array/scalar) would silently promote a float32
program — ``udeb.py``/``lamcalc.py`` pin all constants to the working
dtype, so the f32 program is genuinely f32 end-to-end.
"""

import numpy as np
import pytest

from regression.helpers import get_variable_values, load_regression_data


def _trajectories(model, dtype):
    import jax

    from rscm_tpu.core.model.program import ModelProgram

    prog = ModelProgram(model, dtype=dtype)
    endo, _ = jax.jit(prog.run_fn)(
        prog.gather_endo(), prog.gather_exo(), prog.gather_params(),
        prog.gather_internals(),
    )
    return {k: np.asarray(v, np.float64) for k, v in endo.items()}


def _drift(build):
    """Per-variable scale-relative f32/f64 divergence of the traced program."""
    t64 = _trajectories(build(), np.float64)
    t32 = _trajectories(build(), np.float32)
    out = {}
    for k in t64:
        a, b = t64[k], t32[k]
        scale = np.nanmax(np.abs(a))
        if not np.isfinite(scale) or scale == 0.0:
            scale = 1.0
        out[k] = float(np.nanmax(np.abs(a - b)) / scale)
    return out


def _assert_drift_below(drift, bound):
    over = {k: v for k, v in drift.items() if not (v < bound)}
    assert not over, (
        f"f32 drift exceeds {bound:g} for: "
        + ", ".join(f"{k}={v:.2e}" for k, v in sorted(over.items()))
    )


def test_ghg_forcing_f32_drift():
    """Analytical forcing: f32 drift ~1e-7..8e-7, bound 5e-6 (regression
    asserts rtol 1e-5 against MAGICC7 — f32 is below even that)."""
    from regression.test_ghg_forcing import build_ghg_forcing_model

    df, config = load_regression_data("ghg_forcing", "01_concentration_driven")
    years, co2 = get_variable_values(df, "Atmospheric Concentrations|CO2")
    _, ch4 = get_variable_values(df, "Atmospheric Concentrations|CH4")
    _, n2o = get_variable_values(df, "Atmospheric Concentrations|N2O")
    drift = _drift(lambda: build_ghg_forcing_model(years, co2, ch4, n2o, config))
    assert len(drift) >= 3
    _assert_drift_below(drift, 5e-6)


def test_udeb_f32_drift_default():
    """ClimateUDEB full default: monthly scan x Thomas solve x 350 yr
    accumulates to ~1e-6; bound 5e-5 vs the 1.5e-2 regression tolerance."""
    from regression.test_ocean_udeb import build_ocean_model, step_forcing

    df, config = load_regression_data("ocean_udeb", "10_full_default")
    years, _ = get_variable_values(df, "Surface Temperature")
    erf = step_forcing(years, config.get("core_delq2xco2", 3.71))
    drift = _drift(lambda: build_ocean_model(config, years, erf))
    assert set(drift) >= {"Surface Temperature", "Heat Uptake"}
    _assert_drift_below(drift, 5e-5)


@pytest.mark.slow
def test_udeb_f32_drift_time_varying_ecs():
    """The in-graph LAMCALC iteration (time-varying ECS) is the largest
    UDEB accumulation risk: measured ~8e-6, bound 1e-4."""
    from regression.test_ocean_udeb import build_ocean_model, step_forcing

    df, config = load_regression_data("ocean_udeb", "09_time_varying_ecs")
    years, _ = get_variable_values(df, "Surface Temperature")
    erf = step_forcing(years, config.get("core_delq2xco2", 3.71))
    drift = _drift(lambda: build_ocean_model(config, years, erf))
    _assert_drift_below(drift, 1e-4)


@pytest.mark.slow
def test_emissions_driven_f32_drift():
    """Full ten-component emissions-driven pathway: worst variable
    (Carbon Flux|Terrestrial) measured ~4e-5; bound 5e-4 — still two
    orders below the 5e-2 emissions-driven tolerance."""
    from regression.test_emissions_driven import (
        _extract_emissions,
        build_emissions_driven_model,
    )

    df, config = load_regression_data("ghg_forcing", "03_emissions_driven")
    years, exp_co2 = get_variable_values(df, "Atmospheric Concentrations|CO2")
    _, exp_ch4 = get_variable_values(df, "Atmospheric Concentrations|CH4")
    _, exp_n2o = get_variable_values(df, "Atmospheric Concentrations|N2O")
    emissions = _extract_emissions(df, years)
    initial_conditions = {
        "Atmospheric Concentration|CO2": float(exp_co2[0]),
        "Atmospheric Concentration|CH4": float(exp_ch4[0]),
        "Atmospheric Concentration|N2O": float(exp_n2o[0]),
        "Surface Temperature": 0.0,
        "Ocean Surface pCO2": float(exp_co2[0]),
        "Cumulative Ocean Uptake": 0.0,
        "Carbon Pool|Plant": 884.86,
        "Carbon Pool|Detritus": 92.77,
        "Carbon Pool|Soil": 1681.53,
        "Carbon Pool|Humus": 836.0,
    }
    drift = _drift(
        lambda: build_emissions_driven_model(
            years, emissions, initial_conditions, config
        )
    )
    assert len(drift) >= 20  # the whole coupled graph is exercised
    _assert_drift_below(drift, 5e-4)


def test_f32_program_is_not_promoted():
    """An f32 program must stay f32 end-to-end under x64 mode: a stray
    strong-f64 constant would silently promote (and break) the scan."""
    import jax

    from regression.test_ocean_udeb import build_ocean_model, step_forcing
    from rscm_tpu.core.model.program import ModelProgram

    df, config = load_regression_data("ocean_udeb", "10_full_default")
    years, _ = get_variable_values(df, "Surface Temperature")
    erf = step_forcing(years, config.get("core_delq2xco2", 3.71))
    prog = ModelProgram(build_ocean_model(config, years, erf), dtype=np.float32)
    shapes = jax.eval_shape(
        prog.run_fn, prog.gather_endo(), prog.gather_exo(),
        prog.gather_params(), prog.gather_internals(),
    )
    leaves = jax.tree.leaves(shapes)
    assert leaves and all(leaf.dtype == np.float32 for leaf in leaves)
