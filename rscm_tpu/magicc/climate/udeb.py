"""
ClimateUDEB: 4-box atmosphere + 2 x N-layer upwelling-diffusion ocean.

Mirror of ``crates/rscm-magicc/src/climate/udeb/`` (+ ``state.rs``,
``parameters/climate_udeb.rs``): monthly sub-steps solving an implicit
tridiagonal diffusion/upwelling system per hemisphere (Thomas solve),
LAMCALC-derived ocean/land feedbacks with time-varying ECS (cumulative-T
and forcing feedbacks), depth-dependent ocean area factors, SST->air
temperature adjustment, ground-heat damping, and variable upwelling.

Two execution paths share the physics:

- the **host** path mirrors the reference literally (validated against all
  12 Fortran MAGICC7 ocean_udeb regression scenarios);
- the **traced** path runs the whole yearly update as pure jnp inside the
  fused scan program: monthly sub-steps via an inner ``lax.scan``,
  vectorised tridiagonal assembly, a traced 40-iteration LAMCALC
  (``lamcalc_traced``) for the time-varying ECS, and the cumulative-
  temperature history as a fixed ring buffer.  Host/traced agreement is at
  machine precision (see tests/test_udeb_traced.py).
"""

from __future__ import annotations

import math

import numpy as np

from rscm_tpu.components._builder import make_builder
from rscm_tpu.core.component import Component, Input, Output, Parameter, State
from rscm_tpu.core.spatial import FourBoxRegion
from rscm_tpu.core.state import FourBoxSlice
from rscm_tpu.utils import thomas_solve, thomas_solve_batched

from .lamcalc import LamcalcParams, LamcalcResult, compute_qfrac, lamcalc

__all__ = ["ClimateUDEB", "ClimateUDEBBuilder", "CMIP5_PROFILE_NH", "CMIP5_PROFILE_SH"]

DIFFUSIVITY_CM2S_TO_M2YR = 3155.76
RHO_SEAWATER = 1026.0
CP_SEAWATER = 3985.0
SECONDS_PER_YEAR = 31557600.0

# CMIP5-derived initial ocean temperature profiles (climate_udeb.rs tables)
CMIP5_PROFILE_NH = (
    1.89503822e01, 1.58484640e01, 1.27692938e01, 1.11237631e01, 9.93378544e00,
    8.89700890e00, 8.01173782e00, 7.24060631e00, 6.58022213e00, 5.99888515e00,
    5.47700644e00, 5.02416515e00, 4.62269211e00, 4.27446032e00, 3.95875454e00,
    3.70120311e00, 3.47130036e00, 3.26678157e00, 3.08187413e00, 2.93045211e00,
    2.79141068e00, 2.66952801e00, 2.55478907e00, 2.44816899e00, 2.35198379e00,
    2.26331019e00, 2.18005610e00, 2.10292435e00, 2.02744699e00, 1.95637441e00,
    1.89118743e00, 1.82867718e00, 1.76954043e00, 1.71074319e00, 1.65469503e00,
    1.60236323e00, 1.55269921e00, 1.50864816e00, 1.47147048e00, 1.44045138e00,
    1.41173756e00, 1.38347185e00, 1.35783422e00, 1.33539736e00, 1.31498563e00,
    1.29516900e00, 1.27472460e00, 1.25263810e00, 1.22954643e00, 1.20586693e00,
)
CMIP5_PROFILE_SH = (
    1.62849369e01, 1.35041571e01, 1.10637445e01, 9.45342350e00, 8.30402851e00,
    7.37928152e00, 6.60113478e00, 5.90550613e00, 5.29829597e00, 4.77080584e00,
    4.31242418e00, 3.93976259e00, 3.62348270e00, 3.35576391e00, 3.11617875e00,
    2.93644977e00, 2.77795982e00, 2.63738632e00, 2.50925493e00, 2.40222931e00,
    2.30221725e00, 2.21322107e00, 2.12794638e00, 2.04543614e00, 1.96889246e00,
    1.89580762e00, 1.82651293e00, 1.75886285e00, 1.69188118e00, 1.62586987e00,
    1.56049752e00, 1.49373257e00, 1.42720032e00, 1.35796928e00, 1.28947854e00,
    1.22542751e00, 1.16357803e00, 1.10515058e00, 1.05139232e00, 1.00322735e00,
    9.58882809e-01, 9.15422320e-01, 8.75476420e-01, 8.43416333e-01, 8.16016912e-01,
    7.90101945e-01, 7.68699825e-01, 7.51805604e-01, 7.36583769e-01, 7.25481987e-01,
)

_HYPSOMETRY_DEPTH = (0.0, 200.0, 500.0, 1000.0, 1500.0, 2000.0, 2500.0, 3000.0,
                     3500.0, 4000.0, 4500.0, 5000.0)
_HYPSOMETRY_AREA = (1.0, 0.975, 0.95, 0.92, 0.91, 0.87, 0.81, 0.72, 0.55, 0.38,
                    0.18, 0.05)


def heat_capacity_per_unit_area(depth_m: float) -> float:
    return RHO_SEAWATER * CP_SEAWATER * depth_m / SECONDS_PER_YEAR


class ClimateUDEB(Component):
    """Upwelling-diffusion energy-balance climate model."""

    tags = ("climate", "udeb", "magicc")
    category = "Climate"

    #: common alternate parameter spelling used in MAGICC configs
    parameter_aliases = {"forcing_2xco2": "rf_2xco2"}

    total_erf = Input("Effective Radiative Forcing", unit="W/m^2")
    surface_temperature = State("Surface Temperature", unit="K", grid="FourBox")
    heat_uptake = Output("Heat Uptake", unit="W/m^2")
    ocean_heat_content = Output("Ocean Heat Content", unit="J/m^2")
    sst = Output("Sea Surface Temperature", unit="K")

    n_layers = Parameter(default=50, static=True)
    mixed_layer_depth = Parameter(default=60.0, unit="m", static=True)
    layer_thickness = Parameter(default=100.0, unit="m", static=True)
    kappa = Parameter(default=0.75, unit="cm^2/s")
    kappa_min = Parameter(default=0.1, unit="cm^2/s")
    kappa_dkdt = Parameter(default=-0.191)
    w_initial = Parameter(default=3.5, unit="m/yr")
    w_variable_fraction = Parameter(default=0.7)
    w_threshold_temp_nh = Parameter(default=8.0, unit="K")
    w_threshold_temp_sh = Parameter(default=8.0, unit="K")
    ecs = Parameter(default=3.0, unit="K")
    rf_2xco2 = Parameter(default=3.71, unit="W/m^2")
    rlo = Parameter(default=1.317)
    feedback_q_sensitivity = Parameter(default=7.84e-9)
    feedback_cumt_sensitivity = Parameter(default=0.08)
    feedback_cumt_period = Parameter(default=300.0, unit="yr", static=True)
    k_lo = Parameter(default=1.44, unit="W/m^2/K")
    k_ns = Parameter(default=0.31, unit="W/m^2/K")
    amplify_ocean_to_land = Parameter(default=1.02)
    nh_land_fraction = Parameter(default=0.42, static=True)
    sh_land_fraction = Parameter(default=0.21, static=True)
    depth_dependent_area = Parameter(default=1.0, static=True)
    temp_adjust_alpha = Parameter(default=1.04)
    temp_adjust_gamma = Parameter(default=-0.002)
    polar_sinking_ratio = Parameter(default=0.2)
    land_heat_capacity_enabled = Parameter(default=True, static=True)
    k_lg = Parameter(default=0.1, unit="W/m^2/K")
    land_hc_eff_thickness = Parameter(default=300.0, unit="m")
    rf_regions_co2 = Parameter(default=(1.4089, 1.37045, 1.43333, 1.33257), static=True)
    efficacy_apply = Parameter(default=0, static=True)
    prescribed_efficacy_co2 = Parameter(default=1.0)
    ocean_temp_profile = Parameter(default="CMIP5", static=True)  # "CMIP5" | "Analytical"
    steps_per_year = Parameter(default=12, static=True)
    max_temperature = Parameter(default=25.0, unit="K")
    #: execution engine for the traced monthly sub-step loop:
    #: "auto" (default: the Pallas kernel when the *default* backend is
    #: TPU, the XLA inner scan elsewhere — pass "xla" explicitly when
    #: pinning a run to a non-default device on a TPU host), "xla"
    #: (inner lax.scan) or "pallas" (the whole
    #: year of monthly sub-steps as one on-chip kernel,
    #: rscm_tpu/ops/udeb_month.py — keeps every Thomas intermediate in
    #: VMEM; differentially tested against the xla engine, 2x ensemble
    #: throughput at 100k members)
    month_engine = Parameter(default="auto", static=True)
    #: tridiagonal solver for the traced monthly column update:
    #: "sequential" (Thomas sweep unrolled over layers — bit-matches the
    #: host path and measured fastest on TPU at 50 layers) or "assoc"
    #: (associative-scan solve, depth ~log N, ~1e-12-relative agreement;
    #: for much deeper columns)
    tridiag_solver = Parameter(default="sequential", static=True)
    #: gate for the in-graph LAMCALC on the traced path; with False the
    #: compiled program reuses the build-time lambdas (exact when the ECS
    #: feedback sensitivities are zero; a documented approximation
    #: otherwise that trades ECS time-variation for a much smaller program)
    time_varying_ecs = Parameter(default=True, static=True)

    def __init__(self, **params):
        super().__init__(**params)
        if self.n_layers < 2:
            raise ValueError(f"invalid n_layers: must be >= 2, got {self.n_layers}")
        if not np.isfinite(self.prescribed_efficacy_co2) or self.prescribed_efficacy_co2 <= 0:
            raise ValueError(
                "invalid prescribed_efficacy_co2: must be finite and positive, "
                f"got {self.prescribed_efficacy_co2}"
            )
        result = self._run_lamcalc(self.ecs)
        if result is None:
            raise ValueError(
                f"LAMCALC iteration failed to converge for ECS={self.ecs}, RLO={self.rlo}"
            )
        self.lambda_ocean = result.lambda_ocean
        self.lambda_land = result.lambda_land
        self.matrix_inverse = result.matrix_inverse
        self.co2_internal_efficacy = result.co2_internal_efficacy
        area = np.asarray(self.global_box_fractions())
        self.co2_qfrac = compute_qfrac(self.rf_regions_co2, area)
        self.af_top, self.af_bottom, self.af_diff = self.compute_area_factors()

    # Note: the LAMCALC products (lambda_ocean/lambda_land/matrix_inverse/
    # co2_internal_efficacy) are derived instance attributes, not declared
    # Parameters, so they stay out of the traced pytree; the traced path
    # re-derives them in-graph from the (possibly batched) ecs/rlo/... .

    # -- parameter helpers (climate_udeb.rs impl block) ----------------------

    def _run_lamcalc(self, ecs):
        fgno, fgnl, fgso, fgsl = self.global_box_fractions()
        return lamcalc(
            LamcalcParams(
                q_2xco2=self.rf_2xco2,
                k_lo=self.k_lo,
                k_ns=self.k_ns,
                ecs=ecs,
                rlo=self.rlo,
                amplify_ocean_to_land=self.amplify_ocean_to_land,
                fgno=fgno,
                fgnl=fgnl,
                fgso=fgso,
                fgsl=fgsl,
                rf_regions_co2=tuple(self.rf_regions_co2),
            )
        )

    def kappa_m2_per_yr(self):
        return self.kappa * DIFFUSIVITY_CM2S_TO_M2YR

    def kappa_min_m2_per_yr(self):
        return self.kappa_min * DIFFUSIVITY_CM2S_TO_M2YR

    def lambda_global(self):
        return self.rf_2xco2 / self.ecs

    def global_box_fractions(self):
        fgnl = self.nh_land_fraction / 2.0
        fgno = 0.5 - fgnl
        fgsl = self.sh_land_fraction / 2.0
        fgso = 0.5 - fgsl
        return (fgno, fgnl, fgso, fgsl)

    def ocean_area_at_depth(self, depth_m: float) -> float:
        hydro = float(
            np.interp(depth_m, _HYPSOMETRY_DEPTH, _HYPSOMETRY_AREA)
        )
        return 1.0 + self.depth_dependent_area * (hydro - 1.0)

    def compute_area_factors(self):
        n = self.n_layers
        af_top, af_bottom, af_diff = [], [], []
        for layer in range(n):
            if layer == 0:
                z_top, z_bottom = 0.0, self.mixed_layer_depth
            else:
                z_top = self.mixed_layer_depth + (layer - 1) * self.layer_thickness
                z_bottom = z_top + self.layer_thickness
            a_top = self.ocean_area_at_depth(z_top)
            a_bottom = self.ocean_area_at_depth(z_bottom)
            a_avg = (a_top + a_bottom) / 2.0
            af_top.append(a_top / a_avg)
            af_bottom.append(a_bottom / a_avg)
            af_diff.append((a_top - a_bottom) / a_avg)
        return np.asarray(af_top), np.asarray(af_bottom), np.asarray(af_diff)

    def mixed_layer_heat_capacity(self):
        return heat_capacity_per_unit_area(self.mixed_layer_depth)

    def ground_heat_capacity(self):
        return heat_capacity_per_unit_area(self.land_hc_eff_thickness)

    def initial_ocean_profile(self, hemi: int) -> np.ndarray:
        assert hemi in (0, 1)
        if self.ocean_temp_profile == "CMIP5":
            cmip5 = CMIP5_PROFILE_NH if hemi == 0 else CMIP5_PROFILE_SH
            profile = np.empty(self.n_layers)
            for i in range(self.n_layers):
                profile[i] = cmip5[i] if i < len(cmip5) else cmip5[-1]
            return profile
        # analytical exponential profile
        t_mix, t_polar = 17.2, 1.0
        kappa = self.kappa_m2_per_yr()
        profile = np.empty(self.n_layers)
        profile[0] = t_mix
        for layer in range(1, self.n_layers):
            depth = (layer - 1.0) * self.layer_thickness + 0.5 * self.layer_thickness
            profile[layer] = t_polar + (t_mix - t_polar) * math.exp(
                -self.w_initial * depth / kappa
            )
        return profile

    # -- internal state (climate/state.rs) ------------------------------------

    #: capacity of the cumulative-temperature ring buffer; must cover
    #: feedback_cumt_period / dt steps (512 >= 300 annual steps + margin)
    history_capacity = Parameter(default=512, static=True)

    def create_initial_state(self):
        profiles = [self.initial_ocean_profile(0), self.initial_ocean_profile(1)]
        return {
            "ocean_temps": np.zeros((2, self.n_layers)),
            "upwelling_rates": np.array([self.w_initial, self.w_initial]),
            # newest-first ring buffers replacing the reference's unbounded
            # Vec history (state.rs temperature_history/dt_history): entry k
            # holds (global_temp * dt, dt) of the step k steps ago
            "th_values": np.zeros(self.history_capacity),
            "th_dts": np.zeros(self.history_capacity),
            "land_temps": np.zeros(2),
            "ground_temps": np.zeros(2),
            "alpha_eff": np.array([self.temp_adjust_alpha, self.temp_adjust_alpha]),
            "hemi_heat_exchange": np.zeros(2),
            "initial_ocean_profile": np.stack(profiles),
            "polar_sinking_temp": 1.0,
            "mixed_layer_initial_temp": float(profiles[0][0]),
        }

    # -- scan-layout hooks -----------------------------------------------------
    #
    # Inside the fused scan the cumulative-temperature ring is CIRCULAR
    # (slot p holds the entry of the latest year ≡ p mod capacity), so a
    # year writes one slot instead of shifting the whole (B, capacity)
    # buffer — the shift was ~0.31 s of the 100k x 251-yr ensemble.  The
    # host-visible contract stays newest-first; the program converts once
    # at entry/exit via these hooks (mirror of OceanCarbon's flux ring).

    def _cumt_window(self, dt_year: float):
        """Static feedback window: (n_eff, frac, newest-first weights).

        ``n_eff`` whole entries get weight 1 and the entry aged ``n_eff``
        gets the fractional remainder (zero when the window is clamped to
        the ring capacity) — the discretisation of the cumulative-
        temperature feedback period under a uniform ``dt``.
        """
        cap = int(self.history_capacity)
        period = self.feedback_cumt_period
        n_full = int(period // dt_year)
        frac = (period - n_full * dt_year) / dt_year
        n_eff = min(n_full, cap)
        if n_full >= cap:
            frac = 0.0
        weights = np.zeros(cap)
        weights[:n_eff] = 1.0
        if frac > 0:
            weights[n_eff] = frac
        return n_eff, frac, weights

    def pack_scan_state(self, state, start_idx: int, dt=None):
        cap = int(self.history_capacity)
        slots = (int(start_idx) - 1 - np.arange(cap)) % cap
        out = {**state, "th_values": state["th_values"][slots]}
        if dt is not None:
            # seed the running boxcar sum: inside the scan the windowed
            # part of cum_t is a recursion (add the new entry, subtract
            # the entry aging out — two ring slots) instead of a
            # (B, capacity) dot every year, with a Kahan compensation
            # term so the running sum does not drift in float32.  Only
            # valid under a uniform axis; otherwise the solve falls back
            # to the dot (the absence of this key is the signal).
            n_eff, _, _ = self._cumt_window(float(dt))
            th = state["th_values"]
            boxcar = np.ones(cap)
            boxcar[n_eff:] = 0.0
            if hasattr(th, "dtype"):
                # pin to the carry dtype: a float64 numpy weight vector
                # would promote an f32 program's running sum
                boxcar = boxcar.astype(np.dtype(th.dtype))
            from rscm_tpu.core import xmath as xm

            s0 = xm.dot(th, boxcar)
            out["th_cumsum"] = s0
            out["th_cumsum_c"] = s0 * 0.0
        return out

    def unpack_scan_state(self, state, end_idx: int, dt=None):
        cap = int(self.history_capacity)
        ages = (int(end_idx) - 1 - np.arange(cap)) % cap
        out = {**state, "th_values": state["th_values"][ages]}
        out.pop("th_cumsum", None)
        out.pop("th_cumsum_c", None)
        return out

    # -- physics pieces (udeb/mod.rs, udeb/ocean_column.rs) --------------------

    def apply_efficacy_and_qfrac(self, erf, co2_efficacy):
        if self.efficacy_apply == 1:
            erf_adjusted = erf * self.prescribed_efficacy_co2
        elif self.efficacy_apply == 2 and np.isfinite(co2_efficacy) and co2_efficacy > 0:
            erf_adjusted = erf * self.prescribed_efficacy_co2 / co2_efficacy
        else:
            erf_adjusted = erf
        return np.asarray([erf_adjusted * q for q in self.co2_qfrac])

    def adjusted_ecs(self, global_forcing, state):
        cumt_2x = self.ecs * self.feedback_cumt_period
        period = self.feedback_cumt_period
        values = state["th_values"]  # newest-first
        dts = state["th_dts"]

        # Walk newest-first accumulating step widths until the feedback
        # period is covered, weighting the last partial step (mirror of
        # udeb/mod.rs:302-350 over the unbounded history).
        cum_t = 0.0
        years_remaining = period
        for value, dt in zip(values, dts):
            if years_remaining <= 0.0 or dt <= 0.0:
                if years_remaining <= 0.0:
                    break
                continue
            if dt <= years_remaining:
                cum_t += value
                years_remaining -= dt
            else:
                cum_t += value * (years_remaining / dt)
                years_remaining = 0.0

        cumt_factor = (
            1.0 + self.feedback_cumt_sensitivity * (cum_t - cumt_2x) / cumt_2x
            if abs(cumt_2x) > 1e-15
            else 1.0
        )
        q_factor = 1.0 + self.feedback_q_sensitivity * (
            max(global_forcing, 0.0) - self.rf_2xco2
        )
        return self.ecs * cumt_factor * q_factor

    def calculate_land_temperature(self, ocean_temp, land_forcing, land_fraction,
                                   lambda_land):
        numerator = land_forcing * land_fraction + self.k_lo * self.amplify_ocean_to_land * ocean_temp
        denominator = lambda_land * land_fraction + self.k_lo
        return min(numerator / denominator, self.max_temperature)

    def sst_to_air_temperature(self, sst):
        alpha, gamma = self.temp_adjust_alpha, self.temp_adjust_gamma
        t_star = -(alpha - 1.0) / (2.0 * gamma) if abs(gamma) > 1e-15 else math.inf
        if sst < t_star:
            return alpha * sst + gamma * sst * sst
        delta_max = alpha * t_star + gamma * t_star * t_star - t_star
        return sst + delta_max

    def layer_diffusivities(self, state, hemi):
        n = self.n_layers
        dz = self.layer_thickness
        total_depth = self.mixed_layer_depth + (n - 1.0) * dz
        t_top = state["ocean_temps"][hemi][0]
        t_bottom = state["ocean_temps"][hemi][n - 1]
        kappa_min = self.kappa_min_m2_per_yr()

        depths = self.mixed_layer_depth + np.arange(n - 1) * dz
        relative_depth = depths / total_depth
        k = (
            (1.0 - relative_depth) * self.kappa_dkdt * (t_top - t_bottom) + self.kappa
        ) * DIFFUSIVITY_CM2S_TO_M2YR
        return np.maximum(k, kappa_min)

    def step_hemisphere(self, state, hemi, forcing, dt, lambda_ocean, lambda_land,
                        hemi_heat_exchange, ground_temp, alpha_eff):
        """One monthly implicit ocean-column step (ocean_column.rs:81-240)."""
        n = self.n_layers
        kappas = self.layer_diffusivities(state, hemi)
        w = state["upwelling_rates"][hemi]
        dz = self.layer_thickness
        dz_mix = self.mixed_layer_depth
        pi_ratio = self.polar_sinking_ratio
        af_top, af_bot, af_diff = self.af_top, self.af_bottom, self.af_diff
        c_mix = self.mixed_layer_heat_capacity()

        f_l_hemi = (self.nh_land_fraction if hemi == 0 else self.sh_land_fraction) / 2.0
        f_o_hemi = 0.5 - f_l_hemi
        denominator = f_o_hemi * (self.k_lo + f_l_hemi * lambda_land)

        term_feedback = alpha_eff / c_mix * (
            lambda_ocean
            + lambda_land * self.k_lo * self.amplify_ocean_to_land * f_l_hemi / denominator
        )

        dz1 = dz / 2.0
        term_diff = kappas[0] / (dz_mix * dz1) * dt
        term_upwell = w / dz_mix * dt
        forcing_amp = 1.0 + self.k_lo * f_l_hemi / denominator

        a = np.zeros(n)
        b = np.zeros(n)
        c = np.zeros(n)
        d = np.zeros(n)

        temps = state["ocean_temps"][hemi]

        b[0] = (
            1.0
            + term_feedback * dt * af_top[0]
            + term_diff * af_bot[0]
            + term_upwell * pi_ratio * af_bot[0]
        )
        c[0] = -(term_diff + term_upwell) * af_bot[0]
        d[0] = temps[0] + (forcing * forcing_amp + hemi_heat_exchange) / c_mix * dt * af_top[0]

        if self.land_heat_capacity_enabled:
            land_temp = state["land_temps"][hemi]
            d[0] -= (
                self.k_lg * (land_temp - ground_temp) / (c_mix * f_o_hemi) * dt * af_top[0]
            )

        for i in range(1, n - 1):
            dz_up = dz1 if i == 1 else dz
            term_diff_up = kappas[i - 1] / (dz * dz_up) * dt
            term_diff_down = kappas[i] / (dz * dz) * dt
            term_upwell_layer = w / dz * dt
            a[i] = -term_diff_up * af_top[i]
            b[i] = (
                1.0
                + term_diff_up * af_top[i]
                + term_diff_down * af_bot[i]
                + term_upwell_layer * af_top[i]
            )
            c[i] = -(term_diff_down + term_upwell_layer) * af_bot[i]
            d[i] = temps[i] + pi_ratio * term_upwell_layer * temps[0] * af_diff[i]

        term_diff_up = kappas[n - 2] / (dz * dz) * dt
        term_upwell_bottom = w / dz * dt
        a[n - 1] = -term_diff_up * af_top[n - 1]
        b[n - 1] = 1.0 + (term_diff_up + term_upwell_bottom) * af_top[n - 1]
        d[n - 1] = temps[n - 1] + pi_ratio * term_upwell_bottom * temps[0] * af_top[n - 1]

        delta_w = w - self.w_initial
        if abs(delta_w) > 1e-15:
            init = state["initial_ocean_profile"][hemi]
            t_polar = state["polar_sinking_temp"]
            d[0] += dt / dz_mix * delta_w * (init[1] - t_polar) * af_bot[0]
            dt_per_dz = dt / dz
            for i in range(1, n - 1):
                d[i] += dt_per_dz * delta_w * (init[i + 1] * af_bot[i] - init[i] * af_top[i])
                d[i] += dt_per_dz * delta_w * t_polar * af_diff[i]
            d[n - 1] += dt_per_dz * delta_w * (t_polar - init[n - 1]) * af_top[n - 1]

        new_temps = thomas_solve(a, b, c, d)
        state["ocean_temps"][hemi] = np.minimum(new_temps, self.max_temperature)
        return state["ocean_temps"][hemi][0]

    def update_upwelling(self, state, global_temp):
        w_0 = self.w_initial
        f_var = self.w_variable_fraction
        w_min = w_0 * (1.0 - f_var)
        for hemi, t_thresh in enumerate([self.w_threshold_temp_nh, self.w_threshold_temp_sh]):
            w = w_0 * (1.0 - f_var * min(global_temp / t_thresh, 1.0))
            state["upwelling_rates"][hemi] = max(w, w_min)

    def calculate_heat_uptake(self, forcing, temperature, lambda_ocean, lambda_land):
        weights = np.asarray(self.global_box_fractions())
        lambdas = np.array([lambda_ocean, lambda_land, lambda_ocean, lambda_land])
        q_global = float(np.dot(weights, forcing))
        feedback_global = float(np.dot(weights, lambdas * np.asarray(temperature)))
        return q_global - feedback_global

    def calculate_ocean_heat_content(self, state):
        rho_c = RHO_SEAWATER * CP_SEAWATER
        total = 0.0
        for hemi in range(2):
            temps = state["ocean_temps"][hemi]
            total += rho_c * self.mixed_layer_depth * temps[0]
            total += rho_c * self.layer_thickness * float(np.sum(temps[1:]))
        return total / 2.0

    # -- main solve (udeb/mod.rs:399-470) ---------------------------------------

    def solve_ctx(self, ctx, inputs, internal_state):
        from rscm_tpu.core.state import is_traced

        if is_traced(inputs.total_erf.at_start()) or is_traced(ctx.t_current):
            return self._solve_traced(ctx, inputs, internal_state)
        return self._solve_host(ctx, inputs, internal_state)

    # .. traced path: the whole yearly update as pure jnp (lives inside the
    #    fused lax.scan step program; monthly sub-steps via an inner scan) ..

    def _solve_traced(self, ctx, inputs, internal_state):
        import jax.numpy as jnp
        from jax import lax

        from rscm_tpu.utils import (  # noqa: F401
            thomas_solve,
            thomas_solve_assoc,
            thomas_solve_batched,
        )

        from .lamcalc import lamcalc_traced

        state = internal_state
        n = self.n_layers
        steps = int(self.steps_per_year)

        spans = np.asarray(ctx.spans, dtype=np.float64)
        dt_year = float(spans[0])
        assert np.allclose(spans, dt_year, rtol=0, atol=0.0), (
            "traced ClimateUDEB requires a uniform time axis"
        )
        dt_sub = dt_year / steps

        erf_start = inputs.total_erf.at_start()
        erf_end_raw = inputs.total_erf.at_end()
        erf_end = jnp.where(jnp.isnan(erf_end_raw), erf_start, erf_end_raw)
        erf_start = jnp.where(jnp.isnan(erf_start), erf_end, erf_start)

        prev_temp = jnp.stack(
            [
                inputs.surface_temperature.at_start(region)
                for region in (
                    FourBoxRegion.NorthernOcean,
                    FourBoxRegion.NorthernLand,
                    FourBoxRegion.SouthernOcean,
                    FourBoxRegion.SouthernLand,
                )
            ]
        )

        ocean_temps = jnp.asarray(state["ocean_temps"])
        land_temps = jnp.asarray(state["land_temps"])
        ground_temps = jnp.asarray(state["ground_temps"])

        # Working dtype follows the state leaves (the program's dtype).
        # Constants must be pinned to it: under x64 mode numpy arrays
        # default to float64, and a single strong-f64 constant would
        # promote the whole scan carry, breaking f32 programs.
        wdt = ocean_temps.dtype

        def C(x):
            return jnp.asarray(x, dtype=wdt)

        # branch-free resume seeding (mirror of the host path's guard)
        seed = (
            (ocean_temps[0, 0] == 0.0)
            & (prev_temp[0] != 0.0)
            & ~jnp.any(jnp.isnan(prev_temp))
        )
        ocean_temps = ocean_temps.at[0, 0].set(
            jnp.where(seed, prev_temp[0], ocean_temps[0, 0])
        )
        ocean_temps = ocean_temps.at[1, 0].set(
            jnp.where(seed, prev_temp[2], ocean_temps[1, 0])
        )
        land_temps = jnp.where(seed, jnp.stack([prev_temp[1], prev_temp[3]]), land_temps)
        ground_temps = jnp.where(seed, land_temps, ground_temps)

        # adjusted ECS from the ring buffer: static weights cover the
        # feedback period under the uniform dt
        period = self.feedback_cumt_period
        capacity = int(self.history_capacity)
        n_eff, frac, weights = self._cumt_window(dt_year)
        scan_mode = getattr(ctx, "scan_mode", False)
        if scan_mode and "th_cumsum" in state:
            # running boxcar sum carried across years (seeded by
            # pack_scan_state): the windowed part of cum_t reads one
            # scalar carry; only the fractional-age entry still touches
            # the ring (one slot) — the (B, capacity) dot it replaces was
            # ~7% of the 100k MAGICC ensemble's wall-clock
            idx = jnp.asarray(ctx.step_index, dtype=jnp.int32)
            cum_t = jnp.asarray(state["th_cumsum"])
            if frac > 0:
                slot_frac = (idx - 1 - n_eff) % capacity
                cum_t = cum_t + C(frac) * jnp.asarray(state["th_values"])[
                    slot_frac
                ]
        elif scan_mode:
            # circular layout inside the fused scan (see pack_scan_state):
            # slot p holds the entry of age (idx-1-p) mod capacity, so the
            # newest-first weights are read through a roll by the
            # (unbatched) step index — used when the axis is non-uniform
            # and the running sum is unavailable
            w_base = weights[(-1 - np.arange(capacity)) % capacity]
            idx = jnp.asarray(ctx.step_index, dtype=jnp.int32)
            weights_circ = jnp.roll(C(w_base), idx)
            cum_t = jnp.dot(jnp.asarray(state["th_values"]), weights_circ)
        else:
            cum_t = jnp.dot(jnp.asarray(state["th_values"]), C(weights))

        cumt_2x = self.ecs * period
        erf_mid = (erf_start + erf_end) / 2.0
        cumt_factor = jnp.where(
            jnp.abs(cumt_2x) > 1e-15,
            1.0 + self.feedback_cumt_sensitivity * (cum_t - cumt_2x) / cumt_2x,
            1.0,
        )
        q_factor = 1.0 + self.feedback_q_sensitivity * (
            jnp.maximum(erf_mid, 0.0) - self.rf_2xco2
        )
        adjusted_ecs = self.ecs * cumt_factor * q_factor

        fgno, fgnl, fgso, fgsl = self.global_box_fractions()
        from .lamcalc import LamcalcParams

        # engine resolution happens before LAMCALC: the Pallas path also
        # runs the per-year LAMCALC iteration as a VMEM kernel
        # (ops/lamcalc_kernel.py) — as an XLA while_loop it was ~35% of
        # the 100k MAGICC ensemble's wall-clock
        month_engine = self.month_engine
        if month_engine == "auto":
            # resolve against the declared execution target (the mesh a
            # runner is compiling for), not jax.default_backend(): under
            # the forced-CPU mesh fallback the default backend may be a
            # TPU — or a hung tunnel that must not even be initialized
            from rscm_tpu.utils.target import target_platform

            month_engine = "pallas" if target_platform() == "tpu" else "xla"

        if self.time_varying_ecs:
            lamcalc_params = LamcalcParams(
                q_2xco2=self.rf_2xco2, k_lo=self.k_lo, k_ns=self.k_ns,
                ecs=adjusted_ecs, rlo=self.rlo,
                amplify_ocean_to_land=self.amplify_ocean_to_land,
                fgno=fgno, fgnl=fgnl, fgso=fgso, fgsl=fgsl,
                rf_regions_co2=tuple(self.rf_regions_co2),
            )
            lamcalc_fallback = (
                self.lambda_ocean, self.lambda_land, self.matrix_inverse,
                self.co2_internal_efficacy,
            )
            if month_engine == "pallas":
                from rscm_tpu.ops.lamcalc_kernel import lamcalc_scalars

                lam_o, lam_l, co2_eff = lamcalc_scalars(
                    lamcalc_params, adjusted_ecs, lamcalc_fallback
                )
            else:
                lam_o, lam_l, _inv, co2_eff = lamcalc_traced(
                    lamcalc_params, adjusted_ecs, lamcalc_fallback
                )
        else:
            lam_o = C(self.lambda_ocean)
            lam_l = C(self.lambda_land)
            co2_eff = C(self.co2_internal_efficacy)
        # Unlike the host path (which reuses the build-time LAMCALC result
        # when adjusted_ecs == ecs), the traced path always derives the
        # lambdas in-graph: parameters may be traced/batched, so the
        # build-time constants can be stale.  The iteration is
        # deterministic, so for matching ECS the recomputed values agree
        # with the build-time ones to floating-point precision.

        c_ground = self.ground_heat_capacity() if self.land_heat_capacity_enabled else 0.0
        c_mix = self.mixed_layer_heat_capacity()
        dz = self.layer_thickness
        dz_mix = self.mixed_layer_depth
        dz1 = dz / 2.0
        pi_ratio = self.polar_sinking_ratio
        af_top = C(self.af_top)
        af_bot = C(self.af_bottom)
        af_diff = C(self.af_diff)
        kappa_min = self.kappa_min_m2_per_yr()
        total_depth = dz_mix + (n - 1.0) * dz
        depths = dz_mix + np.arange(n - 1) * dz
        relative_depth = C(depths / total_depth)

        f_l = np.array([self.nh_land_fraction / 2.0, self.sh_land_fraction / 2.0])
        f_o = 0.5 - f_l
        w_thresh = jnp.stack(
            [C(self.w_threshold_temp_nh), C(self.w_threshold_temp_sh)]
        )
        qfrac = C(self.co2_qfrac)
        init_profiles = jnp.asarray(state["initial_ocean_profile"])
        t_polar = state["polar_sinking_temp"]
        alpha_eff = jnp.asarray(state["alpha_eff"])

        def apply_forcing(erf):
            if self.efficacy_apply == 1:
                erf_adjusted = erf * self.prescribed_efficacy_co2
            elif self.efficacy_apply == 2:
                ok = jnp.isfinite(co2_eff) & (co2_eff > 0)
                erf_adjusted = jnp.where(
                    ok, erf * self.prescribed_efficacy_co2 / jnp.where(ok, co2_eff, 1.0),
                    erf,
                )
            else:
                erf_adjusted = erf
            return erf_adjusted * qfrac

        def sst_to_air(sst):
            # branch-free in (possibly traced) gamma: quadratic regime below
            # t_star, linear continuation above; pure linear when gamma ~ 0
            alpha, gamma = self.temp_adjust_alpha, self.temp_adjust_gamma
            nonzero = jnp.abs(gamma) > 1e-15
            gamma_safe = jnp.where(nonzero, gamma, 1.0)
            t_star = -(alpha - 1.0) / (2.0 * gamma_safe)
            delta_max = alpha * t_star + gamma * t_star * t_star - t_star
            quad_regime = jnp.where(
                sst < t_star, alpha * sst + gamma * sst * sst, sst + delta_max
            )
            return jnp.where(nonzero, quad_regime, alpha * sst)

        f_l_v = C(f_l)  # (2,)
        f_o_v = C(f_o)  # (2,)
        idx = np.arange(1, n - 1)
        dz_up = np.where(idx == 1, dz1, dz)
        inv_dz_dzup = C(1.0 / (dz * dz_up))  # (n-2,)

        def step_ocean_columns(ocean, w, forcing, hemi_exchange, ground, land, a_eff):
            """One monthly implicit update of BOTH hemispheric columns.

            Every per-hemisphere quantity carries a leading axis of length
            2, so the coefficient assembly and the Thomas sweep run as one
            batched computation over hemispheres (x ensemble members under
            vmap) instead of two separate column solves.
            """
            t_top = ocean[:, 0]
            t_bottom = ocean[:, n - 1]
            kappas = jnp.maximum(
                ((1.0 - relative_depth)[None, :] * self.kappa_dkdt
                 * (t_top - t_bottom)[:, None]
                 + self.kappa) * DIFFUSIVITY_CM2S_TO_M2YR,
                kappa_min,
            )  # (2, n-1)

            denominator = f_o_v * (self.k_lo + f_l_v * lam_l)
            term_feedback = a_eff / c_mix * (
                lam_o
                + lam_l * self.k_lo * self.amplify_ocean_to_land * f_l_v / denominator
            )
            term_diff0 = kappas[:, 0] / (dz_mix * dz1) * dt_sub
            term_upwell0 = w / dz_mix * dt_sub
            forcing_amp = 1.0 + self.k_lo * f_l_v / denominator

            # interior rows 1..n-2, vectorised over (hemisphere, layer)
            term_diff_up = kappas[:, idx - 1] * inv_dz_dzup[None, :] * dt_sub
            term_diff_down = kappas[:, idx] / (dz * dz) * dt_sub
            term_upwell_layer = (w / dz * dt_sub)[:, None]  # (2, 1)

            a_mid = -term_diff_up * af_top[idx]
            b_mid = (
                1.0
                + term_diff_up * af_top[idx]
                + term_diff_down * af_bot[idx]
                + term_upwell_layer * af_top[idx]
            )
            c_mid = -(term_diff_down + term_upwell_layer) * af_bot[idx]
            d_mid = ocean[:, idx] + pi_ratio * term_upwell_layer * ocean[:, :1] * af_diff[idx]

            b0 = (
                1.0
                + term_feedback * dt_sub * af_top[0]
                + term_diff0 * af_bot[0]
                + term_upwell0 * pi_ratio * af_bot[0]
            )
            c0 = -(term_diff0 + term_upwell0) * af_bot[0]
            d0 = ocean[:, 0] + (forcing * forcing_amp + hemi_exchange) / c_mix * dt_sub * af_top[0]
            if self.land_heat_capacity_enabled:
                d0 = d0 - self.k_lg * (land - ground) / (c_mix * f_o_v) * dt_sub * af_top[0]

            term_diff_last = kappas[:, n - 2] / (dz * dz) * dt_sub
            term_upwell_last = w / dz * dt_sub
            a_last = -term_diff_last * af_top[n - 1]
            b_last = 1.0 + (term_diff_last + term_upwell_last) * af_top[n - 1]
            d_last = ocean[:, n - 1] + pi_ratio * term_upwell_last * ocean[:, 0] * af_top[n - 1]

            # variable-upwelling source terms (proportional to delta_w, so
            # computing them unconditionally matches the reference's guard)
            delta_w = w - self.w_initial  # (2,)
            init = init_profiles  # (2, n)
            d0 = d0 + dt_sub / dz_mix * delta_w * (init[:, 1] - t_polar) * af_bot[0]
            d_mid = d_mid + dt_sub / dz * delta_w[:, None] * (
                init[:, idx + 1] * af_bot[idx] - init[:, idx] * af_top[idx]
            )
            d_mid = d_mid + dt_sub / dz * delta_w[:, None] * t_polar * af_diff[idx]
            d_last = d_last + dt_sub / dz * delta_w * (t_polar - init[:, n - 1]) * af_top[n - 1]

            zeros2 = jnp.zeros_like(b0)
            a_vec = jnp.concatenate([zeros2[:, None], a_mid, a_last[:, None]], axis=1)
            b_vec = jnp.concatenate([b0[:, None], b_mid, b_last[:, None]], axis=1)
            c_vec = jnp.concatenate([c0[:, None], c_mid, zeros2[:, None]], axis=1)
            d_vec = jnp.concatenate([d0[:, None], d_mid, d_last[:, None]], axis=1)

            # Batched Thomas sweep: same recursion as the host path, unrolled
            # over the 50 static layers — a chain of fused elementwise vector
            # ops over (hemisphere, member).  lax.linalg.tridiagonal_solve
            # measured slower here and faults on TPU at batch >= ~10k.
            if self.tridiag_solver == "assoc":
                solution = thomas_solve_assoc(a_vec, b_vec, c_vec, d_vec)
            else:
                solution = thomas_solve_batched(a_vec, b_vec, c_vec, d_vec)
            return jnp.minimum(solution, self.max_temperature)

        def month_step(carry, frac):
            ocean_temps, land_temps, ground_temps, hemi_exchange, upwelling = carry
            erf = erf_start + frac * (erf_end - erf_start)
            forcing = apply_forcing(erf)

            if self.land_heat_capacity_enabled:
                flux = self.k_lg * (land_temps - ground_temps)
                safe_fl = np.where(f_l < 1e-15, 1.0, f_l)
                delta_ground = flux / (C(safe_fl) * c_ground) * dt_sub
                ground_temps = ground_temps + jnp.where(
                    C(f_l) < 1e-15, 0.0, delta_ground
                )

            ocean_temps = step_ocean_columns(
                ocean_temps, upwelling, jnp.stack([forcing[0], forcing[2]]),
                hemi_exchange, ground_temps, land_temps, alpha_eff,
            )

            t_air_nho = sst_to_air(ocean_temps[0, 0])
            t_air_sho = sst_to_air(ocean_temps[1, 0])
            land_temps = jnp.stack(
                [
                    jnp.minimum(
                        (forcing[1] * fgnl + self.k_lo * self.amplify_ocean_to_land
                         * t_air_nho) / (lam_l * fgnl + self.k_lo),
                        self.max_temperature,
                    ),
                    jnp.minimum(
                        (forcing[3] * fgsl + self.k_lo * self.amplify_ocean_to_land
                         * t_air_sho) / (lam_l * fgsl + self.k_lo),
                        self.max_temperature,
                    ),
                ]
            )

            exchange_nh = self.k_ns / fgno * (t_air_sho - t_air_nho) if fgno > 1e-15 else hemi_exchange[0]
            exchange_sh = self.k_ns / fgso * (t_air_nho - t_air_sho) if fgso > 1e-15 else hemi_exchange[1]
            hemi_exchange = jnp.stack([exchange_nh, exchange_sh])

            global_temp = (
                t_air_nho * fgno + land_temps[0] * fgnl
                + t_air_sho * fgso + land_temps[1] * fgsl
            )
            w_min = self.w_initial * (1.0 - self.w_variable_fraction)
            ratios = jnp.minimum(global_temp / w_thresh, 1.0)
            upwelling = jnp.maximum(
                self.w_initial * (1.0 - self.w_variable_fraction * ratios), w_min
            )
            return (ocean_temps, land_temps, ground_temps, hemi_exchange, upwelling), None

        hemi_exchange = jnp.asarray(state["hemi_heat_exchange"])
        upwelling = jnp.asarray(state["upwelling_rates"])
        if month_engine == "pallas":
            from rscm_tpu.ops import udeb_year_update

            # traced efficacy factor folded into the erf inputs (exactly
            # apply_forcing's multiplicative scaling)
            if self.efficacy_apply == 1:
                eff_factor = C(self.prescribed_efficacy_co2)
            elif self.efficacy_apply == 2:
                ok = jnp.isfinite(co2_eff) & (co2_eff > 0)
                eff_factor = jnp.where(
                    ok,
                    self.prescribed_efficacy_co2 / jnp.where(ok, co2_eff, 1.0),
                    C(1.0),
                )
            else:
                eff_factor = C(1.0)
            scal = jnp.stack([
                C(lam_o), C(lam_l), C(self.kappa), C(self.kappa_dkdt),
                C(kappa_min), C(self.w_initial), C(self.w_variable_fraction),
                C(self.k_lo), C(self.k_ns), C(self.k_lg),
                C(self.amplify_ocean_to_land), C(pi_ratio),
                C(self.temp_adjust_alpha), C(self.temp_adjust_gamma),
                C(self.max_temperature),
                C(c_ground), C(erf_start * eff_factor), C(erf_end * eff_factor),
                C(state["polar_sinking_temp"]),
                C(self.w_threshold_temp_nh), C(self.w_threshold_temp_sh),
            ])
            vec = jnp.concatenate([
                land_temps, ground_temps, hemi_exchange, upwelling, alpha_eff,
            ])
            ocean_temps, vec_out = udeb_year_update(
                self, dt_year, scal, ocean_temps, init_profiles, vec
            )
            land_temps = vec_out[0:2]
            ground_temps = vec_out[2:4]
            hemi_exchange = vec_out[4:6]
            upwelling = vec_out[6:8]
        else:
            fracs = C(np.arange(1, steps + 1) / steps)
            carry = (
                ocean_temps, land_temps, ground_temps,
                hemi_exchange, upwelling,
            )
            (
                ocean_temps, land_temps, ground_temps, hemi_exchange, upwelling
            ), _ = lax.scan(month_step, carry, fracs)

        sst_nh = ocean_temps[0, 0]
        sst_sh = ocean_temps[1, 0]
        alpha = self.temp_adjust_alpha
        new_alpha_eff = jnp.stack(
            [
                jnp.where(jnp.abs(sst_nh) < 1e-15, alpha, sst_to_air(sst_nh) / jnp.where(jnp.abs(sst_nh) < 1e-15, 1.0, sst_nh)),
                jnp.where(jnp.abs(sst_sh) < 1e-15, alpha, sst_to_air(sst_sh) / jnp.where(jnp.abs(sst_sh) < 1e-15, 1.0, sst_sh)),
            ]
        )

        t_air_nho = sst_to_air(sst_nh)
        t_air_sho = sst_to_air(sst_sh)
        surface_temperature = jnp.stack(
            [t_air_nho, land_temps[0], t_air_sho, land_temps[1]]
        )

        area = C([fgno, fgnl, fgso, fgsl])
        global_temp = jnp.dot(surface_temperature, area)

        from rscm_tpu.core import xmath as xm

        if scan_mode:
            # circular: one slot write instead of a whole-buffer shift
            slot = jnp.asarray(ctx.step_index, dtype=jnp.int32) % int(
                self.history_capacity
            )
            new_entry = global_temp * dt_year
            new_th_values = jnp.asarray(state["th_values"]).at[slot].set(new_entry)
        else:
            new_th_values = xm.push_front(
                jnp.asarray(state["th_values"]), global_temp * dt_year
            )
        new_state = {
            "ocean_temps": ocean_temps,
            "upwelling_rates": upwelling,
            "th_values": new_th_values,
            "th_dts": xm.push_front(jnp.asarray(state["th_dts"]), dt_year),
            "land_temps": land_temps,
            "ground_temps": ground_temps,
            "alpha_eff": new_alpha_eff,
            "hemi_heat_exchange": hemi_exchange,
            "initial_ocean_profile": state["initial_ocean_profile"],
            "polar_sinking_temp": state["polar_sinking_temp"],
            "mixed_layer_initial_temp": state["mixed_layer_initial_temp"],
        }
        if scan_mode and "th_cumsum" in state:
            # advance the running boxcar sum: add this year's entry,
            # retire the entry aging out of the window (read from the
            # PRE-update ring — when n_eff == capacity the retiring slot
            # is the one just overwritten).  Kahan-compensated so the
            # float32 recursion stays at rounding-level agreement with
            # the per-year dot over arbitrarily long runs.
            s_prev = jnp.asarray(state["th_cumsum"])
            c_prev = jnp.asarray(state["th_cumsum_c"])
            if n_eff > 0:
                retiring = jnp.asarray(state["th_values"])[
                    (jnp.asarray(ctx.step_index, dtype=jnp.int32) - n_eff)
                    % capacity
                ]
                d = (new_entry - retiring) - c_prev
                s_next = s_prev + d
                c_next = (s_next - s_prev) - d
                new_state["th_cumsum"] = s_next
                new_state["th_cumsum_c"] = c_next
            else:
                new_state["th_cumsum"] = s_prev
                new_state["th_cumsum_c"] = c_prev

        forcing_end = apply_forcing(erf_end)
        lambdas = C([1.0, 0.0, 1.0, 0.0]) * lam_o + C(
            [0.0, 1.0, 0.0, 1.0]
        ) * lam_l
        heat_uptake = jnp.dot(area, forcing_end) - jnp.dot(
            area, lambdas * surface_temperature
        )
        rho_c = RHO_SEAWATER * CP_SEAWATER
        ocean_heat_content = (
            rho_c * dz_mix * (ocean_temps[0, 0] + ocean_temps[1, 0])
            + rho_c * dz * (jnp.sum(ocean_temps[0, 1:]) + jnp.sum(ocean_temps[1, 1:]))
        ) / 2.0
        sst = (sst_nh + sst_sh) / 2.0

        return (
            self.Outputs(
                surface_temperature=FourBoxSlice.from_array(
                    [surface_temperature[i] for i in range(4)]
                ),
                heat_uptake=heat_uptake,
                ocean_heat_content=ocean_heat_content,
                sst=sst,
            ),
            new_state,
        )

    def _solve_host(self, ctx, inputs, internal_state):
        state = internal_state

        erf_start = float(inputs.total_erf.at_start())
        erf_end = inputs.total_erf.at_end()
        erf_end = erf_start if erf_end is None or np.isnan(erf_end) else float(erf_end)
        # When ERF is endogenous (e.g. a schema aggregate) its value at the
        # first step start is still unset; fall back to the end-of-step value
        # rather than poisoning the ocean column with NaN (the reference
        # panics on this wiring — "Zero pivot" in thomas_solve).
        if np.isnan(erf_start):
            erf_start = erf_end
        steps = int(self.steps_per_year)

        prev_temp = [
            float(inputs.surface_temperature.at_start(region))
            for region in (
                FourBoxRegion.NorthernOcean,
                FourBoxRegion.NorthernLand,
                FourBoxRegion.SouthernOcean,
                FourBoxRegion.SouthernLand,
            )
        ]

        # resume support: seed ocean/land temps from a restored collection
        if (
            state["ocean_temps"][0][0] == 0.0
            and prev_temp[0] != 0.0
            and not any(np.isnan(prev_temp))
        ):
            state["ocean_temps"][0][0] = prev_temp[0]
            state["ocean_temps"][1][0] = prev_temp[2]
            state["land_temps"][0] = prev_temp[1]
            state["land_temps"][1] = prev_temp[3]
            state["ground_temps"][0] = state["land_temps"][0]
            state["ground_temps"][1] = state["land_temps"][1]

        dt_year = float(ctx.t_next) - float(ctx.t_current)
        dt_sub = dt_year / steps

        erf_mid = (erf_start + erf_end) / 2.0
        adjusted_ecs = self.adjusted_ecs(erf_mid, state)

        if abs(adjusted_ecs - self.ecs) > 1e-10:
            result = self._run_lamcalc(adjusted_ecs)
            if result is None:
                result = LamcalcResult(
                    self.lambda_ocean,
                    self.lambda_land,
                    self.matrix_inverse,
                    self.co2_internal_efficacy,
                )
            current_lambda_ocean = result.lambda_ocean
            current_lambda_land = result.lambda_land
            current_co2_efficacy = result.co2_internal_efficacy
        else:
            current_lambda_ocean = self.lambda_ocean
            current_lambda_land = self.lambda_land
            current_co2_efficacy = self.co2_internal_efficacy

        fgno, fgnl, fgso, fgsl = self.global_box_fractions()
        c_ground = self.ground_heat_capacity() if self.land_heat_capacity_enabled else 0.0
        alpha_eff_nh, alpha_eff_sh = state["alpha_eff"][0], state["alpha_eff"][1]

        for step_idx in range(1, steps + 1):
            frac = step_idx / steps
            erf = erf_start + frac * (erf_end - erf_start)
            forcing = self.apply_efficacy_and_qfrac(erf, current_co2_efficacy)

            if self.land_heat_capacity_enabled:
                for hemi, f_l in enumerate([fgnl, fgsl]):
                    if f_l < 1e-15:
                        continue
                    flux = self.k_lg * (
                        state["land_temps"][hemi] - state["ground_temps"][hemi]
                    )
                    state["ground_temps"][hemi] += flux / (f_l * c_ground) * dt_sub

            nh_ground, sh_ground = state["ground_temps"][0], state["ground_temps"][1]

            sst_nh = self.step_hemisphere(
                state, 0, forcing[0], dt_sub, current_lambda_ocean,
                current_lambda_land, state["hemi_heat_exchange"][0], nh_ground,
                alpha_eff_nh,
            )
            sst_sh = self.step_hemisphere(
                state, 1, forcing[2], dt_sub, current_lambda_ocean,
                current_lambda_land, state["hemi_heat_exchange"][1], sh_ground,
                alpha_eff_sh,
            )

            t_air_nho = self.sst_to_air_temperature(sst_nh)
            t_air_sho = self.sst_to_air_temperature(sst_sh)
            state["land_temps"][0] = self.calculate_land_temperature(
                t_air_nho, forcing[1], fgnl, current_lambda_land
            )
            state["land_temps"][1] = self.calculate_land_temperature(
                t_air_sho, forcing[3], fgsl, current_lambda_land
            )

            if fgno > 1e-15:
                state["hemi_heat_exchange"][0] = self.k_ns / fgno * (t_air_sho - t_air_nho)
            if fgso > 1e-15:
                state["hemi_heat_exchange"][1] = self.k_ns / fgso * (t_air_nho - t_air_sho)

            global_temp = (
                t_air_nho * fgno
                + state["land_temps"][0] * fgnl
                + t_air_sho * fgso
                + state["land_temps"][1] * fgsl
            )
            self.update_upwelling(state, global_temp)

        sst_nh = state["ocean_temps"][0][0]
        sst_sh = state["ocean_temps"][1][0]

        alpha = self.temp_adjust_alpha
        state["alpha_eff"][0] = (
            alpha if abs(sst_nh) < 1e-15 else self.sst_to_air_temperature(sst_nh) / sst_nh
        )
        state["alpha_eff"][1] = (
            alpha if abs(sst_sh) < 1e-15 else self.sst_to_air_temperature(sst_sh) / sst_sh
        )

        t_air_nho = self.sst_to_air_temperature(sst_nh)
        t_air_sho = self.sst_to_air_temperature(sst_sh)
        surface_temperature = np.array(
            [t_air_nho, state["land_temps"][0], t_air_sho, state["land_temps"][1]]
        )

        global_temp = float(np.dot(surface_temperature, [fgno, fgnl, fgso, fgsl]))
        state["th_values"] = np.concatenate(
            [[global_temp * dt_year], state["th_values"][:-1]]
        )
        state["th_dts"] = np.concatenate([[dt_year], state["th_dts"][:-1]])

        forcing_end = self.apply_efficacy_and_qfrac(erf_end, current_co2_efficacy)
        heat_uptake = self.calculate_heat_uptake(
            forcing_end, surface_temperature, current_lambda_ocean, current_lambda_land
        )
        ocean_heat_content = self.calculate_ocean_heat_content(state)
        sst = (sst_nh + sst_sh) / 2.0

        return (
            self.Outputs(
                surface_temperature=FourBoxSlice.from_array(surface_temperature),
                heat_uptake=heat_uptake,
                ocean_heat_content=ocean_heat_content,
                sst=sst,
            ),
            state,
        )


ClimateUDEBBuilder = make_builder(ClimateUDEB)
