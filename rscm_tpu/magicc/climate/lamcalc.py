"""
LAMCALC: solve for ocean/land feedback parameters matching a target ECS and
land-ocean warming ratio.

Mirror of ``crates/rscm-magicc/src/climate/lamcalc.rs``: hybrid step/secant
iteration on lambda_ocean (<= 40 iterations, RLO tolerance 1e-3) through a
4x4 regional coupling-matrix inversion; also computes the CO2 internal
efficacy.  Runs on the host in float64 — its products (lambda_ocean,
lambda_land, matrix inverse) are constants of the compiled program when the
ECS is time-invariant.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from rscm_tpu.utils import invert_4x4

__all__ = [
    "LamcalcParams",
    "LamcalcResult",
    "lamcalc",
    "build_coupling_matrix",
    "compute_qfrac",
    "calc_internal_efficacy",
]

MAX_ITERATIONS = 40
RLO_TOLERANCE = 0.001


@dataclass
class LamcalcParams:
    q_2xco2: float
    k_lo: float
    k_ns: float
    ecs: float
    rlo: float
    amplify_ocean_to_land: float
    fgno: float
    fgnl: float
    fgso: float
    fgsl: float
    rf_regions_co2: tuple


@dataclass
class LamcalcResult:
    lambda_ocean: float
    lambda_land: float
    matrix_inverse: np.ndarray
    co2_internal_efficacy: float


def build_coupling_matrix(params: LamcalcParams, lam_o: float, lam_l: float) -> np.ndarray:
    alpha = params.amplify_ocean_to_land
    k_lo = params.k_lo
    k_ns = params.k_ns
    return np.array(
        [
            [params.fgno * lam_o + k_lo * alpha + k_ns, -k_lo, -k_ns, 0.0],
            [-k_lo * alpha, params.fgnl * lam_l + k_lo, 0.0, 0.0],
            [-k_ns, 0.0, params.fgso * lam_o + k_lo * alpha + k_ns, -k_lo],
            [0.0, 0.0, -k_lo * alpha, params.fgsl * lam_l + k_lo],
        ]
    )


def compute_qfrac(rf_regions, area) -> np.ndarray:
    rf_regions = np.asarray(rf_regions, dtype=np.float64)
    area = np.asarray(area, dtype=np.float64)
    rf_sum = float(np.dot(rf_regions, area))
    if abs(rf_sum) <= 1e-15:
        return np.ones(4)
    return rf_regions / rf_sum


def _box_temperatures(q, matrix_inverse, area, qfrac) -> np.ndarray:
    return q * (matrix_inverse @ (np.asarray(area) * np.asarray(qfrac)))


def calc_internal_efficacy(q_2xco2, matrix_inverse, area, rf_regions, ecs) -> float:
    rf_regions = np.asarray(rf_regions, dtype=np.float64)
    area = np.asarray(area, dtype=np.float64)
    rf_sum = float(np.dot(rf_regions, area))
    if abs(rf_sum) <= 1e-15:
        return 1.0
    qfrac = compute_qfrac(rf_regions, area)
    temps = _box_temperatures(q_2xco2, matrix_inverse, area, qfrac)
    t_global = float(np.dot(area, temps))
    return t_global / ecs


def lamcalc_traced(params: LamcalcParams, ecs, fallback):
    """Traced LAMCALC: the same hybrid step/secant iteration as
    :func:`lamcalc`, expressed branch-free over a fixed 40-iteration
    ``lax.fori_loop`` with convergence freezing, so a time-varying
    (traced) ECS can re-derive the feedback parameters inside the fused
    step program.

    ``fallback`` is ``(lambda_ocean, lambda_land, matrix_inverse,
    co2_internal_efficacy)`` used when the iteration fails to converge
    (mirror of the runtime ``unwrap_or`` in ``udeb/mod.rs:304-318``).
    Returns the same 4-tuple with traced leaves.
    """
    import jax.numpy as jnp
    from jax import lax

    q = params.q_2xco2
    lam = q / ecs
    fgosum = params.fgno + params.fgso
    fglsum = params.fgnl + params.fgsl
    fratio = fgosum / fglsum

    # Working dtype follows the (possibly traced) ECS; constants are pinned
    # to it so an f32 program is not promoted to f64 under x64 mode.
    wdt = jnp.result_type(jnp.asarray(ecs))

    def C(x):
        return jnp.asarray(x, dtype=wdt)

    area = C([params.fgno, params.fgnl, params.fgso, params.fgsl])
    rf_regions = C(params.rf_regions_co2)
    rf_sum = jnp.dot(rf_regions, area)
    qfrac = jnp.where(jnp.abs(rf_sum) <= 1e-15, jnp.ones(4, wdt), rf_regions / rf_sum)

    k_lo = params.k_lo
    k_ns = params.k_ns
    alpha = params.amplify_ocean_to_land

    def coupling_matrix(lam_o, lam_l):
        return jnp.asarray(
            dtype=wdt,
            a=[
                [params.fgno * lam_o + k_lo * alpha + k_ns, -k_lo, -k_ns, 0.0],
                [-k_lo * alpha, params.fgnl * lam_l + k_lo, 0.0, 0.0],
                [-k_ns, 0.0, params.fgso * lam_o + k_lo * alpha + k_ns, -k_lo],
                [0.0, 0.0, -k_lo * alpha, params.fgsl * lam_l + k_lo],
            ]
        )

    def body(i, carry):
        (lamo_im2, lamo_im1, lamo_i, diff_im2, diff_im1, dlamo, iflag,
         found, best_lam_o, best_lam_l, best_inv) = carry

        lam_l = lam + fratio * (lam - lamo_i) / params.rlo
        matrix = coupling_matrix(lamo_i, lam_l)
        inv = invert_4x4(matrix)

        temps = q * (inv @ (area * qfrac))
        ocean_mean = (params.fgno * temps[0] + params.fgso * temps[2]) / fgosum
        land_mean = (params.fgnl * temps[1] + params.fgsl * temps[3]) / fglsum
        diff_i = params.rlo - land_mean / ocean_mean

        converged_now = (jnp.abs(diff_i) < RLO_TOLERANCE) & ~found
        best_lam_o = jnp.where(converged_now, lamo_i, best_lam_o)
        best_lam_l = jnp.where(converged_now, lam_l, best_lam_l)
        best_inv = jnp.where(converged_now, inv, best_inv)
        found = found | converged_now

        sign_change = diff_i * diff_im1 < 0.0
        iflag = jnp.where(sign_change, 1, iflag)

        # step mode: flip dlamo when the error grew
        dlamo_step = jnp.where(jnp.abs(diff_i) > jnp.abs(diff_im1), -dlamo, dlamo)
        next_step = lamo_i + dlamo_step

        # secant vs previous point
        denom1 = diff_i - diff_im1
        secant1 = jnp.where(
            jnp.abs(denom1) < 1e-30,
            lamo_i + dlamo,
            lamo_i - diff_i * (lamo_i - lamo_im1) / jnp.where(
                jnp.abs(denom1) < 1e-30, 1.0, denom1
            ),
        )
        # secant vs the point two back
        denom2 = diff_i - diff_im2
        secant2 = jnp.where(
            jnp.abs(denom2) < 1e-30,
            lamo_i + dlamo,
            lamo_i - diff_i * (lamo_i - lamo_im2) / jnp.where(
                jnp.abs(denom2) < 1e-30, 1.0, denom2
            ),
        )

        lamo_next = jnp.where(
            iflag == 0, next_step, jnp.where(sign_change, secant1, secant2)
        )
        dlamo = jnp.where(iflag == 0, dlamo_step, dlamo)

        # freeze the walk once converged
        lamo_next = jnp.where(found, lamo_i, lamo_next)
        return (lamo_im1, lamo_i, lamo_next, diff_im1, diff_i, dlamo, iflag,
                found, best_lam_o, best_lam_l, best_inv)

    init = (
        C(0.0) + lam,  # lamo[i-2] placeholder (lamo[0]=0 in ref; see note)
        C(0.0) + lam,  # lamo[i-1] = lamo[1] = lam
        lam + 0.7,  # lamo[i] = lamo[2]
        C(0.0),  # diff[i-2] = diff[0] = 0
        C(0.0),  # diff[i-1] = diff[1] = 0
        C(0.7),
        jnp.asarray(0),
        jnp.asarray(False),
        C(0.0),
        C(0.0),
        jnp.zeros((4, 4), wdt),
    )
    # while_loop with early exit: converged members are frozen by the body,
    # so stopping once every (vmapped) member has converged is result-
    # identical to running all MAX_ITERATIONS - 1 steps; typical secant
    # convergence is ~10 iterations, so this cuts the serial chain ~3x.
    def while_cond(state):
        i, carry = state
        return (i < MAX_ITERATIONS - 1) & ~carry[7]

    def while_body(state):
        i, carry = state
        return i + 1, body(i, carry)

    _, out = lax.while_loop(while_cond, while_body, (jnp.asarray(0), init))
    found = out[7]
    lam_o = jnp.where(found, out[8], C(fallback[0]))
    lam_l = jnp.where(found, out[9], C(fallback[1]))
    inv = jnp.where(found, out[10], C(fallback[2]))

    # internal efficacy from the converged inverse (lamcalc.rs:64-90)
    temps = q * (inv @ (area * qfrac))
    t_global = jnp.dot(area, temps)
    efficacy = jnp.where(
        jnp.abs(rf_sum) <= 1e-15, 1.0, t_global / ecs
    )
    efficacy = jnp.where(found, efficacy, C(fallback[3]))
    return lam_o, lam_l, inv, efficacy


def lamcalc(params: LamcalcParams) -> Optional[LamcalcResult]:
    """Iterate lambda_ocean until the land/ocean warming ratio matches RLO."""
    lam = params.q_2xco2 / params.ecs
    fgosum = params.fgno + params.fgso
    fglsum = params.fgnl + params.fgsl
    fratio = fgosum / fglsum

    area = np.array([params.fgno, params.fgnl, params.fgso, params.fgsl])
    qfrac = compute_qfrac(params.rf_regions_co2, area)

    lamo = np.zeros(MAX_ITERATIONS + 2)
    diff = np.zeros(MAX_ITERATIONS + 2)
    lamo[1] = lam
    lamo[2] = lam + 0.7

    dlamo = 0.7
    iflag = 0

    for i in range(2, MAX_ITERATIONS + 1):
        lam_l = lam + fratio * (lam - lamo[i]) / params.rlo
        lam_o = lamo[i]

        matrix = build_coupling_matrix(params, lam_o, lam_l)
        inv = invert_4x4(matrix)
        if inv is None:
            return None

        temps = _box_temperatures(params.q_2xco2, inv, area, qfrac)
        ocean_mean = (params.fgno * temps[0] + params.fgso * temps[2]) / fgosum
        land_mean = (params.fgnl * temps[1] + params.fgsl * temps[3]) / fglsum
        rlo_est = land_mean / ocean_mean

        diff[i] = params.rlo - rlo_est
        if abs(diff[i]) < RLO_TOLERANCE:
            efficacy = calc_internal_efficacy(
                params.q_2xco2, inv, area, params.rf_regions_co2, params.ecs
            )
            return LamcalcResult(lam_o, lam_l, inv, efficacy)

        if diff[i] * diff[i - 1] < 0.0:
            iflag = 1

        if iflag == 0:
            if abs(diff[i]) > abs(diff[i - 1]):
                dlamo = -dlamo
            lamo[i + 1] = lamo[i] + dlamo
        elif diff[i] * diff[i - 1] < 0.0:
            denom = diff[i] - diff[i - 1]
            if abs(denom) < 1e-30:
                lamo[i + 1] = lamo[i] + dlamo
            else:
                lamo[i + 1] = lamo[i] - diff[i] * (lamo[i] - lamo[i - 1]) / denom
        else:
            i2 = i - 2 if i >= 2 else 0
            denom = diff[i] - diff[i2]
            if abs(denom) < 1e-30:
                lamo[i + 1] = lamo[i] + dlamo
            else:
                lamo[i + 1] = lamo[i] - diff[i] * (lamo[i] - lamo[i2]) / denom

    return None
