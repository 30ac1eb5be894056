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


def _lamcalc_iter(static, ecs_, q_, k_lo_, k_ns_, rlo_, alpha_, *, fixed):
    """The LAMCALC iteration with all inputs explicit (see lamcalc_traced).

    ``static`` is a hashable bundle ``(fg, rf_regions, dtype_str,
    fallback)`` — everything here is rebuilt from it, so this function
    closes over nothing created inside an outer trace (a requirement for
    the module-level ``custom_jvp`` wrapper below).
    """
    import jax.numpy as jnp
    from jax import lax

    (fgno, fgnl, fgso, fgsl), rf_regions_t, dtype_str, fallback_t = static
    wdt = jnp.dtype(dtype_str)
    fgosum = fgno + fgso
    fglsum = fgnl + fgsl
    fratio = fgosum / fglsum

    def C(x):
        return jnp.asarray(x, dtype=wdt)

    area = C([fgno, fgnl, fgso, fgsl])
    rf_regions = C(rf_regions_t)
    rf_sum = jnp.dot(rf_regions, area)
    qfrac = jnp.where(
        jnp.abs(rf_sum) <= 1e-15, jnp.ones(4, wdt), rf_regions / rf_sum
    )
    fb = (
        C(fallback_t[0]), C(fallback_t[1]), C(fallback_t[2]), C(fallback_t[3]),
    )
    lam = q_ / ecs_

    def coupling_matrix(lam_o, lam_l):
        return jnp.asarray(
            dtype=wdt,
            a=[
                [fgno * lam_o + k_lo_ * alpha_ + k_ns_, -k_lo_, -k_ns_, 0.0],
                [-k_lo_ * alpha_, fgnl * lam_l + k_lo_, 0.0, 0.0],
                [-k_ns_, 0.0, fgso * lam_o + k_lo_ * alpha_ + k_ns_, -k_lo_],
                [0.0, 0.0, -k_lo_ * alpha_, fgsl * lam_l + k_lo_],
            ]
        )

    def body(i, carry):
        (lamo_im2, lamo_im1, lamo_i, diff_im2, diff_im1, dlamo, iflag,
         found, best_lam_o, best_lam_l, best_inv) = carry

        lam_l = lam + fratio * (lam - lamo_i) / rlo_
        matrix = coupling_matrix(lamo_i, lam_l)
        inv = invert_4x4(matrix)

        temps = q_ * (inv @ (area * qfrac))
        ocean_mean = (fgno * temps[0] + fgso * temps[2]) / fgosum
        land_mean = (fgnl * temps[1] + fgsl * temps[3]) / fglsum
        diff_i = rlo_ - land_mean / ocean_mean

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
    if fixed:
        out = lax.fori_loop(0, MAX_ITERATIONS - 1, body, init)
    else:
        # while_loop with early exit: converged members are frozen by the
        # body, so stopping once every (vmapped) member has converged is
        # result-identical to all MAX_ITERATIONS - 1 steps; typical secant
        # convergence is ~10 iterations (~3x less serial depth)
        def while_cond(state):
            i, carry = state
            return (i < MAX_ITERATIONS - 1) & ~carry[7]

        def while_body(state):
            i, carry = state
            return i + 1, body(i, carry)

        _, out = lax.while_loop(while_cond, while_body, (jnp.asarray(0), init))
    found = out[7]
    lam_o = jnp.where(found, out[8], fb[0])
    lam_l = jnp.where(found, out[9], fb[1])
    inv = jnp.where(found, out[10], fb[2])

    # internal efficacy from the converged inverse (lamcalc.rs:64-90)
    temps = q_ * (inv @ (area * qfrac))
    t_global = jnp.dot(area, temps)
    efficacy = jnp.where(jnp.abs(rf_sum) <= 1e-15, 1.0, t_global / ecs_)
    efficacy = jnp.where(found, efficacy, fb[3])
    return lam_o, lam_l, inv, efficacy


def _lamcalc_solve(static, ecs, q, k_lo, k_ns, rlo, alpha):
    return _lamcalc_iter(static, ecs, q, k_lo, k_ns, rlo, alpha, fixed=False)


def _lamcalc_solve_jvp(static, primals, tangents):
    import jax

    # one solve, not two: the fixed-count fori path computes the same
    # frozen values as the early-exit primal, so its jvp provides both the
    # primal and the tangent for differentiated programs
    return jax.jvp(
        lambda *a: _lamcalc_iter(static, *a, fixed=True), primals, tangents
    )


_LAMCALC_SOLVE = None


def _get_lamcalc_solve():
    global _LAMCALC_SOLVE
    if _LAMCALC_SOLVE is None:
        import functools

        import jax

        solve = jax.custom_jvp(_lamcalc_solve, nondiff_argnums=(0,))
        solve.defjvp(_lamcalc_solve_jvp)
        _LAMCALC_SOLVE = solve
    return _LAMCALC_SOLVE


def lamcalc_traced(params: LamcalcParams, ecs, fallback):
    """Traced LAMCALC: the same hybrid step/secant iteration as
    :func:`lamcalc`, expressed branch-free with convergence freezing so a
    time-varying (traced) ECS can re-derive the feedback parameters
    inside the fused step program.

    Execution is split by transform (``jax.custom_jvp``, defined at module
    level with every input explicit so nothing trace-local leaks into the
    AD rule):

    - the **primal** runs an early-exit ``lax.while_loop`` (converged
      members are frozen by the body, so stopping once every vmapped
      member has converged is result-identical; typical secant convergence
      is ~10 of the 40 iterations — ~3x less serial depth);
    - **derivatives** flow through an equivalent fixed-count
      ``lax.fori_loop`` (reverse-mode AD cannot differentiate
      ``while_loop``; the fori path computes the same frozen values, so
      the tangents are exact), keeping NUTS/sensitivity gradients working
      through UDEB models.

    ``fallback`` is ``(lambda_ocean, lambda_land, matrix_inverse,
    co2_internal_efficacy)`` used when the iteration fails to converge
    (mirror of the runtime ``unwrap_or`` in ``udeb/mod.rs:304-318``);
    fallbacks are build-time constants and carry no tangent.
    Returns the same 4-tuple with traced leaves.
    """
    import jax.numpy as jnp

    wdt = jnp.result_type(jnp.asarray(ecs))

    def C(x):
        return jnp.asarray(x, dtype=wdt)

    def hashable(x):
        arr = np.asarray(x)
        if arr.ndim == 0:
            return float(arr)
        return tuple(hashable(v) for v in arr)

    static = (
        (
            float(params.fgno), float(params.fgnl),
            float(params.fgso), float(params.fgsl),
        ),
        tuple(float(v) for v in params.rf_regions_co2),
        str(np.dtype(wdt)),
        tuple(hashable(f) for f in fallback),
    )
    solve = _get_lamcalc_solve()
    return solve(
        static, C(ecs), C(params.q_2xco2), C(params.k_lo), C(params.k_ns),
        C(params.rlo), C(params.amplify_ocean_to_land),
    )


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
