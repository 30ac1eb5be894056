"""
Pallas kernel: the whole LAMCALC iteration in VMEM.

Why a kernel: with a time-varying (traced, batched) ECS the hybrid
step/secant iteration (``magicc/climate/lamcalc.py::_lamcalc_iter``,
mirror of ``crates/rscm-magicc/src/climate/lamcalc.rs``) runs per year
per member inside the fused scan.  As an XLA ``while_loop`` it is
HBM-bound: every iteration's ~150 elementwise ops round-trip (B,)
carries through HBM — measured 0.58 s of the 100k x 251-yr MAGICC
ensemble (~35% of total).  Here the full iteration runs on a member tile
in VMEM: 6 scalar rows in, 3 rows out, one HBM round trip per call.

The math is the same branch-free iteration with convergence freezing and
the same cofactor-expansion 4x4 inverse (``utils/linear_algebra.py::
invert_4x4_traced``) written componentwise — no (4, 4) axes appear, so
every op stays a dense (TILE_SUB, lanes) member tile.  The walk runs
fully unrolled (Mosaic cannot legalize multi-carry loops; converged
members are frozen by the body, so extra iterations are idempotent).

Transform layering mirrors ``ops/udeb_month.py``: ``custom_vmap`` routes
batched calls to the kernel (unbatched = batch of one), ``custom_jvp``
outside it sends derivatives through an identical-arithmetic jnp
reference (fixed-count ``fori_loop``), keeping NUTS / sensitivity
gradients exact.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

__all__ = ["lamcalc_scalars", "LamStatic", "SCALAR_ROWS"]

#: packed per-member scalar input rows, in order
SCALAR_ROWS = ("ecs", "q", "k_lo", "k_ns", "rlo", "alpha")
S_IN = len(SCALAR_ROWS)
S_OUT = 3  # lam_o, lam_l, efficacy

MAX_ITERATIONS = 40
RLO_TOLERANCE = 0.001

TILE_SUB = 8
TILE_LANES = 512
TILE_B = TILE_SUB * TILE_LANES


@dataclass(frozen=True)
class LamStatic:
    """Compile-time bundle: box fractions, qfrac weights, fallbacks."""

    fg: tuple  # (fgno, fgnl, fgso, fgsl)
    qfrac: tuple  # (4,) forcing fractions (from rf_regions_co2)
    rf_sum_zero: bool  # |rf · area| <= 1e-15 -> efficacy 1.0 branch
    fallback: tuple  # (lam_o, lam_l, efficacy) floats


def _iteration(st: LamStatic, jnp, ecs, q, k_lo, k_ns, rlo, alpha, n_iters):
    """The full LAMCALC walk on member-shaped arrays; returns
    (lam_o, lam_l, efficacy).  ``n_iters(body, init)`` drives the loop —
    a while with early exit in the kernel, a fixed fori for AD."""
    fgno, fgnl, fgso, fgsl = st.fg
    q0, q1, q2, q3 = st.qfrac
    v0, v1, v2, v3 = fgno * q0, fgnl * q1, fgso * q2, fgsl * q3
    fgosum = fgno + fgso
    fglsum = fgnl + fgsl
    fratio = fgosum / fglsum

    lam = q / ecs

    def temps_from(lam_o, lam_l):
        # coupling-matrix entries (build_coupling_matrix); structural
        # zeros stay Python floats and fold out of the cofactors
        a_diag = k_lo * alpha + k_ns
        m = [
            [fgno * lam_o + a_diag, -k_lo, -k_ns, 0.0],
            [-k_lo * alpha, fgnl * lam_l + k_lo, 0.0, 0.0],
            [-k_ns, 0.0, fgso * lam_o + a_diag, -k_lo],
            [0.0, 0.0, -k_lo * alpha, fgsl * lam_l + k_lo],
        ]

        # cofactor/adjugate inverse, componentwise (invert_4x4_traced)
        def det3(rows, cols):
            (r0, r1, r2), (c0, c1, c2) = rows, cols
            return (
                m[r0][c0] * (m[r1][c1] * m[r2][c2] - m[r1][c2] * m[r2][c1])
                - m[r0][c1] * (m[r1][c0] * m[r2][c2] - m[r1][c2] * m[r2][c0])
                + m[r0][c2] * (m[r1][c0] * m[r2][c1] - m[r1][c1] * m[r2][c0])
            )

        others = [tuple(k for k in range(4) if k != i) for i in range(4)]
        cof = [
            [(-1.0) ** (i + j) * det3(others[i], others[j]) for j in range(4)]
            for i in range(4)
        ]
        det = sum(m[0][j] * cof[0][j] for j in range(4))
        inv_det = 1.0 / det
        # temps_i = q * sum_j inv[i][j] * v_j with inv[i][j] = cof[j][i] *
        # inv_det — inv entries formed first, matching invert_4x4_traced's
        # rounding, then contracted in matmul order
        v = (v0, v1, v2, v3)
        return [
            q * sum((cof[j][i] * inv_det) * v[j] for j in range(4))
            for i in range(4)
        ]

    def body(carry):
        (lamo_im2, lamo_im1, lamo_i, diff_im2, diff_im1, dlamo, iflag,
         found, best_lam_o, best_lam_l, best_eff) = carry

        lam_l = lam + fratio * (lam - lamo_i) / rlo
        t = temps_from(lamo_i, lam_l)
        ocean_mean = (fgno * t[0] + fgso * t[2]) / fgosum
        land_mean = (fgnl * t[1] + fgsl * t[3]) / fglsum
        diff_i = rlo - land_mean / ocean_mean

        t_global = fgno * t[0] + fgnl * t[1] + fgso * t[2] + fgsl * t[3]
        eff_i = t_global / ecs

        converged_now = (jnp.abs(diff_i) < RLO_TOLERANCE) & ~found
        best_lam_o = jnp.where(converged_now, lamo_i, best_lam_o)
        best_lam_l = jnp.where(converged_now, lam_l, best_lam_l)
        best_eff = jnp.where(converged_now, eff_i, best_eff)
        found = found | converged_now

        sign_change = diff_i * diff_im1 < 0.0
        iflag = jnp.where(sign_change, 1, iflag)

        dlamo_step = jnp.where(
            jnp.abs(diff_i) > jnp.abs(diff_im1), -dlamo, dlamo
        )
        next_step = lamo_i + dlamo_step

        denom1 = diff_i - diff_im1
        secant1 = jnp.where(
            jnp.abs(denom1) < 1e-30,
            lamo_i + dlamo,
            lamo_i - diff_i * (lamo_i - lamo_im1)
            / jnp.where(jnp.abs(denom1) < 1e-30, 1.0, denom1),
        )
        denom2 = diff_i - diff_im2
        secant2 = jnp.where(
            jnp.abs(denom2) < 1e-30,
            lamo_i + dlamo,
            lamo_i - diff_i * (lamo_i - lamo_im2)
            / jnp.where(jnp.abs(denom2) < 1e-30, 1.0, denom2),
        )

        lamo_next = jnp.where(
            iflag == 0, next_step, jnp.where(sign_change, secant1, secant2)
        )
        dlamo = jnp.where(iflag == 0, dlamo_step, dlamo)
        lamo_next = jnp.where(found, lamo_i, lamo_next)
        return (lamo_im1, lamo_i, lamo_next, diff_im1, diff_i, dlamo, iflag,
                found, best_lam_o, best_lam_l, best_eff)

    # every carry leaf derives from the input so Mosaic assigns it a
    # concrete (non-replicated) layout — splat constants in a while carry
    # trip "Invalid relayout: ... replicated in destination but not in
    # source" at the loop boundary
    zeros = lam * 0.0
    init = (
        lam + 0.0,
        lam + 0.0,
        lam + 0.7,
        zeros,
        zeros,
        zeros + 0.7,
        zeros.astype(jnp.int32),
        zeros > 1.0,
        zeros,
        zeros,
        zeros,
    )
    out = n_iters(body, init)
    found = out[7]
    fb_lam_o, fb_lam_l, fb_eff = st.fallback
    lam_o = jnp.where(found, out[8], fb_lam_o)
    lam_l = jnp.where(found, out[9], fb_lam_l)
    if st.rf_sum_zero:
        efficacy = jnp.where(found, jnp.ones_like(out[10]), fb_eff)
    else:
        efficacy = jnp.where(found, out[10], fb_eff)
    return lam_o, lam_l, efficacy


def _run_unrolled(jnp, lax, body, init):
    """Fully unrolled iterations for the kernel: Mosaic fails to legalize
    ``scf.yield`` for a while/fori with this many vector carries, and the
    whole walk is VMEM-resident anyway (converged members are frozen by
    the body, so the extra iterations are idempotent)."""
    carry = init
    for _ in range(MAX_ITERATIONS - 1):
        carry = body(carry)
    return carry


def _run_fixed(jnp, lax, body, init):
    return lax.fori_loop(0, MAX_ITERATIONS - 1, lambda i, c: body(c), init)


def _build_kernel(st: LamStatic):
    import jax.numpy as jnp
    from jax import lax

    def kernel(in_ref, out_ref):
        rows = in_ref[:]  # (S_IN, sub, lanes)
        ecs, q, k_lo, k_ns, rlo, alpha = (rows[i] for i in range(S_IN))
        lam_o, lam_l, eff = _iteration(
            st, jnp, ecs, q, k_lo, k_ns, rlo, alpha,
            functools.partial(_run_unrolled, jnp, lax),
        )
        out_ref[0] = lam_o
        out_ref[1] = lam_l
        out_ref[2] = eff

    return kernel


def _tile_geometry(b: int, interpret: bool):
    if interpret:
        return 1, 128
    if b < TILE_B:
        return TILE_SUB, 128
    return TILE_SUB, TILE_LANES


@functools.lru_cache(maxsize=32)
def _build_caller(
    st: LamStatic, dtype_str: str, interpret: bool, tile_sub: int, tile_lanes: int
):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = jnp.dtype(dtype_str)
    kernel = _build_kernel(st)

    def call(packed):
        b8 = packed.shape[-1]
        grid = (b8 // tile_lanes,)

        def tile_spec(rows):
            return pl.BlockSpec(
                (rows, tile_sub, tile_lanes),
                lambda i: (0, 0, i),
                memory_space=pltpu.VMEM,
            )

        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[tile_spec(S_IN)],
            out_specs=tile_spec(S_OUT),
            out_shape=jax.ShapeDtypeStruct((S_OUT, tile_sub, b8), dtype),
            interpret=interpret,
        )(packed)

    return call


def _ref_jnp(st: LamStatic, ecs, q, k_lo, k_ns, rlo, alpha):
    """Identical-arithmetic jnp path (fixed-count loop) for AD."""
    import jax.numpy as jnp
    from jax import lax

    return _iteration(
        st, jnp, ecs, q, k_lo, k_ns, rlo, alpha,
        functools.partial(_run_fixed, jnp, lax),
    )


@functools.lru_cache(maxsize=32)
def _get_member_fn(st: LamStatic, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax import custom_batching

    def batched_impl(args_b):
        b = args_b[0].shape[0]
        dtype = jnp.result_type(*args_b)
        tile_sub, tile_lanes = _tile_geometry(b, interpret)
        pad = (-b) % (tile_sub * tile_lanes)
        padded = b + pad
        caller = _build_caller(
            st, str(np.dtype(dtype)), interpret, tile_sub, tile_lanes
        )

        packed = jnp.stack([jnp.asarray(a, dtype) for a in args_b])  # (S_IN, b)
        if pad:
            # pad with the first member's values (real, convergent inputs
            # — zero-padding would make padded lanes run all 40 iters)
            packed = jnp.concatenate(
                [packed, jnp.broadcast_to(packed[:, :1], (S_IN, pad))], axis=1
            )
        packed = packed.reshape(S_IN, tile_sub, padded // tile_sub)
        out = caller(packed).reshape(S_OUT, padded)
        if pad:
            out = out[:, :b]
        return out[0], out[1], out[2]

    @custom_batching.custom_vmap
    def core(ecs, q, k_lo, k_ns, rlo, alpha):
        o = batched_impl(tuple(a[None] for a in (ecs, q, k_lo, k_ns, rlo, alpha)))
        return o[0][0], o[1][0], o[2][0]

    @core.def_vmap
    def _rule(axis_size, in_batched, *args):
        args = [
            a if bat else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            for a, bat in zip(args, in_batched)
        ]
        return batched_impl(tuple(args)), (True, True, True)

    @jax.custom_jvp
    def member_fn(ecs, q, k_lo, k_ns, rlo, alpha):
        return core(ecs, q, k_lo, k_ns, rlo, alpha)

    @member_fn.defjvp
    def _jvp(primals, tangents):
        return jax.jvp(
            lambda *a: _ref_jnp(st, *a), primals, tangents
        )

    return member_fn


def lamcalc_scalars(params, ecs, fallback):
    """Kernel-backed LAMCALC returning ``(lam_o, lam_l, efficacy)``.

    Same signature semantics as ``lamcalc_traced`` minus the (unused by
    the UDEB scan) matrix inverse.  ``params`` is a ``LamcalcParams``;
    ``ecs`` the (possibly traced/batched) adjusted ECS; ``fallback`` the
    ``(lambda_ocean, lambda_land, matrix_inverse, co2_internal_efficacy)``
    build-time constants used for non-converged members.
    """
    import jax
    import jax.numpy as jnp

    from rscm_tpu.magicc.climate.lamcalc import compute_qfrac

    fgno, fgnl, fgso, fgsl = (
        float(params.fgno), float(params.fgnl),
        float(params.fgso), float(params.fgsl),
    )
    area = np.array([fgno, fgnl, fgso, fgsl])
    rf_regions = np.asarray(params.rf_regions_co2, dtype=np.float64)
    rf_sum = float(np.dot(rf_regions, area))
    qfrac = compute_qfrac(rf_regions, area)

    st = LamStatic(
        fg=(fgno, fgnl, fgso, fgsl),
        qfrac=tuple(float(v) for v in qfrac),
        rf_sum_zero=abs(rf_sum) <= 1e-15,
        fallback=(
            float(np.asarray(fallback[0])),
            float(np.asarray(fallback[1])),
            float(np.asarray(fallback[3])),
        ),
    )
    # target-aware, mirroring udeb_month: follow the declared execution
    # target so a CPU mesh gets interpret mode without touching the
    # default backend
    from rscm_tpu.utils.target import target_platform

    interpret = target_platform() != "tpu"
    ecs = jnp.asarray(ecs)
    wdt = ecs.dtype

    def C(x):
        return jnp.asarray(x, dtype=wdt)

    return _get_member_fn(st, interpret)(
        ecs, C(params.q_2xco2), C(params.k_lo), C(params.k_ns),
        C(params.rlo), C(params.amplify_ocean_to_land),
    )
