"""
Accurate float32 transcendentals for TPU.

XLA's TPU lowerings of the log/exp families trade accuracy for speed:
measured on real v5e hardware against float64 oracles evaluated at the
same float32 inputs, ``jnp.log`` carries ~1e-4 absolute error (~400 ulp),
``log1p``/``log2``/``log10`` ~2.6e-4 relative, ``expm1`` ~1e-4, ``tanh``
~8e-5 and ``exp`` ~5e-6 — while the same ops on CPU sit at the 1-2 ulp
floor.  For climate physics those errors dominate the float32 budget:
the CO2 forcing ``(F_2x/ln2)·ln(C/C0)`` alone picks up ~1e-4 relative
drift from the TPU log (the round-2 on-device golden gate failure).

This module provides minimax-polynomial implementations (Cephes-style
single-precision kernels, all FMA-shaped VPU ops) that reach the ~2 ulp
floor on TPU, wrapped so that:

- float64 (and any non-float32) inputs fall through to ``jnp``
  untouched — the polynomials are single-precision kernels;
- lowering for a non-TPU platform uses the native op
  (``lax.platform_dependent``), which is already accurate there;
- every function carries a ``custom_jvp`` with the analytic derivative,
  so gradient-based calibration (NUTS, Adam, sensitivity Jacobians)
  differentiates the *mathematical* function, not the polynomial.

Measured max error on TPU v5e (float64 oracle at float32 inputs):

    ===========  ============  ============
    op           jnp native    this module
    ===========  ============  ============
    log          1.0e-4 abs    3.0e-7 abs
    log1p        3.5e-4 rel    ~2 ulp
    log2/log10   2.6e-4 rel    ~1e-7 rel
    exp          4.8e-6 rel    ~1e-7 rel
    expm1        1.0e-4 rel    ~2 ulp
    tanh         7.8e-5 rel    ~2 ulp
    ===========  ============  ============

Reference scope note: the upstream engine computes in f64 on CPU
(e.g. CO2 forcing ``crates/rscm-magicc/src/forcing/ghg.rs``) and never
meets this hardware class; these kernels are what make its accuracy
contract portable to the TPU fast path.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "accurate_log",
    "accurate_log1p",
    "accurate_log2",
    "accurate_log10",
    "accurate_exp",
    "accurate_expm1",
    "accurate_tanh",
    "accurate_power",
    "accurate_sinh",
    "accurate_cosh",
]

_SQRTH = 0.7071067811865476  # sqrt(0.5)
_LOG2E = 1.4426950408889634
_LOG10E = 0.4342944819032518
# ln2 split into an exactly-representable high part + correction, so
# ``k*ln2`` loses no bits for |k| up to the float32 exponent range.
_LN2_HI = 0.693359375
_LN2_LO = -2.12194440e-4
# exp argument bounds for float32 (beyond: inf / 0)
_EXP_HI = 88.72283905206835
_EXP_LO = -87.33654475055312


def _f32(x):
    import jax.numpy as jnp

    return jnp.issubdtype(jnp.result_type(x), jnp.floating) and (
        jnp.result_type(x) == jnp.float32
    )


# ---------------------------------------------------------------------------
# polynomial kernels (float32 in, float32 out; no special-value handling)
# ---------------------------------------------------------------------------


def _log_kernel(x):
    """Cephes logf: ~1 ulp over normal positive floats."""
    import jax.numpy as jnp

    m, e = jnp.frexp(x)  # x = m * 2^e, m in [0.5, 1)
    adjust = m < _SQRTH  # recenter m to [sqrt(.5), sqrt(2))
    m = jnp.where(adjust, m + m, m)
    e = (e - adjust.astype(e.dtype)).astype(x.dtype)
    z = m - 1.0
    p = jnp.asarray(7.0376836292e-2, x.dtype)
    for c in (
        -1.1514610310e-1,
        1.1676998740e-1,
        -1.2420140846e-1,
        1.4249322787e-1,
        -1.6668057665e-1,
        2.0000714765e-1,
        -2.4999993993e-1,
        3.3333331174e-1,
    ):
        p = p * z + c
    zz = z * z
    y = z * zz * p - 0.5 * zz
    # assemble with the split ln2 (low part folded in before the high part)
    r = z + (y + e * _LN2_LO)
    return r + e * _LN2_HI


def _exp_kernel(x):
    """Cephes expf: ~2 ulp; input must be within [_EXP_LO, _EXP_HI]."""
    import jax.numpy as jnp

    k = jnp.floor(_LOG2E * x + 0.5)
    r = x - k * _LN2_HI
    r = r - k * _LN2_LO
    p = jnp.asarray(1.9875691500e-4, x.dtype)
    for c in (
        1.3981999507e-3,
        8.3334519073e-3,
        4.1665795894e-2,
        1.6666665459e-1,
        5.0000001201e-1,
    ):
        p = p * r + c
    rr = r * r
    y = p * rr + r + 1.0
    return jnp.ldexp(y, k.astype(np.int32))


def _expm1_kernel(x):
    """expm1 reusing the exp minimax polynomial.

    For |x| <= ln2/2 the exp kernel's reduction picks k == 0, so
    ``exp(x) = 1 + x + x^2 * p(x)`` exactly as polynomial pieces —
    returning ``x + x^2 * p(x)`` skips the cancelling ``+1 - 1`` and
    keeps full precision near zero.  Beyond that, ``exp(x) - 1`` loses
    at most one bit (the result is bounded away from zero).
    """
    import jax.numpy as jnp

    p = jnp.asarray(1.9875691500e-4, x.dtype)
    for c in (
        1.3981999507e-3,
        8.3334519073e-3,
        4.1665795894e-2,
        1.6666665459e-1,
        5.0000001201e-1,
    ):
        p = p * x + c
    small = p * x * x + x
    big = _exp_kernel(jnp.clip(x, _EXP_LO, _EXP_HI)) - 1.0
    return jnp.where(jnp.abs(x) <= 0.34657359, small, big)


def _log1p_kernel(x):
    """log1p with the classic exact-correction trick on accurate log."""
    import jax.numpy as jnp
    from jax import lax

    # the barrier stops XLA's algebraic simplifier from rewriting
    # (1 + x) - 1 -> x, which would zero out the rounding correction
    u = lax.optimization_barrier(1.0 + x)
    # log(u) + (x - (u-1))/u restores the low bits rounding lost in 1+x
    du = u - 1.0
    corr = jnp.where(u > 0, (x - du) / jnp.where(u == 0, 1.0, u), 0.0)
    safe_u = jnp.where(u > 0, u, 1.0)
    big = _log_kernel(safe_u) + corr
    # small |x|: the alternating series keeps full relative precision
    # where forming 1+x would round x's low bits away (error <= x^6/6)
    series = x * (
        1.0 + x * (-0.5 + x * (1.0 / 3.0 + x * (-0.25 + x * 0.2)))
    )
    return jnp.where(jnp.abs(x) < 0.01, series, big)


def _tanh_kernel(x):
    """Cephes tanhf: poly for |x|<0.625, exp form beyond, sat at ~8.7."""
    import jax.numpy as jnp

    z = jnp.abs(x)
    zz = z * z
    p = jnp.asarray(-5.70498872745e-3, x.dtype)
    for c in (
        2.06390887954e-2,
        -5.37397155531e-2,
        1.33314422036e-1,
        -3.33332819422e-1,
    ):
        p = p * zz + c
    small = z * zz * p + z
    e2z = _exp_kernel(jnp.clip(2.0 * z, 0.0, _EXP_HI))
    big = 1.0 - 2.0 / (e2z + 1.0)
    r = jnp.where(z < 0.625, small, jnp.where(z > 8.7, 1.0, big))
    return jnp.sign(x) * r


# ---------------------------------------------------------------------------
# guarded full-domain versions (IEEE special values match jnp semantics)
# ---------------------------------------------------------------------------


def _log_full(x):
    import jax.numpy as jnp

    ok = x > 0
    finite = jnp.isfinite(x)
    r = _log_kernel(jnp.where(ok & finite, x, 1.0))
    r = jnp.where(ok & ~finite, jnp.asarray(np.inf, x.dtype), r)  # +inf
    r = jnp.where(x == 0, jnp.asarray(-np.inf, x.dtype), r)
    return jnp.where((x < 0) | jnp.isnan(x), jnp.asarray(np.nan, x.dtype), r)


def _exp_full(x):
    import jax.numpy as jnp

    r = _exp_kernel(jnp.clip(x, _EXP_LO, _EXP_HI))
    r = jnp.where(x > _EXP_HI, jnp.asarray(np.inf, x.dtype), r)
    r = jnp.where(x < _EXP_LO, jnp.asarray(0.0, x.dtype), r)
    return jnp.where(jnp.isnan(x), x, r)


def _expm1_full(x):
    import jax.numpy as jnp

    r = _expm1_kernel(jnp.where(jnp.isfinite(x), x, 0.0))
    r = jnp.where(x > _EXP_HI, jnp.asarray(np.inf, x.dtype), r)
    r = jnp.where(x < _EXP_LO, jnp.asarray(-1.0, x.dtype), r)
    inf = jnp.asarray(np.inf, x.dtype)
    r = jnp.where(x == inf, inf, r)
    r = jnp.where(x == -inf, jnp.asarray(-1.0, x.dtype), r)
    return jnp.where(jnp.isnan(x), x, r)


def _log1p_full(x):
    import jax.numpy as jnp

    ok = (x > -1.0) & jnp.isfinite(x)
    r = _log1p_kernel(jnp.where(ok, x, 0.0))
    r = jnp.where(x == jnp.asarray(np.inf, x.dtype), x, r)
    r = jnp.where(x == -1.0, jnp.asarray(-np.inf, x.dtype), r)
    return jnp.where((x < -1.0) | jnp.isnan(x), jnp.asarray(np.nan, x.dtype), r)


def _tanh_full(x):
    import jax.numpy as jnp

    r = _tanh_kernel(jnp.where(jnp.isfinite(x), x, 0.0))
    r = jnp.where(jnp.isinf(x), jnp.sign(x), r)
    return jnp.where(jnp.isnan(x), x, r)


# ---------------------------------------------------------------------------
# public API: platform-dispatched, dtype-gated, analytic custom derivatives
# ---------------------------------------------------------------------------


def _wrap(name, poly_full, native, jvp):
    """Build the public op: f32-on-TPU -> polynomial, else native jnp.

    ``lax.platform_dependent`` branches at lowering time, so one traced
    program stays correct for whichever backend it is compiled for.
    The custom JVP makes autodiff see the analytic derivative — NUTS /
    Adam / sensitivity Jacobians differentiate log as 1/x, not as the
    derivative of a degree-9 polynomial in frexp pieces.
    """
    import jax

    @jax.custom_jvp
    def fn(x):
        from jax import lax
        import jax.numpy as jnp

        x = jnp.asarray(x)
        if not _f32(x):
            return native(x)
        return lax.platform_dependent(x, tpu=poly_full, default=native)

    @fn.defjvp
    def _fn_jvp(primals, tangents):
        (x,) = primals
        (dx,) = tangents
        y = fn(x)
        return y, jvp(x, y) * dx

    fn.__name__ = name
    fn.__qualname__ = name
    return fn


def _d_log(x, _y):
    return 1.0 / x


def _d_log1p(x, _y):
    return 1.0 / (1.0 + x)


def _d_log2(x, _y):
    return _LOG2E / x


def _d_log10(x, _y):
    return _LOG10E / x


def _d_exp(_x, y):
    return y


def _d_expm1(_x, y):
    return y + 1.0


def _d_tanh(_x, y):
    return 1.0 - y * y


def _init():
    import jax.numpy as jnp

    def log2_poly(x):
        return _log_full(x) * _LOG2E

    def log10_poly(x):
        return _log_full(x) * _LOG10E

    ops = {
        "accurate_log": _wrap("accurate_log", _log_full, jnp.log, _d_log),
        "accurate_log1p": _wrap(
            "accurate_log1p", _log1p_full, jnp.log1p, _d_log1p
        ),
        "accurate_log2": _wrap("accurate_log2", log2_poly, jnp.log2, _d_log2),
        "accurate_log10": _wrap(
            "accurate_log10", log10_poly, jnp.log10, _d_log10
        ),
        "accurate_exp": _wrap("accurate_exp", _exp_full, jnp.exp, _d_exp),
        "accurate_expm1": _wrap(
            "accurate_expm1", _expm1_full, jnp.expm1, _d_expm1
        ),
        "accurate_tanh": _wrap("accurate_tanh", _tanh_full, jnp.tanh, _d_tanh),
    }
    return ops


_OPS = None


def _get(name):
    global _OPS
    if _OPS is None:
        _OPS = _init()
    return _OPS[name]


def accurate_log(x):
    return _get("accurate_log")(x)


def accurate_log1p(x):
    return _get("accurate_log1p")(x)


def accurate_log2(x):
    return _get("accurate_log2")(x)


def accurate_log10(x):
    return _get("accurate_log10")(x)


def accurate_exp(x):
    return _get("accurate_exp")(x)


def accurate_expm1(x):
    return _get("accurate_expm1")(x)


def accurate_tanh(x):
    return _get("accurate_tanh")(x)


def accurate_sinh(x):
    """sinh via expm1 (cancellation-free near zero):
    ``sinh(x) = (em + em/(em+1))/2`` with ``em = expm1(x)``."""
    import jax.numpy as jnp

    x = jnp.asarray(x)
    if not _f32(x):
        return jnp.sinh(x)
    # odd symmetry: evaluate on |x| so em + 1 never cancels
    em = accurate_expm1(jnp.abs(x))
    r = jnp.sign(x) * 0.5 * (em + em / (em + 1.0))
    return jnp.where(jnp.isinf(x), x, r)  # em/(em+1) is inf/inf there


def accurate_cosh(x):
    import jax.numpy as jnp

    x = jnp.asarray(x)
    if not _f32(x):
        return jnp.cosh(x)
    e = accurate_exp(jnp.abs(x))
    return 0.5 * (e + 1.0 / e)


def accurate_power(x, y):
    """pow(x, y) = exp(y * log(x)) on the accurate kernels.

    Matches ``jnp.power`` conventions on the domains the physics uses
    (x > 0, plus the x == 0 / y == 0 edges).  Negative bases fall back
    to the native op (integer-exponent sign handling isn't worth
    reimplementing for a domain the physics never touches).
    """
    import jax.numpy as jnp

    x = jnp.asarray(x)
    y = jnp.asarray(y)
    if not (_f32(x) and _f32(jnp.result_type(x, y))):
        return jnp.power(x, y)
    pos = x > 0
    r = accurate_exp(
        jnp.asarray(y, x.dtype) * accurate_log(jnp.where(pos, x, 1.0))
    )
    r = jnp.where(pos, r, jnp.power(x, y))
    return jnp.where(y == 0, jnp.asarray(1.0, x.dtype), r)
