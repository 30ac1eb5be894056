"""Accuracy, special-value, and autodiff contracts of the accurate-f32
transcendental kernels (rscm_tpu/ops/accurate_math.py).

These run on CPU, where ``lax.platform_dependent`` selects the *native*
ops for the public wrappers — so the polynomial kernels are exercised
directly here (they are platform-independent f32 arithmetic; the real-TPU
numbers are asserted by bench.py's on-device golden gate).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rscm_tpu.ops import accurate_math as am
from rscm_tpu.ops.accurate_math import (
    _exp_full,
    _expm1_full,
    _log1p_full,
    _log_full,
    _tanh_full,
)

RNG = np.random.default_rng(42)


def max_rel(got, want):
    got = np.asarray(got, np.float64)
    return float(np.max(np.abs(got - want) / np.maximum(np.abs(want), 1e-300)))


# -- polynomial-kernel accuracy (the TPU branch, evaluated on CPU) ----------

X_LOG = np.concatenate(
    [
        RNG.uniform(1e-30, 1e-6, 2000),
        RNG.uniform(1e-6, 1.0, 2000),
        RNG.uniform(1.0, 4.0, 2000),
        RNG.uniform(4.0, 1e30, 2000),
    ]
).astype(np.float32)
X_WIDE = np.concatenate(
    [RNG.uniform(-80.0, 80.0, 4000), RNG.uniform(-0.3, 0.3, 2000)]
).astype(np.float32)
X_LOG1P = np.concatenate(
    [
        RNG.uniform(-0.999, 10.0, 4000),
        RNG.uniform(-1e-4, 1e-4, 1000),
        RNG.uniform(-0.02, 0.02, 1000),
    ]
).astype(np.float32)


@pytest.mark.parametrize(
    "kernel,oracle,xs,tol",
    [
        (_log_full, np.log, X_LOG, 5e-7),
        (_exp_full, np.exp, X_WIDE, 5e-7),
        (_expm1_full, np.expm1, X_LOG1P, 5e-7),
        (_log1p_full, np.log1p, X_LOG1P, 5e-7),
        (_tanh_full, np.tanh, X_WIDE * 0.15, 5e-7),
    ],
    ids=["log", "exp", "expm1", "log1p", "tanh"],
)
def test_kernel_accuracy(kernel, oracle, xs, tol):
    got = jax.jit(kernel)(jnp.asarray(xs))
    want = oracle(xs.astype(np.float64))
    assert max_rel(got, want) < tol


def test_sinh_cosh_accuracy():
    xs = np.concatenate(
        [RNG.uniform(-12, 12, 4000), RNG.uniform(-1e-3, 1e-3, 1000)]
    ).astype(np.float32)
    # public wrappers: on CPU these hit the native branch; drive the
    # composite form through a f32 jit to check the cancellation-free
    # construction as well
    assert max_rel(am.accurate_sinh(jnp.asarray(xs)), np.sinh(xs.astype(np.float64))) < 1e-6
    assert max_rel(am.accurate_cosh(jnp.asarray(xs)), np.cosh(xs.astype(np.float64))) < 1e-6


def test_power_matches_numpy():
    x = RNG.uniform(1e-3, 1e3, 2000).astype(np.float32)
    for y in (0.75, 1.3, -0.5, 2.0, 0.0):
        got = am.accurate_power(jnp.asarray(x), y)
        want = x.astype(np.float64) ** y
        assert max_rel(got, want) < 1e-5, y
    # zero base / negative base fall back to native conventions
    assert float(am.accurate_power(jnp.float32(0.0), 2.0)) == 0.0
    assert float(am.accurate_power(jnp.float32(-2.0), 2.0)) == 4.0
    assert float(am.accurate_power(jnp.float32(0.0), 0.0)) == 1.0


# -- IEEE special values match jnp semantics --------------------------------

SPECIALS = np.array([0.0, -1.0, 1.0, np.inf, -np.inf, np.nan], np.float32)


@pytest.mark.parametrize(
    "kernel,native",
    [
        (_log_full, jnp.log),
        (_exp_full, jnp.exp),
        (_expm1_full, jnp.expm1),
        (_log1p_full, jnp.log1p),
        (_tanh_full, jnp.tanh),
    ],
    ids=["log", "exp", "expm1", "log1p", "tanh"],
)
def test_specials_match_native(kernel, native):
    got = np.asarray(kernel(jnp.asarray(SPECIALS)))
    want = np.asarray(native(jnp.asarray(SPECIALS)))
    np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
    m = ~np.isnan(want)
    np.testing.assert_array_equal(got[m], want[m])


def test_sinh_specials():
    got = np.asarray(am.accurate_sinh(jnp.asarray(SPECIALS)))
    want = np.asarray(jnp.sinh(jnp.asarray(SPECIALS)))
    np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
    m = ~np.isnan(want)
    np.testing.assert_array_equal(got[m], want[m])


# -- autodiff: analytic derivatives, not polynomial derivatives --------------


def test_custom_jvp_analytic():
    x = 2.0  # weak f32
    assert float(jax.grad(am.accurate_log)(x)) == pytest.approx(0.5, abs=1e-7)
    assert float(jax.grad(am.accurate_exp)(x)) == pytest.approx(
        float(am.accurate_exp(jnp.float32(x))), rel=1e-6
    )
    assert float(jax.grad(am.accurate_tanh)(0.3)) == pytest.approx(
        1.0 - np.tanh(0.3) ** 2, rel=1e-5
    )
    assert float(jax.grad(am.accurate_log1p)(1.0)) == pytest.approx(0.5, rel=1e-6)
    assert float(jax.grad(am.accurate_expm1)(0.0)) == pytest.approx(1.0, rel=1e-6)
    # second order comes through the analytic jvp, too
    assert float(jax.grad(jax.grad(am.accurate_log))(2.0)) == pytest.approx(
        -0.25, rel=1e-5
    )


def test_grad_through_vmap_scan():
    def loss(c0):
        def step(c, _):
            c = c + 0.1 * am.accurate_log(c)
            return c, c

        c, _ = jax.lax.scan(step, c0, None, length=5)
        return c

    g = jax.grad(loss)(jnp.float32(1.5))
    eps = 1e-3
    fd = (loss(jnp.float32(1.5 + eps)) - loss(jnp.float32(1.5 - eps))) / (2 * eps)
    assert float(g) == pytest.approx(float(fd), rel=1e-2)


# -- float64 passthrough ------------------------------------------------------


def test_f64_passthrough_exact():
    x = jnp.asarray([0.5, 2.0, 123.456], jnp.float64)
    np.testing.assert_array_equal(np.asarray(am.accurate_log(x)), np.log(np.asarray(x)))
    np.testing.assert_array_equal(np.asarray(am.accurate_exp(x)), np.exp(np.asarray(x)))


# -- xmath wiring --------------------------------------------------------------


def test_xmath_traced_routes_through_accurate():
    from rscm_tpu.core import xmath as xm

    x = jnp.asarray([0.5, 1.5, 278.0], jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(xm.log(x)), np.asarray(am.accurate_log(x))
    )
    np.testing.assert_array_equal(
        np.asarray(xm.exp(x)), np.asarray(am.accurate_exp(x))
    )
    # host path is still float64 numpy
    assert isinstance(xm.log(2.0), np.floating)
    assert xm.log(2.0) == np.log(2.0)
