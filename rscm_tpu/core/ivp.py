"""
Fixed-step RK4 sub-stepping for per-component ODE solves.

Mirror of ``crates/rscm-core/src/ivp/mod.rs`` + the ``ode_solvers`` Rk4 it
wraps: a component integrates its ODE over one model step ``[t0, t1]`` with
a fixed sub-step (typically 0.1 yr inside an annual step), and the landing
time must be within ``T_THRESHOLD = 5e-3`` of ``t1``
(``ivp/mod.rs:9,90-102``).

TPU-native treatment: the sub-step count is resolved **statically** at trace
time from the model's time axis (``SolveContext.spans``), so the RK4 loop
unrolls inside the fused step function — 4 derivative evaluations per
sub-step become straight-line XLA ops with no control flow.  The same code
runs the host path with plain float64 arithmetic.

``y`` is a tuple of scalars (host floats or tracers); the derivative
function ``f(t, y) -> dy/dt tuple`` reads forcings from windows captured in
its closure (windows are constant over the step via ``get()``, matching the
reference components).
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import numpy as np

__all__ = ["T_THRESHOLD", "substep_count", "rk4_integrate", "solve_ivp_rk4"]

T_THRESHOLD = 5e-3


def substep_count(ctx, step_size: float) -> int:
    """Static number of RK4 sub-steps for this model step.

    Mirrors ``ode_solvers`` Rk4's ``ceil(span / step)`` count and the
    reference's end-time assertion.  Under tracing all model steps must
    yield the same count (uniform axis) since one step program serves every
    scan iteration.
    """
    spans = getattr(ctx, "spans", None)
    if spans is None:
        # host path: concrete bounds
        spans = np.asarray([float(ctx.t_next) - float(ctx.t_current)])
    else:
        spans = np.asarray(spans, dtype=np.float64)

    counts = np.ceil(spans / step_size - 1e-9).astype(int)
    n = int(counts[0])
    if not np.all(counts == n):
        raise ValueError(
            "RK4 sub-step count varies across the time axis "
            f"(counts {sorted(set(counts.tolist()))}); a non-uniform axis "
            "cannot be compiled into a single fused step program. "
            "Run the model with compiled=False or use a uniform axis."
        )
    landing_err = np.max(np.abs(counts * step_size - spans))
    assert landing_err < T_THRESHOLD, (
        f"RK4 landing time misses the step end by {landing_err:.3e} "
        f"(> {T_THRESHOLD}); choose a step_size that divides the axis step."
    )
    return n


def _add(y: Tuple, k: Tuple, h):
    return tuple(yi + ki * h for yi, ki in zip(y, k))


def _rk4_step(f: Callable, y: Tuple, t, h) -> Tuple:
    k1 = f(t, y)
    k2 = f(t + h / 2.0, _add(y, k1, h / 2.0))
    k3 = f(t + h / 2.0, _add(y, k2, h / 2.0))
    k4 = f(t + h, _add(y, k3, h))
    return tuple(
        yi + (k1i + 2.0 * k2i + 2.0 * k3i + k4i) * (h / 6.0)
        for yi, k1i, k2i, k3i, k4i in zip(y, k1, k2, k3, k4)
    )


def rk4_integrate(f: Callable, y0: Tuple, t0, step_size: float, n: int) -> Tuple:
    """Classic RK4 with ``n`` fixed sub-steps of width ``step_size``.

    Arithmetic matches ``ode_solvers``' Rk4:
    ``y += (k1 + 2 k2 + 2 k3 + k4) * (h/6)``.

    Under tracing the sub-step loop is a ``lax.fori_loop`` (the sub-steps
    are inherently sequential, so rolling them shrinks the step program —
    and its compile time — ~n-fold without costing wall-clock); the host
    path and short unrolls use a plain Python loop with identical
    arithmetic.
    """
    h = step_size
    y = tuple(y0)

    def _is_traced(values) -> bool:
        import jax

        return any(isinstance(v, (jax.Array, jax.core.Tracer)) for v in values)

    if n > 2 and (_is_traced(y) or _is_traced([t0])):
        from jax import lax

        def body(i, y):
            return _rk4_step(f, y, t0 + i * h, h)

        return lax.fori_loop(0, n, body, y)

    for i in range(n):
        y = _rk4_step(f, y, t0 + i * h, h)
    return y


def solve_ivp_rk4(f: Callable, y0: Sequence, ctx, step_size: float = 0.1) -> Tuple:
    """Integrate ``dy/dt = f(t, y)`` over the model step in ``ctx``.

    Equivalent of ``IVPBuilder::to_rk4(t0, t1, step).integrate()`` +
    ``get_last_step`` (``ivp/mod.rs:245,90``).
    """
    n = substep_count(ctx, step_size)
    return rk4_integrate(f, tuple(y0), ctx.t_current, step_size, n)
