"""
Dual-mode scalar math: numpy float64 on host, jnp under tracing.

Component physics is written once against this module.  When inputs are
concrete host values (the eager/step path) operations stay in float64 numpy
— bit-exact with the float64 compiled path under x64.  When inputs are JAX
tracers (the compiled ``lax.scan`` path) the same expressions trace to XLA
ops in the model's compute dtype.

Only the functions components actually need are exposed; plain ``+ - * /``
works directly on both value kinds via operator overloading.
"""

from __future__ import annotations

import numpy as np


def _is_traced(*xs) -> bool:
    import jax

    return any(isinstance(x, (jax.Array, jax.core.Tracer)) for x in xs)


def static_value(x):
    """The concrete float value of ``x`` if it is known at trace time
    (python/numpy scalar — e.g. a parameter baked as a constant), else
    ``None``.  Lets physics special-case default parameter values
    (skip a ``power`` at exponent 1, share an ``exp`` grid between
    equal Q10 alphas) without touching swept/traced parameters."""
    if isinstance(x, (int, float)):
        return float(x)
    if isinstance(x, np.ndarray) and x.ndim == 0:
        return float(x)
    if isinstance(x, (np.floating, np.integer)):
        return float(x)
    return None


def _dispatch(name):
    def fn(*args, **kwargs):
        if _is_traced(*args):
            import jax.numpy as jnp

            return getattr(jnp, name)(*args, **kwargs)
        return getattr(np, name)(*args, **kwargs)

    fn.__name__ = name
    return fn


def _dispatch_accurate(name):
    """Traced path routes through :mod:`rscm_tpu.ops.accurate_math`.

    XLA's TPU lowerings of the log/exp op families carry 1e-4-class
    float32 error (measured on v5e; see accurate_math's table) — enough
    to dominate the physics' dtype-drift budget.  The accurate ops are
    minimax-polynomial VPU kernels dispatched per lowering platform
    (``lax.platform_dependent``): non-TPU backends and float64 inputs
    keep the native op, so CPU-compiled and x64 numerics are unchanged.
    """

    def fn(*args, **kwargs):
        if _is_traced(*args):
            from rscm_tpu.ops import accurate_math

            return getattr(accurate_math, "accurate_" + name)(*args, **kwargs)
        return getattr(np, name)(*args, **kwargs)

    fn.__name__ = name
    return fn


exp = _dispatch_accurate("exp")
#: Native-lowering exp (``jnp.exp`` when traced).  XLA's TPU exp carries
#: ~5e-6 relative error (vs ~1e-7 for :data:`exp`) but is a single
#: hardware-pipelined op instead of a ~25-op minimax polynomial.  Use it
#: for physics whose own parametric uncertainty dwarfs 1e-5 — e.g. rate
#: modifiers inside golden-free feedback modules — never for anything a
#: golden-parity gate observes (forcing logs, carbonate chemistry).
exp_fast = _dispatch("exp")
tile = _dispatch("tile")
repeat = _dispatch("repeat")
log = _dispatch_accurate("log")
log2 = _dispatch_accurate("log2")
log10 = _dispatch_accurate("log10")
log1p = _dispatch_accurate("log1p")
expm1 = _dispatch_accurate("expm1")
sqrt = _dispatch("sqrt")
power = _dispatch_accurate("power")
abs = _dispatch("abs")  # noqa: A001
sign = _dispatch("sign")
maximum = _dispatch("maximum")
minimum = _dispatch("minimum")
clip = _dispatch("clip")
where = _dispatch("where")
tanh = _dispatch_accurate("tanh")
sinh = _dispatch_accurate("sinh")
cosh = _dispatch_accurate("cosh")
sin = _dispatch("sin")
cos = _dispatch("cos")
arctan = _dispatch("arctan")
floor = _dispatch("floor")
ceil = _dispatch("ceil")
isnan = _dispatch("isnan")
nan_to_num = _dispatch("nan_to_num")
take = _dispatch("take")
sum = _dispatch("sum")  # noqa: A001
mean = _dispatch("mean")
interp = _dispatch("interp")


def asarray(x, like=None):
    """Array conversion following the mode of ``like`` (or of ``x``)."""
    if _is_traced(x, like):
        import jax.numpy as jnp

        return jnp.asarray(x)
    return np.asarray(x, dtype=np.float64)


def stack(xs):
    if _is_traced(*xs):
        import jax.numpy as jnp

        return jnp.stack([jnp.asarray(x) for x in xs])
    return np.asarray([float(x) for x in xs])


def select(pred, on_true, on_false):
    """Branch-free select usable in both modes (alias of where)."""
    return where(pred, on_true, on_false)


def push_front(buffer, value):
    """Shift a 1-D ring buffer right by one and place ``value`` at index 0.

    Newest-first layout; the oldest entry falls off the end.  Used for
    fixed-length flux histories carried through scans (e.g. the ocean
    carbon IRF convolution).
    """
    if _is_traced(buffer, value):
        import jax.numpy as jnp

        buffer = jnp.asarray(buffer)
        return jnp.concatenate(
            [jnp.reshape(jnp.asarray(value, dtype=buffer.dtype), (1,)), buffer[:-1]]
        )
    buffer = np.asarray(buffer, dtype=np.float64)
    return np.concatenate([[float(value)], buffer[:-1]])


def dot(a, b):
    if _is_traced(a, b):
        import jax.numpy as jnp

        return jnp.dot(jnp.asarray(a), jnp.asarray(b))
    return np.dot(a, b)
