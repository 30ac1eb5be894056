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


def _dispatch(name):
    def fn(*args, **kwargs):
        if _is_traced(*args):
            import jax.numpy as jnp

            return getattr(jnp, name)(*args, **kwargs)
        return getattr(np, name)(*args, **kwargs)

    fn.__name__ = name
    return fn


exp = _dispatch("exp")
log = _dispatch("log")
log2 = _dispatch("log2")
log10 = _dispatch("log10")
log1p = _dispatch("log1p")
expm1 = _dispatch("expm1")
sqrt = _dispatch("sqrt")
power = _dispatch("power")
abs = _dispatch("abs")  # noqa: A001
sign = _dispatch("sign")
maximum = _dispatch("maximum")
minimum = _dispatch("minimum")
clip = _dispatch("clip")
where = _dispatch("where")
tanh = _dispatch("tanh")
sinh = _dispatch("sinh")
cosh = _dispatch("cosh")
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
