"""Execution-target context: which platform compiled code will run on.

Components that pick between a Pallas TPU kernel and a plain-XLA
implementation at trace time (``ClimateUDEB.month_engine="auto"``) cannot
see where the jitted program will execute.  ``jax.default_backend()`` is
the wrong oracle whenever the caller targets a non-default mesh — the
forced-CPU fallback would resolve to the Pallas kernel and fail to lower
for CPU devices — and merely *asking* it initializes the default backend,
which hangs indefinitely when that backend is a broken TPU tunnel.

Mesh-aware runners (:class:`rscm_tpu.parallel.EnsembleRunner`, the device
MCMC/NUTS engines) wrap tracing and execution in :func:`execution_target`
with the mesh's platform; :func:`target_platform` resolves
target-dependent choices, falling back to the default backend only when
no target is declared.
"""

from __future__ import annotations

from contextlib import contextmanager
from contextvars import ContextVar
from typing import Iterator, Optional

_TARGET: ContextVar[Optional[str]] = ContextVar(
    "rscm_tpu_execution_target", default=None
)


@contextmanager
def execution_target(platform: Optional[str]) -> Iterator[None]:
    """Declare the platform jitted code traced inside the block runs on.

    ``platform`` is a JAX platform string (``"tpu"``, ``"cpu"``, ...) or
    ``None`` to defer to the default backend.  Nestable; the previous
    target is restored on exit.
    """
    token = _TARGET.set(platform)
    try:
        yield
    finally:
        _TARGET.reset(token)


def target_platform() -> str:
    """The platform the current trace will execute on.

    Inside an :func:`execution_target` block this is the declared target
    and never touches any backend; otherwise it is the default backend's
    platform.
    """
    declared = _TARGET.get()
    if declared is not None:
        return declared
    import jax

    return jax.default_backend()


def mesh_platform(mesh) -> str:
    """Platform string of a mesh's devices (they are single-platform)."""
    return next(iter(mesh.devices.flat)).platform


@contextmanager
def mesh_context(mesh) -> Iterator[None]:
    """Anchor eager ops *and* trace-time target resolution to a mesh.

    The single policy point for "placement must follow the mesh, never the
    default backend" (the round-2 dryrun failure mode): inside the block,
    eager ops (``jnp.asarray``, PRNG key handling) execute on the mesh's
    first device via ``jax.default_device``, and
    :func:`target_platform` resolves to the mesh's platform.  With
    ``mesh=None`` it only clears any inherited target; the default
    backend applies as usual.
    """
    if mesh is None:
        with execution_target(None):
            yield
        return
    import jax

    anchor = next(iter(mesh.devices.flat))
    with jax.default_device(anchor), execution_target(anchor.platform):
        yield
