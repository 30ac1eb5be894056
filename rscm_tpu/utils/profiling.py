"""
Profiling and numerical-diagnostics helpers.

The reference's observability story is ``Model::debug_info`` + dot export
(SURVEY.md §5 — it has no profiler hooks).  The TPU-native equivalents:

- :func:`trace_profile` wraps ``jax.profiler.trace`` so a model run (or any
  block) captures a TensorBoard-compatible device trace;
- :func:`cost_analysis` reports XLA's FLOP/byte estimates for a model's
  compiled program;
- :func:`diagnose_nans` steps a model eagerly and reports the first
  component writing a non-finite value — the practical replacement for
  wading through NaN holes (the engine's analogue of checkify).
"""

from __future__ import annotations

import contextlib
from typing import Optional

import numpy as np

__all__ = ["trace_profile", "cost_analysis", "diagnose_nans"]


@contextlib.contextmanager
def trace_profile(log_dir: str):
    """Capture a device trace for the enclosed block (TensorBoard format)."""
    import jax

    with jax.profiler.trace(log_dir):
        yield


def cost_analysis(model) -> Optional[dict]:
    """XLA cost analysis (flops, bytes accessed) of the model's compiled
    run program on the current device."""
    import jax

    program = model.program
    fn = jax.jit(lambda e, x, p, i: program.run_fn(e, x, p, i))
    lowered = fn.lower(
        program.gather_endo(),
        program.gather_exo(),
        program.gather_params(),
        program.gather_internals(),
    )
    compiled = lowered.compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0] if analysis else None
    return analysis


def diagnose_nans(model, max_steps: Optional[int] = None) -> list:
    """Run eagerly from the model's current index, recording each first
    appearance of a non-finite output.

    Returns a list of ``{"step", "time", "component", "variable"}`` dicts
    (empty when the run stays finite).  The model is mutated (it runs).
    """
    findings = []
    seen = set()
    steps = 0
    while not model.finished():
        if max_steps is not None and steps >= max_steps:
            break
        t = model.current_time()
        idx = model.time_index
        for node in model.exec_order:
            component = model.graph.nodes[node]
            name = getattr(component, "component_name", type(component).__name__)
            if name == "NullComponent":
                continue
            model._step_component(node)
            _, write_specs = model._plan[node]
            for var in write_specs:
                data = model.collection.get_data(var)
                if data is None:
                    continue
                row = data.values()[idx + 1]
                if not np.all(np.isfinite(row)) and var not in seen:
                    seen.add(var)
                    findings.append(
                        {
                            "step": idx,
                            "time": t,
                            "component": name,
                            "variable": var,
                        }
                    )
        model.time_index += 1
        steps += 1
    return findings
