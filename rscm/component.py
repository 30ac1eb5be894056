"""
Typed Python components (reference-API surface of ``python/rscm/component.py``).

The engine's declarative component API is the same design, so this is a
direct re-export: subclass :class:`Component`, declare I/O with
:class:`Input`/:class:`Output`/:class:`State` class attributes, implement
``solve(t_current, t_next, inputs)`` returning ``self.Outputs(...)``, and
wrap with ``rscm.core.PythonComponent.build`` for model integration — or
add the component directly, in which case traceable physics compiles into
the fused scan program.
"""

from rscm_tpu.core.component import Component, Input, Output, Parameter, State

__all__ = ["Component", "Input", "Output", "Parameter", "State"]
