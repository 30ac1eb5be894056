"""
Ordered name -> prior map with random and Latin Hypercube sampling.

Mirror of ``crates/rscm-calibrate/src/parameter_set.rs:73-295``.  The joint
``log_prior`` is vectorisable (works on (D,) and (B, D) arrays, traced or
host), so it slots directly into the on-device posterior.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from .distribution import Distribution

__all__ = ["ParameterSet"]


class ParameterSet:
    def __init__(self, parameters: Optional[Dict[str, Distribution]] = None):
        self.parameters: Dict[str, Distribution] = dict(parameters or {})

    @staticmethod
    def from_map(parameters: Dict[str, Distribution]) -> "ParameterSet":
        return ParameterSet(parameters)

    def add(self, name: str, distribution: Distribution) -> "ParameterSet":
        self.parameters[name] = distribution
        return self

    class _CallableList(list):
        """List that is also callable — the reference exposes
        ``param_names`` as an attribute; this engine's internals call it."""

        def __call__(self):
            return list(self)

    @property
    def param_names(self) -> "ParameterSet._CallableList":
        return ParameterSet._CallableList(self.parameters)

    def __len__(self) -> int:
        return len(self.parameters)

    def is_empty(self) -> bool:
        return not self.parameters

    # -- sampling ------------------------------------------------------------

    def sample_random(self, n: int, rng: Optional[np.random.Generator] = None) -> np.ndarray:
        rng = rng if rng is not None else np.random.default_rng()
        out = np.empty((n, len(self)))
        # Mirror the reference's per-sample-then-per-parameter draw order so
        # seeded streams produce comparable layouts.
        for j, dist in enumerate(self.parameters.values()):
            out[:, j] = dist.sample_n(n, rng)
        return out

    def sample_lhs(self, n: int, rng: Optional[np.random.Generator] = None) -> np.ndarray:
        """Latin Hypercube: stratified quantiles, shuffled per parameter."""
        rng = rng if rng is not None else np.random.default_rng()
        out = np.empty((n, len(self)))
        for j, dist in enumerate(self.parameters.values()):
            stratified = (np.arange(n) + rng.random(n)) / n
            rng.shuffle(stratified)
            out[:, j] = [dist.ppf(float(u)) for u in stratified]
        return out

    def sample_jax(self, key, n: int):
        """Traced prior sampling: (n, D) with one key split per parameter."""
        import jax.numpy as jnp
        import jax.random as jr

        keys = jr.split(key, len(self))
        cols = [
            dist.sample_jax(k, (n,)) for k, dist in zip(keys, self.parameters.values())
        ]
        return jnp.stack(cols, axis=-1)

    # -- density / bounds -----------------------------------------------------

    def log_prior(self, params):
        """Joint log-prior of a (D,) vector or (..., D) batch."""
        params = np.asarray(params) if not _is_traced(params) else params
        if not _is_traced(params) and params.shape[-1] != len(self):
            raise ValueError(
                f"Parameter vector length {params.shape[-1]} does not match "
                f"parameter set size {len(self)}"
            )
        total = 0.0
        for j, dist in enumerate(self.parameters.values()):
            total = total + dist.ln_pdf(params[..., j])
        return total

    def bounds(self):
        lower, upper = [], []
        for dist in self.parameters.values():
            b = dist.bounds()
            if b is None:
                lower.append(-np.inf)
                upper.append(np.inf)
            else:
                lower.append(b[0])
                upper.append(b[1])
        return (lower, upper)

    # -- serialisation --------------------------------------------------------

    def to_dict(self) -> dict:
        return {name: dist.to_dict() for name, dist in self.parameters.items()}

    @staticmethod
    def from_dict(d: dict) -> "ParameterSet":
        return ParameterSet(
            {name: Distribution.from_dict(spec) for name, spec in d.items()}
        )

    def __repr__(self):
        return f"ParameterSet({self.parameters})"


def _is_traced(x) -> bool:
    import jax

    return isinstance(x, (jax.Array, jax.core.Tracer))
