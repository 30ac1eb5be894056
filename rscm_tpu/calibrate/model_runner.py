"""
Model runners: map a parameter vector to model outputs.

Mirror of ``crates/rscm-calibrate/src/model_runner.rs``:

- :class:`ModelRunner` — the protocol (``param_names``, ``run``,
  ``run_batch``);
- :class:`DefaultModelRunner` — builds a fresh model per parameter vector
  through a user factory and extracts named scalar outputs (host path;
  the reference parallelises this with rayon — here each model run is
  already one compiled program);
- :class:`CompiledModelRunner` — the TPU-native runner: one model, its
  parameters exposed as traced leaves; ``trajectories_fn`` is a **pure
  function** theta -> {var: (n_steps, 1)} that vmaps/grads/jits, which the
  on-device sampler consumes.
"""

from __future__ import annotations

from typing import Callable, Dict, List

import numpy as np

from .likelihood import ModelOutput, VariableOutput

__all__ = ["ModelRunner", "DefaultModelRunner", "CompiledModelRunner", "SensitivityAnalyzer"]


class ModelRunner:
    """Protocol base.

    Also usable directly with the reference's convenience constructor:
    ``ModelRunner(model_factory=fn, param_names=[...],
    output_variables=[...])`` where ``fn(param_dict)`` returns
    ``{var_name: {time: value}}``.
    """

    def __init__(self, model_factory=None, param_names=None, output_variables=None):
        self._factory = model_factory
        self._param_names = list(param_names) if param_names is not None else None
        self._output_variables = (
            list(output_variables) if output_variables is not None else None
        )

    def param_names(self) -> List[str]:
        if self._param_names is not None:
            return list(self._param_names)
        raise NotImplementedError

    def run(self, params) -> ModelOutput:
        if self._factory is None:
            raise NotImplementedError
        param_dict = dict(zip(self._param_names, np.asarray(params, dtype=float)))
        result = self._factory(param_dict)
        output = ModelOutput()
        for name in self._output_variables or list(result):
            var_output = VariableOutput(name)
            for t, v in result[name].items():
                var_output.add(float(t), float(v))
            output.add_variable(var_output)
        return output

    def run_batch(self, param_sets) -> list:
        """Default sequential batch; entries are ModelOutput or Exception."""
        out = []
        for params in param_sets:
            try:
                out.append(self.run(params))
            except Exception as e:  # failed runs become -inf posterior
                out.append(e)
        return out


class DefaultModelRunner(ModelRunner):
    def __init__(
        self,
        param_names: List[str],
        output_variables: List[str],
        factory: Callable,
    ):
        self._param_names = list(param_names)
        self.output_variables = list(output_variables)
        self.factory = factory

    def param_names(self):
        return self._param_names

    def run(self, params) -> ModelOutput:
        params = list(np.asarray(params, dtype=np.float64))
        if len(params) != len(self._param_names):
            raise ValueError(
                f"Expected {len(self._param_names)} parameters, got {len(params)}"
            )
        model = self.factory(params)
        model.run()
        if not model.finished():
            raise RuntimeError("Model did not complete all timesteps")
        return self.extract_outputs(model)

    def extract_outputs(self, model) -> ModelOutput:
        output = ModelOutput()
        collection = model.timeseries()
        for var_name in self.output_variables:
            data = collection.get_data(var_name)
            if data is None:
                raise ValueError(f"Model output missing variable: {var_name}")
            if data.grid.size() != 1:
                raise ValueError(f"Grid variables not yet supported: {var_name}")
            var_output = VariableOutput(var_name)
            times = data.time_axis().values()
            values = data.values()[:, 0]
            for t, v in zip(times, values):
                if not np.isnan(v):
                    var_output.add(float(t), float(v))
            output.add_variable(var_output)
        return output


class CompiledModelRunner(ModelRunner):
    """TPU-native runner over a built model's compiled program.

    ``param_map`` maps sampled parameter names to model parameters as
    ``"ComponentName.param"`` strings (one sampled value may drive several
    model parameters by listing multiple targets).
    """

    def __init__(
        self,
        model,
        param_map: Dict[str, object],
        output_variables: List[str],
        dtype=None,
        stream: bool = True,
        scan_unroll: int = 1,
    ):
        from rscm_tpu.core.model.program import ModelProgram

        self.model = model
        # scan_unroll trades program size for per-iteration scan overhead.
        # Calibration batches are small (walkers/chains, not 100k members),
        # so the time scan is latency-bound: ~9 us/step of pure iteration
        # overhead at 64 chains on TPU v5e vs sub-us of physics. Gradient
        # samplers (NUTS) that evaluate the model thousands of times per
        # chain benefit from unrolling; the big-ensemble EnsembleRunner
        # path keeps unroll=1 (measured slower there — program.py:70).
        self.program = ModelProgram(model, dtype=dtype, scan_unroll=scan_unroll)
        self.output_variables = list(output_variables)
        # streaming (windowed-carry) program by default: the scan carry is
        # O(lookback) per variable instead of O(n_steps), which is what
        # keeps big-model posteriors (full MAGICC x 1024 walkers, and their
        # reverse-mode gradients) inside HBM.  Values are bitwise-equal to
        # the full mode (tests/test_fuzz_graphs.py); pass stream=False to
        # force the full-trajectory program.
        self.stream = bool(stream)
        self._param_names = list(param_map)
        # normalise: name -> list of "Component.param"
        self.param_map = {
            name: ([targets] if isinstance(targets, str) else list(targets))
            for name, targets in param_map.items()
        }

        # resolve Component.param -> (node_key, param_name); duplicate
        # component names must be a hard error — silently letting the last
        # node win would bind calibration parameters to the wrong instance
        # and produce wrong posteriors with no diagnostic
        name_for_node = {}
        for node in self.program.exec_nodes:
            comp = model.graph.nodes[node]
            comp_name = getattr(comp, "component_name", type(comp).__name__)
            if comp_name in name_for_node:
                raise ValueError(
                    f"CompiledModelRunner: two components share the name "
                    f"{comp_name!r}; param_map targets would be ambiguous. "
                    "Give each instance a distinct component_name."
                )
            name_for_node[comp_name] = str(node)
        self._targets = {}
        base = self.program.gather_params()
        for name, targets in self.param_map.items():
            resolved = []
            for target in targets:
                comp_name, _, pname = target.partition(".")
                if comp_name not in name_for_node:
                    raise KeyError(f"Unknown component '{comp_name}' in param_map")
                node_key = name_for_node[comp_name]
                if pname not in base.get(node_key, {}):
                    raise KeyError(
                        f"Unknown parameter '{pname}' on component '{comp_name}'"
                    )
                resolved.append((node_key, pname))
            self._targets[name] = resolved
        self._base_params = base
        self._cached = None
        self._cached_batch = None

    def param_names(self):
        return self._param_names

    # -- pure traced core ------------------------------------------------------

    def params_pytree(self, theta):
        """Substitute a (D,) parameter vector into the model's param pytree."""
        out = {k: dict(v) for k, v in self._base_params.items()}
        for j, name in enumerate(self._param_names):
            for node_key, pname in self._targets[name]:
                out[node_key][pname] = theta[j]
        return out

    def trajectories_fn(self):
        """Pure fn: theta (D,) -> {var: (n_steps, g)} — jit/vmap/grad-able."""
        p = self.program
        exo = p.gather_exo()
        internals = p.gather_internals()
        out_vars = self.output_variables

        if self.stream:
            endo_bufs = p.gather_endo_window()

            def fn(theta):
                params = self.params_pytree(theta)
                trajs, _ = p.run_window_fn(
                    endo_bufs, exo, params, internals, out_vars
                )
                return trajs

        else:
            endo = p.gather_endo()

            def fn(theta):
                params = self.params_pytree(theta)
                endo_out, _ = p.run_fn(endo, exo, params, internals)
                return {name: endo_out[name] for name in out_vars}

        return fn

    # -- ModelRunner protocol (host API parity) --------------------------------

    def _series(self, name: str, traj) -> np.ndarray:
        """(n_steps,) scalar series from a trajectory.

        Multi-region (grid) variables reduce to the area-weighted global
        aggregate — the same ``aggregate_global`` semantics the traced
        likelihood applies (the reference's DefaultModelRunner rejects grid
        variables outright; this runner supports them globally-aggregated).
        """
        arr = np.asarray(traj)
        if arr.ndim == 2 and arr.shape[1] > 1:
            data = self.model.collection.get_data(name)
            return arr @ np.asarray(data.grid.weights, dtype=arr.dtype)
        return arr[:, 0] if arr.ndim == 2 else arr

    def run(self, params) -> ModelOutput:
        import jax

        if self._cached is None:
            self._cached = jax.jit(self.trajectories_fn())
        theta = np.asarray(params, dtype=self.program.dtype)
        trajectories = self._cached(theta)
        output = ModelOutput()
        times = self.model.time_axis.values()
        for name in self.output_variables:
            var_output = VariableOutput(name)
            series = self._series(name, trajectories[name])
            for t, v in zip(times, series):
                if not np.isnan(v):
                    var_output.add(float(t), float(v))
            output.add_variable(var_output)
        return output

    def run_batch(self, param_sets) -> list:
        import jax

        thetas = np.asarray(param_sets, dtype=self.program.dtype)
        if self._cached_batch is None:
            # cache like run(): trajectories_fn() returns a fresh closure
            # each call, so an uncached jit(vmap(...)) would retrace and
            # recompile the whole model program on every batch
            self._cached_batch = jax.jit(jax.vmap(self.trajectories_fn()))
        batched = self._cached_batch(thetas)
        outputs = []
        times = self.model.time_axis.values()
        for i in range(thetas.shape[0]):
            output = ModelOutput()
            for name in self.output_variables:
                var_output = VariableOutput(name)
                series = self._series(name, batched[name][i])
                for t, v in zip(times, series):
                    if not np.isnan(v):
                        var_output.add(float(t), float(v))
                output.add_variable(var_output)
            outputs.append(output)
        return outputs


class SensitivityAnalyzer:
    """Exact parameter sensitivities through the compiled model.

    A capability the reference cannot offer (its models are not
    differentiable, so sensitivity studies there mean finite-difference
    ensembles): here ``d output(t) / d theta_j`` comes from one
    reverse/forward-mode pass through the whole traced program, at machine
    precision and a small constant factor over a forward run.

    Built on :class:`CompiledModelRunner`'s pure ``theta -> trajectories``
    core; results are plain numpy.
    """

    def __init__(self, runner: CompiledModelRunner):
        if not isinstance(runner, CompiledModelRunner):
            raise TypeError("SensitivityAnalyzer requires a CompiledModelRunner")
        self.runner = runner
        self._jac = None

    def jacobian(self, theta) -> Dict[str, np.ndarray]:
        """``{var: (n_steps, n_regions, D)}`` — d trajectory / d theta.

        Forward-mode (``jacfwd``): D is small, trajectories are long, so
        one JVP per parameter beats reverse mode's per-output VJPs.
        """
        import jax

        if self._jac is None:
            self._jac = jax.jit(jax.jacfwd(self.runner.trajectories_fn()))
        theta = np.asarray(theta, dtype=self.runner.program.dtype)
        return {
            name: np.asarray(v) for name, v in self._jac(theta).items()
        }

    def elasticities(self, theta) -> Dict[str, np.ndarray]:
        """Dimensionless sensitivities ``(theta_j / y(t)) * dy/dtheta_j``.

        Comparable across parameters and variables; entries where the
        trajectory is ~0 are returned as NaN rather than blowing up.
        """
        theta = np.asarray(theta, dtype=np.float64)
        jac = self.jacobian(theta)
        fn = self.runner.trajectories_fn()
        import jax

        base = jax.jit(fn)(theta.astype(self.runner.program.dtype))
        out = {}
        for name, j in jac.items():
            y = np.asarray(base[name])[..., None]  # (n_steps, g, 1)
            with np.errstate(divide="ignore", invalid="ignore"):
                e = j * theta[None, None, :] / y
            e[np.broadcast_to(np.abs(y) < 1e-30, e.shape)] = np.nan
            out[name] = e
        return out
