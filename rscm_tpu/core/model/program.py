"""
The compiled model program: the whole run as one fused XLA computation.

This is the TPU-native inversion of the reference's pointer-chasing runtime
(SURVEY.md §3.2): instead of name-keyed lookups and trait dispatch per
component per step, the builder's static execution plan is traced **once**
into a single step function, and ``lax.scan`` drives it over the time axis.
XLA fuses the per-component physics (RK4 sub-steps unrolled, grid transforms
as constant matmuls, unit conversions as constant scales) into one program.

Design notes
------------
- **Carry** = ``(endogenous arrays, component internal states)``.  Every
  endogenous variable keeps its full ``(n_steps, n_regions)`` trajectory in
  the carry and is written at index N+1 with ``dynamic_update_slice`` — XLA
  performs these updates in place inside the scan body, so per-step cost is
  O(step state), not O(history).  Window reads (``at_start``/``previous``/
  ``last_n``/``interpolate``) are dynamic slices of the same arrays, which
  keeps the *entire* reference window semantics available under tracing.
- **Streaming mode** (:meth:`ModelProgram.run_window_fn`) replaces the
  full-trajectory carry with a per-variable rolling window sized from the
  deepest lookback any reader declares (``Component.input_lookback``), and
  emits only the *requested* output trajectories as ``lax.scan`` ys.  Carry
  memory becomes O(n_vars · lookback) instead of O(n_vars · n_steps), which
  is what lets a 100k-member full-MAGICC ensemble fit one chip's HBM.
  Window reads use a *static* buffer index, so reads/writes compile to
  static slices (cheaper than the full mode's dynamic ones); values are
  bit-identical to the full mode because the same rows flow through the
  same arithmetic.
- **Exogenous** data and the time axis are traced operands closed over by
  the scan body (read-only; no carry cost).
- **Parameters** enter as a pytree argument, so one compiled program serves
  any parameter values: ``vmap`` over stacked parameter pytrees runs
  ensembles; gradients flow end-to-end (see rscm_tpu.calibrate).
- Upstream outputs written at N+1 by earlier components in the step are
  immediately visible to later components' ``at_end`` reads — the same
  dataflow the reference achieves through its BFS write-then-read ordering.

The functional core (:meth:`ModelProgram.run_fn`) is pure and jittable; the
object wrapper moves data between the host collection and the device.
"""

from __future__ import annotations

import functools
from typing import Dict

import numpy as np

from ..component import SolveContext
from ..state import StateValue, make_window
from ..timeseries import VariableType
from .graph import NullComponent
from .input_state import InputState
from .runtime import prepare_inputs

__all__ = ["ModelProgram"]


class ModelProgram:
    """Compiled ``lax.scan`` program for a built model."""

    def __init__(self, model, dtype=None, scan_unroll: int = 1):
        import jax

        self.model = model
        if dtype is None:
            dtype = np.float64 if jax.config.jax_enable_x64 else np.float32
        self.dtype = np.dtype(dtype)
        # Unrolling the time scan trades program size for per-iteration scan
        # overhead.  Measured on TPU v5e (flagship model, 10k members):
        # unroll=4 was ~1.6x SLOWER than plain scan (0.86 -> 1.37 ms) — the
        # scan's per-iteration cost is already negligible there — so 1 is
        # the default; the knob exists for other hardware/program shapes.
        self.scan_unroll = int(scan_unroll)

        # Static structure ---------------------------------------------------
        self.exec_nodes = [
            node
            for node in model.exec_order
            if not isinstance(model.graph.nodes[node], NullComponent)
        ]
        for node in self.exec_nodes:
            component = model.graph.nodes[node]
            if not getattr(component, "traceable", True):
                raise TypeError(
                    f"Component '{getattr(component, 'component_name', component)}' "
                    f"cannot be traced (arbitrary Python solve); the model runs "
                    f"on the eager host path instead."
                )
        self.n_steps = len(model.time_axis)
        self.time_values = np.asarray(model.time_axis.values(), dtype=self.dtype)
        self.time_bounds = np.asarray(model.time_axis.bounds(), dtype=self.dtype)
        # static step widths (float64) for trace-time sub-step resolution
        self.spans = np.diff(np.asarray(model.time_axis.bounds(), dtype=np.float64))

        self.endo_names = []
        self.exo_names = []
        for item in model.collection:
            if item.variable_type is VariableType.Endogenous:
                self.endo_names.append(item.name)
            else:
                self.exo_names.append(item.name)

        self._jitted = {}

    # -- functional core -----------------------------------------------------

    def _solve_all_nodes(self, endo, internals, ctx, params_xs,
                         make_builder, write_row):
        """Shared per-step solve skeleton for both scan modes.

        Solves every node in topological order: builds its input windows
        via ``make_builder(spec, item, endo)``, binds traced parameters,
        applies write-spec grid matrices, and commits endogenous rows via
        ``write_row(endo, key, row)``.  The full and streaming step
        functions differ only in those two callbacks (how a window sees
        storage, and where a row lands) — everything else must stay
        identical or the modes drift apart.
        """
        import jax.numpy as jnp

        model = self.model
        plan = model._plan
        endo_set = set(self.endo_names)

        for node in self.exec_nodes:
            component = model.graph.nodes[node]
            read_specs, write_specs = plan[node]

            builders = {}
            for spec in read_specs:
                item = model.collection.get_item(spec.var_name)
                builders[spec.var_name] = make_builder(spec, item, endo)
            input_state = InputState(builders, ctx.t_current)

            params = params_xs[str(node)] if str(node) in params_xs else {}
            traced_component = (
                component.with_params(params) if params else component
            )

            inputs = prepare_inputs(traced_component, input_state)
            outputs, new_internal = traced_component.solve_ctx(
                ctx, inputs, internals.get(str(node))
            )
            internals = {**internals, str(node): new_internal}

            if hasattr(outputs, "to_dict"):
                outputs = outputs.to_dict()
            for key, value in outputs.items():
                sv = StateValue.wrap(value)
                spec = write_specs.get(key)
                row = jnp.asarray(sv.as_array(), dtype=self.dtype)
                if spec is not None and spec.matrix is not None:
                    row = row @ jnp.asarray(spec.matrix, dtype=self.dtype)
                if key not in endo_set:
                    continue
                endo = write_row(endo, key, row)

        return endo, internals

    def _make_step_fn(self, exo):
        """Close the step function over static plan + exogenous arrays."""
        import jax.lax as lax

        model = self.model
        time_values = self.time_values
        endo_set = set(self.endo_names)

        def step_fn(carry, xs):
            endo, internals = carry
            idx = xs["idx"]
            t_current = xs["t"]
            t_next = xs["t_next"]
            ctx = SolveContext(
                t_current, t_next, idx, spans=self.spans, scan_mode=True
            )

            def make_builder(spec, item, endo):
                values = (
                    endo[spec.var_name]
                    if spec.var_name in endo_set
                    else exo[spec.var_name]
                )

                def make(spec=spec, values=values, item=item):
                    return make_window(
                        spec.window_grid,
                        values,
                        idx,
                        t_current,
                        factor=spec.factor,
                        source=spec.source,
                        strategy=item.data.interpolation_strategy,
                        time_values=time_values,
                        grid=model._grid_obj(spec.window_grid),
                        aggregation=spec.aggregation,
                    )

                return make

            def write_row(endo, key, row):
                arr = lax.dynamic_update_slice_in_dim(
                    endo[key], row[None, :], idx + 1, axis=0
                )
                return {**endo, key: arr}

            endo, internals = self._solve_all_nodes(
                endo, internals, ctx, xs["params"], make_builder, write_row
            )
            return (endo, internals), None

        return step_fn

    @property
    def _uniform_dt(self):
        """The axis step if the time axis is uniform, else None.

        Passed to the scan-layout hooks: recursive window summaries (e.g.
        ClimateUDEB's running cumulative-temperature sum) are only valid
        when every step covers the same span; on a non-uniform axis the
        hooks skip them and the components fall back to the windowed dot.
        """
        if not hasattr(self, "_uniform_dt_cache"):
            # diff the float64 axis source, not the dtype-cast
            # self.time_values: under the default float32 program a
            # uniform monthly axis (dt = 1/12) picks up ~1e-7 relative
            # rounding in its f32 diffs and would be misclassified as
            # non-uniform, silently skipping every scan-layout hook
            dts = np.diff(
                np.asarray(self.model.time_axis.values(), dtype=np.float64)
            )
            self._uniform_dt_cache = (
                float(dts[0])
                if dts.size and np.allclose(dts, dts[0], rtol=1e-12, atol=0.0)
                else None
            )
        return self._uniform_dt_cache

    def _pack_internals(self, internals, start_idx: int):
        """Apply components' scan-layout packing in-graph (static-index
        gathers — one-time cost at program entry).  The hooks are written
        against plain indexing so they work on numpy and traced arrays
        alike; the pure-fn contract of run_fn is unchanged: callers pass
        and receive HOST-layout internals."""
        out = dict(internals)
        for node in self.exec_nodes:
            comp = self.model.graph.nodes[node]
            key = str(node)
            if out.get(key) is not None and hasattr(comp, "pack_scan_state"):
                out[key] = comp.pack_scan_state(
                    out[key], start_idx, dt=self._uniform_dt
                )
        return out

    def _unpack_internals(self, internals, end_idx: int):
        out = dict(internals)
        for node in self.exec_nodes:
            comp = self.model.graph.nodes[node]
            key = str(node)
            if out.get(key) is not None and hasattr(comp, "unpack_scan_state"):
                out[key] = comp.unpack_scan_state(
                    out[key], end_idx, dt=self._uniform_dt
                )
        return out

    def run_fn(self, endo, exo, params, internals, start_idx: int = 0):
        """Pure run: scan the step function from ``start_idx`` to the end.

        All array arguments are traced; ``start_idx`` is static.  Returns
        ``(endo, internals)`` after the final step.  Internals enter and
        leave in the host layout (scan-internal re-layouts are applied and
        reverted in-graph).
        """
        import jax.lax as lax
        import jax.numpy as jnp

        n_run = self.n_steps - 1 - start_idx
        if n_run <= 0:
            return endo, internals

        internals = self._pack_internals(internals, start_idx)

        idxs = np.arange(start_idx, self.n_steps - 1, dtype=np.int32)
        xs = {
            "idx": jnp.asarray(idxs),
            "t": jnp.asarray(self.time_bounds[idxs], dtype=self.dtype),
            "t_next": jnp.asarray(self.time_bounds[idxs + 1], dtype=self.dtype),
        }

        step_fn = self._make_step_fn(exo)

        def step_with_params(carry, x):
            return step_fn(carry, {**x, "params": params})

        (endo, internals), _ = lax.scan(
            step_with_params, (endo, internals), xs, unroll=self.scan_unroll
        )
        return endo, self._unpack_internals(internals, self.n_steps - 1)

    # -- streaming (windowed-carry) mode --------------------------------------

    @functools.cached_property
    def lookbacks(self) -> Dict[str, int]:
        """Deepest lookback any component reads per endogenous variable."""
        lb = {name: 1 for name in self.endo_names}
        for node in self.exec_nodes:
            component = self.model.graph.nodes[node]
            read_specs, _ = self.model._plan[node]
            get_lb = getattr(component, "input_lookback", None)
            for spec in read_specs:
                if spec.var_name in lb:
                    depth = int(get_lb(spec.var_name)) if get_lb is not None else 1
                    lb[spec.var_name] = max(lb[spec.var_name], depth)
        return lb

    def _make_window_step_fn(self, exo, out_vars):
        """Streaming step: rolling per-variable buffers, ys emission.

        Carry endo buffers are ``(L_v + 2, n_regions)``: rows map to absolute
        step indices ``idx - L_v .. idx + 1`` (clamped at the start of the
        run), so every window op resolves at a *static* buffer index.
        """
        import jax.numpy as jnp

        model = self.model
        endo_set = set(self.endo_names)
        lookbacks = self.lookbacks
        l_max = max(lookbacks.values(), default=1)
        n = self.n_steps
        time_np = np.asarray(self.time_values, dtype=np.float64)
        # step widths for linear time extrapolation of the clamped pre-history
        dt0 = float(time_np[1] - time_np[0]) if n > 1 else 1.0

        def global_time_window(idx):
            # times aligned with a width-(l_max+2) buffer ending at idx+1;
            # rows before the axis start get linearly extrapolated times so
            # interpolation over clamped pre-history stays well-defined
            offs = jnp.arange(-l_max, 2)
            abs_idx = idx + offs
            clipped = jnp.clip(abs_idx, 0, n - 1)
            t = jnp.asarray(self.time_values)[clipped]
            return t + jnp.where(abs_idx < 0, abs_idx, 0).astype(t.dtype) * dt0

        def step_fn(carry, xs):
            endo, internals = carry
            idx = xs["idx"]
            t_current = xs["t"]
            t_next = xs["t_next"]
            ctx = SolveContext(
                t_current, t_next, idx, spans=self.spans, scan_mode=True
            )
            time_win = global_time_window(idx)

            def make_builder(spec, item, endo):
                if spec.var_name in endo_set:
                    lb = lookbacks[spec.var_name]

                    def make(spec=spec, lb=lb, item=item, endo=endo):
                        return make_window(
                            spec.window_grid,
                            endo[spec.var_name],
                            lb,  # static: buffer row of step N
                            t_current,
                            factor=spec.factor,
                            source=spec.source,
                            strategy=item.data.interpolation_strategy,
                            time_values=time_win[l_max - lb:],
                            grid=model._grid_obj(spec.window_grid),
                            aggregation=spec.aggregation,
                        )

                else:

                    def make(spec=spec, item=item):
                        return make_window(
                            spec.window_grid,
                            exo[spec.var_name],
                            idx,
                            t_current,
                            factor=spec.factor,
                            source=spec.source,
                            strategy=item.data.interpolation_strategy,
                            time_values=self.time_values,
                            grid=model._grid_obj(spec.window_grid),
                            aggregation=spec.aggregation,
                        )

                return make

            def write_row(endo, key, row):
                return {**endo, key: endo[key].at[lookbacks[key] + 1].set(row)}

            endo, internals = self._solve_all_nodes(
                endo, internals, ctx, xs["params"], make_builder, write_row
            )

            ys = {name: endo[name][lookbacks[name] + 1] for name in out_vars}
            # roll every buffer one step forward.  The fresh N+1 slot is
            # the collection's stored row for that absolute index: NaN for
            # ordinary (empty) endogenous storage — but the builder can
            # pre-populate endogenous variables from exogenous data, and a
            # component may legally omit an output write (runtime.rs:452
            # iterates only the returned outputs), in which case the full
            # mode preserves the stored value and streaming must match.
            prefill = xs.get("prefill", {})
            rolled = {}
            for name, buf in endo.items():
                if name in prefill:  # static membership at trace time
                    fresh = jnp.asarray(prefill[name], dtype=buf.dtype)[None, :]
                else:
                    fresh = jnp.full((1, buf.shape[1]), np.nan, dtype=buf.dtype)
                rolled[name] = jnp.concatenate([buf[1:], fresh], axis=0)
            return (rolled, internals), ys

        return step_fn

    def run_window_fn(self, endo_bufs, exo, params, internals, out_vars,
                      start_idx: int = 0):
        """Pure streaming run: returns ``({name: full trajectory}, carry)``.

        ``endo_bufs`` come from :meth:`gather_endo_window`; ``out_vars`` is a
        static sequence of endogenous names to emit.  Rows up to
        ``start_idx`` are constants from the host collection (the initial /
        already-computed values), identical to the full mode's output.
        """
        import jax.lax as lax
        import jax.numpy as jnp

        out_vars = tuple(out_vars)
        unknown = [v for v in out_vars if v not in set(self.endo_names)]
        if unknown:
            raise KeyError(
                f"run_window_fn: not endogenous variables: {unknown}; "
                f"endogenous: {sorted(self.endo_names)}"
            )
        n_run = self.n_steps - 1 - start_idx
        if n_run <= 0:
            host = self.gather_endo()
            return {name: jnp.asarray(host[name]) for name in out_vars}, (
                endo_bufs, internals,
            )

        idxs = np.arange(start_idx, self.n_steps - 1, dtype=np.int32)
        xs = {
            "idx": jnp.asarray(idxs),
            "t": jnp.asarray(self.time_bounds[idxs], dtype=self.dtype),
            "t_next": jnp.asarray(self.time_bounds[idxs + 1], dtype=self.dtype),
            "prefill": {},
        }
        # per-step roll-in rows for endogenous variables whose storage is
        # pre-populated beyond the start (builder's exogenous-data path):
        # the full mode preserves those rows when a component skips a
        # write, so the streaming roll must supply them too.  Ordinary
        # NaN-filled variables skip this (zero overhead).
        for name in self.endo_names:
            vals = np.asarray(
                self.model.collection.get_data(name)._values, dtype=self.dtype
            )
            future = vals[min(start_idx + 2, len(vals)) :]
            if future.size and not np.all(np.isnan(future)):
                rows = vals[np.clip(idxs + 2, 0, self.n_steps - 1)]
                xs["prefill"][name] = jnp.asarray(rows)

        step_fn = self._make_window_step_fn(exo, out_vars)
        internals = self._pack_internals(internals, start_idx)

        def step_with_params(carry, x):
            return step_fn(carry, {**x, "params": params})

        (endo_bufs, internals), ys = lax.scan(
            step_with_params, (endo_bufs, internals), xs, unroll=self.scan_unroll
        )
        internals = self._unpack_internals(internals, self.n_steps - 1)

        trajs = {}
        for name in out_vars:
            prefix = np.asarray(
                self.model.collection.get_data(name)._values[: start_idx + 1],
                dtype=self.dtype,
            )
            trajs[name] = jnp.concatenate([jnp.asarray(prefix), ys[name]], axis=0)
        return trajs, (endo_bufs, internals)

    def gather_endo_window(self, start_idx: int = 0) -> Dict[str, np.ndarray]:
        """Initial rolling buffers for the streaming mode.

        Buffer rows hold the collection values at absolute indices
        ``start_idx - L .. start_idx + 1``, clamped at 0 — the same values a
        traced full-array window's clamped reads would return.
        """
        bufs = {}
        for name in self.endo_names:
            vals = np.asarray(
                self.model.collection.get_data(name)._values, dtype=self.dtype
            )
            lb = self.lookbacks[name]
            rows = [vals[max(0, start_idx - lb + k)] for k in range(lb + 1)]
            # clamp: at the final time index there is no row start_idx+1
            # (run_window_fn's n_run <= 0 short-circuit still needs valid
            # buffers to return)
            rows.append(vals[min(start_idx + 1, len(vals) - 1)])
            bufs[name] = np.stack(rows)
        return bufs

    # -- host data marshalling ----------------------------------------------

    def gather_endo(self) -> Dict[str, np.ndarray]:
        return {
            name: np.asarray(
                self.model.collection.get_data(name)._values, dtype=self.dtype
            )
            for name in self.endo_names
        }

    def gather_exo(self) -> Dict[str, np.ndarray]:
        return {
            name: np.asarray(
                self.model.collection.get_data(name)._values, dtype=self.dtype
            )
            for name in self.exo_names
        }

    def gather_params(self) -> Dict[str, dict]:
        params = {}
        for node in self.exec_nodes:
            pytree = self.model.graph.nodes[node].param_pytree()
            if pytree:
                params[str(node)] = {
                    k: np.asarray(v, dtype=self.dtype) for k, v in pytree.items()
                }
        return params

    def gather_internals(self) -> Dict[str, object]:
        """Internal states in the host layout (``run_fn`` applies any
        component scan-layout packing in-graph itself)."""
        import jax

        def cast(leaf):
            arr = np.asarray(leaf)
            if np.issubdtype(arr.dtype, np.floating):
                return arr.astype(self.dtype)
            return arr

        return {
            str(node): jax.tree.map(cast, self.model.component_states[node])
            for node in self.exec_nodes
        }

    # -- execution ------------------------------------------------------------

    def _get_jitted(self, start_idx: int):
        import jax

        if start_idx not in self._jitted:
            self._jitted[start_idx] = jax.jit(
                functools.partial(self.run_fn, start_idx=start_idx)
            )
        return self._jitted[start_idx]

    def run_into_collection(self, model):
        """Execute from the model's current time index; write results back."""
        start_idx = model.time_index
        endo = self.gather_endo()
        exo = self.gather_exo()
        params = self.gather_params()
        internals = self.gather_internals()

        fn = self._get_jitted(start_idx)
        endo_out, internals_out = fn(endo, exo, params, internals)

        for name, arr in endo_out.items():
            data = model.collection.get_data(name)
            # only the scan-written rows (start_idx+1 onward): earlier rows
            # are committed history — possibly float64 from eager stepping —
            # and must not round-trip through the program dtype
            data._values[start_idx + 1 :, :] = np.asarray(
                arr, dtype=np.float64
            )[start_idx + 1 :]
            data._recompute_latest()
        for node in self.exec_nodes:
            new_state = internals_out.get(str(node))
            if new_state is not None:
                import jax

                model.component_states[node] = jax.tree.map(
                    lambda leaf: np.asarray(leaf), new_state
                )
