"""
Model: a coupled set of components solved on a common time axis.

Mirror of ``crates/rscm-core/src/model/runtime.rs`` — per timestep the
components are visited in the reference's BFS order; each component reads
its inputs through windows (with unit conversion / source resolution /
read-side aggregation), solves over the half-open step, and writes outputs
into the collection at index **N+1** (applying write-side aggregation).
Solve errors are reported and skipped, leaving NaN holes, exactly like the
reference (``runtime.rs:493-495``).

Two executors share the single static execution plan:

- the **eager host executor** (this module) — float64 numpy, arbitrary
  Python components, per-step ``step()`` semantics;
- the **compiled executor** (:mod:`.program`) — the whole run as one
  ``lax.scan`` XLA program; ``run()`` uses it automatically when every
  component is traceable.
"""

from __future__ import annotations

import json
from typing import Dict, Optional

import numpy as np

from ..spatial import GridType, grid_for_type
from ..state import StateValue, VariableSource
from ..component import RequirementType, SolveContext
from ..timeseries import TimeseriesCollection
from .graph import ComponentGraph, NullComponent
from .input_state import InputState
from .types import ReadSpec, WriteSpec

__all__ = ["Model", "prepare_inputs"]


def _listify(obj):
    """Prepare a nested structure for TOML: tuples->lists, drop None values."""
    if isinstance(obj, dict):
        return {k: _listify(v) for k, v in obj.items() if v is not None}
    if isinstance(obj, (list, tuple)):
        return [_listify(v) for v in obj]
    if isinstance(obj, np.generic):
        return obj.item()
    return obj


def _detomlify(obj):
    return obj


def prepare_inputs(component, input_state: InputState):
    """Adapt an InputState to what the component's solve expects."""
    inputs_cls = getattr(component, "Inputs", None)
    if inputs_cls is not None:
        return inputs_cls.from_input_state(input_state)
    return input_state


class Model:
    """Executable model — see module docstring."""

    def __init__(
        self,
        graph: ComponentGraph,
        initial_node: int,
        collection: TimeseriesCollection,
        time_axis,
        grid_weights: Dict[GridType, list],
        read_transforms: Dict[str, object],
        write_transforms: Dict[str, object],
        unit_conversions: Dict[tuple, float],
        variable_sources: Dict[tuple, str],
    ):
        self.graph = graph
        self.initial_node = initial_node
        self.collection = collection
        self.time_axis = time_axis
        self.time_index = 0
        # bumped whenever mutable model state changes (step / restore);
        # consumers (EnsembleRunner input cache) use it to detect staleness
        self._state_version = 0
        self.grid_weights = grid_weights
        self.read_transforms = read_transforms
        self.write_transforms = write_transforms
        self.unit_conversions = unit_conversions
        self.variable_sources = variable_sources

        # topological execution (BFS-compatible on chains; see graph.topo_order)
        self.exec_order = graph.topo_order(initial_node)
        self.component_states = {
            node: graph.nodes[node].create_initial_state() for node in graph.node_indices()
        }
        self._plan = self._build_plan()
        self._program = None  # compiled program, built lazily

    # -- static execution plan ---------------------------------------------

    def _grid_obj(self, grid_type: GridType):
        return grid_for_type(grid_type, self.grid_weights.get(grid_type))

    def _build_plan(self):
        """Resolve per-component read specs and per-variable write specs."""
        plan = {}
        for node in self.exec_order:
            component = self.graph.nodes[node]
            comp_name = getattr(component, "component_name", type(component).__name__)
            read_specs = []
            for req in component.inputs():
                if req.requirement_type is RequirementType.EmptyLink:
                    continue
                name = req.name
                factor = self.unit_conversions.get((name, comp_name), 1.0)
                source = self.variable_sources.get((name, comp_name), VariableSource.Exogenous)
                transform = self.read_transforms.get(name)
                aggregation = None
                window_grid = req.grid_type
                if transform is not None and transform.source_grid != window_grid:
                    aggregation = self._grid_obj(transform.source_grid).transform_matrix(
                        self._grid_obj(window_grid)
                    )
                read_specs.append(ReadSpec(name, window_grid, factor, source, aggregation))

            write_specs = {}
            for req in component.outputs():
                name = req.name
                transform = self.write_transforms.get(name)
                if transform is not None:
                    matrix = self._grid_obj(transform.source_grid).transform_matrix(
                        self._grid_obj(transform.target_grid)
                    )
                    write_specs[name] = WriteSpec(
                        name, transform.source_grid, transform.target_grid, matrix
                    )
                else:
                    write_specs[name] = WriteSpec(name, req.grid_type, req.grid_type, None)
            plan[node] = (read_specs, write_specs)
        return plan

    # -- time accessors ------------------------------------------------------

    def current_time(self) -> float:
        return self.time_axis.at(self.time_index)

    def current_time_bounds(self):
        return self.time_axis.at_bounds(self.time_index)

    def finished(self) -> bool:
        return self.time_index == len(self.time_axis) - 1

    # -- eager (host) execution ---------------------------------------------

    def _build_input_state(self, node: int) -> InputState:
        read_specs, _ = self._plan[node]
        t = self.current_time()
        idx = self.time_index
        builders = {}
        for spec in read_specs:
            item = self.collection.get_item(spec.var_name)
            if item is None:
                continue
            data = item.data

            def make(spec=spec, data=data):
                from ..state import make_window

                return make_window(
                    spec.window_grid,
                    data.values(),
                    idx,
                    t,
                    factor=spec.factor,
                    source=spec.source,
                    strategy=data.interpolation_strategy,
                    time_values=data.time_axis().values(),
                    grid=self._grid_obj(spec.window_grid),
                    aggregation=spec.aggregation,
                )

            builders[spec.var_name] = make
        return InputState(builders, t)

    def _write_outputs(self, node: int, outputs):
        _, write_specs = self._plan[node]
        if hasattr(outputs, "to_dict"):
            outputs = outputs.to_dict()
        for key, value in outputs.items():
            sv = StateValue.wrap(value)
            spec = write_specs.get(key)
            try:
                row = np.asarray(sv.as_array(), dtype=np.float64)
                if spec is not None and spec.matrix is not None:
                    row = row @ spec.matrix
                data = self.collection.get_data(key)
                if data is None:
                    print(f"Failed to set output {key}: unknown variable")
                    continue
                if row.shape[0] != data.grid.size():
                    print(
                        f"Failed to set output {key}: grid mismatch "
                        f"({row.shape[0]} values for {data.grid.grid_name()} storage)"
                    )
                    continue
                data.set_all(self.time_index + 1, row)
            except Exception as e:  # mirror runtime.rs print-and-continue
                print(f"Failed to set output {key}: {e}")

    def _step_component(self, node: int):
        component = self.graph.nodes[node]
        if isinstance(component, NullComponent):
            return
        input_state = self._build_input_state(node)
        start, end = self.current_time_bounds()
        ctx = SolveContext(start, end, self.time_index)
        try:
            inputs = prepare_inputs(component, input_state)
            outputs, new_state = component.solve_ctx(ctx, inputs, self.component_states[node])
            self.component_states[node] = new_state
        except Exception as e:
            print(f"Solving failed: {e}")
            return
        self._write_outputs(node, outputs)

    def step(self):
        """Advance one timestep on the host executor."""
        assert self.time_index < len(self.time_axis) - 1
        for node in self.exec_order:
            self._step_component(node)
        self.time_index += 1
        self._state_version += 1

    # -- full runs -----------------------------------------------------------

    def run(self, compiled: Optional[bool] = None):
        """Run to the end of the time axis.

        ``compiled=None`` (default) uses the fused ``lax.scan`` program when
        every component is traceable, falling back to eager stepping;
        ``True`` forces compilation (raising when impossible); ``False``
        forces the eager path.
        """
        if self.finished():
            return
        if compiled is not False:
            try:
                program = self._get_program()
            except Exception:
                if compiled is True:
                    raise
                program = None
            if program is not None:
                try:
                    program.run_into_collection(self)
                    self.time_index = len(self.time_axis) - 1
                    self._state_version += 1
                    return
                except Exception:
                    if compiled is True:
                        raise
                    # fall through to eager execution
        while not self.finished():
            self.step()

    def _get_program(self):
        if self._program is None:
            from .program import ModelProgram

            self._program = ModelProgram(self)
        return self._program

    @property
    def program(self):
        """The compiled-program handle (builds on first access)."""
        return self._get_program()

    # -- results --------------------------------------------------------------

    def timeseries(self) -> TimeseriesCollection:
        """Clone of the collection held by the model."""
        return self.collection.copy()

    # -- checkpoint / restore -------------------------------------------------

    def to_dict(self) -> dict:
        """Whole-model state: collection, time index, component states.

        Mirror of ``Model::checkpoint`` (``runtime.rs:270-282``) — enough to
        recreate the run mid-stream.
        """

        def encode_state(state):
            # Component internal states are pytrees of dict/list/array/scalar.
            if state is None:
                return None
            if isinstance(state, dict):
                return {k: encode_state(v) for k, v in state.items()}
            if isinstance(state, (list, tuple)):
                return [encode_state(v) for v in state]
            return np.asarray(state).tolist()

        return {
            "time_index": self.time_index,
            "time_axis": self.time_axis.to_dict(),
            "collection": self.collection.to_dict(),
            "component_states": {
                str(node): encode_state(state)
                for node, state in self.component_states.items()
                if state is not None
            },
        }

    def checkpoint(self) -> str:
        return json.dumps(self.to_dict())

    def restore(self, d: dict):
        """Restore collection/time state from a checkpoint dict in place.

        Internal states are validated against each component's *current*
        state schema (keys and leaf shapes) before being adopted: a
        component whose configuration changed between save and restore
        (e.g. a different convolution engine or window size) would
        otherwise crash at trace time — or worse, silently compute with a
        half-restored state.  Components may define
        ``migrate_internal_state(saved)`` to convert a mismatched saved
        state (e.g. :class:`OceanCarbon` migrates ring-engine checkpoints
        into the exp-sum layout); without one, a mismatch raises.
        """
        from ..timeseries import TimeseriesCollection as TC

        self.time_index = int(d["time_index"])
        self._state_version += 1
        self.collection = TC.from_dict(d["collection"])
        states = d.get("component_states", {})

        def decode_state(encoded, template):
            if encoded is None or template is None:
                return template
            if isinstance(template, dict):
                return {k: decode_state(encoded.get(k), v) for k, v in template.items()}
            if isinstance(template, (list, tuple)):
                decoded = [decode_state(e, t) for e, t in zip(encoded, template)]
                return type(template)(decoded) if isinstance(template, tuple) else decoded
            arr = np.asarray(encoded, dtype=np.float64)
            return arr if np.ndim(template) else type(template)(arr) if isinstance(
                template, float
            ) else arr.reshape(np.shape(template))

        def schema_of(state):
            # keys + leaf shapes; robust to lists (JSON) vs ndarrays and
            # to ragged / dict-bearing containers
            if state is None:
                return None
            if isinstance(state, dict):
                return {k: schema_of(v) for k, v in state.items()}
            try:
                arr = np.asarray(state)
                if arr.dtype != object:
                    return arr.shape
            except Exception:
                pass
            return [schema_of(v) for v in state]

        def decode_raw(encoded):
            # decode by the *saved* structure (migration input)
            if isinstance(encoded, dict):
                return {k: decode_raw(v) for k, v in encoded.items()}
            arr = np.asarray(encoded, dtype=np.float64)
            return float(arr) if arr.ndim == 0 else arr

        for node_str, encoded in states.items():
            node = int(node_str)
            template = self.component_states.get(node)
            if encoded is None or template is None:
                continue
            if schema_of(encoded) == schema_of(template):
                self.component_states[node] = decode_state(encoded, template)
                continue
            component = self.graph.nodes[node]
            name = getattr(component, "component_name", type(component).__name__)
            migrate = getattr(component, "migrate_internal_state", None)
            if migrate is None:
                raise ValueError(
                    f"checkpoint restore: saved internal state of component "
                    f"{name!r} does not match its current schema "
                    f"(saved {schema_of(encoded)}, current "
                    f"{schema_of(template)}). The component's configuration "
                    "(e.g. an engine or window-size parameter) changed "
                    "between save and restore; rebuild the model with the "
                    "original configuration."
                )
            migrated = migrate(decode_raw(encoded))
            if schema_of(migrated) != schema_of(template):
                raise ValueError(
                    f"checkpoint restore: {name}.migrate_internal_state "
                    f"produced {schema_of(migrated)}, but the current schema "
                    f"is {schema_of(template)}"
                )
            self.component_states[node] = migrated
        self._program = None

    # -- full serialisation (component reconstruction) ------------------------

    def to_full_dict(self) -> dict:
        """Complete model state incl. components and the execution graph.

        Equivalent of the reference's serde whole-model serialisation
        (``Model::checkpoint``, typetag'd components) — enough for
        ``from_full_dict`` to rebuild an identical runnable model.
        """
        from ..schema import AggregateOp, AggregatorComponent
        from .graph import NullComponent

        components = []
        for node, comp in enumerate(self.graph.nodes):
            if isinstance(comp, NullComponent):
                components.append({"kind": "null"})
            elif isinstance(comp, AggregatorComponent):
                components.append(
                    {
                        "kind": "aggregator",
                        "aggregate_name": comp.aggregate_name,
                        "unit": comp.unit,
                        "grid_type": comp.grid_type.value,
                        "operation": comp.operation.kind,
                        "weights": list(comp.operation.weights)
                        if comp.operation.weights
                        else None,
                        "contributors": list(comp.contributors),
                    }
                )
            else:
                params = {}
                for pname in getattr(comp, "_component_parameters", {}):
                    value = getattr(comp, pname, None)
                    if value is not None and not isinstance(
                        value, (str, bool, int, float, list, tuple)
                    ):
                        value = np.asarray(value).tolist()
                    params[pname] = value
                components.append(
                    {
                        "kind": "component",
                        "class": type(comp).__name__,
                        "module": type(comp).__module__,
                        "params": params,
                    }
                )

        edges = [
            {
                "src": src,
                "dst": dst,
                "name": getattr(payload, "name", ""),
                "unit": getattr(payload, "unit", ""),
                "requirement_type": getattr(
                    payload, "requirement_type", RequirementType.EmptyLink
                ).value,
                "grid_type": getattr(payload, "grid_type", GridType.Scalar).value,
            }
            for src, dst, payload in self.graph.edges
        ]

        return {
            **self.to_dict(),
            "components": components,
            "edges": edges,
            "grid_weights": {gt.value: w for gt, w in self.grid_weights.items()},
            "read_transforms": {
                name: {
                    "variable": t.variable,
                    "unit": t.unit,
                    "source_grid": t.source_grid.value,
                    "target_grid": t.target_grid.value,
                    "direction": t.direction,
                }
                for name, t in self.read_transforms.items()
            },
            "write_transforms": {
                name: {
                    "variable": t.variable,
                    "unit": t.unit,
                    "source_grid": t.source_grid.value,
                    "target_grid": t.target_grid.value,
                    "direction": t.direction,
                }
                for name, t in self.write_transforms.items()
            },
            "unit_conversions": [
                [var, comp, factor]
                for (var, comp), factor in self.unit_conversions.items()
            ],
            "variable_sources": [
                [var, comp, source]
                for (var, comp), source in self.variable_sources.items()
            ],
        }

    @staticmethod
    def from_full_dict(d: dict) -> "Model":
        import importlib

        from ..schema import AggregateDefinition, AggregateOp, AggregatorComponent
        from ..time_axis import TimeAxis
        from .graph import ComponentGraph, NullComponent
        from .types import RequiredTransformation
        from ..component import RequirementDefinition

        graph = ComponentGraph()
        for spec in d["components"]:
            if spec["kind"] == "null":
                graph.add_node(NullComponent())
            elif spec["kind"] == "aggregator":
                op = (
                    AggregateOp.weighted(spec["weights"])
                    if spec["operation"] == "Weighted"
                    else AggregateOp(spec["operation"])
                )
                graph.add_node(
                    AggregatorComponent(
                        AggregateDefinition(
                            spec["aggregate_name"],
                            spec["unit"],
                            op,
                            spec["contributors"],
                            GridType(spec["grid_type"]),
                        )
                    )
                )
            else:
                module = importlib.import_module(spec["module"])
                cls = getattr(module, spec["class"])
                graph.add_node(cls(**spec["params"]))

        for edge in d["edges"]:
            graph.add_edge(
                edge["src"],
                edge["dst"],
                RequirementDefinition(
                    edge["name"],
                    edge["unit"],
                    RequirementType(edge["requirement_type"]),
                    GridType(edge["grid_type"]),
                ),
            )

        def parse_transforms(entry):
            return {
                name: RequiredTransformation(
                    t["variable"],
                    t["unit"],
                    GridType(t["source_grid"]),
                    GridType(t["target_grid"]),
                    t["direction"],
                )
                for name, t in entry.items()
            }

        model = Model(
            graph=graph,
            initial_node=0,
            collection=TimeseriesCollection.from_dict(d["collection"]),
            time_axis=TimeAxis.from_dict(d["time_axis"]),
            grid_weights={
                GridType(k): v for k, v in d.get("grid_weights", {}).items()
            },
            read_transforms=parse_transforms(d.get("read_transforms", {})),
            write_transforms=parse_transforms(d.get("write_transforms", {})),
            unit_conversions={
                (var, comp): factor
                for var, comp, factor in d.get("unit_conversions", [])
            },
            variable_sources={
                (var, comp): source
                for var, comp, source in d.get("variable_sources", [])
            },
        )
        model.restore(d)
        return model

    def to_toml(self) -> str:
        """Serialise the model to TOML (mirror of ``python/model.rs:224``)."""
        from rscm_tpu.utils import dumps_toml

        return dumps_toml(_listify(self.to_full_dict()))

    @staticmethod
    def from_toml(text: str) -> "Model":
        import tomllib

        return Model.from_full_dict(_detomlify(tomllib.loads(text)))

    # -- introspection --------------------------------------------------------

    def as_dot(self) -> str:
        """Graphviz dot export (mirror of ``runtime.rs:532-544``)."""
        lines = ["digraph {"]
        for i, component in enumerate(self.graph.nodes):
            label = repr(component).replace("\\", "\\\\").replace('"', '\\"')
            lines.append(f'    {i} [ label = "{label}" ]')
        for src, dst, payload in self.graph.edges:
            name = getattr(payload, "name", "")
            lines.append(f'    {src} -> {dst} [ label = "{name}" ]')
        lines.append("}")
        return "\n".join(lines)

    def debug_info(self, format: str = "rich") -> str:
        """Execution-order and dataflow introspection.

        Mirror of ``model/debug.rs``: execution order, per-component inputs
        with source classification, outputs, grids, transforms, conversions.
        """
        info = {"execution_order": [], "variables": {}}
        for position, node in enumerate(self.exec_order):
            component = self.graph.nodes[node]
            if isinstance(component, NullComponent):
                continue
            comp_name = getattr(component, "component_name", type(component).__name__)
            read_specs, write_specs = self._plan[node]
            entry = {
                "component": comp_name,
                "position": position,
                "inputs": [
                    {
                        "name": spec.var_name,
                        "source": spec.source,
                        "grid": spec.window_grid.value,
                        "unit_conversion_factor": spec.factor,
                        "read_transform": spec.aggregation is not None,
                    }
                    for spec in read_specs
                ],
                "outputs": [
                    {
                        "name": spec.var_name,
                        "grid": spec.source_grid.value,
                        "storage_grid": spec.storage_grid.value,
                        "write_transform": spec.matrix is not None,
                    }
                    for spec in write_specs.values()
                ],
            }
            info["execution_order"].append(entry)
        for item in self.collection:
            info["variables"][item.name] = {
                "type": item.variable_type.value,
                "grid": item.data.grid.grid_name(),
                "units": item.data.units,
            }
        if format == "json":
            return json.dumps(info, indent=2)

        # "rich" = coloured terminal output (mirror of model/debug.rs with
        # the reference's rich-debug feature); "plain" strips the colours.
        if format == "rich":
            bold, dim, reset = "\033[1m", "\033[2m", "\033[0m"
            cyan, green, yellow, magenta = (
                "\033[36m", "\033[32m", "\033[33m", "\033[35m"
            )
        else:
            bold = dim = reset = cyan = green = yellow = magenta = ""

        source_color = {
            VariableSource.Exogenous: green,
            VariableSource.UpstreamOutput: cyan,
            VariableSource.OwnState: magenta,
        }
        lines = [f"{bold}Model execution order:{reset}"]
        for entry in info["execution_order"]:
            lines.append(f"  {bold}[{entry['position']}] {entry['component']}{reset}")
            for inp in entry["inputs"]:
                extra = []
                if inp["unit_conversion_factor"] != 1.0:
                    extra.append(f"x{inp['unit_conversion_factor']:.6g}")
                if inp["read_transform"]:
                    extra.append("aggregated")
                suffix = f" {yellow}({', '.join(extra)}){reset}" if extra else ""
                color = source_color.get(inp["source"], "")
                lines.append(
                    f"      in:  {inp['name']} "
                    f"[{color}{inp['source']}{reset}, {inp['grid']}]{suffix}"
                )
            for out in entry["outputs"]:
                suffix = (
                    f" {yellow}-> {out['storage_grid']}{reset}"
                    if out["write_transform"]
                    else ""
                )
                lines.append(f"      out: {out['name']} [{out['grid']}]{suffix}")
        lines.append(f"{dim}{len(info['variables'])} variables in collection{reset}")
        return "\n".join(lines)
