"""
Differential fuzz: random component DAGs, host path vs compiled path.

Random graphs of tiny affine components (``out = gain * sum(inputs) +
offset``, plus a self-integrating state) are built in random insertion
orders; the eager float64 host executor and the traced ``lax.scan``
program must agree everywhere.  This exercises source classification
(Exogenous / UpstreamOutput / OwnState depends on insertion order —
SURVEY appendix), execution ordering, schema aggregates, and the window
read/write conventions across graph shapes no hand-written test covers.
"""

import random

import numpy as np
import pytest

from rscm_tpu.core import ModelBuilder, TimeAxis, Timeseries, VariableSchema
from rscm_tpu.core.component import Component, Input, Output, Parameter, State


def _make_affine_component(class_name, input_vars, output_var):
    """Dynamic component: output = gain * sum(inputs) + offset."""
    namespace = {
        "__doc__": f"fuzz affine node {class_name}",
        "gain": Parameter(default=1.0),
        "offset": Parameter(default=0.0),
    }
    for i, var in enumerate(input_vars):
        namespace[f"in_{i}"] = Input(var, unit="W/m^2")
    namespace["out"] = Output(output_var, unit="W/m^2")

    n_inputs = len(input_vars)

    def solve_ctx(self, ctx, inputs, internal_state):
        total = 0.0
        for i in range(n_inputs):
            total = total + getattr(inputs, f"in_{i}").get()
        return self.Outputs(out=self.gain * total + self.offset), internal_state

    namespace["solve_ctx"] = solve_ctx
    return type(class_name, (Component,), namespace, register=False)


def _make_integrator_component(class_name, input_var, state_var):
    """Dynamic component: state' = state + rate * input * dt."""
    namespace = {
        "__doc__": f"fuzz integrator node {class_name}",
        "rate": Parameter(default=0.1),
        "inp": Input(input_var, unit="W/m^2"),
        "acc": State(state_var, unit="W/m^2"),
    }

    def solve_ctx(self, ctx, inputs, internal_state):
        dt = ctx.t_next - ctx.t_current
        new = inputs.acc.at_start() + self.rate * inputs.inp.get() * dt
        return self.Outputs(acc=new), internal_state

    namespace["solve_ctx"] = solve_ctx
    return type(class_name, (Component,), namespace, register=False)


def _random_model(seed):
    rng = random.Random(seed)
    years = np.arange(2000.0, 2000.0 + rng.randrange(5, 15))
    ta = TimeAxis.from_values(years)

    n_layers = rng.randrange(2, 5)
    schema = VariableSchema()
    schema.add_variable("Fuzz|Source", "W/m^2")

    components = []
    initial_values = {}
    produced = ["Fuzz|Source"]  # variables available as inputs

    for layer in range(n_layers):
        var = f"Fuzz|L{layer}"
        n_in = min(len(produced), rng.randrange(1, 3))
        input_vars = rng.sample(produced, n_in)
        if rng.random() < 0.3:
            state_var = f"Fuzz|S{layer}"
            cls = _make_integrator_component(
                f"FuzzInt{seed}_{layer}", input_vars[0], state_var
            )
            comp = cls(rate=rng.uniform(0.05, 0.3))
            schema.add_variable(state_var, "W/m^2")
            initial_values[state_var] = rng.uniform(-1.0, 1.0)
            produced.append(state_var)
        else:
            cls = _make_affine_component(f"FuzzAff{seed}_{layer}", input_vars, var)
            comp = cls(gain=rng.uniform(0.5, 1.5), offset=rng.uniform(-0.5, 0.5))
            schema.add_variable(var, "W/m^2")
            produced.append(var)
        components.append(comp)

    # random insertion order exercises source classification
    rng.shuffle(components)

    source = Timeseries.from_values(
        np.linspace(1.0, 2.0, len(years)), np.asarray(years)
    )
    builder = ModelBuilder().with_time_axis(ta).with_schema(schema)
    for comp in components:
        builder = builder.with_component(comp)
    return (
        builder.with_exogenous_variable("Fuzz|Source", source)
        .with_initial_values(initial_values)
        .build()
    ), produced


@pytest.mark.parametrize("seed", range(16))
def test_random_dag_host_matches_compiled(seed):
    host, produced = _random_model(seed)
    compiled, _ = _random_model(seed)

    host.run(compiled=False)
    compiled.run(compiled=True)

    for name in produced:
        h = host.collection.get_data(name).values()
        c = compiled.collection.get_data(name).values()
        np.testing.assert_allclose(
            h, c, rtol=1e-10, atol=1e-12,
            err_msg=f"seed={seed} variable={name}",
        )


def _make_fourbox_component(class_name, input_var, output_var):
    """Dynamic FourBox component: per-region affine with region offsets."""
    namespace = {
        "__doc__": f"fuzz fourbox node {class_name}",
        "gain": Parameter(default=1.0),
        "inp": Input(input_var, unit="W/m^2"),
        "out": Output(output_var, unit="W/m^2", grid="FourBox"),
    }

    def solve_ctx(self, ctx, inputs, internal_state):
        base = inputs.inp.get()
        from rscm_tpu.core.state import FourBoxSlice

        return (
            self.Outputs(
                out=FourBoxSlice(
                    self.gain * base + 0.1,
                    self.gain * base + 0.2,
                    self.gain * base - 0.1,
                    self.gain * base - 0.2,
                )
            ),
            internal_state,
        )

    namespace["solve_ctx"] = solve_ctx
    return type(class_name, (Component,), namespace, register=False)


def _make_global_reader(class_name, fourbox_var, output_var):
    """Reads a FourBox variable through a Scalar window (read-side
    aggregation baked into the plan)."""
    namespace = {
        "__doc__": f"fuzz aggregating reader {class_name}",
        "inp": Input(fourbox_var, unit="W/m^2"),  # scalar view of FourBox
        "out": Output(output_var, unit="W/m^2"),
    }

    def solve_ctx(self, ctx, inputs, internal_state):
        return self.Outputs(out=2.0 * inputs.inp.get()), internal_state

    namespace["solve_ctx"] = solve_ctx
    return type(class_name, (Component,), namespace, register=False)


@pytest.mark.parametrize("seed", range(6))
def test_grid_pipelines_host_match_compiled(seed):
    """Scalar -> FourBox -> (aggregated) Scalar chains across random
    insertion orders, host vs compiled."""
    from rscm_tpu.core import GridType

    rng = random.Random(100 + seed)
    years = np.arange(2000.0, 2000.0 + rng.randrange(5, 12))

    def build():
        schema = VariableSchema()
        schema.add_variable("Fuzz|Source", "W/m^2")
        schema.add_variable("Fuzz|Grid", "W/m^2", GridType.FourBox)
        schema.add_variable("Fuzz|Global", "W/m^2")

        components = [
            _make_fourbox_component(f"FuzzGrid{seed}", "Fuzz|Source", "Fuzz|Grid"),
            _make_global_reader(f"FuzzRead{seed}", "Fuzz|Grid", "Fuzz|Global"),
        ]
        comps = [cls(gain=1.0 + 0.1 * seed) if hasattr(cls, "gain") else cls()
                 for cls in components]
        order = list(range(len(comps)))
        rng2 = random.Random(seed)
        rng2.shuffle(order)

        builder = (
            ModelBuilder()
            .with_time_axis(TimeAxis.from_values(years))
            .with_schema(schema)
        )
        for i in order:
            builder = builder.with_component(comps[i])
        return (
            builder.with_exogenous_variable(
                "Fuzz|Source",
                Timeseries.from_values(np.linspace(1.0, 2.0, len(years)), years),
            )
            .build()
        )

    host = build()
    host.run(compiled=False)
    compiled = build()
    compiled.run(compiled=True)

    for name in ["Fuzz|Grid", "Fuzz|Global"]:
        np.testing.assert_allclose(
            host.collection.get_data(name).values(),
            compiled.collection.get_data(name).values(),
            rtol=1e-10, atol=1e-12, err_msg=f"seed={seed} {name}",
        )


def _make_hemispheric_component(class_name, input_var, output_var):
    namespace = {
        "__doc__": f"fuzz hemispheric node {class_name}",
        "gain": Parameter(default=1.0),
        "inp": Input(input_var, unit="W/m^2"),
        "out": Output(output_var, unit="W/m^2", grid="Hemispheric"),
    }

    def solve_ctx(self, ctx, inputs, internal_state):
        base = inputs.inp.get()
        from rscm_tpu.core.state import HemisphericSlice

        return (
            self.Outputs(
                out=HemisphericSlice(self.gain * base + 0.3, self.gain * base - 0.3)
            ),
            internal_state,
        )

    namespace["solve_ctx"] = solve_ctx
    return type(class_name, (Component,), namespace, register=False)


@pytest.mark.parametrize("seed", range(4))
def test_hemispheric_pipeline_host_matches_compiled(seed):
    """Scalar -> Hemispheric -> aggregated Scalar, host vs compiled."""
    from rscm_tpu.core import GridType

    years = np.arange(2000.0, 2008.0)

    def build():
        schema = VariableSchema()
        schema.add_variable("Fuzz|Source", "W/m^2")
        schema.add_variable("Fuzz|Hemi", "W/m^2", GridType.Hemispheric)
        schema.add_variable("Fuzz|Global", "W/m^2")
        comps = [
            _make_hemispheric_component(f"FuzzHemi{seed}", "Fuzz|Source", "Fuzz|Hemi")(
                gain=1.0 + 0.2 * seed
            ),
            _make_global_reader(f"FuzzHemiRead{seed}", "Fuzz|Hemi", "Fuzz|Global")(),
        ]
        rng = random.Random(seed)
        rng.shuffle(comps)
        builder = (
            ModelBuilder()
            .with_time_axis(TimeAxis.from_values(years))
            .with_schema(schema)
        )
        for comp in comps:
            builder = builder.with_component(comp)
        return (
            builder.with_exogenous_variable(
                "Fuzz|Source",
                Timeseries.from_values(np.linspace(1.0, 2.0, len(years)), years),
            )
            .build()
        )

    host = build(); host.run(compiled=False)
    compiled = build(); compiled.run(compiled=True)
    for name in ["Fuzz|Hemi", "Fuzz|Global"]:
        np.testing.assert_allclose(
            host.collection.get_data(name).values(),
            compiled.collection.get_data(name).values(),
            rtol=1e-10, atol=1e-12, err_msg=f"seed={seed} {name}",
        )


# -- streaming vs full-mode fuzz ---------------------------------------------
#
# The streaming (windowed-carry) program replaces full-trajectory carries
# with O(lookback) rolling buffers and *static* buffer indices
# (core/model/program.py:260-372).  These fuzz graphs stress exactly the
# machinery where a static-index windowing bug would hide: deep
# input_lookback reads (at_offset / last_n), schema aggregates, grid
# transforms and integrator state, across random shapes and insertion
# orders — asserting BITWISE full/streaming equality.


def _make_lookback_component(class_name, input_var, output_var, depth):
    """out = mean of the last ``depth+1`` steps of input + trend term."""
    namespace = {
        "__doc__": f"fuzz lookback node {class_name} (depth {depth})",
        "gain": Parameter(default=1.0),
        "inp": Input(input_var, unit="W/m^2", lookback=depth),
        "out": Output(output_var, unit="W/m^2"),
    }

    def solve_ctx(self, ctx, inputs, internal_state):
        w = inputs.inp
        total = w.get()
        for k in range(1, depth + 1):
            past = w.at_offset(-k)
            total = total + (past if past is not None else w.get())
        trend = w.get() - (
            w.at_offset(-depth) if w.at_offset(-depth) is not None else w.get()
        )
        return (
            self.Outputs(out=self.gain * total / (depth + 1) + 0.1 * trend),
            internal_state,
        )

    namespace["solve_ctx"] = solve_ctx
    return type(class_name, (Component,), namespace, register=False)


def _random_streaming_model(seed):
    """Random DAG mixing deep-lookback readers, integrators, FourBox
    producers, aggregating readers and a schema Sum aggregate."""
    from rscm_tpu.core import GridType

    rng = random.Random(9000 + seed)
    years = np.arange(2000.0, 2000.0 + rng.randrange(12, 30))
    ta = TimeAxis.from_values(years)

    schema = VariableSchema()
    schema.add_variable("Fuzz|Source", "W/m^2")

    components = []
    initial_values = {}
    produced = ["Fuzz|Source"]
    sum_contributors = []

    n_layers = rng.randrange(3, 6)
    for layer in range(n_layers):
        kind = rng.random()
        input_var = rng.choice(produced)
        if kind < 0.4:
            var = f"Fuzz|LB{layer}"
            depth = rng.randrange(2, 9)  # deep lookbacks, beyond previous()
            cls = _make_lookback_component(
                f"FuzzLB{seed}_{layer}", input_var, var, depth
            )
            comp = cls(gain=rng.uniform(0.5, 1.5))
            schema.add_variable(var, "W/m^2")
            produced.append(var)
            sum_contributors.append(var)
        elif kind < 0.6:
            var = f"Fuzz|S{layer}"
            cls = _make_integrator_component(f"FuzzInt{seed}_{layer}", input_var, var)
            comp = cls(rate=rng.uniform(0.05, 0.3))
            schema.add_variable(var, "W/m^2")
            initial_values[var] = rng.uniform(-1.0, 1.0)
            produced.append(var)
        elif kind < 0.8:
            grid_var = f"Fuzz|G{layer}"
            global_var = f"Fuzz|GA{layer}"
            schema.add_variable(grid_var, "W/m^2", GridType.FourBox)
            schema.add_variable(global_var, "W/m^2")
            components.append(
                _make_fourbox_component(
                    f"FuzzGrid{seed}_{layer}", input_var, grid_var
                )(gain=rng.uniform(0.5, 1.5))
            )
            comp = _make_global_reader(
                f"FuzzRead{seed}_{layer}", grid_var, global_var
            )()
            produced.extend([global_var])
            sum_contributors.append(global_var)
        else:
            var = f"Fuzz|A{layer}"
            n_in = min(len(produced), rng.randrange(1, 3))
            cls = _make_affine_component(
                f"FuzzAff{seed}_{layer}", rng.sample(produced, n_in), var
            )
            comp = cls(gain=rng.uniform(0.5, 1.5), offset=rng.uniform(-0.5, 0.5))
            schema.add_variable(var, "W/m^2")
            produced.append(var)
            sum_contributors.append(var)
        components.append(comp)

    if sum_contributors:
        schema.add_aggregate(
            "Fuzz|Total", "W/m^2", "Sum", sorted(set(sum_contributors))
        )
        produced.append("Fuzz|Total")

    rng.shuffle(components)
    source = Timeseries.from_values(
        np.sin(np.linspace(0.0, 3.0, len(years))) + 1.5, np.asarray(years)
    )
    builder = ModelBuilder().with_time_axis(ta).with_schema(schema)
    for comp in components:
        builder = builder.with_component(comp)
    model = (
        builder.with_exogenous_variable("Fuzz|Source", source)
        .with_initial_values(initial_values)
        .build()
    )
    return model, [v for v in produced if v != "Fuzz|Source"]


@pytest.mark.parametrize("seed", range(12))
def test_random_graph_streaming_matches_full(seed):
    """Bitwise full-mode vs streaming-mode equality on random graphs with
    deep lookbacks, aggregates, grids and internal state."""
    from rscm_tpu.core.model.program import ModelProgram

    model, out_vars = _random_streaming_model(seed)
    program = ModelProgram(model)

    full_endo, _ = program.run_fn(
        program.gather_endo(),
        program.gather_exo(),
        program.gather_params(),
        program.gather_internals(),
    )
    stream_trajs, _ = program.run_window_fn(
        program.gather_endo_window(0),
        program.gather_exo(),
        program.gather_params(),
        program.gather_internals(),
        out_vars,
    )
    for name in out_vars:
        f = np.asarray(full_endo[name])
        s = np.asarray(stream_trajs[name])
        # bitwise: same rows flow through the same arithmetic
        np.testing.assert_array_equal(
            f, s, err_msg=f"seed={seed} variable={name}"
        )


@pytest.mark.parametrize("seed", range(4))
def test_random_graph_streaming_matches_full_midrun(seed):
    """Streaming from a nonzero start index (resume path): the carried
    window must be seeded with the already-computed prefix rows."""
    from rscm_tpu.core.model.program import ModelProgram

    model, out_vars = _random_streaming_model(seed)
    n_prefix = 4
    for _ in range(n_prefix):
        model.step()
    program = ModelProgram(model)

    full_endo, _ = program.run_fn(
        program.gather_endo(),
        program.gather_exo(),
        program.gather_params(),
        program.gather_internals(),
        start_idx=n_prefix,
    )
    stream_trajs, _ = program.run_window_fn(
        program.gather_endo_window(n_prefix),
        program.gather_exo(),
        program.gather_params(),
        program.gather_internals(),
        out_vars,
        start_idx=n_prefix,
    )
    for name in out_vars:
        np.testing.assert_array_equal(
            np.asarray(full_endo[name]),
            np.asarray(stream_trajs[name]),
            err_msg=f"seed={seed} variable={name}",
        )
