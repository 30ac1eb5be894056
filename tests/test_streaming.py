"""
Streaming (windowed-carry) program mode: parity with the full-trajectory
scan and memory-shape guarantees.

The streaming mode (``ModelProgram.run_window_fn``) is the memory-scalable
execution path: the scan carry holds only each variable's lookback window
and only requested trajectories are emitted as ys.  Values must be
bit-identical to the full mode — the same rows flow through the same
arithmetic, only the storage layout differs.
"""

import numpy as np
import pytest

from rscm_tpu.core import ModelBuilder, TimeAxis, Timeseries, VariableSchema
from rscm_tpu.parallel import EnsembleRunner


def _flagship(n_years=30):
    from bench import build_flagship

    return build_flagship(n_years=n_years)


def _assert_trajectories_equal(full, streamed):
    assert set(full) == set(streamed)
    for k in full:
        a, b = np.asarray(full[k]), np.asarray(streamed[k])
        assert a.shape == b.shape
        np.testing.assert_array_equal(a, b, err_msg=k)


class TestStreamingParity:
    def test_flagship_bitwise_equal(self):
        runner = EnsembleRunner(_flagship())
        rng = np.random.default_rng(3)
        params = runner.batched_params(
            {
                "TwoLayer.lambda0": rng.uniform(0.8, 1.8, 5),
                "CarbonCycle.tau": rng.uniform(15.0, 60.0, 5),
            }
        )
        full = runner.run(params=params, stream=False)
        streamed = runner.run(params=params, out_vars=list(full), stream=True)
        _assert_trajectories_equal(full, streamed)

    def test_out_vars_subset_only_emits_requested(self):
        runner = EnsembleRunner(_flagship())
        params = runner.batched_params({"TwoLayer.lambda0": np.array([1.0, 1.3])})
        out = runner.run(params=params, out_vars=["Surface Temperature"], stream=True)
        assert set(out) == {"Surface Temperature"}
        assert np.asarray(out["Surface Temperature"]).shape == (2, 30, 1)

    def test_deep_lookback_component(self):
        """N2O reads at_offset(-(strat_delay+1)); the carry window must
        cover it (lookback plumbing through Component.input_lookback)."""
        from rscm_tpu.magicc import N2OChemistry

        years = np.arange(2000.0, 2030.0)
        emissions = 8.0 + 3.0 * np.sin((years - 2000.0) / 4.0)
        schema = VariableSchema()
        schema.add_variable("Emissions|N2O", "Mt N/yr")
        schema.add_variable("Atmospheric Concentration|N2O", "ppb")
        schema.add_variable("Lifetime|N2O", "yr")
        for delay in (1, 3):
            model = (
                ModelBuilder()
                .with_time_axis(TimeAxis.from_values(years))
                .with_schema(schema)
                .with_component(N2OChemistry(strat_delay=delay))
                .with_exogenous_variable(
                    "Emissions|N2O", Timeseries.from_values(emissions, years)
                )
                .with_initial_values({"Atmospheric Concentration|N2O": 275.0})
                .build()
            )
            runner = EnsembleRunner(model)
            assert runner.program.lookbacks["Atmospheric Concentration|N2O"] == delay + 1
            params = runner.batched_params(
                {"N2OChemistry.natural_emissions": np.array([10.0, 12.0])}
            )
            full = runner.run(params=params, stream=False)
            streamed = runner.run(params=params, out_vars=list(full), stream=True)
            _assert_trajectories_equal(full, streamed)

    def test_prefilled_unwritten_variable_matches_full_mode(self):
        """A component may legally omit an output write (the reference
        iterates only the returned outputs, runtime.rs:452), in which case
        the full mode preserves the collection's stored rows.  The
        streaming roll must supply the same stored rows — it used to roll
        in NaN, diverging for any pre-populated endogenous variable."""
        from rscm_tpu.core.component import Component, Input, Output
        from rscm_tpu.core.model.program import ModelProgram

        class PartialWriter(Component):
            drive = Input("Drive", unit="K")
            main = Output("Main", unit="K")
            extra = Output("Extra", unit="K")  # declared, never written

            def solve_ctx(self, ctx, inputs, internal_state):
                return {"Main": inputs.drive.get() * 2.0}, internal_state

        class Reader(Component):
            extra = Input("Extra", unit="K")
            echo = Output("Echo", unit="K")

            def solve_ctx(self, ctx, inputs, internal_state):
                return {"Echo": inputs.extra.get() + 1.0}, internal_state

        years = np.arange(2000.0, 2012.0)
        model = (
            ModelBuilder()
            .with_time_axis(TimeAxis.from_values(years))
            .with_component(PartialWriter())
            .with_component(Reader())
            .with_exogenous_variable(
                "Drive", Timeseries.from_values(np.linspace(0.0, 2.0, 12), years)
            )
            .build()
        )
        # pre-populate the never-written variable (a restored checkpoint /
        # previously-run collection leaves exactly this shape of state)
        model.collection.get_data("Extra")._values[:, 0] = np.linspace(
            5.0, 7.0, len(years)
        )

        program = ModelProgram(model)
        args = (
            program.gather_exo(),
            program.gather_params(),
            program.gather_internals(),
        )
        full, _ = program.run_fn(program.gather_endo(), *args)
        out_vars = ("Main", "Extra", "Echo")
        streamed, _ = program.run_window_fn(
            program.gather_endo_window(0), *args, out_vars=out_vars
        )
        for name in out_vars:
            np.testing.assert_array_equal(
                np.asarray(full[name]), np.asarray(streamed[name]), err_msg=name
            )

    def test_carry_shape_is_lookback_not_n_steps(self):
        program = EnsembleRunner(_flagship(n_years=200)).program
        bufs = program.gather_endo_window()
        for name, buf in bufs.items():
            assert buf.shape[0] == program.lookbacks[name] + 2
            assert buf.shape[0] <= 4  # flagship components read at most previous()

    def test_batched_exogenous_streaming(self):
        model = _flagship()
        runner = EnsembleRunner(model)
        years = np.asarray(model.time_axis.values())
        rng = np.random.default_rng(11)
        batch_emissions = np.stack(
            [np.linspace(0.0, top, len(years))[:, None] for top in rng.uniform(4, 12, 4)]
        )
        params = runner.batched_params({"TwoLayer.lambda0": rng.uniform(0.8, 1.8, 4)})
        exo = {"Emissions|CO2|Anthropogenic": batch_emissions}
        full = runner.run(params=params, exo=exo, stream=False)
        streamed = runner.run(
            params=params, exo=exo, out_vars=list(full), stream=True
        )
        _assert_trajectories_equal(full, streamed)


@pytest.mark.slow
class TestStreamingMagicc:
    def test_full_magicc_bitwise_equal(self):
        from rscm_tpu.magicc.coupled import build_magicc_model

        model = build_magicc_model(years=np.arange(1850.0, 1890.0))
        runner = EnsembleRunner(model)
        assert runner.program.lookbacks["Atmospheric Concentration|N2O"] == 2
        params = runner.batched_params({"ClimateUDEB.ecs": np.array([2.0, 3.0, 4.5])})
        full = runner.run(params=params, stream=False)
        streamed = runner.run(params=params, out_vars=list(full), stream=True)
        _assert_trajectories_equal(full, streamed)
