"""Typed slices + StateValue surface tests
(mirror of tests/test_typed_slices.py and tests/test_state_value.py)."""

import numpy as np
import pytest

from rscm_tpu.core import (
    FourBoxRegion,
    FourBoxSlice,
    GridType,
    HemisphericRegion,
    HemisphericSlice,
    StateValue,
)


class TestFourBoxSlice:
    def test_constructor_with_kwargs(self):
        s = FourBoxSlice(
            northern_ocean=1.0, northern_land=2.0,
            southern_ocean=3.0, southern_land=4.0,
        )
        assert s.northern_ocean == 1.0
        assert s.southern_land == 4.0

    def test_constructor_partial_kwargs(self):
        s = FourBoxSlice(northern_ocean=5.0)
        assert s.northern_ocean == 5.0
        assert np.isnan(s.northern_land)  # unset regions default to NaN

    def test_default_constructor(self):
        s = FourBoxSlice()
        assert all(np.isnan(v) for v in s.to_list())

    def test_uniform(self):
        s = FourBoxSlice.uniform(7.5)
        assert s.to_list() == [7.5] * 4

    def test_from_array(self):
        s = FourBoxSlice.from_array([1.0, 2.0, 3.0, 4.0])
        assert s.northern_land == 2.0

    def test_setters(self):
        s = FourBoxSlice()
        s.northern_ocean = 10.0
        s.southern_land = 40.0
        assert s.get(FourBoxRegion.NorthernOcean) == 10.0
        assert s.get(3) == 40.0

    def test_get_set_by_index(self):
        s = FourBoxSlice.uniform(1.0)
        s.set(FourBoxRegion.SouthernOcean, 9.0)
        assert s.get(2) == 9.0
        s[1] = 5.0
        assert s[1] == 5.0

    def test_invalid_index(self):
        s = FourBoxSlice()
        with pytest.raises(ValueError, match="Invalid region index"):
            s.get(7)

    def test_len_and_arrays(self):
        s = FourBoxSlice(1.0, 2.0, 3.0, 4.0)
        assert len(s) == 4
        np.testing.assert_array_equal(s.to_array(), [1.0, 2.0, 3.0, 4.0])
        assert s.to_dict() == {
            "northern_ocean": 1.0, "northern_land": 2.0,
            "southern_ocean": 3.0, "southern_land": 4.0,
        }

    def test_aggregate_global(self):
        from rscm_tpu.core import FourBoxGrid

        s = FourBoxSlice(1.0, 2.0, 3.0, 4.0)
        assert s.aggregate_global(FourBoxGrid.magicc_standard()) == pytest.approx(2.5)

    def test_repr(self):
        assert "northern_ocean" in repr(FourBoxSlice.uniform(1.0))


class TestHemisphericSlice:
    def test_constructor(self):
        s = HemisphericSlice(northern=1.5, southern=2.5)
        assert s.northern == 1.5
        assert s.southern == 2.5

    def test_uniform_from_array(self):
        assert HemisphericSlice.uniform(3.0).to_list() == [3.0, 3.0]
        s = HemisphericSlice.from_array([1.0, 2.0])
        assert s.get(HemisphericRegion.Southern) == 2.0

    def test_setters_indexing(self):
        s = HemisphericSlice()
        s.northern = 10.0
        s[1] = 20.0
        assert s.to_list() == [10.0, 20.0]
        assert len(s) == 2


class TestStateValue:
    def test_scalar(self):
        sv = StateValue.scalar(5.0)
        assert sv.is_scalar()
        assert sv.as_scalar() == 5.0
        assert sv.as_four_box() is None
        assert sv.to_scalar() == 5.0
        assert sv.kind is GridType.Scalar

    def test_four_box(self):
        sv = StateValue.four_box(FourBoxSlice(1.0, 2.0, 3.0, 4.0))
        assert sv.is_four_box()
        assert sv.as_four_box().northern_land == 2.0
        assert sv.as_scalar() is None
        # to_scalar = unweighted mean (state/mod.rs:30-41)
        assert sv.to_scalar() == pytest.approx(2.5)

    def test_hemispheric(self):
        sv = StateValue.hemispheric(HemisphericSlice(2.0, 4.0))
        assert sv.is_hemispheric()
        assert sv.to_scalar() == pytest.approx(3.0)

    def test_wrap(self):
        assert StateValue.wrap(1.0).is_scalar()
        assert StateValue.wrap(FourBoxSlice()).is_four_box()
        assert StateValue.wrap(HemisphericSlice()).is_hemispheric()
        sv = StateValue.wrap(StateValue.scalar(2.0))
        assert sv.as_scalar() == 2.0

    def test_equality(self):
        assert StateValue.scalar(1.0) == StateValue.scalar(1.0)
        assert StateValue.scalar(1.0) != StateValue.scalar(2.0)
        assert StateValue.four_box(FourBoxSlice.uniform(1.0)) == StateValue.four_box(
            FourBoxSlice.uniform(1.0)
        )

    def test_repr(self):
        assert "StateValue.scalar(1" in repr(StateValue.scalar(1.0))
        assert "StateValue.four_box" in repr(StateValue.four_box(FourBoxSlice()))
        assert "FourBoxSlice" in repr(StateValue.four_box(FourBoxSlice()))


class TestTypedComponentGridOutputs:
    """Typed components producing grid outputs (test_state_value.py:94-220)."""

    def _run(self, component_cls, out_name, expected_grid_size):
        from rscm_tpu.core import ModelBuilder, TimeAxis, Timeseries

        years = np.arange(2000.0, 2004.0)
        model = (
            ModelBuilder()
            .with_time_axis(TimeAxis.from_values(years))
            .with_component(component_cls())
            .with_exogenous_variable(
                "In", Timeseries.from_values(np.arange(1.0, 5.0), years)
            )
            .build()
        )
        model.run(compiled=False)
        data = model.collection.get_data(out_name)
        assert data.grid.size() == expected_grid_size
        return data

    def test_four_box_output(self):
        from rscm_tpu.core import Component, Input, Output

        class FourBoxProducer(Component, register=False):
            value = Input("In", unit="1")
            out = Output("Out4", unit="1", grid="FourBox")

            def solve_ctx(self, ctx, inputs, st):
                v = inputs.value.get()
                return self.Outputs(
                    out=FourBoxSlice(v, 2 * v, 3 * v, 4 * v)
                ), st

        data = self._run(FourBoxProducer, "Out4", 4)
        assert data.at_time_index(1) == [1.0, 2.0, 3.0, 4.0]

    def test_hemispheric_output(self):
        from rscm_tpu.core import Component, Input, Output

        class HemiProducer(Component, register=False):
            value = Input("In", unit="1")
            out = Output("Out2", unit="1", grid="Hemispheric")

            def solve_ctx(self, ctx, inputs, st):
                v = inputs.value.get()
                return self.Outputs(out=HemisphericSlice(v, -v)), st

        data = self._run(HemiProducer, "Out2", 2)
        assert data.at_time_index(2) == [2.0, -2.0]

    def test_mixed_outputs_compiled_parity(self):
        from rscm_tpu.core import Component, Input, ModelBuilder, Output, TimeAxis, Timeseries

        class Mixed(Component, register=False):
            value = Input("In", unit="1")
            scalar_out = Output("OutS", unit="1")
            grid_out = Output("OutG", unit="1", grid="FourBox")

            def solve_ctx(self, ctx, inputs, st):
                v = inputs.value.get()
                return self.Outputs(
                    scalar_out=v * 10.0,
                    grid_out=FourBoxSlice.uniform(v),
                ), st

        years = np.arange(2000.0, 2010.0)

        def build():
            return (
                ModelBuilder()
                .with_time_axis(TimeAxis.from_values(years))
                .with_component(Mixed())
                .with_exogenous_variable(
                    "In", Timeseries.from_values(np.arange(10.0), years)
                )
                .build()
            )

        host, comp = build(), build()
        host.run(compiled=False)
        comp.run(compiled=True)
        for name in ("OutS", "OutG"):
            np.testing.assert_allclose(
                host.collection.get_data(name).values(),
                comp.collection.get_data(name).values(),
                err_msg=name,
            )


class TestTracedSliceSemantics:
    def test_slice_eq_with_traced_values_returns_traced_bool(self):
        """Comparing slices holding tracers must return a traced
        conjunction, not raise TracerBoolConversionError through all()."""
        import jax
        import jax.numpy as jnp

        from rscm_tpu.core.state import FourBoxSlice

        def f(x):
            a = FourBoxSlice(x, x + 1.0, x + 2.0, x + 3.0)
            b = FourBoxSlice(x, x + 1.0, x + 2.0, x + 3.0)
            c = FourBoxSlice(x, x + 1.0, x + 2.0, x + 99.0)
            return jnp.stack(
                [jnp.asarray(a == b), jnp.asarray(a == c)]
            )

        eq, neq = np.asarray(jax.jit(f)(jnp.float32(1.0)))
        assert bool(eq) and not bool(neq)

    def test_scalar_window_last_n_traced_marks_prehistory_nan(self):
        """Traced last_n beyond the series start must NaN the invalid
        leading rows (a silent dynamic_slice clamp returned *shifted*
        data from the wrong time window); valid rows stay aligned."""
        import jax
        import jax.numpy as jnp

        from rscm_tpu.core.spatial import GridType
        from rscm_tpu.core.state import VariableSource, make_window

        values = np.arange(10.0, dtype=np.float64)[:, None]
        times = np.arange(2000.0, 2010.0)

        def f(idx):
            w = make_window(
                GridType.Scalar,
                jnp.asarray(values),
                idx,
                jnp.asarray(2000.0) + idx,
                source=VariableSource.Exogenous,
                time_values=jnp.asarray(times),
            )
            return w.last_n(4)

        ok = np.asarray(jax.jit(f)(jnp.int32(5)))
        np.testing.assert_allclose(ok, [2.0, 3.0, 4.0, 5.0])
        short = np.asarray(jax.jit(f)(jnp.int32(1)))
        assert np.isnan(short[:2]).all()  # rows before the series start
        np.testing.assert_allclose(short[2:], [0.0, 1.0])
