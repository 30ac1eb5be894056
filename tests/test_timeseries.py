"""Core data-layer tests: TimeAxis, interpolation, grids, GridTimeseries.

Behavioural expectations mirror the reference test-suite
(``crates/rscm-core/src/timeseries.rs`` tests, ``tests/test_timeseries.py``,
``tests/test_spatial_grids.py``).
"""

import numpy as np
import pytest

from rscm_tpu.core.errors import ExtrapolationError, UnsupportedGridTransformationError
from rscm_tpu.core.interpolate import (
    Interp1d,
    InterpolationKind,
    InterpolationStrategy,
    LinearSpline,
    Next,
    Previous,
    interpolate_traced,
)
from rscm_tpu.core.spatial import (
    FourBoxGrid,
    FourBoxRegion,
    GridType,
    HemisphericGrid,
    HemisphericRegion,
    ScalarGrid,
    ScalarRegion,
)
from rscm_tpu.core.time_axis import TimeAxis
from rscm_tpu.core.timeseries import (
    GridTimeseries,
    Timeseries,
    TimeseriesCollection,
    VariableType,
)


class TestTimeAxis:
    def test_from_values(self):
        ta = TimeAxis.from_values(np.array([1.0, 2.0, 3.0]))
        assert len(ta) == 3
        assert ta.at_bounds(2) == (3.0, 4.0)
        assert ta.at(1) == 2.0
        assert ta.at(27) is None

    def test_from_bounds(self):
        ta = TimeAxis.from_bounds(np.array([1.0, 2.0, 3.0, 4.0]))
        assert len(ta) == 3
        assert ta.len_bounds() == 4

    def test_monotonic_required(self):
        with pytest.raises(AssertionError):
            TimeAxis.from_values(np.array([2020.0, 1.0, 2021.0]))

    def test_contains_and_index_of(self):
        ta = TimeAxis.from_values(np.array([1.0, 2.0, 3.0]))
        assert ta.contains(1.0)
        assert not ta.contains(27.0)
        assert ta.index_of(2.0) == 1
        assert ta.index_of(27.0) is None

    def test_values_bounds(self):
        ta = TimeAxis.from_values(np.arange(2000.0, 2005.0))
        np.testing.assert_array_equal(ta.values(), np.arange(2000.0, 2005.0))
        assert ta.first() == 2000.0
        assert ta.last() == 2005.0


class TestInterpolation:
    def test_linear(self):
        time = np.array([0.0, 0.5, 1.0, 1.5])
        y = np.array([5.0, 8.0, 9.0])
        strat = LinearSpline(False)
        for t, e in zip([0.0, 0.25, 0.5, 0.75, 1.0], [5.0, 6.5, 8.0, 8.5, 9.0]):
            assert Interp1d(time, y, strat).interpolate(t) == pytest.approx(e)

    def test_linear_extrapolation_error(self):
        time = np.array([0.0, 1.0])
        y = np.array([5.0])
        strat = LinearSpline(False)
        for t in [-1.0, -0.01, 1.01, 1.2]:
            with pytest.raises(ExtrapolationError, match="Extrapolation is not allowed"):
                Interp1d(time, y, strat).interpolate(t)

    def test_linear_extrapolation(self):
        time = np.array([0.0, 0.5, 1.0, 1.5])
        y = np.array([5.0, 8.0, 9.0])
        strat = LinearSpline(True)
        for t, e in zip([1.5, 2.0], [10.0, 11.0]):
            assert Interp1d(time, y, strat).interpolate(t) == pytest.approx(e)

    def test_next(self):
        time = np.array([0.0, 0.5, 1.0, 1.5])
        y = np.array([5.0, 8.0, 9.0])
        strat = Next(False)
        for t, e in zip([0.0, 0.25, 0.5, 0.75, 1.0], [5.0, 8.0, 8.0, 9.0, 9.0]):
            assert Interp1d(time, y, strat).interpolate(t) == pytest.approx(e)

    def test_next_extrapolation(self):
        time = np.array([0.0, 0.5, 1.0, 1.5])
        y = np.array([5.0, 8.0, 9.0])
        strat = Next(True)
        targets = [-1.0, 0.0, 0.25, 0.5, 0.75, 1.0, 1.2]
        exps = [5.0, 5.0, 8.0, 8.0, 9.0, 9.0, 9.0]
        for t, e in zip(targets, exps):
            assert Interp1d(time, y, strat).interpolate(t) == pytest.approx(e)

    def test_previous(self):
        time = np.array([0.0, 0.5, 1.0, 1.5])
        y = np.array([5.0, 8.0, 9.0])
        strat = Previous(True)
        # On boundary returns the value at that index; in-segment the previous.
        assert Interp1d(time, y, strat).interpolate(0.25) == 5.0
        assert Interp1d(time, y, strat).interpolate(0.5) == 8.0
        assert Interp1d(time, y, strat).interpolate(0.75) == 8.0
        assert Interp1d(time, y, strat).interpolate(2.5) == 9.0
        assert Interp1d(time, y, strat).interpolate(-1.0) == 5.0

    def test_traced_matches_host(self):
        time = np.array([0.0, 0.5, 1.0, 1.5, 2.0])
        y = np.array([5.0, 8.0, 9.0, 4.0, 7.0])
        targets = [-0.5, 0.0, 0.2, 0.5, 0.77, 1.0, 1.9, 2.0, 2.5]
        for kind in InterpolationKind:
            strat = InterpolationStrategy(kind, True)
            for t in targets:
                host = Interp1d(time, y, strat).interpolate(t)
                traced = float(interpolate_traced(time, y, t, strat))
                assert traced == pytest.approx(host, rel=1e-14), (kind, t)


class TestSpatialGrids:
    def test_four_box_aggregate(self):
        grid = FourBoxGrid.with_weights([0.25, 0.25, 0.40, 0.10])
        assert grid.aggregate_global([15.0, 14.0, 10.0, 9.0]) == pytest.approx(12.15)

    def test_four_box_to_hemispheric(self):
        grid = FourBoxGrid.magicc_standard()
        result = grid.transform_to([16.0, 14.0, 12.0, 8.0], HemisphericGrid.equal_weights())
        assert result == pytest.approx([15.0, 10.0])

    def test_four_box_to_scalar(self):
        grid = FourBoxGrid.magicc_standard()
        result = grid.transform_to([10.0, 20.0, 30.0, 40.0], ScalarGrid())
        assert result == pytest.approx([25.0])

    def test_hemispheric_to_scalar(self):
        grid = HemisphericGrid.equal_weights()
        assert grid.transform_to([15.0, 10.0], ScalarGrid()) == pytest.approx([12.5])

    def test_hemispheric_to_four_box_rejected(self):
        grid = HemisphericGrid.equal_weights()
        with pytest.raises(UnsupportedGridTransformationError):
            grid.transform_to([15.0, 10.0], FourBoxGrid.magicc_standard())

    def test_weights_must_sum_to_one(self):
        with pytest.raises(AssertionError):
            FourBoxGrid.with_weights([0.5, 0.5, 0.5, 0.5])

    def test_grid_type_coarseness(self):
        assert GridType.Scalar.is_coarser_than(GridType.FourBox)
        assert GridType.Hemispheric.is_coarser_than(GridType.FourBox)
        assert not GridType.FourBox.is_coarser_than(GridType.Scalar)
        assert GridType.FourBox.can_aggregate_to(GridType.Scalar)
        assert not GridType.Hemispheric.can_aggregate_to(GridType.FourBox)

    def test_region_names(self):
        assert FourBoxGrid.magicc_standard().region_names() == [
            "Northern Ocean",
            "Northern Land",
            "Southern Ocean",
            "Southern Land",
        ]
        assert int(FourBoxRegion.NorthernOcean) == 0
        assert int(HemisphericRegion.Southern) == 1
        assert int(ScalarRegion.Global) == 0


class TestGridTimeseries:
    def _make_fourbox(self):
        grid = FourBoxGrid.magicc_standard()
        ta = TimeAxis.from_values(np.array([2000.0, 2001.0, 2002.0]))
        values = np.array(
            [[15.0, 14.0, 10.0, 9.0], [15.5, 14.5, 10.5, 9.5], [16.0, 15.0, 11.0, 10.0]]
        )
        return GridTimeseries(values, ta, grid, "degC", LinearSpline(True))

    def test_create(self):
        ts = self._make_fourbox()
        assert len(ts) == 3
        assert ts.grid.size() == 4
        assert ts.latest == 2

    def test_access(self):
        ts = self._make_fourbox()
        assert ts.at(0, FourBoxRegion.NorthernOcean) == 15.0
        assert ts.at(0, FourBoxRegion.NorthernLand) == 14.0
        assert ts.at_time_index(0) == [15.0, 14.0, 10.0, 9.0]
        assert ts.latest_values() == [16.0, 15.0, 11.0, 10.0]

    def test_latest_tracking(self):
        grid = FourBoxGrid.magicc_standard()
        ta = TimeAxis.from_values(np.array([2000.0, 2001.0]))
        values = np.array([[15.0, 14.0, 10.0, 9.0], [np.nan] * 4])
        ts = GridTimeseries(values, ta, grid, "degC", LinearSpline(True))
        assert ts.latest == 0
        for r, v in enumerate([16.0, 15.0, 11.0, 10.0]):
            ts.set_index(1, r, v)
        assert ts.latest == 1

    def test_aggregate_global(self):
        ts = self._make_fourbox()
        g = ts.aggregate_global()
        assert g.grid.size() == 1
        assert g.at(0, ScalarRegion.Global) == pytest.approx(12.0)

    def test_transform_to_hemispheric(self):
        grid = FourBoxGrid.magicc_standard()
        ta = TimeAxis.from_values(np.array([2000.0, 2001.0]))
        values = np.array([[16.0, 14.0, 12.0, 8.0], [17.0, 15.0, 13.0, 9.0]])
        ts = GridTimeseries(values, ta, grid, "degC", LinearSpline(True))
        hemi = ts.transform_to(HemisphericGrid.equal_weights())
        assert hemi.at(0, HemisphericRegion.Northern) == pytest.approx(15.0)
        assert hemi.at(0, HemisphericRegion.Southern) == pytest.approx(10.0)

    def test_region_extraction(self):
        ts = self._make_fourbox()
        no = ts.region(int(FourBoxRegion.NorthernOcean))
        assert no.grid.size() == 1
        assert no.at(0) == 15.0
        nl = ts.region_by_name("Northern Land")
        assert nl.at(0) == 14.0

    def test_interpolate_into(self):
        grid = FourBoxGrid.magicc_standard()
        ta = TimeAxis.from_values(np.array([2000.0, 2002.0]))
        values = np.array([[10.0] * 4, [20.0] * 4])
        ts = GridTimeseries(values, ta, grid, "degC", LinearSpline(True))
        resampled = ts.interpolate_into(
            TimeAxis.from_values(np.array([2000.0, 2001.0, 2002.0]))
        )
        assert len(resampled) == 3
        assert resampled.at(1, FourBoxRegion.NorthernOcean) == pytest.approx(15.0)

    def test_scalar_convenience(self):
        ts = Timeseries.from_values(
            np.array([1.0, 2.0, 3.0, 4.0, 5.0]), np.arange(2000.0, 2050.0, 10.0)
        )
        assert len(ts) == 5
        assert ts.latest_value() == 5.0
        assert ts.at_scalar(0) == 1.0
        assert ts.at_time(2040.0, ScalarRegion.Global) == 5.0
        # Linear extrapolation (default strategy extrapolates)
        assert ts.at_time(2045.0) == pytest.approx(5.5)

    def test_roundtrip_serialisation(self):
        ts = self._make_fourbox()
        d = ts.to_dict()
        ts2 = GridTimeseries.from_dict(d)
        np.testing.assert_array_equal(ts.values(), ts2.values())
        assert ts2.grid.grid_type is GridType.FourBox
        assert ts2.latest == ts.latest


class TestTimeseriesCollection:
    def test_add_and_get(self):
        coll = TimeseriesCollection()
        ts = Timeseries.from_values(np.array([1.0, 2.0]), np.array([2000.0, 2001.0]))
        coll.add_timeseries("Emissions|CO2", ts, VariableType.Exogenous)
        got = coll.get_timeseries_by_name("Emissions|CO2")
        assert got is not None
        assert got.at_scalar(0) == 1.0
        # Clone semantics: mutation does not propagate back
        got.set_scalar(0, 99.0)
        assert coll.get_timeseries_by_name("Emissions|CO2").at_scalar(0) == 1.0

    def test_duplicate_rejected(self):
        coll = TimeseriesCollection()
        ts = Timeseries.from_values(np.array([1.0, 2.0]), np.array([2000.0, 2001.0]))
        coll.add_timeseries("x", ts)
        with pytest.raises(ValueError, match="already exists"):
            coll.add_timeseries("x", ts.copy())

    def test_sorted_names(self):
        coll = TimeseriesCollection()
        for name in ["b", "a", "c"]:
            coll.add_timeseries(
                name, Timeseries.from_values(np.array([1.0, 2.0]), np.array([0.0, 1.0]))
            )
        assert coll.names() == ["a", "b", "c"]

    def test_grid_checked_setters(self):
        from rscm_tpu.core.errors import GridOutputMismatchError

        coll = TimeseriesCollection()
        ta = TimeAxis.from_values(np.array([2000.0, 2001.0]))
        coll.add_four_box_timeseries(
            "T", GridTimeseries.new_empty(ta, FourBoxGrid.magicc_standard(), "K")
        )
        with pytest.raises(GridOutputMismatchError):
            coll.set_scalar("T", 0, 1.0)
        coll.set_four_box("T", 0, [1.0, 2.0, 3.0, 4.0])
        assert coll.get_fourbox_timeseries_by_name("T").at_time_index(0) == [1.0, 2.0, 3.0, 4.0]


class TestCollectionContracts:
    """Clone-on-add, serialisation fidelity, and actionable errors."""

    def _scalar_ts(self):
        return Timeseries.from_values(
            np.array([1.0, 2.0, 3.0]), np.array([2000.0, 2001.0, 2002.0])
        )

    def test_add_grid_timeseries_clones(self):
        coll = TimeseriesCollection()
        ts = self._scalar_ts()
        coll.add_grid_timeseries("X", ts)
        ts.set_index(0, 0, 999.0)  # caller mutation must not leak in
        assert coll.get_data("X").at_index(0, 0) == 1.0

    def test_extend_clones(self):
        src = TimeseriesCollection()
        src.add_timeseries("X", self._scalar_ts())
        dst = TimeseriesCollection()
        dst.extend(src)
        src.get_data("X").set_index(0, 0, 999.0)
        assert dst.get_data("X").at_index(0, 0) == 1.0

    def test_latest_round_trips_through_dict(self):
        ta = TimeAxis.from_values(np.array([2000.0, 2001.0, 2002.0]))
        ts = GridTimeseries.new_empty(ta, ScalarGrid(), "K")
        ts.set_index(2, 0, 1.0)
        ts.set_index(2, 0, float("nan"))  # latest stays 2 (reference parity)
        assert ts.latest == 2
        assert GridTimeseries.from_dict(ts.to_dict()).latest == 2

    def test_setters_raise_keyerror_for_unknown_name(self):
        coll = TimeseriesCollection()
        with pytest.raises(KeyError, match="'nope' not found"):
            coll.set_scalar("nope", 0, 1.0)

    def test_grid_weights_immune_to_caller_mutation(self):
        w = np.array([0.3, 0.3, 0.2, 0.2])
        g = FourBoxGrid(w)
        w[0] = 0.9
        np.testing.assert_array_equal(g.weights, [0.3, 0.3, 0.2, 0.2])

    def test_weighted_aggregate_without_weights_is_schema_error(self):
        from rscm_tpu.core.errors import SchemaValidationError
        from rscm_tpu.core.schema import AggregateOp, VariableSchema

        schema = VariableSchema()
        schema.add_variable("A", "K")
        schema.add_aggregate("Agg", "K", AggregateOp("Weighted"), ["A"])
        with pytest.raises(SchemaValidationError, match="requires weights"):
            schema.validate()
