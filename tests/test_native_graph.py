"""
Differential tests: native C++ graph engine vs the pure-Python fallback.

The native engine (``native/graph_engine.cpp`` via :mod:`rscm_tpu.native`)
must produce bit-identical traversal orders to the Python implementations
in ``rscm_tpu/core/model/graph.py`` — same BFS (petgraph reverse-insertion
neighbor order), same Kahn FIFO topological order, same cycle offender.
"""

import random

import pytest

from rscm_tpu.core.errors import CircularDependencyError
from rscm_tpu.core.model.graph import ComponentGraph
from rscm_tpu.native import load_graph_engine

engine = load_graph_engine()

pytestmark = pytest.mark.skipif(
    engine is None, reason="native graph engine unavailable (no g++?)"
)


class _Named:
    def __init__(self, name):
        self.component_name = name


def _python_graph(n_nodes, edges):
    """Build a ComponentGraph and force the pure-Python path on it."""
    g = ComponentGraph()
    for i in range(n_nodes):
        g.add_node(_Named(f"C{i}"))
    for src, dst in edges:
        g.add_edge(src, dst, None)
    g._native_engine = lambda: None
    return g


def _random_dag(rng, n_nodes, extra_edges):
    """Random DAG edges (src < dst keeps it acyclic), insertion-shuffled."""
    edges = []
    for dst in range(1, n_nodes):
        src = rng.randrange(dst)
        edges.append((src, dst))  # connected-ish
    for _ in range(extra_edges):
        a, b = rng.randrange(n_nodes), rng.randrange(n_nodes)
        if a != b:
            edges.append((min(a, b), max(a, b)))
    rng.shuffle(edges)
    return edges


def test_bfs_matches_python_on_random_dags():
    rng = random.Random(0)
    for trial in range(50):
        n = rng.randrange(2, 30)
        edges = _random_dag(rng, n, rng.randrange(0, 2 * n))
        # add a root 0 -> everything unreachable, like NullComponent wiring
        py = _python_graph(n, edges)
        start = 0
        assert engine.bfs_order(n, edges, start) == py.bfs_order(start), (
            f"trial {trial}: n={n} edges={edges}"
        )


def test_topo_matches_python_on_random_dags():
    rng = random.Random(1)
    for trial in range(50):
        n = rng.randrange(2, 30)
        edges = _random_dag(rng, n, rng.randrange(0, 2 * n))
        py = _python_graph(n, edges)
        assert engine.topo_order(n, edges) == py.topo_order(0), (
            f"trial {trial}: n={n} edges={edges}"
        )


def test_topo_handles_multi_edges_and_self_loops():
    # duplicate edges and self-loops, mirroring the model builder's
    # multigraph (one edge per requirement) and OwnState self-edges
    edges = [(0, 1), (0, 1), (1, 1), (1, 2), (0, 2), (2, 2)]
    py = _python_graph(3, edges)
    assert engine.topo_order(3, edges) == py.topo_order(0) == [0, 1, 2]


def test_bfs_reverse_insertion_neighbor_order():
    # petgraph order: from node 0 with edges inserted 0->1 then 0->2,
    # neighbors iterate [2, 1]
    edges = [(0, 1), (0, 2)]
    assert engine.bfs_order(3, edges, 0) == [0, 2, 1]


def test_cycle_detection_matches_python():
    edges = [(0, 1), (1, 2), (2, 1)]  # 1 <-> 2 cycle
    offender = engine.find_cycle(3, edges)
    py = _python_graph(3, edges)
    with pytest.raises(CircularDependencyError) as exc:
        py.check_acyclic()
    assert f"'C{offender}'" in str(exc.value)


def test_cycle_detection_tolerates_self_loops():
    edges = [(0, 0), (0, 1), (1, 1)]
    assert engine.find_cycle(2, edges) == -1
    _python_graph(2, edges).check_acyclic()  # must not raise


@pytest.mark.parametrize("bad", [(0, 5), (5, 0), (-1, 0), (0, -1)])
def test_out_of_range_edges_raise_instead_of_corrupting(bad):
    """Edge indices outside [0, n_nodes) must be a Python exception — the
    C functions index src/dst directly, so unchecked input would be UB."""
    edges = [(0, 1), bad]
    with pytest.raises(ValueError, match="out of range"):
        engine.bfs_order(2, edges, 0)
    with pytest.raises(ValueError, match="out of range"):
        engine.topo_order(2, edges)
    with pytest.raises(ValueError, match="out of range"):
        engine.find_cycle(2, edges)


def test_model_build_uses_native_and_matches_python(monkeypatch):
    """End-to-end: a coupled model's execution order is identical with the
    engine on and off (RSCM_TPU_NATIVE=0 path)."""
    import numpy as np

    from rscm_tpu.core import ModelBuilder, TimeAxis, Timeseries, VariableSchema
    from rscm_tpu.components import CarbonCycle, CO2ERF, TwoLayer

    years = np.arange(2000.0, 2010.0)
    emissions = np.full(len(years), 10.0)

    def build():
        schema = VariableSchema()
        schema.add_variable("Emissions|CO2|Anthropogenic", "GtC / yr")
        schema.add_variable("Surface Temperature", "K")
        schema.add_variable("Deep Ocean Temperature", "K")
        schema.add_variable("Atmospheric Concentration|CO2", "ppm")
        schema.add_variable("Cumulative Emissions|CO2", "Gt C")
        schema.add_variable("Cumulative Land Uptake", "Gt C")
        schema.add_variable("Effective Radiative Forcing|CO2", "W/m^2")
        schema.add_aggregate(
            "Effective Radiative Forcing",
            "W/m^2",
            "Sum",
            ["Effective Radiative Forcing|CO2"],
        )
        return (
            ModelBuilder()
            .with_time_axis(TimeAxis.from_values(years))
            .with_schema(schema)
            .with_component(CarbonCycle(tau=20.0, conc_pi=280.0, alpha_temperature=0.03))
            .with_component(CO2ERF(erf_2xco2=3.7, conc_pi=280.0))
            .with_component(
                TwoLayer(
                    lambda0=1.0,
                    a=0.0,
                    efficacy=1.0,
                    eta=0.7,
                    heat_capacity_surface=8.0,
                    heat_capacity_deep=100.0,
                )
            )
            .with_exogenous_variable(
                "Emissions|CO2|Anthropogenic", Timeseries.from_values(emissions, years)
            )
            .with_initial_values(
                {
                    "Surface Temperature": 0.0,
                    "Deep Ocean Temperature": 0.0,
                    "Atmospheric Concentration|CO2": 280.0,
                    "Cumulative Emissions|CO2": 0.0,
                    "Cumulative Land Uptake": 0.0,
                }
            )
            .build()
        )

    native_model = build()

    monkeypatch.setattr(
        "rscm_tpu.core.model.graph.ComponentGraph._native_engine",
        staticmethod(lambda: None),
    )
    python_model = build()
    assert native_model.exec_order == python_model.exec_order
