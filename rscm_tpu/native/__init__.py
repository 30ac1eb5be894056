"""
ctypes bindings for the native (C++) runtime pieces.

The reference implements its graph/schedule core in native code
(``crates/rscm-core/src/model/runtime.rs``, petgraph); the rebuild keeps a
native core too — ``native/graph_engine.cpp`` — bound here via ctypes (no
pybind11 in this environment).  Everything has a pure-Python fallback in
``rscm_tpu.core.model.graph``; the native path must be bit-for-bit
order-identical and is differentially tested against it
(``tests/test_native_graph.py``).

Loading strategy:

1. ``RSCM_TPU_NATIVE=0`` disables native entirely (pure Python).
2. A prebuilt ``native/librscm_graph.so`` next to the sources is used if
   present.
3. Otherwise we compile it once with ``g++`` into the same directory (the
   repo is the install; a read-only checkout silently falls back).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

__all__ = ["load_graph_engine", "GraphEngine", "native_enabled"]

_ABI_VERSION = 1
_REPO_ROOT = Path(__file__).resolve().parents[2]
_NATIVE_DIR = _REPO_ROOT / "native"
_LIB_PATH = _NATIVE_DIR / "librscm_graph.so"
_SOURCE = _NATIVE_DIR / "graph_engine.cpp"

_engine_cache: Optional["GraphEngine"] = None
_load_attempted = False


def native_enabled() -> bool:
    return os.environ.get("RSCM_TPU_NATIVE", "1") != "0"


def _compile() -> bool:
    if not _SOURCE.exists():
        return False
    try:
        subprocess.run(
            [
                os.environ.get("CXX", "g++"),
                "-O2",
                "-std=c++17",
                "-fPIC",
                "-shared",
                "-o",
                str(_LIB_PATH),
                str(_SOURCE),
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _LIB_PATH.exists()
    except (OSError, subprocess.SubprocessError):
        return False


class GraphEngine:
    """Thin typed wrapper over librscm_graph.so."""

    def __init__(self, lib: ctypes.CDLL):
        self._lib = lib
        i32 = ctypes.c_int32
        p32 = ctypes.POINTER(ctypes.c_int32)
        lib.rscm_bfs_order.argtypes = [i32, i32, p32, p32, i32, p32]
        lib.rscm_bfs_order.restype = i32
        lib.rscm_topo_order.argtypes = [i32, i32, p32, p32, p32]
        lib.rscm_topo_order.restype = i32
        lib.rscm_find_cycle.argtypes = [i32, i32, p32, p32]
        lib.rscm_find_cycle.restype = i32

    @staticmethod
    def _edge_arrays(n_nodes: int, edges: Sequence[Tuple[int, int]]):
        # The C functions index src/dst unchecked, so an out-of-range edge
        # must surface here as a Python exception, not heap corruption.
        # Graphs are tiny (tens of nodes); the check is free.
        for a, b in edges:
            if not (0 <= a < n_nodes and 0 <= b < n_nodes):
                raise ValueError(
                    f"edge ({a}, {b}) out of range for graph with "
                    f"{n_nodes} nodes"
                )
        n = len(edges)
        Arr = ctypes.c_int32 * max(n, 1)
        src = Arr(*(e[0] for e in edges)) if n else Arr()
        dst = Arr(*(e[1] for e in edges)) if n else Arr()
        return n, src, dst

    @staticmethod
    def _check_count(count: int) -> int:
        if count < 0:  # -2: native-side edge bounds check tripped
            raise ValueError(f"native graph engine rejected edges (code {count})")
        return count

    def bfs_order(self, n_nodes: int, edges: Sequence[Tuple[int, int]], start: int) -> List[int]:
        n_edges, src, dst = self._edge_arrays(n_nodes, edges)
        out = (ctypes.c_int32 * max(n_nodes, 1))()
        count = self._check_count(
            self._lib.rscm_bfs_order(n_nodes, n_edges, src, dst, start, out)
        )
        return list(out[:count])

    def topo_order(self, n_nodes: int, edges: Sequence[Tuple[int, int]]) -> List[int]:
        n_edges, src, dst = self._edge_arrays(n_nodes, edges)
        out = (ctypes.c_int32 * max(n_nodes, 1))()
        count = self._check_count(
            self._lib.rscm_topo_order(n_nodes, n_edges, src, dst, out)
        )
        return list(out[:count])

    def find_cycle(self, n_nodes: int, edges: Sequence[Tuple[int, int]]) -> int:
        """Index of a node on a cycle, or -1 if acyclic."""
        n_edges, src, dst = self._edge_arrays(n_nodes, edges)
        result = int(self._lib.rscm_find_cycle(n_nodes, n_edges, src, dst))
        if result < -1:
            raise ValueError(f"native graph engine rejected edges (code {result})")
        return result


def load_graph_engine() -> Optional[GraphEngine]:
    """Load (compiling if needed) the native graph engine, or None."""
    global _engine_cache, _load_attempted
    if _engine_cache is not None:
        return _engine_cache
    if _load_attempted or not native_enabled():
        return _engine_cache
    _load_attempted = True
    if not _LIB_PATH.exists() and not _compile():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        if lib.rscm_graph_abi_version() != _ABI_VERSION:
            return None
        _engine_cache = GraphEngine(lib)
    except OSError:
        return None
    return _engine_cache
