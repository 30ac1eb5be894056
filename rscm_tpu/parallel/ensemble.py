"""
Vmapped + mesh-sharded ensemble execution of a compiled model program.

Typical use::

    runner = EnsembleRunner(model)
    stacked = stack_params([...one param dict per member...])   # or build directly
    out = runner.run(params=stacked)                # single chip
    out = runner.run(params=stacked, mesh=make_mesh())  # all local devices

``params`` follows the model program's parameter pytree —
``{node_id: {param_name: (B,) array}}`` — obtained from
:meth:`EnsembleRunner.base_params` / :func:`stack_params`.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

__all__ = ["EnsembleRunner", "make_mesh", "stack_params"]


def make_mesh(
    n_devices: Optional[int] = None,
    axis_name: str = "batch",
    devices: Optional[list] = None,
):
    """1-D device mesh over the first ``n_devices`` local devices.

    Pass ``devices`` explicitly to build the mesh on a specific backend's
    devices (e.g. ``jax.devices("cpu")`` for the forced-host platform when
    the default platform has fewer chips).
    """
    import jax
    from jax.sharding import Mesh

    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def stack_params(member_params: list) -> dict:
    """Stack a list of per-member parameter pytrees into batched arrays."""
    import jax

    return jax.tree.map(lambda *leaves: np.stack(leaves), *member_params)


class EnsembleRunner:
    """Run a model's compiled program over a batch of members."""

    def __init__(self, model, dtype=None):
        from rscm_tpu.core.model.program import ModelProgram

        self.model = model
        self.program = ModelProgram(model, dtype=dtype)
        self._jitted = {}

    # -- base (single-member) inputs ----------------------------------------

    def base_args(self):
        p = self.program
        return (
            p.gather_endo(),
            p.gather_exo(),
            p.gather_params(),
            p.gather_internals(),
        )

    def base_params(self) -> dict:
        return self.program.gather_params()

    def batched_params(self, overrides: Dict[str, np.ndarray]) -> dict:
        """Batched parameter pytree from per-parameter override arrays.

        ``overrides`` maps ``"ComponentName.param"`` to a (B,) array; all
        other parameters broadcast from the model's values.
        """
        base = self.base_params()
        sizes = {v.shape[0] for v in overrides.values()}
        assert len(sizes) == 1, "override arrays must share the batch size"
        (batch,) = sizes

        name_for_node = {}
        for node in self.program.exec_nodes:
            comp = self.model.graph.nodes[node]
            name_for_node[str(node)] = getattr(
                comp, "component_name", type(comp).__name__
            )

        out = {}
        matched = set()
        for node_key, params in base.items():
            comp_name = name_for_node[node_key]
            out[node_key] = {}
            for pname, value in params.items():
                key = f"{comp_name}.{pname}"
                if key in overrides:
                    matched.add(key)
                    out[node_key][pname] = np.asarray(
                        overrides[key], dtype=self.program.dtype
                    )
                else:
                    out[node_key][pname] = np.broadcast_to(
                        np.asarray(value, dtype=self.program.dtype), (batch,)
                    )
        unknown = set(overrides) - matched
        if unknown:
            known = sorted(
                f"{name_for_node[nk]}.{pn}"
                for nk, params in base.items()
                for pn in params
            )
            raise KeyError(
                f"batched_params: unknown parameter(s) {sorted(unknown)}; "
                f"known traced parameters: {known}"
            )
        return out

    # -- execution -----------------------------------------------------------

    def _build_fn(self, batch_exo: bool, start_idx: int, stream_out=None):
        import jax

        p = self.program

        if stream_out is not None:

            def single(endo, exo, params, internals):
                trajs, _carry = p.run_window_fn(
                    endo, exo, params, internals, stream_out, start_idx=start_idx
                )
                return trajs

        else:

            def single(endo, exo, params, internals):
                endo_out, _ = p.run_fn(endo, exo, params, internals, start_idx=start_idx)
                return endo_out

        in_axes = (None, 0 if batch_exo else None, 0, None)
        return jax.vmap(single, in_axes=in_axes)

    def run(
        self,
        params: dict,
        exo: Optional[dict] = None,
        mesh=None,
        out_vars: Optional[list] = None,
        start_idx: int = 0,
        stream: Optional[bool] = None,
    ):
        """Run the ensemble; returns ``{var_name: (B, n_steps, n_regions)}``.

        ``exo`` optionally provides *batched* exogenous arrays
        ``{name: (B, n_steps, g)}`` (e.g. one SSP scenario per member);
        unbatched exogenous data broadcasts from the model.  ``out_vars``
        restricts which trajectories are pulled back to the host.

        ``stream`` selects the memory-scalable windowed-carry program
        (carry O(lookback) per variable, only ``out_vars`` trajectories
        materialised — required for big-model x big-ensemble runs).  The
        default streams whenever ``out_vars`` is given; values are
        identical between the modes.
        """
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        p = self.program
        if stream is None:
            stream = out_vars is not None
        stream_out = None
        if stream:
            stream_out = tuple(out_vars) if out_vars is not None else tuple(p.endo_names)
        endo = p.gather_endo_window(start_idx) if stream else p.gather_endo()
        internals = p.gather_internals()
        base_exo = p.gather_exo()
        batch_exo = exo is not None
        if batch_exo:
            full_exo = dict(base_exo)
            full_exo.update({k: np.asarray(v, dtype=p.dtype) for k, v in exo.items()})
            # broadcast any unbatched exogenous vars to the batch
            some_batched = next(iter(exo.values()))
            batch = np.asarray(some_batched).shape[0]
            for k, v in full_exo.items():
                if np.asarray(v).ndim == 2:
                    full_exo[k] = np.broadcast_to(v, (batch,) + np.asarray(v).shape)
            exo_arg = full_exo
        else:
            exo_arg = base_exo

        key = (batch_exo, start_idx, mesh is not None and mesh.axis_names, stream_out)
        if key not in self._jitted:
            fn = self._build_fn(batch_exo, start_idx, stream_out=stream_out)
            if mesh is not None:
                axis = mesh.axis_names[0]
                batch_sharding = NamedSharding(mesh, P(axis))
                replicated = NamedSharding(mesh, P())

                def shard_batched(tree, batched):
                    return jax.tree.map(
                        lambda _: batch_sharding if batched else replicated, tree
                    )

                self._jitted[key] = jax.jit(
                    fn,
                    in_shardings=(
                        replicated,
                        batch_sharding if batch_exo else replicated,
                        batch_sharding,
                        replicated,
                    ),
                )
            else:
                self._jitted[key] = jax.jit(fn)

        endo_out = self._jitted[key](endo, exo_arg, params, internals)
        if out_vars is not None:
            endo_out = {k: v for k, v in endo_out.items() if k in out_vars}
        return endo_out
