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
        self._input_cache = {}
        self._input_cache_version = self._model_version()

    def _model_version(self):
        """Cheap staleness signature of the underlying model's mutable state."""
        return (self.model.time_index, getattr(self.model, "_state_version", 0))

    def refresh_inputs(self):
        """Drop the cached device-resident model inputs.

        :meth:`run` snapshots the model's endogenous window, exogenous data
        and internal states onto the device on first use (so steady-state
        calls ship only the parameters).  The cache auto-invalidates when the
        model is stepped or restored from a checkpoint; call this explicitly
        after any other in-place mutation of the model's timeseries data.
        """
        self._input_cache.clear()
        self._input_cache_version = self._model_version()

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

    def batched_params(
        self, overrides: Dict[str, np.ndarray], mesh=None, device=None
    ) -> dict:
        """Batched parameter pytree from per-parameter override arrays.

        ``overrides`` maps ``"ComponentName.param"`` to a (B,) array; all
        other parameters stay **unbatched scalars** (vmapped with
        ``in_axes=None``), so only the varied parameters occupy batch-sized
        device memory.  The returned leaves are device-resident: for big
        ensembles the host->device transfer happens once here, not on every
        :meth:`run` call (through the remote-TPU tunnel, re-shipping ~100
        broadcast ``(B,)`` arrays per call measured 38 s at 100k members
        where the compute itself is <1 ms).

        Placement follows the execution target, never the default backend:
        pass the ``mesh`` you will pass to :meth:`run` (batched leaves are
        sharded over its batch axis, scalars replicated) or an explicit
        ``device``.  With neither, the leaves go to the default device if it
        is healthy, else stay host-side (``jit`` places them at call time).
        A batch not divisible by the mesh's device count stays host-side
        too — :meth:`run` pads it before placing.
        """
        import jax

        base = self.base_params()
        sizes = {v.shape[0] for v in overrides.values()}
        assert len(sizes) == 1, "override arrays must share the batch size"

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
                    out[node_key][pname] = np.asarray(
                        value, dtype=self.program.dtype
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
        # Only batched (B,) leaves are placed on device: unvaried scalars
        # are baked into the program as trace-time constants by
        # :meth:`run` (see ``_split_params``), so committing them would
        # only force a device->host pull per scalar at bake time.
        def _place(sharding=None):
            placed = {}
            for nk, node in out.items():
                placed[nk] = {}
                for pn, v in node.items():
                    if np.ndim(v) >= 1:
                        placed[nk][pn] = (
                            jax.device_put(v, sharding)
                            if sharding is not None
                            else jax.device_put(v)
                        )
                    else:
                        placed[nk][pn] = v
            return placed

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            (batch,) = sizes
            if batch % mesh.devices.size != 0:
                # An uneven batch cannot be committed to a sharded layout
                # (device_put would raise); :meth:`run` pads uneven batches
                # before placing, so keep the leaves host-side and let its
                # pad-then-place path shard them.
                return out
            axis = mesh.axis_names[0]
            return _place(NamedSharding(mesh, P(axis)))
        if device is not None:
            return _place(device)
        # No explicit target: default-device residency is a perf optimisation
        # only — if the default backend is unusable (e.g. a libtpu client /
        # terminal mismatch while the caller targets a CPU mesh), keep the
        # leaves host-side and let jit's in_shardings place them at call time.
        try:
            return _place()
        except Exception:
            return out

    # -- constant baking -------------------------------------------------------

    @staticmethod
    def _split_params(params):
        """Partition the parameter pytree into traced (batched ``(B,)``)
        leaves and baked scalar constants.

        Unvaried scalars become **trace-time python floats** closed over
        by the program, not jit arguments: XLA constant-folds them —
        unit-conversion factors, start-year gates, default exponents and
        equal Q10 alphas all collapse at compile time (the same folding
        the calibration runner gets from ``params_pytree``'s numpy
        closure).  The jit cache is keyed on the baked values, so
        changing a scalar triggers a recompile instead of stale results.
        """
        traced: dict = {}
        baked: dict = {}
        baked_key = []
        for nk in sorted(params):
            for pn in sorted(params[nk]):
                v = params[nk][pn]
                if np.ndim(v) >= 1:
                    traced.setdefault(nk, {})[pn] = v
                else:
                    fv = float(v)
                    baked.setdefault(nk, {})[pn] = fv
                    baked_key.append((nk, pn, fv))
        return traced, baked, tuple(baked_key)

    # -- attribution -----------------------------------------------------------

    def cost_analysis(
        self,
        params: dict,
        exo: Optional[dict] = None,
        out_vars: Optional[list] = None,
        start_idx: int = 0,
        stream: Optional[bool] = None,
    ) -> Optional[dict]:
        """XLA cost analysis (flops, bytes accessed) of the exact ensemble
        program :meth:`run` executes for these arguments.

        Lower-and-compile goes through the persistent compilation cache, so
        calling this after :meth:`run` costs no second real compile.  Used
        by bench.py's roofline attribution (achieved HBM-bandwidth fraction
        per config).
        """
        import jax

        p = self.program
        if stream is None:
            stream = out_vars is not None
        stream_out = (
            tuple(out_vars if out_vars is not None else p.endo_names)
            if stream
            else None
        )
        endo = p.gather_endo_window(start_idx) if stream else p.gather_endo()
        exo_arg = dict(p.gather_exo())
        if exo:
            exo_arg.update(exo)
        internals = p.gather_internals()
        traced_params, baked, _ = self._split_params(params)
        param_axes = jax.tree.map(
            lambda v: 0 if np.ndim(v) >= 1 else None, traced_params
        )
        exo_axes = jax.tree.map(
            lambda v: 0 if np.ndim(v) >= 3 else None, exo_arg
        )
        fn = self._build_fn(exo_axes, start_idx, stream_out, param_axes, baked)
        compiled = (
            jax.jit(fn).lower(endo, exo_arg, traced_params, internals).compile()
        )
        analysis = compiled.cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0] if analysis else None
        return analysis

    # -- execution -----------------------------------------------------------

    def _build_fn(self, exo_axes, start_idx: int, stream_out, param_axes, baked):
        import jax

        p = self.program

        def merge(tparams):
            """Overlay traced (batched) leaves on the baked constants."""
            out = {nk: dict(node) for nk, node in baked.items()}
            for nk, node in tparams.items():
                out.setdefault(nk, {}).update(node)
            return out

        if stream_out is not None:

            def single(endo, exo, tparams, internals):
                trajs, _carry = p.run_window_fn(
                    endo, exo, merge(tparams), internals, stream_out,
                    start_idx=start_idx,
                )
                return trajs

        else:

            def single(endo, exo, tparams, internals):
                endo_out, _ = p.run_fn(
                    endo, exo, merge(tparams), internals, start_idx=start_idx
                )
                return endo_out

        # per-leaf axes: only the actually-varied parameters / batched
        # exogenous scenarios are mapped; everything else rides along via
        # in_axes=None (no (B, ...) broadcast, no per-call re-transfer)
        in_axes = (None, exo_axes, param_axes, None)
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

        if start_idx == 0 and self.model.time_index > 0:
            import warnings

            warnings.warn(
                "EnsembleRunner.run(start_idx=0) on a model that has been "
                f"stepped to index {self.model.time_index}: component "
                "internal states (ocean flux history, UDEB ocean column, "
                "...) are snapshotted from the model's CURRENT position, so "
                "the ensemble would mix initial timeseries values with "
                "end-of-run internal states. Rebuild the model (or restore "
                "its checkpoint) for a from-scratch ensemble, or pass "
                "start_idx=model.time_index to continue from where it is.",
                stacklevel=2,
            )

        p = self.program
        if stream is None:
            stream = out_vars is not None
        stream_out = None
        if stream:
            stream_out = tuple(out_vars) if out_vars is not None else tuple(p.endo_names)

        # placement target: the mesh's devices when given, default otherwise.
        # Keyed by device identity so one runner can serve several meshes.
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            replicated_sharding = NamedSharding(mesh, P())
            target_key = tuple(d.id for d in mesh.devices.flat) + (
                mesh.devices.flat[0].platform,
            )
        else:
            replicated_sharding = None
            target_key = None

        # static model inputs: gathered + device-put once, reused across
        # calls; auto-invalidated when the model's state signature changes.
        if self._model_version() != self._input_cache_version:
            self.refresh_inputs()
        cache_key = (stream, start_idx, target_key)
        if cache_key not in self._input_cache:
            gathered_endo = (
                p.gather_endo_window(start_idx) if stream else p.gather_endo()
            )
            gathered = (gathered_endo, p.gather_exo(), p.gather_internals())
            if replicated_sharding is not None:
                gathered = jax.device_put(gathered, replicated_sharding)
            else:
                try:
                    gathered = jax.device_put(gathered)
                except Exception:
                    pass  # unusable default backend: jit places host arrays
            self._input_cache[cache_key] = gathered
        endo, base_exo, internals = self._input_cache[cache_key]

        batch_exo = exo is not None
        if batch_exo:
            # batched members keep axis 0; unbatched model exogenous rides
            # along unmapped (in_axes=None) — no (B, ...) broadcast.
            # Device-resident inputs stay on device (np.asarray would pull
            # them to the host and re-ship ~100s of MB per call through a
            # remote tunnel); host inputs stay host-side so jit can shard
            # them straight to their target devices instead of committing
            # the whole array to the default device first
            import jax
            import jax.numpy as jnp

            def _cast(v):
                if isinstance(v, jax.Array):
                    return jnp.asarray(v, dtype=p.dtype)
                return np.asarray(v, dtype=p.dtype)

            exo_arg = dict(base_exo)
            exo_arg.update({k: _cast(v) for k, v in exo.items()})
        else:
            exo_arg = base_exo

        params, baked, baked_key = self._split_params(params)
        param_axes = jax.tree.map(
            lambda v: 0 if np.ndim(v) >= 1 else None, params
        )
        # exogenous leaves are (n_steps, g) unbatched or (B, n_steps, g) batched
        exo_axes = jax.tree.map(
            lambda v: 0 if np.ndim(v) >= 3 else None, exo_arg
        )
        axes_key = (
            tuple(
                (nk, pn)
                for nk, node_params in sorted(params.items())
                for pn, v in sorted(node_params.items())
                if np.ndim(v) >= 1
            ),
            tuple(k for k, v in sorted(exo_arg.items()) if np.ndim(v) >= 3),
            baked_key,
        )
        if not axes_key[0] and not axes_key[1]:
            raise ValueError(
                "EnsembleRunner.run: nothing is batched — provide batched "
                "parameters (batched_params/stack_params) and/or batched "
                "exogenous scenarios"
            )

        # uneven batches on a mesh: pad with the last member, slice after.
        # (Device-sharded arrays need the batch to divide the device count;
        # padding costs one host round-trip of the batched leaves, so even
        # batches stay on the fast path.)
        batch = next(
            (
                np.shape(v)[0]
                for node_params in params.values()
                for v in node_params.values()
                if np.ndim(v) >= 1
            ),
            None,
        )
        if batch is None:
            batch = next(np.shape(v)[0] for v in exo_arg.values() if np.ndim(v) >= 3)
        pad = 0
        if mesh is not None:
            n_dev = int(mesh.devices.size)
            pad = (-batch) % n_dev
            if pad:

                import jax.numpy as jnp

                def _pad(v, batched):
                    # host leaves pad in numpy (touching no backend — the
                    # default one may be absent/broken when targeting a CPU
                    # mesh); device leaves pad where they live
                    if not batched:
                        return v
                    if isinstance(v, jax.Array):
                        tail = jnp.broadcast_to(v[-1:], (pad,) + v.shape[1:])
                        return jnp.concatenate([v, tail])
                    v = np.asarray(v)
                    tail = np.broadcast_to(v[-1:], (pad,) + v.shape[1:])
                    return np.concatenate([v, tail])

                params = {
                    nk: {
                        pn: _pad(v, np.ndim(v) >= 1) for pn, v in node_params.items()
                    }
                    for nk, node_params in params.items()
                }
                exo_arg = {k: _pad(v, np.ndim(v) >= 3) for k, v in exo_arg.items()}
        key = (
            start_idx,
            mesh is not None and mesh.axis_names,
            target_key,
            stream_out,
            axes_key,
        )
        if mesh is not None:
            axis = mesh.axis_names[0]
            batch_sharding = NamedSharding(mesh, P(axis))
            replicated = replicated_sharding

            def shard_for(axes_tree):
                return jax.tree.map(
                    lambda ax: batch_sharding if ax == 0 else replicated,
                    axes_tree,
                    is_leaf=lambda x: x is None or x == 0,
                )

            # Inputs must live on the mesh, not wherever they were created
            # (batched_params without a mesh commits to the default device;
            # a forced-CPU mesh wants them on CPU).  device_put is a no-op
            # for leaves already laid out correctly.
            params = jax.device_put(params, shard_for(param_axes))
            exo_arg = jax.device_put(exo_arg, shard_for(exo_axes))
            if key not in self._jitted:
                fn = self._build_fn(
                    exo_axes, start_idx, stream_out, param_axes, baked
                )
                self._jitted[key] = jax.jit(
                    fn,
                    in_shardings=(
                        replicated,
                        shard_for(exo_axes),
                        shard_for(param_axes),
                        replicated,
                    ),
                )
        elif key not in self._jitted:
            fn = self._build_fn(exo_axes, start_idx, stream_out, param_axes, baked)
            self._jitted[key] = jax.jit(fn)

        # tracing happens inside this first call: declare the platform it
        # compiles for, so engine auto-resolution (e.g. the UDEB Pallas
        # month kernel) follows the mesh, not the default backend
        from rscm_tpu.utils.target import execution_target, mesh_platform

        with execution_target(mesh_platform(mesh) if mesh is not None else None):
            endo_out = self._jitted[key](endo, exo_arg, params, internals)
        if out_vars is not None:
            endo_out = {k: v for k, v in endo_out.items() if k in out_vars}
        if pad:
            endo_out = {k: v[:batch] for k, v in endo_out.items()}
        return endo_out
