"""Ensemble (vmap + mesh) execution tests."""

import numpy as np
import pytest

from rscm_tpu.components import TwoLayer
from rscm_tpu.core import ModelBuilder, TimeAxis, Timeseries
from rscm_tpu.parallel import EnsembleRunner, make_mesh

TWO_LAYER_PARAMS = dict(
    lambda0=1.0,
    a=0.0,
    efficacy=1.0,
    eta=0.7,
    heat_capacity_surface=8.0,
    heat_capacity_deep=100.0,
)


def build_model(years, erf):
    return (
        ModelBuilder()
        .with_time_axis(TimeAxis.from_values(years))
        .with_component(TwoLayer(**TWO_LAYER_PARAMS))
        .with_exogenous_variable(
            "Effective Radiative Forcing", Timeseries.from_values(erf, years)
        )
        .with_initial_values({"Surface Temperature": 0.0, "Deep Ocean Temperature": 0.0})
        .build()
    )


class TestEnsembleRunner:
    def test_vmapped_matches_individual_runs(self):
        years = np.arange(2000.0, 2030.0)
        erf = np.full(len(years), 3.7)
        model = build_model(years, erf)
        runner = EnsembleRunner(model)

        lambdas = np.array([0.8, 1.0, 1.3, 1.9])
        params = runner.batched_params({"TwoLayer.lambda0": lambdas})
        out = runner.run(params=params, out_vars=["Surface Temperature"])
        batched = np.asarray(out["Surface Temperature"])  # (B, n, 1)
        assert batched.shape == (4, len(years), 1)

        for i, lam in enumerate(lambdas):
            single = build_model(years, erf)
            single.graph.nodes[single.exec_order[1]].lambda0 = float(lam)
            single.run(compiled=True)
            expected = single.collection.get_data("Surface Temperature").values()
            np.testing.assert_allclose(batched[i], expected, rtol=1e-12, atol=1e-12)

    def test_batched_exogenous_scenarios(self):
        years = np.arange(2000.0, 2020.0)
        model = build_model(years, np.zeros(len(years)))
        runner = EnsembleRunner(model)

        scenarios = np.stack(
            [np.full((len(years), 1), 2.0), np.full((len(years), 1), 4.0)]
        )
        params = runner.batched_params(
            {"TwoLayer.lambda0": np.array([1.0, 1.0])}
        )
        out = runner.run(
            params=params,
            exo={"Effective Radiative Forcing": scenarios},
            out_vars=["Surface Temperature"],
        )
        temps = np.asarray(out["Surface Temperature"])
        # double forcing -> double response (a=0 linear model)
        np.testing.assert_allclose(temps[1, -1], 2.0 * temps[0, -1], rtol=1e-10)

    def test_mesh_sharded_matches_unsharded(self):
        import jax

        if len(jax.devices()) < 2:
            pytest.skip("needs multiple (virtual) devices")
        years = np.arange(2000.0, 2015.0)
        erf = np.full(len(years), 3.7)
        model = build_model(years, erf)
        runner = EnsembleRunner(model)

        batch = 16
        lambdas = np.linspace(0.7, 2.0, batch)
        params = runner.batched_params({"TwoLayer.lambda0": lambdas})

        plain = runner.run(params=params, out_vars=["Surface Temperature"])
        mesh = make_mesh()
        sharded_runner = EnsembleRunner(model)
        sharded = sharded_runner.run(
            params=params, mesh=mesh, out_vars=["Surface Temperature"]
        )
        np.testing.assert_allclose(
            np.asarray(plain["Surface Temperature"]),
            np.asarray(sharded["Surface Temperature"]),
            rtol=1e-12,
        )

    def test_mesh_uneven_batch_matches_unsharded(self):
        """A batch that does not divide the device count pads internally and
        slices the padding off, so results match the unsharded run exactly."""
        import jax

        if len(jax.devices()) < 2:
            pytest.skip("needs multiple (virtual) devices")
        years = np.arange(2000.0, 2015.0)
        erf = np.full(len(years), 3.7)
        model = build_model(years, erf)

        batch = len(jax.devices()) + 3  # deliberately not divisible
        lambdas = np.linspace(0.7, 2.0, batch)

        runner = EnsembleRunner(model)
        params = runner.batched_params({"TwoLayer.lambda0": lambdas})
        plain = runner.run(params=params, out_vars=["Surface Temperature"])

        sharded_runner = EnsembleRunner(model)
        sharded = sharded_runner.run(
            params=params, mesh=make_mesh(), out_vars=["Surface Temperature"]
        )
        result = np.asarray(sharded["Surface Temperature"])
        assert result.shape == (batch, len(years), 1)
        np.testing.assert_allclose(
            np.asarray(plain["Surface Temperature"]), result, rtol=1e-12
        )

    def test_mesh_batched_exogenous(self):
        """Batched-exogenous scenarios shard over the mesh like parameters."""
        import jax

        if len(jax.devices()) < 2:
            pytest.skip("needs multiple (virtual) devices")
        years = np.arange(2000.0, 2012.0)
        model = build_model(years, np.zeros(len(years)))

        n_scenarios = len(jax.devices())
        scenarios = np.stack(
            [np.full((len(years), 1), f) for f in np.linspace(1.0, 4.0, n_scenarios)]
        )
        runner = EnsembleRunner(model)
        params = runner.batched_params(
            {"TwoLayer.lambda0": np.ones(n_scenarios)}
        )
        out = runner.run(
            params=params,
            exo={"Effective Radiative Forcing": scenarios},
            mesh=make_mesh(),
            out_vars=["Surface Temperature"],
        )
        temps = np.asarray(out["Surface Temperature"])
        assert temps.shape == (n_scenarios, len(years), 1)
        # linear model: response ordering follows forcing ordering
        finals = temps[:, -1, 0]
        assert np.all(np.diff(finals) > 0)


def test_batched_params_rejects_unknown_names():
    years = np.arange(2000.0, 2005.0)
    model = build_model(years, np.zeros(len(years)))
    runner = EnsembleRunner(model)
    with pytest.raises(KeyError, match="unknown parameter.*TwoLayer.nope"):
        runner.batched_params({"TwoLayer.nope": np.ones(3)})


class TestMeshAwarePlacement:
    """Placement must follow the execution target, never the default backend.

    Round-2 regression (MULTICHIP_r02): ``batched_params`` committed leaves
    to the default backend with a bare ``jax.device_put``, which blew up when
    the default (TPU) backend was unusable while the mesh had fallen back to
    CPU.  These tests pin the fix: with a mesh, every placement carries an
    explicit sharding.
    """

    def _runner(self, n_years=6):
        years = np.arange(2000.0, 2000.0 + n_years)
        model = build_model(years, np.full(n_years, 3.7))
        return EnsembleRunner(model)

    def test_batched_params_shards_onto_mesh(self):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = make_mesh()
        runner = self._runner()
        params = runner.batched_params(
            {"TwoLayer.lambda0": np.linspace(0.8, 1.8, 2 * mesh.devices.size)},
            mesh=mesh,
        )
        leaves = jax.tree.leaves(params)
        batched = [l for l in leaves if np.ndim(l) >= 1]
        scalars = [l for l in leaves if np.ndim(l) == 0]
        assert batched and scalars
        # batched leaves live sharded on the mesh; unvaried scalars stay
        # host-side — run() bakes them into the program as trace-time
        # constants (committing them would force a device->host pull per
        # scalar at bake time)
        assert all(isinstance(l, jax.Array) for l in batched)
        assert all(
            l.sharding == NamedSharding(mesh, P(mesh.axis_names[0]))
            for l in batched
        )
        assert not any(isinstance(l, jax.Array) for l in scalars)

    def test_batched_params_explicit_device(self):
        import jax

        device = jax.devices("cpu")[0]
        runner = self._runner()
        params = runner.batched_params(
            {"TwoLayer.lambda0": np.array([0.9, 1.1])}, device=device
        )
        for leaf in jax.tree.leaves(params):
            if np.ndim(leaf) >= 1:
                assert leaf.devices() == {device}
            else:  # scalars stay host-side for constant baking
                assert not isinstance(leaf, jax.Array)

    def test_baked_scalar_change_is_not_stale(self):
        """Scalars are baked as compile-time constants, keyed on their
        values: changing one between run() calls must produce the new
        physics (a fresh compile), never a stale cached program."""
        runner = self._runner()
        params = runner.batched_params(
            {"TwoLayer.lambda0": np.array([0.9, 1.1])}
        )
        out1 = np.asarray(
            runner.run(params=params, out_vars=["Surface Temperature"])[
                "Surface Temperature"
            ]
        )
        node_key = next(
            nk for nk, node in params.items() if "eta" in node
        )
        params2 = {nk: dict(node) for nk, node in params.items()}
        params2[node_key]["eta"] = np.float64(
            float(params[node_key]["eta"]) * 2.0
        )
        out2 = np.asarray(
            runner.run(params=params2, out_vars=["Surface Temperature"])[
                "Surface Temperature"
            ]
        )
        assert not np.allclose(out1[:, 1:], out2[:, 1:])

    def test_mesh_run_never_bare_device_put(self, monkeypatch):
        """Tripwire: with a mesh, no device_put may target the default backend."""
        import jax

        orig = jax.device_put

        def guarded(x, device=None, **kwargs):
            assert device is not None, (
                "bare jax.device_put (default-backend placement) during a "
                "mesh-targeted ensemble run"
            )
            return orig(x, device, **kwargs)

        mesh = make_mesh()
        runner = self._runner()
        monkeypatch.setattr(jax, "device_put", guarded)
        params = runner.batched_params(
            {"TwoLayer.lambda0": np.linspace(0.8, 1.8, mesh.devices.size)},
            mesh=mesh,
        )
        out = runner.run(params=params, mesh=mesh, out_vars=["Surface Temperature"])
        assert np.all(np.isfinite(np.asarray(out["Surface Temperature"])))

    def test_default_backend_params_replaced_onto_mesh(self):
        """Params committed elsewhere are re-placed to the mesh inside run()."""
        import jax

        mesh = make_mesh()
        runner = self._runner()
        # commit to a single device (simulates batched_params without mesh
        # pinning to the default backend) then run on the full mesh
        params = runner.batched_params(
            {"TwoLayer.lambda0": np.linspace(0.8, 1.8, mesh.devices.size)},
            device=jax.devices("cpu")[0],
        )
        out = runner.run(params=params, mesh=mesh, out_vars=["Surface Temperature"])
        temps = np.asarray(out["Surface Temperature"])
        assert temps.shape[0] == mesh.devices.size
        assert np.all(np.isfinite(temps))


def test_input_cache_invalidates_when_model_steps():
    years = np.arange(2000.0, 2006.0)
    model = build_model(years, np.full(len(years), 3.7))
    runner = EnsembleRunner(model)
    params = runner.batched_params({"TwoLayer.lambda0": np.array([0.9, 1.2])})
    runner.run(params=params, out_vars=["Surface Temperature"])
    cached_before = dict(runner._input_cache)
    assert cached_before
    model.step()  # mutates collection + time_index
    with pytest.warns(UserWarning, match="stepped to index 1"):
        runner.run(params=params, out_vars=["Surface Temperature"])
    # cache was rebuilt from the mutated model, not served stale
    assert runner._input_cache_version == (
        model.time_index,
        model._state_version,
    )
    for key, value in runner._input_cache.items():
        assert key not in cached_before or value is not cached_before[key]


class TestMeshedMagicc:
    """The FULL MAGICC coupled graph on a multi-device mesh.

    The reference's rayon batch runs *any* model
    (crates/rscm-calibrate/src/model_runner.rs:251-265); the mesh-sharded
    equivalent here must too — not just the two-component flagship.  These
    pin the production path: streaming scan mode, batch axis sharded over
    all 8 virtual devices, results bitwise-equal to the unsharded run.
    """

    @pytest.fixture(scope="class")
    def magicc_outputs(self):
        import jax

        if len(jax.devices()) < 2:
            pytest.skip("needs multiple (virtual) devices")
        from rscm_tpu.magicc.coupled import build_magicc_model

        years = np.arange(1850.0, 1871.0)
        batch = 2 * len(jax.devices())
        rng = np.random.default_rng(3)
        overrides = {
            "ClimateUDEB.ecs": rng.uniform(2.0, 4.5, batch),
            "TerrestrialCarbon.beta": rng.uniform(0.3, 0.9, batch),
        }
        out_vars = [
            "Surface Temperature",
            "Atmospheric Concentration|CO2",
            "Atmospheric Concentration|CH4",
        ]
        results = {}
        for label, mesh in [("plain", None), ("sharded", make_mesh())]:
            runner = EnsembleRunner(build_magicc_model(years=years))
            params = runner.batched_params(overrides, mesh=mesh)
            out = runner.run(params=params, mesh=mesh, out_vars=out_vars)
            results[label] = {k: np.asarray(v) for k, v in out.items()}
        return results, batch, len(years)

    def test_sharded_matches_unsharded(self, magicc_outputs):
        """Sharded == unsharded to f64 rounding.

        Not asserted bitwise: the partitioned and unpartitioned programs
        are *different XLA compilations* whose fusion choices may re-order
        float accumulation (measured max diff 5.7e-14 on ~290 ppm CO2,
        i.e. ~2e-16 relative — pure ulp).  The per-member physics contains
        no cross-member op, so anything beyond rounding would be a real
        partitioning bug; 1e-12 relative catches that with 4 orders of
        headroom.
        """
        results, batch, n_years = magicc_outputs
        for name, sharded in results["sharded"].items():
            plain = results["plain"][name]
            assert sharded.shape == plain.shape
            np.testing.assert_allclose(
                sharded[:, 1:], plain[:, 1:], rtol=1e-12, atol=0.0,
                err_msg=f"{name}: GSPMD partitioning perturbed the physics",
            )

    def test_sharded_outputs_finite_and_shaped(self, magicc_outputs):
        results, batch, n_years = magicc_outputs
        for name, arr in results["sharded"].items():
            assert arr.shape[0] == batch and arr.shape[1] == n_years, name
            assert np.all(np.isfinite(arr[:, 1:])), name

    def test_permafrost_slr_variant_on_mesh(self):
        import jax

        if len(jax.devices()) < 2:
            pytest.skip("needs multiple (virtual) devices")
        from rscm_tpu.magicc.coupled import build_magicc_model

        years = np.arange(1850.0, 1863.0)
        mesh = make_mesh()
        batch = 2 * len(jax.devices())
        runner = EnsembleRunner(
            build_magicc_model(
                years=years, include_permafrost=True, include_slr=True
            )
        )
        params = runner.batched_params(
            {"ClimateUDEB.ecs": np.linspace(2.0, 4.5, batch)}, mesh=mesh
        )
        out = runner.run(
            params=params,
            mesh=mesh,
            out_vars=["Sea Level Rise", "Permafrost|Total Pool"],
        )
        slr = np.asarray(out["Sea Level Rise"])
        pool = np.asarray(out["Permafrost|Total Pool"])
        assert slr.shape[0] == batch and pool.shape[0] == batch
        assert np.all(np.isfinite(slr[:, 1:]))
        assert np.all(np.isfinite(pool[:, 1:]))
