"""Config-system tests (mirror tests/test_config_*.py behaviours)."""

import numpy as np
import pytest

from rscm_tpu.config import (
    ComponentNotFoundError,
    ComponentRegistry,
    IncompatibleSchemaError,
    InputSpec,
    TimeConfig,
    build_model,
    check_schema_version,
    component_registry,
    deep_merge,
    export_parameter_json,
    find_unknown_keys,
    generate_parameter_docs,
    load_config,
    load_config_layers,
    parameter,
    parse_semver,
    validate_parameters,
)

REPO_CONFIG = "configs/two-layer/defaults.toml"
TUNING_CONFIG = "configs/two-layer/tuning/high-sensitivity.toml"


class TestBase:
    def test_time_config(self):
        tc = TimeConfig(1750, 2100)
        assert tc.to_time_axis() == (1750, 2100)
        with pytest.raises(ValueError, match="must be greater"):
            TimeConfig(2100, 2100)

    def test_input_spec(self):
        assert not InputSpec().is_complete()
        assert InputSpec(file="x.csv", unit="W/m^2").is_complete()


class TestLoader:
    def test_deep_merge(self):
        base = {"a": 1, "nested": {"x": 1, "y": 2}}
        override = {"b": 2, "nested": {"y": 3}}
        assert deep_merge(base, override) == {
            "a": 1,
            "b": 2,
            "nested": {"x": 1, "y": 3},
        }

    def test_load_config(self):
        config = load_config(REPO_CONFIG)
        assert config["model"]["type"] == "two-layer"
        assert config["components"]["climate"]["parameters"]["lambda0"] == 1.0

    def test_load_config_layers(self):
        config = load_config_layers(REPO_CONFIG, TUNING_CONFIG)
        params = config["components"]["climate"]["parameters"]
        assert params["lambda0"] == 0.8  # overridden
        assert params["eta"] == 0.7  # preserved from defaults

    def test_unknown_keys_warn(self, tmp_path, caplog):
        p = tmp_path / "odd.toml"
        p.write_text('[model]\nname = "x"\n[bogus]\nkey = 1\n')
        import logging

        with caplog.at_level(logging.WARNING):
            load_config(p)
        assert "bogus" in caplog.text


class TestValidation:
    def test_parse_semver(self):
        assert parse_semver("1.2.3") == (1, 2, 3)
        with pytest.raises(ValueError):
            parse_semver("1.2")
        with pytest.raises(ValueError):
            parse_semver("a.b.c")

    def test_schema_version(self, caplog):
        check_schema_version("1.0.0", "1.0.0")
        with pytest.raises(IncompatibleSchemaError):
            check_schema_version("2.0.0", "1.0.0")
        import logging

        with caplog.at_level(logging.WARNING):
            check_schema_version("1.1.0", "1.0.0")
        assert "newer" in caplog.text

    def test_find_unknown_keys(self):
        assert find_unknown_keys({"a": 1, "b": 2}, {"a"}) == ["b"]
        assert find_unknown_keys({"a": 1}, {"a", "b"}) == []


class TestRegistry:
    def test_register_get(self):
        registry = ComponentRegistry()

        class FakeBuilder:
            pass

        registry.register("Fake", FakeBuilder)
        assert registry.get("Fake") is FakeBuilder
        assert registry.is_registered("Fake")
        assert "Fake" in registry.list()

    def test_not_found(self):
        registry = ComponentRegistry()
        with pytest.raises(ComponentNotFoundError, match="not found"):
            registry.get("Missing")

    def test_conflicting_registration(self):
        registry = ComponentRegistry()

        class A:
            pass

        class B:
            pass

        registry.register("X", A)
        registry.register("X", A)  # idempotent
        with pytest.raises(ValueError, match="already registered"):
            registry.register("X", B)


class TestParameters:
    def test_metadata_and_validation(self):
        from dataclasses import dataclass

        @dataclass
        class MyParams:
            value: float = parameter(default=5.0, range=(0, 10), unit="K")
            mode: str = parameter(default="a", choices=["a", "b"])

        assert validate_parameters(MyParams()) == []
        errors = validate_parameters(MyParams(value=15.0, mode="c"))
        assert len(errors) == 2
        assert "outside valid range" in errors[0]

    def test_docs_generation(self):
        from rscm_tpu.config.models.two_layer import TwoLayerParams

        md = generate_parameter_docs(TwoLayerParams)
        assert "lambda0" in md and "W/m^2/K" in md
        data = export_parameter_json(TwoLayerParams)
        assert data["class"] == "TwoLayerParams"
        assert any(p["name"] == "eta" for p in data["parameters"])


class TestBuildModel:
    def test_build_from_toml(self):
        config = load_config(REPO_CONFIG)
        # keep the test quick: narrow the time range
        config["time"] = {"start": 2000, "end": 2010}
        model = build_model(config)
        assert len(model.time_axis) == 11
        model.run(compiled=False)
        assert model.finished()
        # zero forcing (no exogenous data -> NaN forcing) keeps NaN holes;
        # states must exist with initial zeros at index 0
        assert model.collection.get_data("Surface Temperature").at_scalar(0) == 0.0

    def test_build_layers_override(self):
        config = load_config_layers(REPO_CONFIG, TUNING_CONFIG)
        config["time"] = {"start": 2000, "end": 2005}
        model = build_model(config)
        component = model.graph.nodes[model.exec_order[1]]
        assert component.lambda0 == 0.8
        assert component.efficacy == 1.3

    def test_unknown_model_type(self):
        with pytest.raises(ValueError, match="Unknown model type"):
            build_model({"model": {"type": "nope"}})

    def test_component_metadata_export(self):
        from rscm_tpu.config import export_component_metadata

        meta = export_component_metadata()
        assert "TwoLayer" in meta
        assert any(
            v["variable_name"] == "Effective Radiative Forcing"
            for v in meta["TwoLayer"]["inputs"]
        )


class TestInputResolution:
    """Input-spec routing: typed dataclasses, required enforcement,
    per-layer base-dir resolution, schema-version gating at load."""

    def _write_csv(self, path, name="Effective Radiative Forcing"):
        path.write_text(
            f"time,{name}\n2000,1.0\n2001,2.0\n2002,3.0\n"
        )

    def _toml(self, tmp_path, fname, body):
        p = tmp_path / fname
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(body)
        return p

    def test_typed_config_with_inputspec_builds(self, tmp_path):
        from rscm_tpu.config.models.two_layer import TwoLayerConfig

        self._write_csv(tmp_path / "erf.csv")
        cfg = TwoLayerConfig(
            name="t",
            time=TimeConfig(start=2000, end=2002),
            inputs={
                "Effective Radiative Forcing": InputSpec(
                    file=str(tmp_path / "erf.csv"), unit="W/m^2"
                )
            },
        )
        model = build_model(cfg)
        model.run(compiled=False)
        temps = model.collection.get_data("Surface Temperature").values()
        assert np.all(np.isfinite(temps))

    def test_required_inputspec_without_file_raises(self):
        from rscm_tpu.config.models.two_layer import TwoLayerConfig

        cfg = TwoLayerConfig(
            name="t",
            time=TimeConfig(start=2000, end=2002),
            inputs={"Effective Radiative Forcing": InputSpec(required=True)},
        )
        with pytest.raises(ValueError, match="required but no file"):
            build_model(cfg)

    def test_optional_incomplete_inputspec_is_skipped(self):
        from rscm_tpu.config.builder import _resolve_inputs

        out = _resolve_inputs(
            {"X": InputSpec(required=False)}, {"start": 2000, "end": 2002}, None
        )
        assert out == {}

    def test_layered_file_inputs_resolve_against_their_own_layer(self, tmp_path):
        # defaults layer declares the file (relative to ITS directory);
        # the override layer lives elsewhere and only tweaks a parameter —
        # a naive last-layer-wins _base_dir would look in the wrong place
        self._write_csv(tmp_path / "data" / "erf.csv") if (
            (tmp_path / "data").mkdir() or True
        ) else None
        defaults = self._toml(
            tmp_path,
            "defaults.toml",
            '[model]\ntype = "two-layer"\n'
            "[time]\nstart = 2000\nend = 2002\n"
            "[components.climate.parameters]\n"
            "lambda0 = 1.1\na = 0.0\nefficacy = 1.0\neta = 0.7\n"
            "heat_capacity_surface = 8.0\nheat_capacity_deep = 100.0\n"
            '[inputs."Effective Radiative Forcing"]\n'
            'file = "data/erf.csv"\nunit = "W/m^2"\n',
        )
        override = self._toml(
            tmp_path,
            "tuning/high.toml",
            "[components.climate.parameters]\nlambda0 = 1.5\n",
        )
        config = load_config_layers(defaults, override)
        model = build_model(config)
        model.run(compiled=False)
        assert np.all(
            np.isfinite(model.collection.get_data("Surface Temperature").values())
        )

    def test_incompatible_schema_version_rejected_at_load(self, tmp_path):
        p = self._toml(
            tmp_path,
            "v2.toml",
            '[schema]\nversion = "2.0.0"\n[model]\ntype = "two-layer"\n',
        )
        with pytest.raises(IncompatibleSchemaError):
            load_config(p)
