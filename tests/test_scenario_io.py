"""
Scenario CSV loading: native parser vs Python fallback (differential),
wide-format semantics, and config-driven input wiring end-to-end.
"""

import numpy as np
import pytest

from rscm_tpu.native import csv as csv_mod
from rscm_tpu.native.csv import read_numeric_csv
from rscm_tpu.utils.scenario_io import load_scenario_csv


def _write(tmp_path, text, name="data.csv"):
    path = tmp_path / name
    path.write_text(text)
    return path


class TestNumericCsv:
    def test_native_loads(self):
        assert csv_mod._load() is not None, "native CSV library failed to build"

    def test_parse_basic(self, tmp_path):
        path = _write(tmp_path, "time,A,B\n2000,1.5,2.5\n2001,3.0,4.0\n")
        header, values = read_numeric_csv(path)
        assert header == ["time", "A", "B"]
        np.testing.assert_array_equal(
            values, [[2000.0, 1.5, 2.5], [2001.0, 3.0, 4.0]]
        )

    def test_native_matches_python_on_random_tables(self, tmp_path):
        rng = np.random.default_rng(0)
        for trial in range(10):
            rows, cols = rng.integers(2, 50), rng.integers(2, 8)
            table = rng.standard_normal((rows, cols)) * 10.0 ** rng.integers(-8, 8)
            header = ",".join(["time"] + [f"V{j}" for j in range(cols - 1)])
            body = "\n".join(",".join(repr(float(v)) for v in row) for row in table)
            path = _write(tmp_path, f"{header}\n{body}\n", name=f"t{trial}.csv")

            h_native, v_native = read_numeric_csv(path)
            h_py, v_py = csv_mod._read_python(path)
            assert h_native == h_py
            np.testing.assert_array_equal(v_native, v_py)

    def test_no_trailing_newline(self, tmp_path):
        path = _write(tmp_path, "time,A\n1,2\n3,4")
        _, values = read_numeric_csv(path)
        np.testing.assert_array_equal(values, [[1.0, 2.0], [3.0, 4.0]])

    @pytest.mark.parametrize(
        "text",
        [
            "time,A\n1,2\n3\n",          # ragged
            "time,A\n1,\n",               # empty cell
            "time,A\n1,abc\n",            # non-numeric
            "time,A\n1,1 2\n",            # interior space must not join to 12
            "time,A\n1 0,2\n",            # interior space in first cell
        ],
    )
    def test_malformed_rejected_by_both_parsers(self, tmp_path, text):
        path = _write(tmp_path, text)
        with pytest.raises(ValueError, match="malformed numeric CSV"):
            read_numeric_csv(path)
        with pytest.raises(ValueError, match="malformed numeric CSV"):
            csv_mod._read_python(path)

    def test_surrounding_whitespace_accepted_by_both_parsers(self, tmp_path):
        # float(cell) strips leading/trailing whitespace; native must match.
        path = _write(tmp_path, "time,A\n 1 , 2.5\n3,\t4 \n")
        h_native, v_native = read_numeric_csv(path)
        h_py, v_py = csv_mod._read_python(path)
        assert h_native == h_py
        np.testing.assert_array_equal(v_native, v_py)
        np.testing.assert_array_equal(v_native, [[1.0, 2.5], [3.0, 4.0]])


class TestScenarioCsv:
    def test_load_scenario(self, tmp_path):
        path = _write(
            tmp_path,
            "time,Emissions|CO2,Effective Radiative Forcing\n"
            "2000,1.0,0.5\n2001,2.0,0.6\n2002,3.0,0.7\n",
        )
        series = load_scenario_csv(path, units={"Emissions|CO2": "GtC/yr"})
        assert sorted(series) == ["Effective Radiative Forcing", "Emissions|CO2"]
        ts = series["Emissions|CO2"]
        assert ts.units == "GtC/yr"
        np.testing.assert_array_equal(ts.values()[:, 0], [1.0, 2.0, 3.0])
        np.testing.assert_array_equal(ts.time_axis().values(), [2000.0, 2001.0, 2002.0])

    def test_non_monotonic_time_rejected(self, tmp_path):
        path = _write(tmp_path, "time,A\n2001,1\n2000,2\n")
        with pytest.raises(ValueError, match="strictly increasing"):
            load_scenario_csv(path)

    def test_wrong_first_column_rejected(self, tmp_path):
        path = _write(tmp_path, "A,B\n1,2\n3,4\n")
        with pytest.raises(ValueError, match="first column must be the time axis"):
            load_scenario_csv(path)


class TestConfigInputWiring:
    def test_config_with_file_input_runs(self, tmp_path):
        erf = np.linspace(0.0, 4.0, 101)
        years = np.arange(2000.0, 2101.0)
        csv_path = tmp_path / "erf.csv"
        csv_path.write_text(
            "time,Effective Radiative Forcing\n"
            + "\n".join(f"{t},{v}" for t, v in zip(years, erf))
            + "\n"
        )
        config_path = tmp_path / "model.toml"
        config_path.write_text(
            '[model]\nname = "t"\ntype = "two-layer"\n'
            "[time]\nstart = 2000\nend = 2100\n"
            "[components.climate]\ntype = \"TwoLayer\"\n"
            "[components.climate.parameters]\n"
            "lambda0 = 1.0\na = 0.0\nefficacy = 1.0\neta = 0.7\n"
            "heat_capacity_surface = 8.0\nheat_capacity_deep = 100.0\n"
            "[inputs]\n"
            '"Effective Radiative Forcing" = { file = "erf.csv", unit = "W/m^2" }\n'
        )

        from rscm_tpu.config import build_model, load_config

        model = build_model(load_config(config_path))
        model.run()
        temp = model.timeseries().get_data("Surface Temperature").values()[:, 0]
        assert np.isfinite(temp[-1]) and temp[-1] > 1.0  # forced run warms

    def test_inline_values_input(self):
        from rscm_tpu.config import build_model

        config = {
            "model": {"type": "two-layer"},
            "time": {"start": 2000, "end": 2050},
            "components": {"climate": {"parameters": {
                "lambda0": 1.0, "a": 0.0, "efficacy": 1.0, "eta": 0.7,
                "heat_capacity_surface": 8.0, "heat_capacity_deep": 100.0,
            }}},
            "inputs": {"Effective Radiative Forcing": {
                "values": [0.0, 4.0], "times": [2000.0, 2050.0], "unit": "W/m^2",
            }},
        }
        model = build_model(config)
        model.run()
        temp = model.timeseries().get_data("Surface Temperature").values()[:, 0]
        assert temp[-1] > 0.5
