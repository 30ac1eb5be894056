"""Regression-suite conftest: session-end parity CSV report."""

from pathlib import Path

import pytest

from .helpers import write_parity_report


@pytest.fixture(scope="session", autouse=True)
def parity_report():
    yield
    write_parity_report(Path(__file__).parent / "parity_report.csv")
