"""Test configuration.

Tests run on a virtual 8-device CPU mesh with 64-bit floats enabled so that
numerical parity assertions against the reference semantics are exact; the
same code paths run in float32 on real TPU devices (see bench.py).
"""

import os

# Must be set before jax is imported anywhere.  The harness presets
# JAX_PLATFORMS=axon (real TPU); tests run on a virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
# (Persistent-compilation-cache config is applied after the jax import
# below — this jax build ignores the JAX_COMPILATION_CACHE_DIR env var.)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize pins the platform; override it after import —
# the env var alone is not enough.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: the suite compiles hundreds of XLA
# programs (every model shape x mode); caching them across runs cuts
# repeat suite time by minutes.  Must go through jax.config.update — this
# jax build does not read the JAX_COMPILATION_CACHE_DIR env var.  The
# directory is separate from the TPU bench cache (.jax_cache) so the two
# backends never share entries.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def time_axis():
    from rscm_tpu.core.time_axis import TimeAxis

    return TimeAxis.from_values(np.arange(2020.0, 2025.0, 1.0))


@pytest.fixture
def timeseries(time_axis):
    from rscm_tpu.core.interpolate import LinearSpline
    from rscm_tpu.core.timeseries import Timeseries
    from rscm_tpu.core.spatial import ScalarGrid

    return Timeseries(
        np.asarray([1.0, 2.0, 3.0, 4.0, 5.0]),
        time_axis,
        ScalarGrid(),
        "GtC",
        LinearSpline(False),
    )
