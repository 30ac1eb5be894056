"""
Tutorial 10 — Large ensembles and multi-chip sharding.

TPU-native capstone (no direct reference counterpart — the reference's
parallelism is a shared-memory thread pool): how one compiled program
scales from a single ensemble member to 100k members on one chip, and
across a device mesh with `jax.sharding`.

Run:  python docs/tutorials/10_ensembles_and_sharding.py
(On a machine without 8 devices, the mesh section uses however many
devices exist.)
"""

# Allow running from a source checkout (unnecessary once pip-installed):
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import time

import numpy as np

from rscm_tpu.components import TwoLayer
from rscm_tpu.core import ModelBuilder, TimeAxis, Timeseries
from rscm_tpu.parallel import EnsembleRunner, make_mesh

years = np.arange(1850.0, 2101.0)
erf = Timeseries.from_values(np.linspace(0.0, 6.0, len(years)), years)

model = (
    ModelBuilder()
    .with_time_axis(TimeAxis.from_values(years))
    .with_component(
        TwoLayer(
            lambda0=1.1, a=0.0, efficacy=1.3, eta=0.8,
            heat_capacity_surface=8.0, heat_capacity_deep=110.0,
        )
    )
    .with_exogenous_variable("Effective Radiative Forcing", erf)
    .with_initial_values({"Surface Temperature": 0.0, "Deep Ocean Temperature": 0.0})
    .build()
)

# ----------------------------------------------------------------------------
# 1. Ensembles are "free": the model compiles to one program whose
#    parameters are traced leaves, so vmap over a (B,) batch of any subset
#    of parameters reuses the same program.  This replaces the reference's
#    one-model-per-thread rayon pool with one fused device program.
# ----------------------------------------------------------------------------
import jax

runner = EnsembleRunner(model)
rng = np.random.default_rng(0)

# Time one batch shape per process: each new batch shape compiles a new
# executable, and on some remote-TPU setups a process's *second* resident
# executable dispatches far slower than its first — benchmark each shape
# in a fresh process to compare fairly.
n_members = 10_000
params = runner.batched_params(
    {
        "TwoLayer.lambda0": rng.uniform(0.7, 1.8, n_members),
        "TwoLayer.eta": rng.uniform(0.5, 1.2, n_members),
    }
)
out = runner.run(params=params, out_vars=["Surface Temperature"])
jax.block_until_ready(out)  # first call compiles
walls = []
for _ in range(3):  # best-of-3: single-shot timings catch dispatch noise
    t0 = time.perf_counter()
    out = runner.run(params=params, out_vars=["Surface Temperature"])
    jax.block_until_ready(out)
    walls.append(time.perf_counter() - t0)
wall = min(walls)
temps = np.asarray(out["Surface Temperature"])[:, -1, 0]
print(
    f"{n_members:6d} members x {len(years) - 1} yr: {wall * 1e3:7.2f} ms "
    f"({n_members * (len(years) - 1) / wall:.2e} member-years/s); "
    f"2100 warming 5-95% = {np.percentile(temps, 5):.2f}-"
    f"{np.percentile(temps, 95):.2f} K"
)

# ----------------------------------------------------------------------------
# 2. Multi-chip: a 1-D device mesh shards the batch axis; XLA partitions
#    the program, each chip integrates its shard, no collectives on the
#    hot path (members are independent).  The same code drives 8 TPUs or
#    8 virtual CPU devices (XLA_FLAGS=--xla_force_host_platform_device_count=8).
# ----------------------------------------------------------------------------
n_dev = len(jax.devices())
mesh = make_mesh(n_dev)
print(f"mesh over {n_dev} device(s):", mesh)

batch = 4 * n_dev
params = runner.batched_params(
    {"TwoLayer.lambda0": rng.uniform(0.7, 1.8, batch)}
)
out = runner.run(params=params, mesh=mesh, out_vars=["Surface Temperature"])
temps = np.asarray(out["Surface Temperature"])[:, -1, 0]
assert np.all(np.isfinite(temps))
print(f"mesh-sharded batch of {batch}: 2100 warming "
      f"{temps.min():.2f}-{temps.max():.2f} K")
print("OK")
