"""
Tutorial 7 — Calibration.

Counterpart of the reference's ``docs/notebooks/calibration_tutorial.py``:
priors, targets, likelihoods, MCMC with the Goodman-Weare ensemble
sampler, and point estimation — with the TPU-native additions: the whole
sampler loop runs **on device** as one ``lax.scan`` when the runner is
compiled, and gradient-based optimizers (Adam / L-BFGS) exploit the
differentiable model.

Run:  python docs/tutorials/07_calibration.py
"""

# Allow running from a source checkout (unnecessary once pip-installed):
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import numpy as np

from rscm_tpu.calibrate import (
    AdamOptimizer,
    CompiledModelRunner,
    EnsembleSampler,
    EstimateKind,
    GaussianLikelihood,
    ParameterSet,
    PointEstimator,
    Target,
    Uniform,
    WalkerInit,
)
from rscm_tpu.components import TwoLayer
from rscm_tpu.core import ModelBuilder, TimeAxis, Timeseries

# ----------------------------------------------------------------------------
# 1. A model whose lambda0 (climate feedback) we pretend not to know.
# ----------------------------------------------------------------------------
years = np.arange(2000.0, 2051.0)
erf = Timeseries.from_values(np.linspace(0.0, 4.0, len(years)), years)
TRUE_LAMBDA = 1.25

model = (
    ModelBuilder()
    .with_time_axis(TimeAxis.from_values(years))
    .with_component(
        TwoLayer(
            lambda0=1.0, a=0.0, efficacy=1.0, eta=0.7,  # lambda0 is a guess
            heat_capacity_surface=8.0, heat_capacity_deep=100.0,
        )
    )
    .with_exogenous_variable("Effective Radiative Forcing", erf)
    .with_initial_values({"Surface Temperature": 0.0, "Deep Ocean Temperature": 0.0})
    .build()
)

# A CompiledModelRunner exposes lambda0 as a traced leaf: theta -> model
# trajectories is a pure, jit/vmap/grad-able function.
runner = CompiledModelRunner(
    model, {"lambda0": "TwoLayer.lambda0"}, ["Surface Temperature"]
)

# ----------------------------------------------------------------------------
# 2. Synthetic observations from the "true" lambda0 + noise.
# ----------------------------------------------------------------------------
truth = runner.run([TRUE_LAMBDA])
obs_times = years[10::10].astype(float)
rng = np.random.default_rng(1)

target = Target()
var_target = target.add_variable("Surface Temperature")
for t in obs_times:
    observed = truth.get_variable("Surface Temperature").get(t)
    var_target.add(t, observed + rng.normal(0.0, 0.05), 0.05)

# ----------------------------------------------------------------------------
# 3. Prior + likelihood.
# ----------------------------------------------------------------------------
params = ParameterSet().add("lambda0", Uniform(0.5, 2.5))
likelihood = GaussianLikelihood()

# ----------------------------------------------------------------------------
# 4. MCMC.  With a compiled runner + Gaussian likelihood the sampler
#    detects that the posterior is traceable and runs the entire
#    stretch-move loop on device (engine="device"); otherwise it falls
#    back to the host loop, batching walkers through run_batch.
# ----------------------------------------------------------------------------
sampler = EnsembleSampler(params, runner, likelihood, target)
chain = sampler.run(
    n_iterations=300,
    init=WalkerInit.ball([1.0], 0.05),
    n_walkers=16,
    seed=0,
)
flat = chain.flat_samples(discard=100)
post_mean = float(np.mean(flat[:, 0]))
post_std = float(np.std(flat[:, 0]))
print(f"posterior lambda0 = {post_mean:.3f} ± {post_std:.3f} "
      f"(true {TRUE_LAMBDA})")
assert abs(post_mean - TRUE_LAMBDA) < 5 * max(post_std, 1e-3)

# ----------------------------------------------------------------------------
# 5. Point estimation with a gradient optimizer: the compiled model is
#    differentiable end-to-end, so Adam descends the exact gradient of the
#    negative log-likelihood (the reference only had RandomSearch).
# ----------------------------------------------------------------------------
estimator = PointEstimator(params, runner, likelihood, target)
estimate = estimator.optimize(
    AdamOptimizer(kind=EstimateKind.ML, n_steps=300, learning_rate=0.02),
    x0=[1.0],
)
print(f"Adam ML lambda0 = {estimate.best_params[0]:.4f}")
assert abs(estimate.best_params[0] - TRUE_LAMBDA) < 0.05

# ----------------------------------------------------------------------------
# 6. NUTS: gradient-based MCMC through the compiled model.  Where the
#    stretch sampler random-walks, the No-U-Turn sampler follows the
#    posterior gradient -- it reaches a converged posterior in a fraction
#    of the model evaluations (sampler.last_diagnostics counts them).
#    Bounded priors are logit-transformed internally, so trajectories
#    never hit the prior's hard support walls.
# ----------------------------------------------------------------------------
from rscm_tpu.calibrate import NUTSSampler

nuts = NUTSSampler(params, runner, likelihood, target, max_tree_depth=6)
nuts_chain = nuts.run(n_iterations=200, n_chains=4, warmup=100, seed=3)
nuts_flat = nuts_chain.flat_samples()
print(f"NUTS lambda0 = {np.mean(nuts_flat[:, 0]):.3f} "
      f"± {np.std(nuts_flat[:, 0]):.3f} "
      f"in {nuts.last_diagnostics['n_model_evals']} model evals "
      f"(stretch above used {300 * 16})")
assert abs(np.mean(nuts_flat[:, 0]) - TRUE_LAMBDA) < 5 * max(np.std(nuts_flat[:, 0]), 1e-3)
assert nuts_chain.r_hat()["lambda0"] < 1.1
print("OK")
