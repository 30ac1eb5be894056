"""Device-trace profiler for ensemble runs: op-level time attribution.

Runs the coupled MAGICC ensemble (or the flagship with ``--flagship``)
under ``jax.profiler.trace`` and aggregates the captured Chrome-trace
device events by HLO op, printing the top ops by total device time with
their HLO text.  This is how the round-3 ocean-monthly-stacking
bottleneck was found (see docs/performance.md case study 1): the
TensorBoard UI is unavailable in headless environments, but the
``*.trace.json.gz`` files are plain Chrome-trace JSON and carry
``long_name`` (full HLO) plus byte counts per op.

Usage::

    python scripts/profile_ensemble.py [--members 100000] [--years 251]
                                       [--flagship] [--top 40]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import shutil
import time


def parse_trace(logdir: str, top: int) -> None:
    files = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace files captured under", logdir)
        return
    agg: dict = {}
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            name = ev.get("name", "")
            args = ev.get("args") or {}
            entry = agg.setdefault(name, [0, 0.0, args.get("long_name", "")])
            entry[0] += 1
            entry[1] += ev.get("dur", 0) / 1e6
    print(f"\n{'seconds':>9}  {'count':>7}  op")
    for name, (cnt, tot, long_name) in sorted(
        agg.items(), key=lambda kv: -kv[1][1]
    )[:top]:
        print(f"{tot:9.4f}  x{cnt:<6} {name[:90]}")
        if long_name and long_name != name:
            print(f"{'':9}  {str(long_name)[:160]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--members", type=int, default=100_000)
    ap.add_argument("--years", type=int, default=251)
    ap.add_argument("--flagship", action="store_true")
    ap.add_argument("--permafrost", action="store_true",
                    help="profile the permafrost+SLR extended MAGICC graph")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--logdir", default="/tmp/jaxprof")
    args = ap.parse_args()

    import jax
    import numpy as np

    import bench
    from rscm_tpu.parallel import EnsembleRunner

    rng = np.random.default_rng(3)
    n = args.members
    if args.flagship:
        model = bench.build_flagship(n_years=args.years)
        params_spec = {"TwoLayer.lambda0": rng.uniform(0.8, 1.8, n)}
        out_vars = ["Surface Temperature"]
    elif args.permafrost:
        from rscm_tpu.magicc.coupled import build_magicc_model

        years = np.arange(1750.0, 1750.0 + args.years)
        model = build_magicc_model(
            years=years,
            ocean_params={"history_dtype": "bfloat16"},
            include_permafrost=True,
            include_slr=True,
        )
        params_spec = {
            "ClimateUDEB.ecs": rng.uniform(1.8, 5.5, n),
            "Permafrost.arctic_amplification": rng.uniform(1.5, 2.5, n),
        }
        out_vars = ["Surface Temperature", "Sea Level Rise"]
    else:
        from rscm_tpu.magicc.coupled import build_magicc_model

        years = np.arange(1750.0, 1750.0 + args.years)
        model = build_magicc_model(
            years=years, ocean_params={"history_dtype": "bfloat16"}
        )
        params_spec = {
            "ClimateUDEB.ecs": rng.uniform(1.8, 5.5, n),
            "ClimateUDEB.kappa": rng.uniform(0.4, 1.5, n),
            "TerrestrialCarbon.beta": rng.uniform(0.3, 0.9, n),
        }
        out_vars = ["Surface Temperature", "Atmospheric Concentration|CO2"]

    runner = EnsembleRunner(model)
    params = runner.batched_params(params_spec)
    run = lambda: runner.run(params=params, out_vars=out_vars)  # noqa: E731

    t0 = time.time()
    bench._sync(run())
    print("warmup (incl compile):", round(time.time() - t0, 1), "s")
    t0 = time.time()
    bench._sync(run())
    print("steady:", round(time.time() - t0, 3), "s")

    if os.path.isdir(args.logdir):
        shutil.rmtree(args.logdir)
    with jax.profiler.trace(args.logdir):
        bench._sync(run())
    parse_trace(args.logdir, args.top)


if __name__ == "__main__":
    main()
