"""
Progress reporting for long calibrations (tqdm integration).

Mirror of ``python/rscm/calibrate/progress.py``.
"""

from __future__ import annotations

__all__ = ["ProgressTracker", "create_simple_callback", "create_tqdm_callback"]


def create_tqdm_callback(total: int, desc: str = "Sampling", **tqdm_kwargs):
    """Progress callback driving a tqdm bar; pass to ``sampler.run(...)``."""
    try:
        from tqdm.auto import tqdm
    except ImportError:
        raise ImportError(
            "tqdm is required for progress bar display. Install with: pip install tqdm"
        ) from None

    defaults = {"desc": desc, "total": total, "unit": "iter"}
    defaults.update(tqdm_kwargs)
    pbar = tqdm(**defaults)

    def callback(progress_info):
        pbar.n = progress_info.iteration + 1
        pbar.set_postfix(
            {
                "acc_rate": f"{progress_info.acceptance_rate:.3f}",
                "mean_log_p": f"{progress_info.mean_log_prob:.2f}",
            },
            refresh=True,
        )

    callback.pbar = pbar
    callback.close = pbar.close
    return callback


def create_simple_callback(print_every: int = 100):
    """Text-only progress callback printing every ``print_every`` iterations."""

    def callback(progress_info):
        iteration = progress_info.iteration
        total = progress_info.total
        if (iteration + 1) % print_every == 0 or iteration + 1 == total:
            pct = 100.0 * (iteration + 1) / total
            print(
                f"Iteration {iteration + 1}/{total} ({pct:.1f}%) | "
                f"Acceptance rate: {progress_info.acceptance_rate:.3f} | "
                f"Mean log prob: {progress_info.mean_log_prob:.2f}"
            )

    return callback


class ProgressTracker:
    """Callback object that records per-iteration metrics for later analysis."""

    def __init__(self, print_every: int = 0):
        self.print_every = print_every
        self.iterations = []
        self.acceptance_rates = []
        self.mean_log_probs = []

    def __call__(self, progress_info):
        self.iterations.append(progress_info.iteration)
        self.acceptance_rates.append(progress_info.acceptance_rate)
        self.mean_log_probs.append(progress_info.mean_log_prob)
        if self.print_every > 0:
            iteration, total = progress_info.iteration, progress_info.total
            if (iteration + 1) % self.print_every == 0 or iteration + 1 == total:
                pct = 100.0 * (iteration + 1) / total
                print(
                    f"Iteration {iteration + 1}/{total} ({pct:.1f}%) | "
                    f"Acceptance rate: {progress_info.acceptance_rate:.3f} | "
                    f"Mean log prob: {progress_info.mean_log_prob:.2f}"
                )

    def clear(self):
        self.iterations.clear()
        self.acceptance_rates.clear()
        self.mean_log_probs.clear()
