"""
Progress reporting for long calibrations (tqdm integration).

Mirror of ``python/rscm/calibrate/progress.py``.
"""

from __future__ import annotations

__all__ = ["create_tqdm_callback"]


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
    return callback
