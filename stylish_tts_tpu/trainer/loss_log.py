"""Loss aggregation + broadcast to logger/TensorBoard.

Parity with the reference LossLog/combine_logs
(reference: train/loss_log.py): metrics dict, weighted reporting
total, window-averaged combination, and broadcast to the python logger
and a SummaryWriter (TensorBoard optional — falls back to a JSONL
metrics file when torch.utils.tensorboard is unavailable).
"""

from __future__ import annotations

import json
import logging
import os.path as osp
from typing import Dict, List, Optional

logger = logging.getLogger("stylish_tts_tpu")


class MetricsWriter:
    """TensorBoard writer with a JSONL fallback."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(osp.join(out_dir, "tensorboard"))
        except Exception:
            self._jsonl = open(
                osp.join(out_dir, "metrics.jsonl"), "a", encoding="utf-8"
            )

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)
        else:
            self._jsonl.write(
                json.dumps({"tag": tag, "value": value, "step": step}) + "\n"
            )
            self._jsonl.flush()

    def add_audio(self, tag: str, audio, step: int, sample_rate: int) -> None:
        if self._tb is not None:
            import numpy as np

            self._tb.add_audio(
                tag, np.asarray(audio)[None, :], step, sample_rate=sample_rate
            )

    def add_figure(self, tag: str, figure, step: int) -> None:
        if self._tb is not None and figure is not None:
            self._tb.add_figure(tag, figure, step)

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
        elif hasattr(self, "_jsonl"):
            self._jsonl.close()


def combine_metrics(window: List[Dict[str, float]]) -> Dict[str, float]:
    totals: Dict[str, float] = {}
    counts: Dict[str, int] = {}
    for m in window:
        for k, v in m.items():
            totals[k] = totals.get(k, 0.0) + float(v)
            counts[k] = counts.get(k, 0) + 1
    return {k: totals[k] / counts[k] for k in totals}


def weighted_total(metrics: Dict[str, float], weights: Dict[str, float]) -> float:
    # "lr" and the "*_lr_mult" gap-aware-LR diagnostics are observability
    # channels, not loss terms — they must not leak into the total
    return sum(
        weights.get(k, 1.0) * v for k, v in metrics.items()
        if k != "lr" and not k.endswith("_lr_mult")
    )


def broadcast(
    metrics: Dict[str, float],
    weights: Dict[str, float],
    writer: Optional[MetricsWriter],
    step: int,
    *,
    prefix: str = "train",
    header: str = "",
) -> float:
    total = weighted_total(metrics, weights)
    parts = ", ".join(f"{k}: {v:.3f}" for k, v in metrics.items())
    logger.info("%sloss: %.3f, %s", header, total, parts)
    if writer is not None:
        writer.add_scalar(f"{prefix}/loss", total, step)
        for k, v in metrics.items():
            writer.add_scalar(f"{prefix}/{k}", v, step)
    return total
