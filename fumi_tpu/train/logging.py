"""Metric writer — wandb-compatible logging spine.

The reference leans on wandb for run lifecycle, per-step metrics, gradient
watching, and checkpoint storage (ref: fumi/main.py:25-32, utils.py:272,
406-419). Here the writer is pluggable: wandb when importable and enabled,
otherwise a JSONL file + stdout summary — same ``log(dict, step)`` surface
either way, so the harness code is identical.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricWriter:
    """wandb-compatible metric writer with a JSONL fallback."""

    def __init__(self, log_dir: str, run_name: Optional[str] = None,
                 use_wandb: bool = True, wandb_kwargs: Optional[dict] = None,
                 offline: bool = False, run_suffix: str = ""):
        self.run_name = (run_name or f"run_{int(time.time())}") + run_suffix
        self._run_suffix = run_suffix
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._wandb = None
        if use_wandb and not offline:
            try:
                import wandb  # optional dependency
                self._wandb = wandb
                wandb.init(**(wandb_kwargs or {}))
                if wandb.run is not None and wandb.run.name:
                    self.run_name = wandb.run.name + run_suffix
            except Exception as e:
                # falling back silently would lose the user's dashboard
                # without a word — say so once, then log to JSONL only
                print(f"warning: wandb unavailable "
                      f"({type(e).__name__}: {e}); logging to JSONL only")
                self._wandb = None
        self._jsonl = open(
            os.path.join(log_dir, f"{self.run_name}.metrics.jsonl"), "a")
        self.summary: Dict[str, float] = {}
        self._since_flush = 0

    @property
    def run_dir(self) -> str:
        if self._wandb is not None and self._wandb.run is not None:
            return self._wandb.run.dir
        return self.log_dir

    def log(self, metrics: Dict, step: Optional[int] = None) -> None:
        scalars = {k: float(v) for k, v in metrics.items()
                   if _is_scalar(v)}
        if self._wandb is not None:
            self._wandb.log(scalars, step=step)
        rec = dict(scalars)
        if step is not None:
            rec["_step"] = step
        self._jsonl.write(json.dumps(rec) + "\n")
        # flush in batches: per-step training logs arrive 500 at a time
        self._since_flush += 1
        if self._since_flush >= 100:
            self._jsonl.flush()
            self._since_flush = 0
        self.summary.update(scalars)

    def log_arrays(self, arrays: Dict, step: Optional[int] = None) -> None:
        """Log non-scalar records (histogram count vectors, label lists):
        JSONL rows always; ``wandb.Histogram`` for count vectors when a
        live wandb run is attached (``--tpu_watch`` telemetry)."""
        rec = {}
        for k, v in arrays.items():
            rec[k] = v.tolist() if hasattr(v, "tolist") else v
        if self._wandb is not None:
            wb = {}
            for k, v in rec.items():
                if isinstance(v, list) and v and \
                        isinstance(v[0], (int, float)):
                    # fixed-bin counts -> a wandb histogram over bucket
                    # indices (wandb needs numeric edges; the signed-log
                    # bucket labels ride in the JSONL)
                    edges = list(range(len(v) + 1))
                    wb[k] = self._wandb.Histogram(
                        np_histogram=(v, edges))
            if wb:
                self._wandb.log(wb, step=step)
        if step is not None:
            rec["_step"] = step
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()

    def flush(self) -> None:
        self._jsonl.flush()
        self._since_flush = 0

    def finish(self) -> None:
        if self._wandb is not None:
            self._wandb.finish()
        self._jsonl.flush()
        self._jsonl.close()


def _is_scalar(v) -> bool:
    try:
        float(v)
        return True
    except (TypeError, ValueError):
        return False


class AverageMeter:
    """Running average (ref: fumi/utils/average_meter.py:1-17)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0
        self.avg = 0.0

    def update(self, val, n: int = 1):
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)
