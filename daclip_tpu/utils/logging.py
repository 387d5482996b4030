"""Training observability — the reference's TensorBoard/wandb/loguru stack
(SURVEY.md §5: daclip-sde/train.py:117-153, training/main.py:374-398,
train.py:351-353) mapped to a dependency-light design:

  * MetricWriter: per-experiment log file + console (logger.py:4-26 equivalent),
    metrics appended to results.jsonl (train.py:351-353 parity), and TensorBoard
    event files IF a TB writer implementation is importable (tensorboardX or
    tf.summary) — otherwise silently jsonl-only.
  * Throughput meter matching the samples/s(/device) counters (train.py:213-221).
"""
from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Optional


def setup_logger(name: str, log_dir: Optional[str] = None,
                 level=logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(level)
    if not logger.handlers:
        fmt = logging.Formatter("%(asctime)s.%(msecs)03d - %(levelname)s: "
                                "%(message)s", datefmt="%y-%m-%d %H:%M:%S")
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            fh = logging.FileHandler(os.path.join(log_dir, f"{name}.log"))
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    return logger


def _try_tb_writer(log_dir: str):
    try:
        from tensorboardX import SummaryWriter  # type: ignore
        return SummaryWriter(log_dir)
    except ImportError:
        pass
    try:
        from torch.utils.tensorboard import SummaryWriter  # type: ignore
        return SummaryWriter(log_dir)
    except ImportError:
        pass
    try:
        import tensorflow as tf  # type: ignore
        return tf.summary.create_file_writer(log_dir)
    except ImportError:
        return None


def _try_wandb(project: str, name: str, notes: str, config: Optional[Dict]):
    """--report-to wandb (main.py:379-398); returns the wandb module or None
    with a warning when the package is absent (not baked into this image)."""
    try:
        import wandb  # type: ignore
    except ImportError:
        import logging as _logging
        _logging.getLogger(__name__).warning(
            "--report-to wandb requested but the wandb package is not "
            "installed; metrics go to results.jsonl/tensorboard only")
        return None
    wandb.init(project=project, name=name, notes=notes, config=config or {})
    return wandb


class MetricWriter:
    def __init__(self, log_dir: str, use_tensorboard: bool = True,
                 use_wandb: bool = False, wandb_project: str = "open-clip",
                 wandb_name: str = "", wandb_notes: str = "",
                 wandb_config: Optional[Dict] = None):
        os.makedirs(log_dir, exist_ok=True)
        self.jsonl = open(os.path.join(log_dir, "results.jsonl"), "a")
        self.tb = _try_tb_writer(os.path.join(log_dir, "tb")) \
            if use_tensorboard else None
        self.wandb = _try_wandb(wandb_project, wandb_name, wandb_notes,
                                wandb_config) if use_wandb else None

    def write(self, step: int, metrics: Dict[str, float], prefix: str = ""):
        row = {"step": int(step)}
        row.update({f"{prefix}{k}": float(v) for k, v in metrics.items()
                    if _is_scalar(v)})
        self.jsonl.write(json.dumps(row) + "\n")
        self.jsonl.flush()
        if self.tb is not None:
            if hasattr(self.tb, "add_scalar"):       # tensorboardX
                for k, v in row.items():
                    if k != "step":
                        self.tb.add_scalar(k, v, step)
            else:                                     # tf.summary
                import tensorflow as tf  # type: ignore
                with self.tb.as_default():
                    for k, v in row.items():
                        if k != "step":
                            tf.summary.scalar(k, v, step=step)
        if self.wandb is not None:
            self.wandb.log({k: v for k, v in row.items() if k != "step"},
                           step=step)

    def close(self):
        self.jsonl.close()
        if self.tb is not None and hasattr(self.tb, "close"):
            self.tb.close()
        if self.wandb is not None:
            self.wandb.finish()


def _is_scalar(v) -> bool:
    try:
        float(v)
        return True
    except (TypeError, ValueError):
        return False


class ThroughputMeter:
    """samples/s and samples/s/device (training/train.py:213-221)."""

    def __init__(self, num_devices: int = 1):
        self.num_devices = num_devices
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._n = 0

    def update(self, batch_size: int):
        self._n += batch_size

    def rates(self) -> Dict[str, float]:
        dt = max(time.perf_counter() - self._t0, 1e-9)
        sps = self._n / dt
        return {"samples_per_second": sps,
                "samples_per_second_per_device": sps / self.num_devices}
