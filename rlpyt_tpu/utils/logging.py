"""Tabular logger (reference: rlpyt/utils/logging/logger.py + context.py).

Keeps rlpyt's observable surface for curve-comparison parity: a per-run
directory ``<log_dir>/run_<ID>/`` containing ``progress.csv`` (one row per
log interval, same key style: ReturnAverage, StepsPerSecond, CumSteps …),
``debug.log`` (text), ``params.json`` (config), and ``itr_<n>.pkl``
snapshots per snapshot mode (last / all / gap / none).
"""
from __future__ import annotations

import csv
import json
import os
import pickle
import time
from contextlib import contextmanager
from typing import Any, Dict, Optional

import numpy as np


class TabularLogger:
    def __init__(self, log_dir: Optional[str] = None,
                 snapshot_mode: str = "last", snapshot_gap: int = 1,
                 use_summary_writer: bool = False):
        self.log_dir = log_dir
        self.snapshot_mode = snapshot_mode
        self.snapshot_gap = snapshot_gap
        self._tb = None
        if use_summary_writer and log_dir is not None:
            # optional TensorBoard events (rlpyt logger_context
            # use_summary_writer; torch.utils.tensorboard is the same
            # writer the reference used)
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(log_dir=log_dir)
        self._tb_step = 0
        self._tabular: Dict[str, Any] = {}
        self._csv_file = None
        self._csv_writer = None
        self._debug_file = None
        self._header_written = False
        if log_dir is not None:
            os.makedirs(log_dir, exist_ok=True)
            self._csv_path = os.path.join(log_dir, "progress.csv")
            self._debug_file = open(os.path.join(log_dir, "debug.log"), "a")

    def record_tabular(self, key: str, value):
        if hasattr(value, "item"):
            value = value.item()
        self._tabular[key] = value

    def record_tabular_misc_stat(self, key: str, values):
        """Average/Std/Min/Max block (rlpyt logger.record_tabular_misc_stat)."""
        values = np.asarray(values, dtype=np.float64)
        if values.size:
            self.record_tabular(key + "Average", float(np.mean(values)))
            self.record_tabular(key + "Std", float(np.std(values)))
            self.record_tabular(key + "Min", float(np.min(values)))
            self.record_tabular(key + "Max", float(np.max(values)))
        else:
            for suffix in ("Average", "Std", "Min", "Max"):
                self.record_tabular(key + suffix, float("nan"))

    def dump_tabular(self, print_fn=print):
        if not self._tabular:
            return
        if self._tb is not None:
            step = int(self._tabular.get("CumSteps", self._tb_step))
            for k, v in self._tabular.items():
                if isinstance(v, (int, float)):
                    self._tb.add_scalar(k, v, step)
            self._tb_step = step + 1
        # console block
        width = max(len(k) for k in self._tabular)
        lines = ["-" * (width + 22)]
        for k, v in self._tabular.items():
            sval = f"{v:.6g}" if isinstance(v, float) else str(v)
            lines.append(f"| {k:<{width}} | {sval:>15} |")
        lines.append("-" * (width + 22))
        text = "\n".join(lines)
        if print_fn:
            print_fn(text)
        self.log(text, echo=False)
        # csv
        if self.log_dir is not None:
            if self._csv_writer is None:
                self._csv_file = open(self._csv_path, "a", newline="")
                self._csv_writer = csv.DictWriter(
                    self._csv_file, fieldnames=list(self._tabular.keys()))
                if os.path.getsize(self._csv_path) == 0:
                    self._csv_writer.writeheader()
            self._csv_writer.writerow(self._tabular)
            self._csv_file.flush()
        self._tabular = {}

    def log(self, message: str, echo: bool = True):
        stamped = f"{time.strftime('%Y-%m-%d %H:%M:%S')} | {message}"
        if echo:
            print(stamped)
        if self._debug_file is not None:
            self._debug_file.write(stamped + "\n")
            self._debug_file.flush()

    def save_itr_params(self, itr: int, params: Dict[str, Any]):
        """(rlpyt logger.save_itr_params): snapshot per mode."""
        if self.log_dir is None or self.snapshot_mode == "none":
            return
        if self.snapshot_mode == "last":
            path = os.path.join(self.log_dir, "params.pkl")
        elif self.snapshot_mode == "all":
            path = os.path.join(self.log_dir, f"itr_{itr}.pkl")
        elif self.snapshot_mode == "gap":
            if itr % self.snapshot_gap:
                return
            path = os.path.join(self.log_dir, f"itr_{itr}.pkl")
        else:
            raise ValueError(self.snapshot_mode)
        import jax

        host_params = jax.tree.map(np.asarray, params)
        with open(path, "wb") as f:
            pickle.dump(host_params, f)

    def close(self):
        if self._tb is not None:
            self._tb.close()
        if self._csv_file:
            self._csv_file.close()
        if self._debug_file:
            self._debug_file.close()


@contextmanager
def logger_context(log_dir: str, run_id: int, name: str,
                   config: Optional[dict] = None,
                   snapshot_mode: str = "last",
                   use_summary_writer: bool = False):
    """(rlpyt/utils/logging/context.py:logger_context ~L10)."""
    run_dir = os.path.join(log_dir, f"run_{run_id}")
    os.makedirs(run_dir, exist_ok=True)
    if config is not None:
        with open(os.path.join(run_dir, "params.json"), "w") as f:
            json.dump(_jsonable(config), f, indent=2, default=str)
    logger = TabularLogger(run_dir, snapshot_mode=snapshot_mode,
                           use_summary_writer=use_summary_writer)
    logger.log(f"Starting run {name} (run_{run_id})")
    try:
        yield logger
    finally:
        logger.close()


def _jsonable(obj):
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (int, float, str, bool, type(None))):
        return obj
    return str(obj)
